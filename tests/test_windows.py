"""Windowed aggregation tests: batch-mode oracle checks + a streaming run
with watermark (SURVEY §2.9 extensions)."""

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_df_matches_duck


def _events(spark):
    from tests.conftest import load_events
    return load_events(spark)


def test_tumbling_matches_bucketizer_oracle(spark, duck):
    from aresdb_spark.streaming.windows import tumbling

    df = tumbling(_events(spark), "ts", "1 hour", keys=["event_type"],
                  aggs=[F.count("*").alias("cnt")]) \
        .select("window_start", "event_type", "cnt")
    assert_df_matches_duck(df, duck, """
        SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2
    """)


def test_sliding_window(spark, duck):
    from aresdb_spark.streaming.windows import sliding

    df = sliding(_events(spark), "ts", "2 hours", "1 hour") \
        .select("window_start", "cnt")
    # a 2h-window sliding by 1h = union of two shifted hourly truncations
    assert_df_matches_duck(df, duck, """
        WITH h AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS c
                   FROM events GROUP BY 1),
        w AS (SELECT hr AS window_start, c FROM h
              UNION ALL
              SELECT hr - INTERVAL 1 HOUR, c FROM h)
        SELECT window_start, sum(c)::BIGINT AS cnt FROM w GROUP BY 1
    """)


def test_session_window_vs_gaps_and_islands(spark, duck):
    from aresdb_spark.streaming.windows import session, session_oracle_sql

    df = session(_events(spark), "ts", "30 minutes", keys=["user_id"],
                 aggs=[F.count("*").alias("cnt")])
    assert_df_matches_duck(
        df.select("session_start", "session_end", "user_id", "cnt"),
        duck, session_oracle_sql("events", "ts", "user_id", 1800))


def test_streaming_windowed_counts(spark, tmp_path):
    """Streaming tumbling window with watermark over a file source."""
    from aresdb_spark.streaming.ingest import file_source
    from aresdb_spark.streaming.windows import tumbling

    rows = [Row(ts=datetime(2024, 1, 1, h, m), k="a")
            for h in range(3) for m in (5, 25, 45)]
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(rows).coalesce(1).write.parquet(str(src / "b1"))

    stream = file_source(spark, f"{src}/*", spark.createDataFrame(rows).schema)
    agg = tumbling(stream, "ts", "1 hour", keys=["k"], watermark="2 hours")
    # complete mode: deterministic single-run output (append mode would
    # need multiple micro-batches to advance the watermark past a window)
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM win_counts").collect()
    got = {(r["window_start"].hour, r["cnt"]) for r in out}
    assert got == {(0, 3), (1, 3), (2, 3)}
