"""Windowed aggregation operators: tumbling, sliding, session windows
with watermarks.

Reference scope note (SURVEY §2.9): the reference has NO query-time
streaming operators — its "tumbling windows" are the batch time
bucketizers, and session windows don't exist. These operators extend the
engine the way a Spark-native deployment would: the same builders work in
BATCH mode (exact, oracle-checkable) and STREAMING mode (with a watermark
bounding state).

Scale notes:
  - tumbling/sliding: map-side partial agg → one shuffle on (key, window)
  - session windows: Spark's native session_window merges sessions inside
    the aggregation (streaming: state store keyed by (key, session));
    no per-row Python
  - watermark: bounds state size and defines the late-data cutoff — the
    archiving-cutoff analog on the read path
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts_col: str, duration: str,
             keys: list[str] | None = None,
             aggs: list[Column] | None = None,
             watermark: str | None = None) -> DataFrame:
    """Fixed windows: groupBy(window(ts, duration), *keys).agg(...)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.window(ts_col, duration)
    return df.groupBy(w.alias("w"), *(keys or [])).agg(
        *(aggs or [F.count("*").alias("cnt")])) \
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "*").drop("w")


def sliding(df: DataFrame, ts_col: str, duration: str, slide: str,
            keys: list[str] | None = None,
            aggs: list[Column] | None = None,
            watermark: str | None = None) -> DataFrame:
    """Overlapping windows: window(ts, duration, slide)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.window(ts_col, duration, slide)
    return df.groupBy(w.alias("w"), *(keys or [])).agg(
        *(aggs or [F.count("*").alias("cnt")])) \
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "*").drop("w")


def session(df: DataFrame, ts_col: str, gap: str,
            keys: list[str] | None = None,
            aggs: list[Column] | None = None,
            watermark: str | None = None) -> DataFrame:
    """Session windows: a session closes after `gap` of inactivity
    (native session_window — works in batch and streaming)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.session_window(ts_col, gap)
    return df.groupBy(w.alias("w"), *(keys or [])).agg(
        *(aggs or [F.count("*").alias("cnt")])) \
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "*").drop("w")


def session_oracle_sql(table: str, ts_col: str, key_col: str,
                       gap_seconds: int) -> str:
    """DuckDB gaps-and-islands rendering of session(): a new session
    starts when the previous event of the same key is >= gap older —
    Spark's session_window is [start, last + gap), so an event exactly
    ``gap`` after the previous one does NOT overlap and opens a new
    session. The session end is last_event + gap."""
    return f"""
WITH marked AS (
  SELECT {key_col}, {ts_col},
         CASE WHEN {ts_col} - lag({ts_col}) OVER w < INTERVAL {gap_seconds} SECOND
              THEN 0 ELSE 1 END AS new_session
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col})
),
numbered AS (
  SELECT *, sum(new_session) OVER
           (PARTITION BY {key_col} ORDER BY {ts_col}
            ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT min({ts_col}) AS session_start,
       max({ts_col}) + INTERVAL {gap_seconds} SECOND AS session_end,
       {key_col}, count(*) AS cnt
FROM numbered GROUP BY {key_col}, session_id
"""
