from pyspark.sql import functions as F

from aresdb_spark.operators.range_join import (range_join,
                                               range_join_oracle_sql)
from tests.conftest import SF_DIR, assert_df_matches_duck


def _brackets(spark, n=100):
    return spark.range(n).select(
        F.col("id").cast("int").alias("bid"),
        (F.col("id") * 5.0).alias("lo"),
        (F.col("id") * 5.0 + 7.0).alias("hi"))


def test_range_join_small(spark):
    left = spark.createDataFrame(
        [(1, 3.0), (2, 6.0), (3, 99.0)], ["pid", "x"])
    right = spark.createDataFrame(
        [(10, 0.0, 5.0), (11, 5.0, 10.0), (12, 6.0, 6.5)],
        ["rid", "lo", "hi"])
    rows = sorted((r["pid"], r["rid"]) for r in range_join(
        left, right, "x", "lo", "hi", bucket_width=5.0).collect())
    # x=3 → [0,5]; x=6 → [5,10] and [6,6.5]; x=99 → none
    assert rows == [(1, 10), (2, 11), (2, 12)]


def test_range_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 3.0), (2, 50.0)], ["pid", "x"])
    right = spark.createDataFrame([(10, 0.0, 5.0)], ["rid", "lo", "hi"])
    rows = sorted((r["pid"], r["rid"]) for r in range_join(
        left, right, "x", "lo", "hi", bucket_width=5.0, how="left").collect())
    assert rows == [(1, 10), (2, None)]


def test_range_join_inclusive_bounds(spark):
    left = spark.createDataFrame([(1, 5.0), (2, 10.0)], ["pid", "x"])
    right = spark.createDataFrame([(10, 5.0, 10.0)], ["rid", "lo", "hi"])
    rows = sorted((r["pid"], r["rid"]) for r in range_join(
        left, right, "x", "lo", "hi", bucket_width=3.0).collect())
    assert rows == [(1, 10), (2, 10)]


def test_range_join_matches_duckdb_oracle(spark, duck):
    from aresdb_spark.catalog import Catalog

    ev = Catalog(SF_DIR).load(spark, "events").select("event_id", "value")
    df = range_join(ev, _brackets(spark), "value", "lo", "hi",
                    bucket_width=5.0).select("event_id", "bid")
    sql = range_join_oracle_sql(
        "SELECT event_id, value FROM events",
        "SELECT i::INT AS bid, i*5.0 AS lo, i*5.0+7.0 AS hi FROM range(100) t(i)",
        point="value", lower="lo", upper="hi",
        select="l.event_id, r.bid")
    assert_df_matches_duck(df, duck, sql)


def test_range_join_same_named_column_other_type(spark):
    """A right-side column named like the left point but with a different
    (timestamp) type must not shadow the point's numeric dtype lookup —
    regression for the dict(left.dtypes + right.dtypes) bug where the left
    point got bucketed via unix_timestamp and every match silently dropped."""
    left = spark.createDataFrame(
        [(1, 3.0), (2, 6.0), (3, 99.0)], ["pid", "x"])
    right = (spark.createDataFrame(
        [(10, 0.0, 5.0), (11, 5.0, 10.0), (12, 6.0, 6.5)],
        ["rid", "lo", "hi"])
        .withColumn("x", F.to_timestamp(F.lit("2024-01-01 00:00:00"))))
    rows = sorted((r["pid"], r["rid"]) for r in range_join(
        left, right, "x", "lo", "hi", bucket_width=5.0).collect())
    assert rows == [(1, 10), (2, 11), (2, 12)]


def test_range_join_timestamp_point(spark):
    """Timestamp point vs timestamp intervals buckets via epoch seconds on
    both sides (dtype resolved per side, timestamp_ntz included)."""
    from datetime import datetime

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 30)), (2, datetime(2024, 1, 1, 5, 0))],
        ["pid", "t"])
    right = spark.createDataFrame(
        [(10, datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 1, 0))],
        ["rid", "t0", "t1"])
    rows = sorted((r["pid"], r["rid"]) for r in range_join(
        left, right, "t", "t0", "t1", bucket_width=3600.0).collect())
    assert rows == [(1, 10)]


def test_range_join_auto_width_matches_oracle(spark, duck):
    """bucket_width=None derives the width from the data and still matches
    the exact inequality-join oracle."""
    from aresdb_spark.catalog import Catalog

    ev = Catalog(SF_DIR).load(spark, "events").select("event_id", "value")
    df = range_join(ev, _brackets(spark), "value", "lo", "hi"
                    ).select("event_id", "bid")
    sql = range_join_oracle_sql(
        "SELECT event_id, value FROM events",
        "SELECT i::INT AS bid, i*5.0 AS lo, i*5.0+7.0 AS hi FROM range(100) t(i)",
        point="value", lower="lo", upper="hi",
        select="l.event_id, r.bid")
    assert_df_matches_duck(df, duck, sql)


def test_range_join_auto_width_avoids_pathological_expansion(spark):
    """The derived width tracks the median interval length, so intervals
    span k ≈ 2 buckets — not the k ≫ 2 a badly-guessed narrow width
    causes (VERDICT r4 #6). Degenerate point intervals fall back to 1."""
    from aresdb_spark.operators.range_join import derive_bucket_width

    right = spark.range(200).select(
        F.col("id").alias("rid"),
        (F.col("id") * 10.0).alias("lo"),
        (F.col("id") * 10.0 + 100.0).alias("hi"))  # every length = 100
    w = derive_bucket_width(right, "lo", "hi")
    assert 50.0 <= w <= 200.0, w  # k = 100/w + 1 stays ≈ 2

    points = spark.range(200).select(
        F.col("id").alias("rid"), F.col("id").cast("double").alias("lo"),
        F.col("id").cast("double").alias("hi"))
    assert derive_bucket_width(points, "lo", "hi") == 1.0

    # timestamp intervals derive in seconds
    ts = spark.sql("""
        SELECT id, timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60) AS t0,
               timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60+600) AS t1
        FROM range(50)""")
    assert derive_bucket_width(ts, "t0", "t1") == 600.0


def test_range_join_is_not_nested_loop(spark):
    left = spark.createDataFrame([(1, 3.0)], ["pid", "x"])
    right = spark.createDataFrame([(10, 0.0, 5.0)], ["rid", "lo", "hi"])
    plan = range_join(left, right, "x", "lo", "hi", bucket_width=5.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
