from datetime import datetime

import pytest
from pyspark.sql import functions as F

from aresdb_spark.operators.joins import asof_join, asof_join_oracle_sql
from tests.conftest import SF_DIR, assert_df_matches_duck


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


@pytest.fixture()
def small(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(10), "b"), (2, _ts(3), "c"),
         (3, _ts(1), "d")],
        ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, _ts(2), 10.0), (1, _ts(5), 20.0), (1, _ts(8), 30.0),
         (2, _ts(4), 40.0)],
        ["k", "ts", "v"])
    return left, right


def test_asof_backward_inclusive(small):
    left, right = small
    rows = {(r["k"], r["tag"]): r["v"]
            for r in asof_join(left, right, on="ts", by=["k"]).collect()}
    # k=1 @5 matches the equal-ts right row; @10 the latest earlier (8)
    assert rows == {(1, "a"): 20.0, (1, "b"): 30.0,
                    (2, "c"): None, (3, "d"): None}


def test_asof_backward_strict(small):
    left, right = small
    rows = {(r["k"], r["tag"]): r["v"]
            for r in asof_join(left, right, on="ts", by=["k"],
                               strict=True).collect()}
    # strict: the equal-ts right row @5 is excluded → falls back to @2
    assert rows == {(1, "a"): 10.0, (1, "b"): 30.0,
                    (2, "c"): None, (3, "d"): None}


def test_asof_forward(small):
    left, right = small
    rows = {(r["k"], r["tag"]): r["v"]
            for r in asof_join(left, right, on="ts", by=["k"],
                               direction="forward").collect()}
    # k=1 @5 → equal-ts 20.0; @10 → nothing later; k=2 @3 → @4
    assert rows == {(1, "a"): 20.0, (1, "b"): None,
                    (2, "c"): 40.0, (3, "d"): None}


def test_asof_name_collision_suffix(small):
    left, right = small
    out = asof_join(left, right.withColumnRenamed("v", "tag"),
                    on="ts", by=["k"])
    assert "tag_r" in out.columns and "tag" in out.columns


def test_asof_matches_duckdb_oracle(spark, duck):
    from aresdb_spark.catalog import Catalog

    ev = Catalog(SF_DIR).load(spark, "events")
    left = ev.filter(F.col("event_type") != "click")
    right = (ev.filter(F.col("event_type") == "click")
             .select("user_id", "ts", F.col("value").alias("click_v")))
    df = asof_join(left, right, on="ts", by=["user_id"],
                   value_cols=["click_v"]) \
        .select("event_id", "user_id", "click_v")
    sql = asof_join_oracle_sql(
        "SELECT * FROM events WHERE event_type <> 'click'",
        "SELECT user_id, ts, value AS click_v FROM events WHERE event_type = 'click'",
        on="ts", by=["user_id"],
        select="l.event_id, l.user_id, r.click_v")
    assert_df_matches_duck(df, duck, sql)


def test_asof_single_shuffle(spark, small):
    left, right = small
    plan = asof_join(left, right, on="ts", by=["k"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # only the window's hash partition
