import pytest
from pyspark.sql import functions as F

from aresdb_spark.sources.bucketed import read_bucketed, write_bucketed
from tests.conftest import SF_DIR, assert_df_matches_duck


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet") \
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet") \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    write_bucketed(li, "colo_lineitem", str(base / "li"), 8, ["l_orderkey"])
    write_bucketed(od, "colo_orders", str(base / "od"), 8, ["o_orderkey"])
    yield "colo_lineitem", "colo_orders"
    spark.sql("DROP TABLE IF EXISTS colo_lineitem")
    spark.sql("DROP TABLE IF EXISTS colo_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, ot = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, lt).join(
            read_bucketed(spark, ot),
            F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: bucket spec reused
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = read_bucketed(spark, lt).groupBy("l_orderkey") \
        .agg(F.sum("l_quantity").alias("qty"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bucketed_join_matches_oracle(spark, duck, bucketed_tables):
    lt, ot = bucketed_tables
    df = read_bucketed(spark, lt).join(
        read_bucketed(spark, ot),
        F.col("l_orderkey") == F.col("o_orderkey")) \
        .groupBy("o_custkey") \
        .agg(F.sum("l_quantity").alias("qty"),
             F.count("*").alias("n"))
    assert_df_matches_duck(df, duck, """
        SELECT o_custkey, sum(l_quantity) AS qty, count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """)
