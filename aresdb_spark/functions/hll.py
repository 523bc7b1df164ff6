"""HLL / approximate distinct counting.

Reference: hll(x)/countdistincthll(x) with 2^14 registers, mergeable
sparse/dense binary sketches (query/hll.go, query/hll.cu, binary format
query/common/hll.go:43-68).

Capability parity on Spark:
  - query-time approx distinct → approx_count_distinct (HLL++ built-in;
    rsd 0.0065 ≈ 1.04/√2^14 matches the reference's register count)
  - *mergeable, persistable* sketches (the reason the reference has a
    binary format: brokers merge datanode sketches; dashboards merge
    day-sketches) → hll_sketch_agg / hll_sketch_estimate / hll_union
    (Spark 3.5+ Apache DataSketches builtins), wrapped here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aresdb_spark.aql import expr as _expr

# match the reference's 2^14 registers (query/time_series_aggregate.h:42-44)
HLL_PRECISION_RSD = 1.04 / (2 ** 14) ** 0.5  # ≈ 0.0081


def approx_distinct(col: Column, rsd: float = HLL_PRECISION_RSD) -> Column:
    return F.approx_count_distinct(col, rsd)


def hll_sketch(col: Column, lg_k: int = 14) -> Column:
    """Mergeable binary sketch (DataSketches HLL), lgConfigK=14 to mirror
    the reference's 2^14 registers."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def hll_estimate(sketch: Column) -> Column:
    return F.hll_sketch_estimate(sketch)


def hll_merge(sketch: Column) -> Column:
    """Merge sketches across groups (re-aggregation, the broker-merge
    analog: broker/result_merge.go + query/common/hll.go:141-208)."""
    return F.hll_union_agg(sketch)


def daily_distinct_rollup(df: DataFrame, ts_col: str, key_col: str) -> DataFrame:
    """Pattern the reference serves with HLL binary results: persist one
    sketch per (day), then answer any date-range distinct query by
    merging day sketches — no rescan of raw data."""
    by_day = df.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day")).agg(
        hll_sketch(F.col(key_col)).alias("sketch"))
    return by_day


def estimate_over_days(day_sketches: DataFrame) -> DataFrame:
    return day_sketches.agg(
        hll_estimate(hll_merge(F.col("sketch"))).alias("distinct_estimate"))


# AQL surface: hll(x) in a measure is handled by the planner; expression-
# level usage maps to approx_count_distinct
_expr.register_function("hll", lambda a: approx_distinct(a[0]))
_expr.register_function("countdistincthll", lambda a: approx_distinct(a[0]))
