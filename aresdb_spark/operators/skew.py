"""Skew-safe aggregation patterns.

At 100 TB a handful of hot keys (one giant user, one dominant document
source) can stall a shuffle stage on a single reducer. Spark's AQE
skew-join handling covers joins (enabled in session.py); these helpers
cover aggregations:

  - two-stage exact distinct: dedupe (key, value) pairs first (map-side
    partial aggregation shrinks each partition before the shuffle), then
    count per key — the raw values of a hot key never land on one reducer
  - partition-salted aggregation: pre-aggregate per (key, input
    partition), then combine — bounds any reducer's input to
    #partitions rows per key for associative aggregates

Both are pure DataFrame plans (no UDFs) and DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_distinct_two_stage(df: DataFrame, keys: list[str],
                             value_col: str,
                             alias: str | None = None) -> DataFrame:
    """Exact count(DISTINCT value) per key, skew-safe.

    Plan: groupBy(key, value) [shuffle 1, heavily combined map-side] →
    groupBy(key) count [shuffle 2 over already-distinct rows]. A hot key
    with many duplicate values collapses before it ever concentrates."""
    alias = alias or f"distinct_{value_col}"
    return (df.select(*keys, value_col).distinct()
            .groupBy(*keys).agg(F.count(value_col).alias(alias)))


def salted_sum(df: DataFrame, keys: list[str], value_col: str,
               alias: str | None = None) -> DataFrame:
    """Sum per key via partition-local pre-aggregation.

    Equivalent to groupBy(keys).sum — Spark's partial aggregation already
    gives this shape, so the explicit form exists for plans where partial
    agg is defeated (e.g. after an explode, or with agg expressions that
    block map-side combine)."""
    alias = alias or f"sum_{value_col}"
    partial = (df.groupBy(*keys, F.spark_partition_id().alias("__salt"))
               .agg(F.sum(value_col).alias("__part")))
    return partial.groupBy(*keys).agg(F.sum("__part").alias(alias))
