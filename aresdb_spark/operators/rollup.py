"""Hypertable-style time rollups: materialize fine-grained aggregates,
answer coarser queries from them.

The reference archives raw events and re-aggregates per query; at 100 TB
the standard OLAP move is a rollup cascade — materialize (hour, keys)
partial aggregates once (a ~10⁴× row reduction for typical event rates),
then serve day/week/month queries from the hourly table. For algebraic
aggregates the cascade is EXACT, not approximate:

    sum → sum of sums · count → sum of counts · min → min of mins ·
    max → max of maxes

so a daily result from hourly partials hash-matches the same query over
raw data — which is precisely how the driver gate verifies it. avg is
served as sum/count at read time (same split the reference's broker does
for distributed avg, broker/query_plan_agg.go splitAvgQuery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fn → (fine-grained expr builder, re-aggregation fn)
_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def time_rollup(df: DataFrame, time_col: str = "ts", unit: str = "hour",
                keys: list[str] | None = None,
                aggs: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """Materialize (bucket, *keys) aggregates at ``unit`` granularity.
    ``aggs`` is a list of (fn, column, alias) with fn in sum|count|min|max
    (count ignores its column). This is the table you'd write once per
    archive period and reuse across every coarser query."""
    aggs = aggs or [("count", "*", "cnt")]
    cols = []
    for fn, col, alias in aggs:
        if fn not in _MERGE:
            raise ValueError(f"non-algebraic aggregate: {fn!r}")
        cols.append((F.count(F.lit(1)) if fn == "count"
                     else getattr(F, fn)(col)).alias(alias))
    keys = list(keys or [])
    return (df.groupBy(F.date_trunc(unit, F.col(time_col)).alias("bucket"),
                       *keys)
            .agg(*cols))


def rollup_cascade(fine: DataFrame, unit: str,
                   keys: list[str] | None = None,
                   aggs: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """Re-aggregate a finer rollup (from ``time_rollup``) to a coarser
    ``unit``. Exact for the algebraic aggregate set: each alias column is
    merged with its fn's combiner (count → sum). Input rows are already
    bucket-reduced, so this shuffle moves ~rows/10⁴, not raw data."""
    aggs = aggs or [("count", "*", "cnt")]
    keys = list(keys or [])
    cols = [getattr(F, _MERGE[fn])(alias).alias(alias)
            for fn, _col, alias in aggs]
    return (fine.groupBy(F.date_trunc(unit, F.col("bucket")).alias("bucket"),
                         *keys)
            .agg(*cols))
