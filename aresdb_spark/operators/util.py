"""Shared operator utilities: expression let-binding and local-parallelism
guard. Both exist for 100 TB-scale reasons — see docstrings."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def let(bound: Column, body) -> Column:
    """Poor-man's let-binding: evaluate `bound` ONCE per row and feed it to
    `body` as a lambda variable (single-element array + transform).

    Catalyst does not common-subexpression-eliminate across higher-order-
    function lambdas — without this, expressions that reference an
    expensive sub-expression N times (MinHash's 16 permutations, the text
    quality score's 3 token statistics) re-expand the whole pipeline N
    times per row. Measured 40× slowdown on the MinHash signature at
    sf0.1 before this fix."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition only when the scan has fewer partitions than the
    cluster has slots (e.g. one small local parquet file → 1 task on 32
    cores). At scale a 100 TB scan already has ≫ cores partitions, so
    this is a no-op — no extra shuffle is introduced."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
