"""Bucketed table write path — shuffle-free co-located joins and aggs.

The reference co-locates dimension lookups via its in-memory cuckoo PK
index (memstore/cuckoo_index.go); fact-fact joins don't exist there. At
Spark scale the analog for repeated big joins/aggregations on the same
key is bucketing: both tables are hash-partitioned into the same number
of buckets on the join key AT WRITE TIME, so every later join or groupBy
on that key skips its Exchange entirely — the shuffle is paid once, at
write, instead of per query.

``bucketBy`` requires a catalog table (Spark resolves bucket metadata
through the catalog, not the files), so writes go through
``saveAsTable`` with an explicit ``path`` — the data stays plain parquet
in ``<path>``, readable by anything; only the bucket spec lives in the
catalog. Use the same ``n_buckets`` on both sides of a planned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, path: str, n_buckets: int,
                   bucket_cols: list[str],
                   sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed catalog table at ``path``. ``sort_cols``
    (default: the bucket columns) additionally sorts each bucket file so
    sort-merge joins skip their Sort too."""
    writer = (df.write.mode(mode).format("parquet").option("path", path)
              .bucketBy(n_buckets, *bucket_cols)
              .sortBy(*(sort_cols or bucket_cols)))
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (must go through the catalog — a plain
    ``spark.read.parquet(path)`` would drop the bucket metadata and
    reintroduce the shuffle)."""
    return spark.table(table)
