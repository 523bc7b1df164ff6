"""SparkSession factory tuned for the aresdb_spark engine.

Defaults are chosen for scale-out correctness even though tests run on
``local[N]``: AQE on (runtime re-plan, skew-join handling, partition
coalescing), Arrow on (fast Pandas-UDF boundary), explicit shuffle
partition count sized to the core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "aresdb-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    On a real cluster the same configs apply — only ``master`` changes.
    """
    cpus = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # one-to-two shuffle tasks per core locally; a cluster deployment
        # overrides this (AQE coalesces the excess anyway).
        shuffle_partitions = max(cpus, 32)

    # SPARK_GRAFT_MASTER overrides the single-JVM default — used by
    # scripts/check_contract_cluster.sh to run the whole contract suite
    # under local-cluster[N,C,M] (separate executor JVMs: catches
    # driver-local assumptions — unshared temp paths, driver-only state —
    # that local[N] cannot)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # --- planner / runtime adaptivity ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- joins: dimension tables are small → broadcast aggressively ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- IO: keep scan partitions big enough to amortize task overhead ---
        .config("spark.sql.files.maxPartitionBytes", str(256 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata writes events.ts as INT64 TIMESTAMP(NANOS). Spark 3 needs
        # this flag to read it (as bigint; catalog converts to micros,
        # truncating, matching DuckDB's ns→us cast). Spark 4 ignores the flag
        # and reads it natively as timestamp_ntz — all consumers guard the
        # cast on the observed dtype, so both paths work.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # --- python boundary: always Arrow-batched ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- keep timestamps deterministic across engines (oracle parity) ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
