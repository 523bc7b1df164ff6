"""Plan inspection utilities — explain() audits for scale assertions.

Used by tests to prove the physical plans are the ones a 100 TB deployment
needs: filters pushed into the parquet scan, columns pruned, dimension
joins broadcast, partition pruning on day-partitioned archives.
"""

from aresdb_spark.plans.audit import (  # noqa: F401
    count_exchanges, executed_plan_str, has_broadcast_join, scan_info)
