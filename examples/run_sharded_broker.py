"""Broker scatter/gather walkthrough: one AQL query fanned across two
"datanode" shard roots and folded through the result-merge algebra
(reference: broker/executor.go + broker/query_plan_agg.go +
broker/result_merge.go). Demonstrates all the merge rules — count, sum,
min/max, the two-phase avg plan, hll register-tree merge — and the
non-agg row-stream gather with a running limit.

Usage: python examples/run_sharded_broker.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main():
    from pyspark.sql import functions as F

    from aresdb_spark.aql.api import execute_query_sharded
    from aresdb_spark.session import get_spark

    spark = get_spark(app_name="sharded-broker-example", cpus=8,
                      shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="broker_shards_")

    # two "datanodes": a row split of the events fact table
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    shards = []
    for i in (0, 1):
        d = os.path.join(root, f"datanode{i}")
        ev.filter(F.col("event_id") % 2 == i) \
          .write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        shards.append(d)

    def q(measure):
        return {"table": "events",
                "measures": [{"alias": "v", "sqlExpression": measure}],
                "dimensions": [{"alias": "et",
                                "sqlExpression": "event_type"}]}

    for m in ("count(*)", "avg(value)", "hll(user_id)"):
        res = execute_query_sharded(spark, shards, q(m))
        print(m, "=>", json.dumps(res, sort_keys=True))

    rows = execute_query_sharded(spark, shards, {
        "table": "events",
        "measures": [{"sqlExpression": "1"}],
        "dimensions": [{"alias": "event_id", "sqlExpression": "event_id"},
                       {"alias": "event_type",
                        "sqlExpression": "event_type"}],
        "sorts": [{"sqlExpression": "event_id"}],
        "limit": 5})
    print("non-agg gather =>", json.dumps(rows))


if __name__ == "__main__":
    main()
