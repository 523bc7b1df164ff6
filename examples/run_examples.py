"""Run the example queries — the 1k_trips walkthrough analog
(reference: examples/examples.go + examples/1k_trips/queries/*).

Usage: python examples/run_examples.py [sf_dir]
Prints each query's reference-shaped JSON result. The AQL and SQL forms
of total_events return identical results (same planner underneath).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    from aresdb_spark import get_spark
    from aresdb_spark.aql.api import execute_request
    from aresdb_spark.aql.sql import execute_sql

    spark = get_spark(app_name="aresdb-examples", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    for name in ("total_events.aql", "total_value.aql"):
        with open(os.path.join(HERE, "queries", name)) as f:
            req = json.load(f)
        res = execute_request(spark, SF_DIR, req)
        print(f"== {name} ==")
        print(json.dumps(res, indent=2, default=str))

    for name in ("total_events.sql", "click_share.sql"):
        with open(os.path.join(HERE, "queries", name)) as f:
            sql_req = json.load(f)
        results = [execute_sql(spark, SF_DIR, s) for s in sql_req["queries"]]
        print(f"== {name} ==")
        print(json.dumps({"results": results}, indent=2, default=str))


if __name__ == "__main__":
    main()
