"""Run the reference's own shipped 1k_trips example end-to-end.

The reference walkthrough (examples/examples.go) creates tables from
examples/1k_trips/schema/*.json, ingests data/*.csv, and runs
queries/*.aql|sql. This script does the same through this engine's
front doors: SchemaStore for the DDL documents, a parquet write for the
data (the ``{1d}`` time template resolved deterministically over the
last 24 hours), and execute_request / the SQL dialect for the queries.

Usage: python examples/run_1k_trips.py [reference_example_dir]
(default /root/reference/examples/1k_trips; tests/test_reference_example.py
is the asserted twin of this walkthrough.)
"""

from __future__ import annotations

import csv
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLE = sys.argv[1] if len(sys.argv) > 1 \
    else "/root/reference/examples/1k_trips"
NOW = 1706190420  # pinned "now" so relative time filters are reproducible


def main():
    from pyspark.sql import functions as F

    from aresdb_spark import get_spark
    from aresdb_spark.aql.api import execute_request
    from aresdb_spark.aql.planner import Planner
    from aresdb_spark.aql.sql import sql_to_query
    from aresdb_spark.metastore import SchemaStore, catalog_from_store

    spark = get_spark(app_name="1k-trips", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="trips_example_")

    # 1. DDL: the reference's schema documents, validated + registered
    store = SchemaStore()
    for fn in sorted(os.listdir(os.path.join(EXAMPLE, "schema"))):
        with open(os.path.join(EXAMPLE, "schema", fn)) as f:
            store.create_table(json.load(f))
    print("tables:", store.list_tables())

    # 2. data: CSVs with {1d} spread deterministically over [now-1d, now)
    with open(os.path.join(EXAMPLE, "data", "cities.csv")) as f:
        cities = list(csv.DictReader(f))
    spark.createDataFrame(
        [(int(r["id"]), r["name"]) for r in cities], "id int, name string"
    ).write.mode("overwrite").parquet(f"{root}/cities.parquet")

    with open(os.path.join(EXAMPLE, "data", "trips.csv")) as f:
        trips = list(csv.DictReader(f))
    rows = [(NOW - 86400 + (i * 86400) // len(trips), r["uuid"],
             int(r["city_id"]), r["status"], float(r["fare"]),
             r["driver_uuid"], int(r["driver_uuid_hll"]), r["request_point"])
            for i, r in enumerate(trips)]
    (spark.createDataFrame(
        rows, "request_at bigint, uuid string, city_id int, status string, "
              "fare double, driver_uuid string, driver_uuid_hll bigint, "
              "request_point string")
     .withColumn("request_at", F.timestamp_seconds("request_at"))
     .write.mode("overwrite").parquet(f"{root}/trips.parquet"))
    print(f"ingested {len(rows)} trips, {len(cities)} cities -> {root}")

    # 3. the reference's own query files
    catalog = catalog_from_store(root, store)
    for name in ("total_trips.aql", "total_fare.aql"):
        with open(os.path.join(EXAMPLE, "queries", name)) as f:
            req = json.load(f)
        for q in req["queries"]:
            q["now"] = NOW
        print(name, "->", json.dumps(execute_request(spark, catalog, req)))

    with open(os.path.join(EXAMPLE, "queries", "total_trips.sql")) as f:
        sql = json.load(f)["queries"][0]
    sql = sql.replace("GROUP BY", f"AND aql_now(request_at, {NOW}) GROUP BY")
    df = Planner(spark, catalog).plan(sql_to_query(sql))
    print("total_trips.sql ->", df.orderBy(df.columns[0]).collect())


if __name__ == "__main__":
    main()
