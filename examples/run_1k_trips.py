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
    from datetime import datetime

    from aresdb_spark import get_spark
    from aresdb_spark.aql.api import execute_request
    from aresdb_spark.aql.planner import Planner
    from aresdb_spark.aql.sql import sql_to_query
    from aresdb_spark.metastore import SchemaStore, catalog_from_store
    from aresdb_spark.sources.hotcold import DimensionStore, HotColdStore
    from aresdb_spark.streaming.connector import Connector
    from aresdb_spark.streaming.data_handler import DataHandler

    spark = get_spark(app_name="1k-trips", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="trips_example_")

    # 1. DDL: the reference's schema documents, validated + registered
    store = SchemaStore()
    for fn in sorted(os.listdir(os.path.join(EXAMPLE, "schema"))):
        with open(os.path.join(EXAMPLE, "schema", fn)) as f:
            store.create_table(json.load(f))
    print("tables:", store.list_tables())

    # 2. data: CSV rows (all strings, like the Go example's reader) go
    # through the client Connector — type coercion, enum auto-expand,
    # wire batches, the data handler, the hot/cold + dimension stores
    trips_store = HotColdStore(
        path=f"{root}/trips", time_column="request_at",
        primary_key=("uuid",), sort_columns=("city_id", "status"))
    trips_store.init_from(spark.createDataFrame(
        [], "request_at timestamp, uuid string, city_id int, "
            "status string, fare float, driver_uuid string, "
            "driver_uuid_hll bigint, request_point string"),
        cutoff=datetime(2024, 1, 1))
    cities_store = DimensionStore(path=f"{root}/cities",
                                  primary_key=("id",))
    cities_store.init_from(spark.createDataFrame([], "id int, name string"))
    conn = Connector(store, DataHandler(
        spark, store, {"trips": trips_store, "cities": cities_store}))

    with open(os.path.join(EXAMPLE, "data", "cities.csv")) as f:
        reader = csv.reader(f)
        headers = next(reader)
        n_cities = conn.insert("cities", headers,
                               [list(r) for r in reader])

    with open(os.path.join(EXAMPLE, "data", "trips.csv")) as f:
        reader = csv.reader(f)
        headers = next(reader)
        rows = [list(r) for r in reader]
    for i, row in enumerate(rows):  # {1d} → deterministic [now-1d, now)
        row[0] = str(NOW - 86400 + (i * 86400) // len(rows))
    n_trips = conn.insert("trips", headers, rows)
    print(f"ingested {n_trips} trips, {n_cities} cities -> {root}")

    # 3. the reference's own query files
    catalog = catalog_from_store(root, store, hotcold={"trips", "cities"})
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
