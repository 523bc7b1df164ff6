"""Cutover walkthrough: move a table OFF a reference deployment and
onto this engine, then prove the move is reversible.

A reference user's data lives in an "ares-root" — the on-disk layout
its recovery reads (diskstore/diskstore_util.go:104-112 + the disk
metastore, metastore/disk_metastore.go). This walkthrough:

  1. fabricates a small legacy deployment in that exact format (binary
     vector-party files written by this repo's byte-level codec: RLE'd
     sort column, enum dictionary, two archive days, a deleted column),
  2. migrates it with ``migrate_ares_root`` (day-partitioned sorted
     parquet + the usual catalog wiring),
  3. answers an AQL query against the migrated table,
  4. exports the table BACK to reference format with
     ``export_ares_root`` and re-migrates it, proving round-trip
     equality — cutover is two-way, there is no lock-in.

Usage: python examples/run_migrate_off_reference.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _legacy_root(root: str) -> None:
    """Write a reference-format deployment by hand: trips over two UTC
    days (2019-06-01/02), sorted + RLE'd by city, a status enum, and a
    deleted column the migration must skip."""
    from aresdb_spark.sources.ares_root import (
        archive_batch_dir, write_vector_party_bytes)

    schema = {
        "name": "trips", "isFactTable": True, "primaryKeyColumns": [1],
        "archivingSortColumns": [2],
        "columns": [
            {"name": "request_at", "type": "Uint32"},
            {"name": "trip_id", "type": "Int64"},
            {"name": "city_id", "type": "Uint16"},
            {"name": "status", "type": "SmallEnum"},
            {"name": "fare", "type": "Float32"},
            {"name": "legacy_gone", "type": "Int32", "deleted": True},
        ]}

    def w(path, data):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb" if isinstance(data, bytes) else "w") as f:
            f.write(data)

    meta = f"{root}/metastore/trips"
    w(f"{meta}/schema", json.dumps(schema))
    w(f"{meta}/enums/status", "completed\x00\ncancelled\x00\n")
    cutoff = 18051 * 86400  # archiving cutoff after both days
    w(f"{meta}/shards/0/version", str(cutoff))

    days = {
        18048: {  # 2019-06-01, sorted by city: 7,7,7,9
            "t": [10, 20, 30, 40], "id": [1, 2, 3, 4],
            "city_runs": ([7, 9], [0, 3, 4]),
            "status": [0, 0, 1, 0], "fare": [10.5, 7.25, None, 30.0]},
        18049: {  # 2019-06-02: cities 7,9
            "t": [15, 25], "id": [5, 6],
            "city_runs": ([7, 9], [0, 1, 2]),
            "status": [1, None], "fare": [12.0, 9.5]},
    }
    for day, d in days.items():
        w(f"{meta}/shards/0/batches/{day}", f"{cutoff},{len(d['id'])}\n")
        b = archive_batch_dir(root, "trips", 0, day, cutoff)
        w(f"{b}/0.data", write_vector_party_bytes(
            "Uint32", [day * 86400 + t for t in d["t"]]))
        w(f"{b}/1.data", write_vector_party_bytes("Int64", d["id"]))
        runs, counts = d["city_runs"]
        w(f"{b}/2.data", write_vector_party_bytes(
            "Uint16", runs, counts=counts))  # mode 3: RLE'd sort column
        w(f"{b}/3.data", write_vector_party_bytes("SmallEnum", d["status"]))
        w(f"{b}/4.data", write_vector_party_bytes("Float32", d["fare"]))


def run(spark, workdir: str) -> dict:
    from pyspark.sql import functions as F

    from aresdb_spark.sources.ares_root import (
        export_ares_root, migrate_ares_root, read_table_meta,
        validate_migration)

    legacy = os.path.join(workdir, "legacy_root")
    _legacy_root(legacy)

    # --- 2. migrate off the reference; the catalog resolves
    # <sf_dir>/<name>.parquet, so the migrated directory is renamed to
    # slot straight in under that name ---
    migrated = migrate_ares_root(spark, legacy,
                                 os.path.join(workdir, "migrated"))
    # acceptance gate BEFORE cutover: per-day counts against the legacy
    # metastore's own batch sizes, plus per-day CONTENT hashes (the
    # legacy batches re-decoded vs the migrated parquet) — corruption
    # that preserves row counts still fails the gate
    validation = validate_migration(spark, legacy, "trips",
                                    migrated["trips"]["path"],
                                    check_values=True)
    qroot = os.path.join(workdir, "catalog")
    os.makedirs(qroot, exist_ok=True)
    os.rename(migrated["trips"]["path"],
              os.path.join(qroot, "trips.parquet"))
    migrated["trips"]["path"] = os.path.join(qroot, "trips.parquet")
    trips = spark.read.parquet(migrated["trips"]["path"])

    # --- 3. query the migrated table (AQL front end) ---
    from aresdb_spark.aql import Dimension, Measure, Query
    from aresdb_spark.aql.planner import Planner
    from aresdb_spark.catalog import Catalog, TableDef

    catalog = Catalog(sf_dir=qroot, tables={
        "trips": TableDef("trips", is_fact=True,
                          time_column="request_at")})
    df = Planner(spark, catalog).plan(Query(
        table="trips",
        dimensions=[Dimension(expr="status", alias="status")],
        measures=[Measure(expr="count(*)", alias="trips"),
                  Measure(expr="sum(fare)", alias="fares")]))
    by_status = {r.status if r.status is not None else "NULL":
                 [r.trips, round(r.fares, 2) if r.fares is not None
                  else None]
                 for r in df.collect()}

    # --- 4. export back to reference format, re-migrate, compare ---
    back_root = os.path.join(workdir, "export_root")
    schema = {
        "name": "trips", "isFactTable": True, "primaryKeyColumns": [1],
        "archivingSortColumns": [2],
        "columns": [
            {"name": "request_at", "type": "Uint32"},
            {"name": "trip_id", "type": "Int64"},
            {"name": "city_id", "type": "Uint16"},
            {"name": "status", "type": "SmallEnum"},
            {"name": "fare", "type": "Float32"}]}
    export_ares_root(spark, trips.drop("__day"), back_root, schema)
    meta = read_table_meta(back_root, "trips")
    remigrated = migrate_ares_root(spark, back_root,
                                   os.path.join(workdir, "remigrated"))
    again = spark.read.parquet(remigrated["trips"]["path"])
    cols = ["trip_id", "city_id", "status", "fare"]
    roundtrip_equal = (
        sorted(map(tuple, trips.select(cols).collect()))
        == sorted(map(tuple, again.select(cols).collect())))

    return {
        "validation": validation,
        "migrated_rows": migrated["trips"]["rows"],
        "days": sorted(n.split("=")[1]
                       for n in os.listdir(migrated["trips"]["path"])
                       if n.startswith("__day=")),
        "by_status": by_status,
        "exported_enums": meta.enums["status"],
        "roundtrip_equal": roundtrip_equal,
    }


def main():
    from aresdb_spark.session import get_spark

    spark = get_spark(app_name="migrate-example", cpus=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, tempfile.mkdtemp(prefix="migrate_")),
                     indent=2))


if __name__ == "__main__":
    main()
