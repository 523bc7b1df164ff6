"""Geofence walkthrough: ingest a GeoShape dimension table through the
client connector (WKT → UpsertBatch V1 wire bytes → dimension snapshot)
and answer "how many events happened inside each fence" with an AQL geo
join — the reference's geofences_configstore_udr_geofences pattern
(client Insert → memstore → geography_intersects query).

Usage: python examples/run_geofence_ingest.py [sf_dir]
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

    from aresdb_spark.aql import Dimension, Join, Measure, Query
    from aresdb_spark.aql.planner import Planner
    from aresdb_spark.catalog import Catalog, TableDef
    from aresdb_spark.metastore import SchemaStore
    from aresdb_spark.session import get_spark
    from aresdb_spark.sources.hotcold import DimensionStore
    from aresdb_spark.streaming.connector import Connector
    from aresdb_spark.streaming.data_handler import DataHandler

    spark = get_spark(app_name="geofence-example", cpus=8,
                      shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="geofence_")

    # 1. DDL: a geofence dimension table with a GeoShape column
    ss = SchemaStore()
    ss.create_table({
        "name": "geofences",
        "columns": [{"name": "fence_id", "type": "Int64"},
                    {"name": "name", "type": "SmallEnum"},
                    {"name": "shape", "type": "GeoShape"}],
        "primaryKeyColumns": [0]})

    # 2. Ingest WKT shapes through the connector (→ wire bytes → snapshot)
    store = DimensionStore(path=os.path.join(root, "store"),
                           primary_key=("fence_id",))
    store.init_from(spark.createDataFrame(
        [], "fence_id bigint, name string, shape string"))
    conn = Connector(ss, DataHandler(spark, ss, {"geofences": store}))
    n = conn.insert(
        "geofences", ["fence_id", "name", "shape"],
        [[1, "downtown", "POLYGON((0 0, 40 0, 40 30, 0 30, 0 0))"],
         [2, "airport", "POLYGON((0 30, 40 30, 40 60, 0 60, 0 30))"]])
    print(f"ingested {n} geofences through the wire codec")

    # 3. Lay the snapshot + synthetic points into a catalog root
    store.read(spark).write.mode("overwrite").parquet(
        os.path.join(root, "geofences.parquet"))
    (spark.read.parquet(f"{SF_DIR}/events.parquet")
     .select("event_id",
             ((F.col("event_id") % 240) * 0.25).alias("lat"),
             (((F.col("event_id") / 7).cast("long") % 160) * 0.25)
             .alias("lng"))
     .write.mode("overwrite").parquet(os.path.join(root, "points.parquet")))

    # 4. AQL geo join: geo_shape() turns the stored WKT into the typed
    # shape inside codegen; the shape table broadcasts
    cat = Catalog(root, tables={
        "points": TableDef("points", is_fact=True, primary_key=("event_id",)),
        "geofences": TableDef("geofences", primary_key=("fence_id",)),
    })
    df = Planner(spark, cat).plan(Query(
        table="points",
        joins=[Join(table="geofences", alias="g", conditions=[
            "geography_intersects(geo_shape(g.shape), lat, lng)"])],
        dimensions=[Dimension(expr="g.name", alias="fence")],
        measures=[Measure(expr="count(*)", alias="events")],
        filters=["g.fence_id is not null"],
    ))
    print(json.dumps({r["fence"]: r["events"] for r in df.collect()},
                     indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
