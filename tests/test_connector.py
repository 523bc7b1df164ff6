"""The Go client's Insert path (client/connector.go), rule-for-rule:
shape validation, PK/time-column checks, enum auto-expansion +
translation + abandoned-rows accounting, update-mode restrictions, and
the end-to-end post into a queryable store."""

from datetime import datetime

import pytest

from aresdb_spark.metastore import SchemaStore
from aresdb_spark.sources.hotcold import HotColdStore
from aresdb_spark.streaming.connector import Connector, ConnectorError
from aresdb_spark.streaming.data_handler import DataHandler

CUTOFF = datetime(2024, 1, 1)
T0 = int(datetime(2024, 1, 5).timestamp())

SCHEMA = {
    "name": "trips",
    "columns": [{"name": "request_at", "type": "Uint32"},
                {"name": "trip_id", "type": "Int64"},
                {"name": "status", "type": "SmallEnum",
                 "caseInsensitive": True},
                {"name": "fare", "type": "Float32"}],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "archivingSortColumns": [0],
}


@pytest.fixture()
def conn(spark, tmp_path):
    ss = SchemaStore()
    ss.create_table(SCHEMA)
    store = HotColdStore(path=str(tmp_path / "trips"),
                         time_column="request_at",
                         primary_key=("trip_id",))
    store.init_from(spark.createDataFrame(
        [], "request_at timestamp, trip_id bigint, status string, "
            "fare float"), cutoff=CUTOFF)
    return Connector(ss, DataHandler(spark, ss, {"trips": store})), store, ss


def test_insert_validations(conn):
    c, _store, _ss = conn
    with pytest.raises(ConnectorError, match="No column names"):
        c.insert("trips", [], [[1]])
    with pytest.raises(ConnectorError, match="update modes"):
        c.insert("trips", ["request_at", "trip_id"], [[T0, 1]], [0])
    with pytest.raises(ConnectorError, match="match length"):
        c.insert("trips", ["request_at", "trip_id"], [[T0]])
    assert c.insert("trips", ["request_at", "trip_id"], []) == 0
    with pytest.raises(ConnectorError, match="Missing primary key"):
        c.insert("trips", ["request_at", "fare"], [[T0, 1.0]])
    with pytest.raises(ConnectorError, match="Missing time column"):
        c.insert("trips", ["trip_id", "fare"], [[1, 1.0]])
    # sort/PK columns and dimension-ish types only allow overwrite modes
    with pytest.raises(ConnectorError, match="only supports overwrite"):
        c.insert("trips", ["request_at", "trip_id"], [[T0, 1]],
                 update_modes=[2, 0])  # additive on the sort column


def test_insert_enum_autoexpand_and_row_drops(spark, conn):
    c, store, ss = conn
    n = c.insert(
        "trips", ["request_at", "trip_id", "status", "fare"],
        [[T0, 1, "Completed", 10.0],       # case-insensitive → completed
         [T0 + 60, 2, "CANCELLED", 20.0],  # new case auto-registered
         [T0 + 120, None, "completed", 5.0],   # nil PK → dropped
         [None, 4, "completed", 5.0],          # nil time → dropped
         [T0 + 180, 5, 123, 5.0],          # non-string enum → abandoned
         [T0 + 240, 6, None, 6.0]])        # NULL enum stays NULL
    assert n == 3
    # the dictionary auto-expanded with the LOWERED cases (the reference
    # iterates a Go map — no order contract; ours registers sorted)
    assert sorted(ss.get_enum_cases("trips", "status")) == \
        ["cancelled", "completed"]

    got = {r["trip_id"]: (r["status"], r["fare"])
           for r in store.read_hot(spark).collect()}
    assert set(got) == {1, 2, 6}
    assert got[1][0] == "completed" and got[2][0] == "cancelled"
    assert got[6][0] is None


def test_unknown_enum_translates_to_null_when_expand_disabled(spark, conn):
    c, store, ss = conn
    ss.get_table("trips")["columns"][2]["disableAutoExpand"] = True
    ss.extend_enum_dict("trips", "status", ["completed"])
    n = c.insert("trips", ["request_at", "trip_id", "status"],
                 [[T0, 1, "completed"], [T0 + 60, 2, "mystery"]])
    assert n == 2
    got = {r["trip_id"]: r["status"] for r in store.read_hot(spark).collect()}
    # unknown case with expansion disabled → NULL (TranslateEnum -1 ⇒ nil)
    assert got == {1: "completed", 2: None}
    assert ss.get_enum_cases("trips", "status") == ["completed"]


def test_unknown_columns_are_skipped(spark, conn):
    c, store, _ss = conn
    n = c.insert("trips", ["request_at", "trip_id", "nonexistent"],
                 [[T0, 1, "ignored"]])
    assert n == 1
    assert store.read_hot(spark).count() == 1


def test_enum_array_column_roundtrip(spark, tmp_path):
    """Array-enum values travel as JSON-encoded string lists
    (prepareEnumCases' array branch): cases auto-register, items
    translate to ids, bad JSON abandons the row, null items survive."""
    from aresdb_spark.sources.hotcold import DimensionStore

    ss = SchemaStore()
    ss.create_table({
        "name": "tags",
        "columns": [{"name": "k", "type": "Int64"},
                    {"name": "labels", "type": "SmallEnum[]"}],
        "primaryKeyColumns": [0],
        "isFactTable": False,
    })
    store = DimensionStore(path=str(tmp_path / "tags"), primary_key=("k",))
    store.init_from(spark.createDataFrame(
        [], "k bigint, labels array<string>"))
    c = Connector(ss, DataHandler(spark, ss, {"tags": store}))

    n = c.insert("tags", ["k", "labels"],
                 [[1, '["red", "blue"]'],
                  [2, '["blue", null]'],
                  [3, 'not-json'],        # abandoned
                  [4, '["red", 7]'],      # non-string item → abandoned
                  [5, None]])
    assert n == 3
    got = {r["k"]: r["labels"] for r in store.read(spark).collect()}
    assert got[1] == ["red", "blue"]
    assert got[2] == ["blue", None]
    assert got[5] is None
    assert sorted(ss.get_enum_cases("tags", "labels")) == ["blue", "red"]


def test_geoshape_ingest_feeds_geo_join(spark, tmp_path):
    """A reference client ingesting a geofence dimension table (GeoShape
    column as WKT) through the connector: wire round-trip → dimension
    snapshot → AQL geo join over the ingested shapes via geo_shape()
    (WKT → array<array<struct<lat,long>>> inside codegen)."""
    from aresdb_spark.aql import Dimension, Join, Measure, Query
    from aresdb_spark.aql.planner import Planner
    from aresdb_spark.catalog import Catalog, TableDef
    from aresdb_spark.sources.hotcold import DimensionStore

    ss = SchemaStore()
    ss.create_table({
        "name": "geofences",
        "columns": [{"name": "fence_id", "type": "Int64"},
                    {"name": "shape", "type": "GeoShape"}],
        "primaryKeyColumns": [0]})
    store = DimensionStore(path=str(tmp_path / "geofences_store"),
                           primary_key=("fence_id",))
    store.init_from(spark.createDataFrame([], "fence_id bigint, shape string"))
    c = Connector(ss, DataHandler(spark, ss, {"geofences": store}))

    def rect(x0, y0, x1, y1):  # lng-first WKT, lat/lng rectangle corners
        return (f"POLYGON(({y0} {x0}, {y1} {x0}, {y1} {x1}, "
                f"{y0} {x1}, {y0} {x0}))")

    n = c.insert("geofences", ["fence_id", "shape"],
                 [[1, rect(0, 0, 10, 10)],
                  [2, rect(20, 0, 30, 10)],
                  [3, "not a shape"]])     # invalid WKT → row dropped
    assert n == 2
    got = {r["fence_id"]: r["shape"] for r in store.read(spark).collect()}
    # wire round-trip preserved the shape (render differs only in case)
    assert got[1].lower().replace(" ", "") == rect(0, 0, 10, 10) \
        .lower().replace(" ", "")

    store.read(spark).write.mode("overwrite").parquet(
        str(tmp_path / "geofences.parquet"))
    spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 25.0, 5.0), (3, 45.0, 45.0)],
        "point_id bigint, lat double, lng double"
    ).write.mode("overwrite").parquet(str(tmp_path / "points.parquet"))
    cat = Catalog(str(tmp_path), tables={
        "points": TableDef("points", is_fact=True,
                           primary_key=("point_id",)),
        "geofences": TableDef("geofences", primary_key=("fence_id",)),
    })
    rows = Planner(spark, cat).plan(Query(
        table="points",
        joins=[Join(table="geofences", alias="g",
                    conditions=[
                        "geography_intersects(geo_shape(g.shape), lat, lng)"])],
        dimensions=[Dimension(expr="g.fence_id", alias="fence_id")],
        measures=[Measure(expr="count(*)", alias="cnt")],
        filters=["g.fence_id is not null"],
    )).collect()
    assert sorted((r["fence_id"], r["cnt"]) for r in rows) == [(1, 1), (2, 1)]
