"""Golden: the reference's own geo-intersect ProcessQuery fixtures
(query/aql_processor_test.go:1343-1608 "evaluateGeoIntersect should
work" + :1610-1836 "evaluateGeoIntersectJoin should work").

Five trip points — (0,0), (3,2.5), (1.5,3.5), (1.5,4.5), NULL — against
three geofence shapes (a square, a triangle, and a square WITH A HOLE),
shape UUID primary keys. The reference pins:

  - inOrOut=false (NOT in any shape):   {"0": 1}   — only (1.5,4.5),
    which sits inside shape 3's hole; the NULL point is REMOVED from the
    not-in result too (a null test point writes !inOrOut to the
    predicate and GeoRemoveFilter drops it either way —
    iterator.hpp:1378-1388, geo_intersects.cu:217-228).
  - inOrOut=true with the shape-UUID dimension: each shape catches
    exactly one point: {"0": {uuid1: 1, uuid2: 1, uuid3: 1}}.
"""

from pyspark.sql import functions as F  # noqa: F401

from aresdb_spark.aql import Dimension, Join, Measure, Query
from aresdb_spark.aql.api import execute_query
from aresdb_spark.catalog import Catalog, TableDef

UUIDS = ["00000192F23D460DBE60400C32EA0667",
         "00001A3F088047D79343894698F221AB",
         "0000334BB6B0420986175F20F3FBF90D"]

# GeoShapeGo literals from the fixture, (lat, long) pairs
SHAPES = [
    [[(1, 1), (1, -1), (-1, -1), (-1, 1), (1, 1)]],
    [[(3, 3), (2, 2), (4, 2), (3, 3)]],
    [[(0, 6), (3, 6), (3, 3), (0, 3), (0, 6)],
     [(1, 5), (2, 5), (2, 4), (1, 4), (1, 5)]],  # hole
]

POINTS = [(0.0, 0.0), (3.0, 2.5), (1.5, 3.5), (1.5, 4.5), None]


def _catalog(spark, tmp_path):
    shapes = [(UUIDS[i],
               [[{"lat": float(la), "long": float(lo)} for la, lo in ring]
                for ring in SHAPES[i]])
              for i in range(3)]
    spark.createDataFrame(
        shapes, "geofence_uuid string, "
                "shape array<array<struct<lat:float,long:float>>>"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "geofence.parquet"))
    trips = [(i, 0, None if p is None
              else {"lat": float(p[0]), "long": float(p[1])})
             for i, p in enumerate(POINTS)]
    spark.createDataFrame(
        trips, "trip_id int, request_at bigint, "
               "request_point struct<lat:float,long:float>"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "trips.parquet"))
    return Catalog(str(tmp_path), tables={
        "trips": TableDef("trips", is_fact=True, primary_key=("trip_id",)),
        "geofence": TableDef("geofence", primary_key=("geofence_uuid",)),
    })


def test_geo_not_intersects_golden(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    res = execute_query(spark, cat, Query(
        table="trips",
        joins=[Join(table="geofence", alias="g", conditions=[
            "not geography_intersects(g.shape, request_point)"])],
        dimensions=[Dimension(expr="request_at", alias="t")],
        measures=[Measure(expr="count(*)", alias="value")]))
    assert res == {"0": 1}


def test_geo_intersects_join_uuid_dim_golden(spark, tmp_path):
    cat = _catalog(spark, tmp_path)
    res = execute_query(spark, cat, Query(
        table="trips",
        joins=[Join(table="geofence", alias="g", conditions=[
            "geography_intersects(g.shape, request_point)"])],
        dimensions=[Dimension(expr="request_at", alias="t"),
                    Dimension(expr="g.geofence_uuid", alias="u")],
        measures=[Measure(expr="count(*)", alias="value")]))
    assert res == {"0": {UUIDS[0]: 1, UUIDS[1]: 1, UUIDS[2]: 1}}
