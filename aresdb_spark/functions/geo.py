"""Geo join/filter: point-in-polygon (`geography_intersects`).

Reference: query/geo_intersects.cu (ray-casting point-in-polygon on the
GPU); compile constraints at query/aql_compiler.go:199-257; shape model =
polygons with holes, GeoShape = array of rings of (lat, long) structs
(query/time_series_aggregate.h:398-402). Even-odd (ray cast) rule: a point
in an odd number of rings is inside (holes subtract).

Spark design: shapes are a *small* dimension table (city boundaries etc.)
→ broadcast; the predicate is a deterministic expression over
(shape, lat, lng). The ray-cast itself runs as a JVM-side higher-order
aggregate over the ring arrays — no Python UDF, so the broadcast join +
predicate stays inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aresdb_spark.aql import expr as _expr

# GeoShape Spark type: array of rings, ring = array of points
GEO_POINT = T.StructType([
    T.StructField("lat", T.FloatType()), T.StructField("long", T.FloatType())])
GEO_SHAPE = T.ArrayType(T.ArrayType(GEO_POINT))


def point_in_ring(ring: Column, lat: Column, lng: Column) -> Column:
    """Ray-casting crossing test for one ring (array<struct<lat,long>>).

    Crossing count parity via fold over vertex pairs: for each edge
    (i, i+1), count if the horizontal ray from the point crosses it.
    Matches the reference's even-odd kernel (geo_intersects.cu)."""
    n = F.size(ring)
    idx = F.sequence(F.lit(0), n - 2)

    def crosses(i: Column) -> Column:
        a = F.element_at(ring, i + 1)   # element_at is 1-based
        b = F.element_at(ring, i + 2)
        ay, ax = a["long"].cast("double"), a["lat"].cast("double")
        by, bx = b["long"].cast("double"), b["lat"].cast("double")
        cond = ((ay > lng) != (by > lng)) & (
            lat < (bx - ax) * (lng - ay) / (by - ay) + ax)
        return F.when(cond, F.lit(1)).otherwise(F.lit(0))

    crossings = F.aggregate(idx, F.lit(0), lambda acc, i: acc + crosses(i))
    return crossings % 2 == 1


def geography_intersects(shape: Column, lat: Column, lng: Column) -> Column:
    """Point-in-shape with holes: inside an odd number of rings ⇒ inside
    (even-odd rule, like the reference kernel).

    A let-bound bounding-box precheck (one cheap least/greatest fold over
    the vertices) short-circuits the ray cast: points outside the bbox —
    the overwhelming majority when a fact table joins against many
    shapes — never pay the division-heavy crossing test. Result is
    identical (every ring lies inside the bbox)."""
    lat_d, lng_d = lat.cast("double"), lng.cast("double")

    def with_bbox(bb: Column) -> Column:
        inside_bbox = ((lat_d >= bb["mnla"]) & (lat_d <= bb["mxla"])
                       & (lng_d >= bb["mnlo"]) & (lng_d <= bb["mxlo"]))
        ring_hits = F.aggregate(
            shape, F.lit(0),
            lambda acc, ring: acc + F.when(
                point_in_ring(ring, lat_d, lng_d), 1).otherwise(0),
        )
        return F.when(inside_bbox, ring_hits % 2 == 1).otherwise(F.lit(False))

    bbox = F.aggregate(
        F.flatten(shape),
        F.struct(F.lit(999.0).alias("mnla"), F.lit(-999.0).alias("mxla"),
                 F.lit(999.0).alias("mnlo"), F.lit(-999.0).alias("mxlo")),
        lambda acc, p: F.struct(
            F.least(acc["mnla"], p["lat"].cast("double")).alias("mnla"),
            F.greatest(acc["mxla"], p["lat"].cast("double")).alias("mxla"),
            F.least(acc["mnlo"], p["long"].cast("double")).alias("mnlo"),
            F.greatest(acc["mxlo"], p["long"].cast("double")).alias("mxlo")))
    from aresdb_spark.operators.util import let as _let
    return _let(bbox, with_bbox)


def wkt_to_geo_shape(col: Column) -> Column:
    """WKT-ish polygon string → GEO_SHAPE (array of rings of
    struct<lat,long>), entirely with built-in string/array functions so
    the conversion stays inside codegen — no Python in the path.

    Accepts the format GeoShapeFromString accepts
    (reference memstore/common/data_type.go:482-512):
    ``POLYGON ((lng lat, lng lat), (...))`` case-insensitively, lng
    first per WKT, stored lat-first like GeoPointGo. This is the bridge
    from wire-ingested shape columns (which the metastore types as
    string) to ``geography_intersects``."""
    body = F.regexp_replace(F.lower(col), r"^[polygon() ]*", "")
    body = F.regexp_replace(body, r"[polygon() ]*$", "")
    # ring split matches GeoShapeFromString's regex EXACTLY (no space
    # before the comma) so ingest-side and query-side accept the same
    # inputs — a lenient variant here would parse strings the wire
    # codec's parser rejects
    rings = F.split(body, r"\),\s*\(")

    def parse_pair(pair: Column) -> Column:
        parts = F.split(F.trim(pair), r"\s+")
        return F.struct(
            F.element_at(parts, 2).cast("float").alias("lat"),
            F.element_at(parts, 1).cast("float").alias("long"))

    return F.transform(
        rings, lambda ring: F.transform(F.split(ring, r"\s*,\s*"),
                                        parse_pair))


def _geo_fn(args: list[Column]) -> Column:
    # AQL surface: geography_intersects(shape_col, point_col) where point
    # is struct<lat,long>, OR (shape, lat, lng)
    if len(args) == 2:
        return geography_intersects(args[0], args[1]["lat"], args[1]["long"])
    return geography_intersects(args[0], args[1], args[2])


_expr.register_function("geography_intersects", _geo_fn)
_expr.register_function("geo_shape", lambda args: wkt_to_geo_shape(args[0]))
