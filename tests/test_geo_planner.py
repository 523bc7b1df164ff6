"""Geo join through the AQL planner (SURVEY §2.3).

Reference: matchGeoJoin/matchGeoFilter/matchAndRewriteGeoDimension
(query/aql_compiler.go:199-257, 909-986, 1067-1109) + the ray-cast kernel
(query/geo_intersects.cu). Shapes are axis-aligned rectangles (one with a
hole) so a DuckDB range-predicate oracle reproduces the ray-cast result
exactly; points sit strictly inside/outside (no boundary ambiguity).
"""

import pytest
from pyspark.sql import functions as F

from aresdb_spark.aql import Dimension, Join, Measure, Query
from aresdb_spark.aql.planner import Planner
from aresdb_spark.catalog import Catalog, TableDef


def _ring(x0, y0, x1, y1):
    # (lat, long) closed ring
    return [{"lat": float(x0), "long": float(y0)},
            {"lat": float(x0), "long": float(y1)},
            {"lat": float(x1), "long": float(y1)},
            {"lat": float(x1), "long": float(y0)},
            {"lat": float(x0), "long": float(y0)}]


SHAPES = [
    # A: [0,10]² with a hole [4,6]²
    ("A", [_ring(0, 0, 10, 10), _ring(4, 4, 6, 6)]),
    ("B", [_ring(20, 0, 30, 10)]),
    ("C", [_ring(40, 40, 50, 50)]),
]


@pytest.fixture(scope="module")
def geo_catalog(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("geo")
    spark.createDataFrame(
        SHAPES, "shape_id string, shape array<array<struct<lat:float,long:float>>>"
    ).coalesce(1).write.parquet(f"{root}/shapes.parquet")
    # 12×12 grid of 5-unit steps (covers all shapes incl. A's hole point)
    pts = [(i, (i % 12) * 5 + 0.5, ((i // 12) % 12) * 5 + 0.5, float(i))
           for i in range(300)]
    spark.createDataFrame(
        pts, "pid long, lat double, lng double, v double"
    ).coalesce(1).write.parquet(f"{root}/points.parquet")
    return Catalog(str(root), tables={
        "points": TableDef("points", is_fact=True, primary_key=("pid",)),
        "shapes": TableDef("shapes", primary_key=("shape_id",)),
    })


def _oracle_rows(duck, root, where="1=1"):
    duck.execute(f"CREATE OR REPLACE VIEW g_points AS SELECT * FROM '{root}/points.parquet/*.parquet'")
    return duck.execute(f"""
        WITH labeled AS (
          SELECT *, CASE
            WHEN lat > 0 AND lat < 10 AND lng > 0 AND lng < 10
                 AND NOT (lat > 4 AND lat < 6 AND lng > 4 AND lng < 6) THEN 'A'
            WHEN lat > 20 AND lat < 30 AND lng > 0 AND lng < 10 THEN 'B'
            WHEN lat > 40 AND lat < 50 AND lng > 40 AND lng < 50 THEN 'C'
          END AS shape_id FROM g_points)
        SELECT shape_id, count(*) AS cnt FROM labeled
        WHERE shape_id IS NOT NULL AND {where} GROUP BY 1 ORDER BY 1
    """).fetchall()


def test_geo_join_dimension(spark, duck, geo_catalog):
    """Inner geo join + shape-id dimension matches the rectangle oracle."""
    q = Query(
        table="points",
        joins=[Join(table="shapes", alias="g",
                    conditions=["geography_intersects(g.shape, lat, lng)"])],
        dimensions=[Dimension(expr="g.shape_id", alias="shape_id")],
        measures=[Measure(expr="count(*)", alias="cnt")],
    )
    got = sorted(tuple(r) for r in Planner(spark, geo_catalog).plan(q).collect())
    want = [tuple(r) for r in _oracle_rows(duck, geo_catalog.sf_dir)]
    assert got == want and len(got) == 3


def test_geo_filter_prunes_shapes(spark, duck, geo_catalog):
    """Shape-UUID filter (IN on the geo pk) prunes candidate shapes BEFORE
    the intersect — rows in shape C drop entirely."""
    q = Query(
        table="points",
        joins=[Join(table="shapes", alias="g",
                    conditions=["geography_intersects(g.shape, lat, lng)"])],
        dimensions=[Dimension(expr="g.shape_id", alias="shape_id")],
        measures=[Measure(expr="count(*)", alias="cnt")],
        filters=["g.shape_id in ('A', 'B')"],
    )
    got = sorted(tuple(r) for r in Planner(spark, geo_catalog).plan(q).collect())
    want = [tuple(r) for r in _oracle_rows(duck, geo_catalog.sf_dir,
                                           where="shape_id IN ('A', 'B')")]
    assert got == want and len(got) == 2


def test_geo_hex_uuid_dimension(spark, geo_catalog):
    """hex(pk) geo dimension (ref matchAndRewriteGeoDimension: UUID or
    hex(UUID))."""
    q = Query(
        table="points",
        joins=[Join(table="shapes", alias="g",
                    conditions=["geography_intersects(g.shape, lat, lng)"])],
        dimensions=[Dimension(expr="hex(g.shape_id)", alias="h")],
        measures=[Measure(expr="count(*)", alias="cnt")],
    )
    rows = {r["h"] for r in Planner(spark, geo_catalog).plan(q).collect()}
    assert rows == {"41", "42", "43"}  # hex('A'), hex('B'), hex('C')


def test_geo_anti_join(spark, duck, geo_catalog):
    """Negated geo join (inOrOut=false): rows outside every candidate
    shape."""
    q = Query(
        table="points",
        joins=[Join(table="shapes", alias="g",
                    conditions=["not geography_intersects(g.shape, lat, lng)"])],
        measures=[Measure(expr="count(*)", alias="cnt")],
    )
    got = Planner(spark, geo_catalog).plan(q).first()["cnt"]
    duck.execute(f"CREATE OR REPLACE VIEW g_points AS SELECT * FROM "
                 f"'{geo_catalog.sf_dir}/points.parquet/*.parquet'")
    want = duck.execute("""
        SELECT count(*) FROM g_points WHERE NOT (
          (lat > 0 AND lat < 10 AND lng > 0 AND lng < 10
           AND NOT (lat > 4 AND lat < 6 AND lng > 4 AND lng < 6))
          OR (lat > 20 AND lat < 30 AND lng > 0 AND lng < 10)
          OR (lat > 40 AND lat < 50 AND lng > 40 AND lng < 50))
    """).fetchone()[0]
    assert got == want


def test_geo_constraint_errors(spark, geo_catalog):
    with pytest.raises(ValueError, match="one join condition"):
        Planner(spark, geo_catalog).plan(Query(
            table="points",
            joins=[Join(table="shapes", alias="g",
                        conditions=["geography_intersects(g.shape, lat, lng)",
                                    "g.shape_id = 'A'"])],
            measures=[Measure(expr="count(*)", alias="cnt")]))


def test_geo_args_accept_either_order(spark, tmp_path):
    """The reference accepts geography_intersects in either argument
    order and normalizes so the shape is first (query_context_helper.go:
    520-523); the planner applies the same swap using the join's shape
    table alias. Exercised with the 2-arg point-struct form, where a
    swapped call would otherwise crash on field access."""
    from aresdb_spark.aql import Dimension, Join, Measure, Query
    from aresdb_spark.aql.planner import Planner

    spark.createDataFrame(
        SHAPES,
        "shape_id string, shape array<array<struct<lat:float,long:float>>>"
    ).write.parquet(f"{tmp_path}/shapes.parquet")
    spark.createDataFrame(
        [(i, ((i % 12) * 5 + 0.5, ((i // 12) % 12) * 5 + 0.5))
         for i in range(300)],
        "pid long, pt struct<lat:double,long:double>"
    ).write.parquet(f"{tmp_path}/points2.parquet")
    catalog = Catalog(str(tmp_path), tables={
        "points2": TableDef("points2", is_fact=True, primary_key=("pid",)),
        "shapes": TableDef("shapes", primary_key=("shape_id",)),
    })

    def run(cond):
        return sorted(map(tuple, Planner(spark, catalog).plan(Query(
            table="points2",
            joins=[Join(table="shapes", alias="g", conditions=[cond])],
            dimensions=[Dimension(expr="g.shape_id", alias="sid")],
            measures=[Measure(expr="count(*)", alias="c")],
        )).collect()))

    shape_first = run("geography_intersects(g.shape, pt)")
    point_first = run("geography_intersects(pt, g.shape)")
    assert shape_first == point_first and len(shape_first) > 0


def test_geo_arg_validation_matches_reference(spark, geo_catalog):
    """Two fact-side (point) arguments or two shape-table arguments in a
    2-arg geography_intersects error with the reference compiler's
    message (aql_compiler_test.go:2343-2423: 'expect exactly one geo
    shape column and one geo point column')."""
    for cond in ("geography_intersects(lat, lng)",
                 "geography_intersects(g.shape, g.shape)"):
        with pytest.raises(ValueError,
                           match="exactly one geo shape column"):
            Planner(spark, geo_catalog).plan(Query(
                table="points",
                joins=[Join(table="shapes", alias="g",
                            conditions=[cond])],
                measures=[Measure(expr="count(*)", alias="cnt")]))
