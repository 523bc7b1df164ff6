"""Golden: the reference's own sql_parser_test.go cases through
sql_to_query.

query/sql/sql_parser_test.go pins SQL → AQLQuery translations; these
tests run the same SQL strings through our translator and assert the
same AQL structure (table, measures, dimensions, filters, joins, time
filter, timezone, sorts, limit). Cases exercising the reference's
named-subquery (WITH) composite-measure machinery are out of dialect
here — sql.py rejects subqueries loudly, matching sql_parser.go:2018's
posture for plain subqueries — and are covered only as error cases.

The one semantic trap these goldens pin: WHERE ``a AND b OR c`` must
stay ONE filter (``(a AND b) OR c``; AND binds tighter), not split into
conjuncts at the AND — the reference emits whole OR subtrees as single
filter strings (VisitLogicalBinary, sql_parser.go:676-689) and rejects
aql_ macros under an OR (:973-975).
"""

from __future__ import annotations

import pytest

from aresdb_spark.aql.model import NumericBucketizer
from aresdb_spark.aql.sql import SQLSyntaxError, sql_to_query


def dim_tuples(q):
    return [(d.expr, d.time_bucketizer, d.time_unit, d.alias)
            for d in q.dimensions]


def test_row_filters_with_or_stay_one_filter():
    """sql_parser_test.go:38-53 — the whole AND/OR chain is one filter."""
    q = sql_to_query(
        "SELECT count(*) AS completed_trips, sum(fare) FROM trips "
        "WHERE status='completed' AND NOT status = 'cancelled' "
        "OR marketplace='agora' GROUP BY status")
    assert q.table == "trips"
    assert [(m.expr, m.alias) for m in q.measures] == [
        ("count(*)", "completed_trips"), ("sum(fare)", None)]
    assert q.filters == ["status='completed' AND NOT status = 'cancelled' "
                         "OR marketplace='agora'"]
    assert [d.expr for d in q.dimensions] == ["status"]


def test_geography_intersects_join():
    """sql_parser_test.go:54-71 — geo join condition + OR filter + hex
    dimension."""
    q = sql_to_query(
        "SELECT count(*) AS completed_trips FROM trips "
        "LEFT JOIN geo_table g ON geography_intersects(g.shape, request_location) "
        "WHERE status='completed' AND NOT status = 'cancelled' "
        "OR marketplace='agora' AND g.geofence_uuid IN (0x9EAE9256C1F547449E9BD3A2B64826B9) "
        "GROUP BY status, hex(g.geofence_uuid)")
    assert len(q.joins) == 1
    j = q.joins[0]
    assert (j.table, j.alias) == ("geo_table", "g")
    assert j.conditions == ["geography_intersects(g.shape, request_location)"]
    assert len(q.filters) == 1 and "OR marketplace='agora'" in q.filters[0]
    assert [d.expr for d in q.dimensions] == ["status", "hex(g.geofence_uuid)"]


def test_group_by_select_alias_resolves():
    """sql_parser_test.go:73-86 — GROUP BY trip_status (the SELECT
    alias) ⇒ dimension {expr: status, alias: trip_status}."""
    q = sql_to_query("SELECT status AS trip_status, count(*) "
                     "FROM trips GROUP BY trip_status;")
    assert [(d.expr, d.alias) for d in q.dimensions] == [
        ("status", "trip_status")]
    assert [m.expr for m in q.measures] == ["count(*)"]


def test_non_agg_with_limit():
    """sql_parser_test.go:87-100 — no GROUP BY ⇒ projection query with
    measure literal 1."""
    q = sql_to_query("SELECT field1 FROM trips LIMIT 10;")
    assert [m.expr for m in q.measures] == ["1"]
    assert [d.expr for d in q.dimensions] == ["field1"]
    assert q.limit == 10


def test_order_by():
    """sql_parser_test.go:101-117 — ORDER BY defaults ASC."""
    q = sql_to_query("SELECT field1 FROM trips ORDER BY field1;")
    assert [(s.expr, s.order) for s in q.sorts] == [("field1", "asc")]


# sql_parser_test.go:118-176 — every aql_time_bucket_* UDF suffix and
# the bucketizer string it must map to (udfRegister.go:62-79)
_BUCKETS = [
    ("minute", "minute"), ("hour", "hour"), ("day", "day"),
    ("week", "week"), ("month", "month"), ("quarter", "quarter"),
    ("year", "year"), ("time_of_day", "time of day"),
    ("minutes_of_day", "minutes of day"), ("hour_of_day", "hour of day"),
    ("hour_of_week", "hour of week"), ("day_of_week", "day of week"),
    ("day_of_month", "day of month"), ("day_of_year", "day of year"),
    ("month_of_year", "month of year"),
    ("quarter_of_year", "quarter of year"),
]


@pytest.mark.parametrize("suffix,bucket", _BUCKETS)
def test_time_bucket_udfs(suffix, bucket):
    q = sql_to_query(
        f'SELECT count(*) FROM trips GROUP BY '
        f'aql_time_bucket_{suffix}("request_at", "minute", "America/New_York");')
    assert dim_tuples(q) == [("request_at", bucket, "minute", None)]
    assert q.timezone == "America/New_York"


def test_time_filter_dimension_timezone():
    """sql_parser_test.go:177-194 — aql_time_filter + bucketized dim +
    unquoted timezone identifier."""
    q = sql_to_query(
        'SELECT count(*) FROM trips '
        'WHERE aql_time_filter(request_at, "96 quarter-hours ago", '
        '"1 quarter-hours ago", America/New_York) '
        'GROUP BY aql_time_bucket_minute(request_at, "minute", America/New_York);')
    assert (q.time_filter.column, q.time_filter.from_, q.time_filter.to) == (
        "request_at", "96 quarter-hours ago", "1 quarter-hours ago")
    assert dim_tuples(q) == [("request_at", "minute", "minute", None)]
    assert q.timezone == "America/New_York"
    assert q.filters == []


def test_time_filter_plus_row_filter():
    """sql_parser_test.go:195-212 — time filter consumed, row filter
    kept; plural "minutes" bucketizer."""
    q = sql_to_query(
        'SELECT count(*) FROM trips '
        'WHERE aql_time_filter(request_at, "96 quarter-hours ago", '
        '"1 quarter-hours ago", America/New_York) AND marketplace=\'agora\' '
        'GROUP BY aql_time_bucket_minutes(request_at, "minute", America/New_York);')
    assert q.time_filter.column == "request_at"
    assert q.filters == ["marketplace='agora'"]
    assert q.dimensions[0].time_bucketizer == "minutes"


def test_numeric_bucketizer_over_select_alias():
    """sql_parser_test.go:213-230 — aql_numeric_bucket_logbase(pop, 2)
    where pop aliases population in SELECT."""
    q = sql_to_query(
        'SELECT population AS pop, count(*) FROM trips '
        'WHERE aql_time_filter(request_at, "96 quarter-hours ago", '
        '"1 quarter-hours ago", America/New_York) AND marketplace=\'agora\' '
        'GROUP BY aql_time_bucket_hour(request_at, "minute", America/New_York), '
        'aql_numeric_bucket_logbase(pop, 2);')
    assert len(q.dimensions) == 2
    t, n = q.dimensions
    assert (t.expr, t.time_bucketizer, t.time_unit) == (
        "request_at", "hour", "minute")
    assert (n.expr, n.alias) == ("population", "pop")
    assert n.numeric_bucketizer == NumericBucketizer(log_base=2)
    assert [m.expr for m in q.measures] == ["count(*)"]


def test_multi_join():
    """sql_parser_test.go:231-256 — two LEFT JOINs with aliases, multi
    AND join conditions split, "hours" bucketizer."""
    q = sql_to_query(
        "SELECT population AS pop, count(*) FROM trips "
        "LEFT JOIN trips AS rush_leg "
        "ON trips.workflow_uuid=rush_leg.workflow_uuid AND status='completed' "
        "LEFT JOIN api_cities AS cities ON cities.id=city_id "
        'WHERE aql_time_filter(request_at, "96 quarter-hours ago", '
        '"1 quarter-hours ago", America/New_York) AND marketplace=\'agora\' '
        'GROUP BY aql_time_bucket_hours(request_at, "minute", America/New_York), '
        'aql_numeric_bucket_logbase(pop, 2);')
    assert [(j.table, j.alias, j.conditions) for j in q.joins] == [
        ("trips", "rush_leg",
         ["trips.workflow_uuid=rush_leg.workflow_uuid", "status='completed'"]),
        ("api_cities", "cities", ["cities.id=city_id"]),
    ]
    assert q.dimensions[0].time_bucketizer == "hours"
    assert q.filters == ["marketplace='agora'"]


def test_in_operator():
    """sql_parser_test.go:528-546 — IN list survives as one filter."""
    q = sql_to_query("SELECT fare FROM trips WHERE city_id in (1,2,3);")
    assert q.filters == ["city_id in (1,2,3)"]
    assert [d.expr for d in q.dimensions] == ["fare"]
    assert [m.expr for m in q.measures] == ["1"]


@pytest.mark.parametrize("select_expr,where_expr", [
    ("length(array_field2)", "length(array_field1) > 1"),
    ("element_at(array_field2, 1)", "element_at(array_field1, 0) > 4"),
    ("contains(array_field2, 'bar')", "contains(array_field1, 'foo')"),
])
def test_array_functions(select_expr, where_expr):
    """sql_parser_test.go:548-598 — array function calls pass through as
    dimension expressions and filters."""
    q = sql_to_query(f"SELECT {select_expr} FROM table1 WHERE {where_expr};")
    assert [d.expr for d in q.dimensions] == [select_expr]
    assert q.filters == [where_expr]
    assert [m.expr for m in q.measures] == ["1"]


_SUBQ = """SELECT count(*) AS {alias}
    FROM trips
    LEFT JOIN trips AS rush_leg
        ON trips.workflow_uuid=rush_leg.workflow_uuid AND status='completed'
    LEFT JOIN api_cities AS cities ON cities.id=city_id
    WHERE aql_time_filter(request_at, "96 quarter-hours ago",
    "1 quarter-hours ago", America/New_York) AND marketplace='agora'{extra}
    GROUP BY aql_time_bucket_day(request_at, "minute", America/New_York),
    aql_numeric_bucket_logbase(pop, 2)"""


def _requested():
    return _SUBQ.format(alias="Requested", extra="")


def _completed():
    return _SUBQ.format(alias="Completed", extra=" AND status='completed'")


def _assert_composite_common(q):
    assert q.table == "trips"
    assert [(j.table, j.alias) for j in q.joins] == [
        ("trips", "rush_leg"), ("api_cities", "cities")]
    assert q.time_filter.from_ == "96 quarter-hours ago"
    assert q.timezone == "America/New_York"
    assert q.dimensions[0].time_bucketizer == "day"
    assert q.dimensions[1].numeric_bucketizer == NumericBucketizer(log_base=2)
    assert q.filters == []  # row filters live on the measures


def test_composite_measures_subquery_form():
    """sql_parser_test.go:257-319 — two inline subqueries NATURAL LEFT
    JOINed; each measure carries its subquery's row filters; the
    Completed/Requested item becomes a derived measure."""
    q = sql_to_query(
        f"SELECT Completed, Requested, Completed/Requested FROM "
        f"({_requested()}) AS m1 NATURAL LEFT JOIN ({_completed()}) AS m2;")
    _assert_composite_common(q)
    assert [(m.expr, m.alias, m.filters) for m in q.measures] == [
        ("count(*)", "Completed", ["marketplace='agora'",
                                   "status='completed'"]),
        ("count(*)", "Requested", ["marketplace='agora'"]),
        ("Completed/Requested", None, []),
    ]
    assert q.supporting_measures == []


def test_composite_measures_with_form():
    """sql_parser_test.go:280-299 — the WITH variant of the same query
    translates identically."""
    q = sql_to_query(
        f"WITH m1 (Requested) AS ({_requested()}), "
        f"m2 (Completed) AS ({_completed()}) "
        f"SELECT Completed, Requested, Completed/Requested "
        f"FROM m1 NATURAL LEFT JOIN m2;")
    _assert_composite_common(q)
    assert [(m.expr, m.alias) for m in q.measures] == [
        ("count(*)", "Completed"), ("count(*)", "Requested"),
        ("Completed/Requested", None)]


def test_supporting_measures():
    """sql_parser_test.go:320-386 — measures not in the outer SELECT
    become supporting measures (computed, not emitted), in declaration
    order."""
    q = sql_to_query(
        f"WITH m1 (Requested) AS ({_requested()}), "
        f"m2 (Completed) AS ({_completed()}) "
        f"SELECT Completed/Requested FROM m1 NATURAL LEFT JOIN m2;")
    assert [(m.expr, m.alias) for m in q.measures] == [
        ("Completed/Requested", None)]
    assert [(m.expr, m.alias, m.filters) for m in q.supporting_measures] == [
        ("count(*)", "Requested", ["marketplace='agora'"]),
        ("count(*)", "Completed", ["marketplace='agora'",
                                   "status='completed'"]),
    ]


def test_composite_mixed_relation_kinds_rejected():
    """sql_parser_test.go:437-452 — a join relation mixing an inline
    subquery with a plain name is rejected."""
    with pytest.raises(SQLSyntaxError, match="all named|all inline"):
        sql_to_query(
            f"SELECT Requested FROM ({_requested()}) AS m1 "
            f"NATURAL LEFT JOIN m2")


def test_composite_mismatched_group_by_rejected():
    """sql_parser_test.go:454-500 — subqueries must share FROM and
    GROUP BY."""
    with pytest.raises(SQLSyntaxError, match="same"):
        sql_to_query(
            "WITH m1 (A) AS (SELECT count(*) AS A FROM trips GROUP BY x), "
            "m2 (B) AS (SELECT count(*) AS B FROM trips GROUP BY y) "
            "SELECT A/B FROM m1 NATURAL LEFT JOIN m2")


def test_having_or_precedence(spark, duck):
    """HAVING a AND b OR c keeps (a AND b) OR c semantics too."""
    from aresdb_spark.aql.planner import plan_query
    from tests.conftest import SF_DIR, assert_df_matches_duck

    q = sql_to_query(
        "SELECT user_id % 7 AS b, count(*) AS cnt FROM events "
        "GROUP BY user_id % 7 "
        "HAVING cnt > 120 AND b > 3 OR b = 0")
    assert q.having == ["cnt > 120 AND b > 3 OR b = 0"]
    df = plan_query(spark, SF_DIR, q)
    assert_df_matches_duck(df, duck, """
        SELECT user_id % 7 AS b, count(*) AS cnt FROM events GROUP BY 1
        HAVING (cnt > 120 AND b > 3) OR b = 0""")


def test_composite_executes_vs_duckdb(spark, duck):
    """Composite + supporting measures EXECUTE: click share per user_id
    bucket over events, derived clicks/total with total unselected."""
    from aresdb_spark.aql.planner import plan_query
    from tests.conftest import SF_DIR, assert_df_matches_duck

    q = sql_to_query(
        "WITH m1 (clicks) AS (SELECT count(*) AS clicks FROM events "
        "WHERE event_type='click' GROUP BY user_id % 3), "
        "m2 (total) AS (SELECT count(*) AS total FROM events "
        "GROUP BY user_id % 3) "
        "SELECT clicks, clicks/total AS share "
        "FROM m1 NATURAL LEFT JOIN m2")
    df = plan_query(spark, SF_DIR, q)
    assert_df_matches_duck(df, duck, """
        SELECT user_id % 3 AS ubucket,
               count(*) FILTER (WHERE event_type = 'click') AS clicks,
               count(*) FILTER (WHERE event_type = 'click')
                   / count(*) AS share
        FROM events GROUP BY 1""", approx=True, tol=1e-9)


def test_composite_duplicate_alias_rejected():
    """Two legs declaring the same measure alias must error, not
    silently drop the first leg's filters."""
    with pytest.raises(SQLSyntaxError, match="duplicate measure alias"):
        sql_to_query(
            "WITH m1 (a) AS (SELECT count(*) AS a FROM events "
            "WHERE event_type='click' GROUP BY user_id % 3), "
            "m2 (a) AS (SELECT count(*) AS a FROM events "
            "GROUP BY user_id % 3) "
            "SELECT a FROM m1 NATURAL LEFT JOIN m2")


def test_composite_propagates_leg_now_and_leg_order_by():
    """Leg-level aql_now and an agreed leg ORDER BY survive into the
    combined query (they are skeleton state, not droppable); a leg
    ORDER BY inside the parens must not be mistaken for the outer
    one."""
    leg = ("SELECT count(*) AS {a} FROM events "
           "WHERE aql_time_filter(ts, \"2 days ago\", \"now\", UTC) "
           "AND aql_now(ts, 1706190420){f} "
           "GROUP BY user_id % 3 ORDER BY d0 DESC")
    q = sql_to_query(
        "WITH m1 (clicks) AS (" + leg.format(a="clicks",
                                             f=" AND event_type='click'")
        + "), m2 (total) AS (" + leg.format(a="total", f="")
        + ") SELECT clicks, clicks/total AS ctr "
        "FROM m1 NATURAL LEFT JOIN m2")
    assert q.now == 1706190420
    assert [(s.expr, s.order) for s in q.sorts] == [("d0", "desc")]
    # legs disagreeing on ORDER BY are a skeleton mismatch
    with pytest.raises(SQLSyntaxError, match="same"):
        sql_to_query(
            "WITH m1 (a) AS (SELECT count(*) AS a FROM events "
            "GROUP BY user_id % 3 ORDER BY d0), "
            "m2 (b) AS (SELECT count(*) AS b FROM events "
            "GROUP BY user_id % 3) "
            "SELECT a/b FROM m1 NATURAL LEFT JOIN m2")


def test_composite_outer_select_dimension_and_order_by_supporting(
        spark, duck):
    """Outer SELECT naming the group-by dimension selects/renames the
    dimension (not a derived measure), and ORDER BY may reference an
    unselected supporting alias."""
    from aresdb_spark.aql.planner import plan_query
    from tests.conftest import SF_DIR, assert_df_matches_duck

    q = sql_to_query(
        "WITH m1 (clicks) AS (SELECT count(*) AS clicks FROM events "
        "WHERE event_type='click' GROUP BY user_id % 3), "
        "m2 (total) AS (SELECT count(*) AS total FROM events "
        "GROUP BY user_id % 3) "
        "SELECT user_id % 3 AS ub, clicks "
        "FROM m1 NATURAL LEFT JOIN m2 ORDER BY total DESC, ub LIMIT 2")
    assert q.dimensions[0].alias == "ub"
    assert [m.alias for m in q.measures] == ["clicks"]
    assert [m.alias for m in q.supporting_measures] == ["total"]
    df = plan_query(spark, SF_DIR, q)
    assert_df_matches_duck(df, duck, """
        SELECT user_id % 3 AS ub,
               count(*) FILTER (WHERE event_type = 'click') AS clicks
        FROM events GROUP BY 1 ORDER BY count(*) DESC, ub LIMIT 2""")


def test_numeric_bucket_quoted_column_arg():
    """A quoted column argument in aql_numeric_bucket_* strips like the
    time-bucket macros — it must not become a string-literal dim."""
    q = sql_to_query(
        'SELECT count(*) AS c FROM trips '
        'GROUP BY aql_numeric_bucket_logbase("pop", 2);')
    assert q.dimensions[0].expr == "pop"


def test_with_recursive_rejected():
    """sql_parser_test.go:388-403 — WITH RECURSIVE is an error (here:
    the whole WITH/subquery family is out of dialect, rejected loudly)."""
    with pytest.raises(SQLSyntaxError):
        sql_to_query(
            "WITH RECURSIVE x AS (SELECT status FROM trips) "
            "SELECT count(*) FROM trips GROUP BY status")


def test_macro_under_or_rejected():
    """sql_parser.go:973-975 — aql_ macros can not appear under an OR."""
    with pytest.raises(SQLSyntaxError, match="OR"):
        sql_to_query(
            'SELECT count(*) FROM trips WHERE aql_time_filter(request_at, '
            '"2 days ago", "now", UTC) OR marketplace=\'agora\' '
            'GROUP BY status')


def test_or_filter_executes_with_and_precedence(spark, tmp_path):
    """The OR-filter golden is not just shape: (a AND b) OR c must also
    EXECUTE with that precedence. 3 rows where only the c-branch or only
    the a∧b branch admits."""
    from aresdb_spark.aql.planner import Planner
    from aresdb_spark.catalog import Catalog, TableDef

    spark.createDataFrame(
        [("completed", "agora"), ("cancelled", "agora"),
         ("cancelled", "uber")],
        "status string, marketplace string",
    ).write.mode("overwrite").parquet(str(tmp_path / "t.parquet"))
    q = sql_to_query(
        "SELECT status, count(*) AS cnt FROM t "
        "WHERE status='completed' AND marketplace='agora' "
        "OR marketplace='uber' GROUP BY status")
    out = Planner(spark, Catalog(str(tmp_path),
                                 tables={"t": TableDef("t")})).plan(q)
    got = {(r["status"], r["cnt"]) for r in out.collect()}
    # (completed, agora) passes branch 1; (cancelled, uber) passes
    # branch 2; (cancelled, agora) passes neither. A naive AND split
    # would instead compute status='completed' AND (marketplace='agora'
    # OR 'uber') and return only the first row.
    assert got == {("completed", 1), ("cancelled", 1)}
