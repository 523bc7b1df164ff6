"""Differential AQL fuzzer: random queries, Spark vs DuckDB.

Every generated component (dimension, measure, filter, time filter) is a
*pair* — its AQL expression and its DuckDB-SQL rendering — so the whole
random query composes into both an ``aresdb_spark.aql.Query`` and an
oracle SQL string. The planner's result and DuckDB's must agree row-for-
row (float measures within 1e-6 relative).

This generalizes the hand-written contract queries (__spark_entry__.py)
from ~30 fixed points in query space to a sampled region of it: the
grammar below covers SURVEY §2.2 predicates (comparisons, IN, BETWEEN,
NOT, bitwise, modulo), §2.4 aggregations (count/sum/avg/min/max/
count_distinct, measure filters), §2.5 numeric bucketizers, §2.6 scalar
functions (hour/dayofweek/minute/floor/abs/case-when), time filters with
the reference's unit-end ``to`` semantics (query/time_filter.go), and
§2.7 sorts/limits on the non-aggregate path.

Examples are derandomized for suite stability (a fixed, diverse set per
hypothesis version); set AQL_FUZZ_EXAMPLES and AQL_FUZZ_RANDOM=1 for a
wider exploratory hunt.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR, assert_df_matches_duck

N_EXAMPLES = int(os.environ.get("AQL_FUZZ_EXAMPLES", "30"))
DERANDOMIZE = os.environ.get("AQL_FUZZ_RANDOM", "") != "1"

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

# ---------------------------------------------------------------------------
# component strategies: each draws a (aql_fragment, duckdb_fragment[, obj])
# ---------------------------------------------------------------------------


@st.composite
def dim_pair(draw):
    """A random group-by dimension as (Dimension, duckdb_sql)."""
    from aresdb_spark.aql import Dimension
    from aresdb_spark.aql.model import NumericBucketizer

    kind = draw(st.sampled_from(
        ["raw", "mod", "hour", "dow", "minute", "bucket", "bucket_fn",
         "case", "bitand", "shift", "tbucket"]))
    i = draw(st.integers(0, 10_000))  # uniquifies aliases
    alias = f"d{kind}{i}"
    if kind == "tbucket":
        from aresdb_spark.aql.timeutil import time_bucket_oracle_sql
        b = draw(st.sampled_from(
            ["hour", "day", "week", "month", "quarter-hour", "4 hours",
             "30 minutes", "day of week", "hour of day", "day of month"]))
        return (Dimension(expr="ts", time_bucketizer=b, alias=alias),
                f"{time_bucket_oracle_sql('ts', b)} AS {alias}")
    if kind == "raw":
        return Dimension(expr="event_type", alias=alias), f"event_type AS {alias}"
    if kind == "mod":
        k = draw(st.integers(2, 11))
        return (Dimension(expr=f"user_id % {k}", alias=alias),
                f"user_id % {k} AS {alias}")
    if kind == "hour":
        return (Dimension(expr="hour(ts)", alias=alias),
                f"hour(ts)::INT AS {alias}")
    if kind == "dow":
        # Spark dayofweek is Sunday=1; DuckDB dayofweek is Sunday=0
        return (Dimension(expr="dayofweek(ts)", alias=alias),
                f"(dayofweek(ts) + 1)::INT AS {alias}")
    if kind == "minute":
        return (Dimension(expr="minute(ts)", alias=alias),
                f"minute(ts)::INT AS {alias}")
    if kind == "bucket":
        w = draw(st.sampled_from([5, 10, 20, 25, 50]))
        return (Dimension(expr="value",
                          numeric_bucketizer=NumericBucketizer(bucket_width=w),
                          alias=alias),
                f"floor(value / {w}) * {w} AS {alias}")
    if kind == "bucket_fn":  # 2-arg floor, the reference's floor(x, N) form
        w = draw(st.sampled_from([4, 8, 16]))
        return (Dimension(expr=f"floor(value, {w})", alias=alias),
                f"floor(value / {w}) * {w} AS {alias}")
    if kind == "case":
        x = draw(st.integers(5, 300))
        return (Dimension(expr=f"case when value > {x} then 'hi' else 'lo' end",
                          alias=alias),
                f"CASE WHEN value > {x} THEN 'hi' ELSE 'lo' END AS {alias}")
    if kind == "bitand":
        m = draw(st.sampled_from([1, 3, 7, 15]))
        return (Dimension(expr=f"user_id & {m}", alias=alias),
                f"user_id & {m} AS {alias}")
    k = draw(st.integers(1, 3))  # shift
    return (Dimension(expr=f"user_id >> {k}", alias=alias),
            f"user_id >> {k} AS {alias}")


@st.composite
def measure_pair(draw):
    """(Measure, duckdb_sql, merge_where) — ``merge_where`` is non-None
    for a filtered measure and carries (plain_sql, where_clause): when it
    is the query's ONLY measure, the reference merges its row filters
    into the WHERE set (groups disappear — query/aql_compiler.go:807-818,
    mirrored at planner.py:390-394), so the oracle must render the
    filter as WHERE, not FILTER. Multi-measure queries use FILTER."""
    from aresdb_spark.aql import Measure

    kind = draw(st.sampled_from(
        ["count", "sum", "min", "max", "avg", "cd", "filtered", "expr"]))
    i = draw(st.integers(0, 10_000))
    alias = f"m{kind}{i}"
    if kind == "count":
        return Measure(expr="count(*)", alias=alias), f"count(*) AS {alias}", None
    if kind == "sum":
        return (Measure(expr="sum(value)", alias=alias),
                f"sum(value) AS {alias}", None)
    if kind == "min":
        return (Measure(expr="min(value)", alias=alias),
                f"min(value) AS {alias}", None)
    if kind == "max":
        return (Measure(expr="max(value)", alias=alias),
                f"max(value) AS {alias}", None)
    if kind == "avg":
        return (Measure(expr="avg(value)", alias=alias),
                f"avg(value) AS {alias}", None)
    if kind == "cd":
        col = draw(st.sampled_from(["user_id", "event_type"]))
        return (Measure(expr=f"count_distinct({col})", alias=alias),
                f"count(DISTINCT {col}) AS {alias}", None)
    if kind == "filtered":
        et = draw(st.sampled_from(EVENT_TYPES))
        agg = draw(st.sampled_from(["sum", "count", "min"]))
        arg = "*" if agg == "count" else "value"
        cond = f"event_type = '{et}'"
        return (Measure(expr=f"{agg}({arg})", alias=alias, filters=[cond]),
                f"{agg}({arg}) FILTER (WHERE {cond}) AS {alias}",
                (f"{agg}({arg}) AS {alias}", cond))
    # expression over aggregates
    return (Measure(expr="sum(value) / (count(*) + 1)", alias=alias),
            f"sum(value) / (count(*) + 1) AS {alias}", None)


@st.composite
def filter_pair(draw):
    kind = draw(st.sampled_from(
        ["cmp", "in", "mod", "not", "between", "bitand", "notin", "or"]))
    if kind == "cmp":
        op = draw(st.sampled_from([">", "<", ">=", "<="]))
        x = draw(st.integers(1, 320))
        return f"value {op} {x}", f"value {op} {x}"
    if kind == "in":
        ets = draw(st.sets(st.sampled_from(EVENT_TYPES), min_size=1, max_size=4))
        lst = ", ".join(f"'{e}'" for e in sorted(ets))
        return f"event_type in ({lst})", f"event_type IN ({lst})"
    if kind == "mod":
        k, r = draw(st.integers(2, 7)), draw(st.integers(0, 1))
        return f"user_id % {k} = {r}", f"user_id % {k} = {r}"
    if kind == "not":
        n = draw(st.integers(0, 14))
        return f"not (user_id = {n})", f"NOT (user_id = {n})"
    if kind == "between":
        a = draw(st.integers(0, 150))
        b = a + draw(st.integers(1, 170))
        return f"value between {a} and {b}", f"value BETWEEN {a} AND {b}"
    if kind == "bitand":
        m = draw(st.sampled_from([1, 3, 7]))
        r = draw(st.integers(0, 1))
        return f"user_id & {m} = {r}", f"user_id & {m} = {r}"
    if kind == "notin":
        ets = draw(st.sets(st.sampled_from(EVENT_TYPES), min_size=1, max_size=2))
        lst = ", ".join(f"'{e}'" for e in sorted(ets))
        return f"event_type not in ({lst})", f"event_type NOT IN ({lst})"
    x = draw(st.integers(1, 320))  # or
    et = draw(st.sampled_from(EVENT_TYPES))
    # parenthesized on BOTH sides: an unparenthesized `a AND b OR c`
    # binds as `(a AND b) OR c` in the dialect (reference AND/OR
    # precedence, pinned by test_reference_sql_parser.py), so a filter
    # meant as one disjunctive term must carry its own parens
    return (f"(value > {x} or event_type = '{et}')",
            f"(value > {x} OR event_type = '{et}')")


@st.composite
def time_filter_pair(draw):
    """Day-granularity from/to inside the data's Jan 2024 range; the
    reference's ``to`` is inclusive of its unit → oracle end = day + 1
    (query/time_filter.go ParseTimeFilter; see aql_time_filter_absolute)."""
    from aresdb_spark.aql import TimeFilter

    d0 = draw(st.integers(1, 25))
    d1 = d0 + draw(st.integers(0, 29 - d0))
    f, t = f"2024-01-{d0:02d}", f"2024-01-{d1:02d}"
    return (TimeFilter(from_=f, to=t),
            f"ts >= TIMESTAMP '{f}' AND ts < TIMESTAMP '{t}' + INTERVAL 1 DAY")


@st.composite
def agg_query_pair(draw):
    """A random aggregate query: 1-3 dims x 1-3 measures x 0-3 filters
    x optional time filter, as (Query, oracle_sql)."""
    from aresdb_spark.aql import Query

    dims = draw(st.lists(dim_pair(), min_size=1, max_size=3,
                         unique_by=lambda p: p[0].alias))
    measures = draw(st.lists(measure_pair(), min_size=1, max_size=3,
                             unique_by=lambda p: p[0].alias))
    filters = draw(st.lists(filter_pair(), min_size=0, max_size=3,
                            unique_by=lambda p: p[0]))
    tf = draw(st.none() | time_filter_pair())

    # single filtered measure -> reference merges its filter into WHERE
    measure_sqls = [m[1] for m in measures]
    extra_where = []
    if len(measures) == 1 and measures[0][2] is not None:
        measure_sqls = [measures[0][2][0]]
        extra_where = [measures[0][2][1]]

    select = ", ".join([d[1] for d in dims] + measure_sqls)
    where = [f[1] for f in filters] + extra_where + ([tf[1]] if tf else [])
    where_sql = (" WHERE " + " AND ".join(where)) if where else ""
    group = ", ".join(str(i + 1) for i in range(len(dims)))
    sql = f"SELECT {select} FROM events{where_sql} GROUP BY {group}"
    q = Query(table="events",
              dimensions=[d[0] for d in dims],
              measures=[m[0] for m in measures],
              filters=[f[0] for f in filters],
              time_filter=tf[0] if tf else None)
    return q, sql


@st.composite
def nonagg_query_pair(draw):
    """A random non-aggregate projection (measure expr '1' selects the
    reference's non-agg path): scalar dims, filters, ORDER BY the unique
    event_id, LIMIT — deterministic, so compared in order."""
    from aresdb_spark.aql import Dimension, Query, SortField

    scalar_kinds = draw(st.lists(
        st.sampled_from(["abs", "arith", "hour", "case", "raw", "round"]),
        min_size=1, max_size=4))
    dims, selects = [Dimension(expr="event_id", alias="event_id")], ["event_id"]
    for j, kind in enumerate(scalar_kinds):
        alias = f"s{j}"
        if kind == "abs":
            x = draw(st.integers(0, 300))
            dims.append(Dimension(expr=f"abs(value - {x})", alias=alias))
            selects.append(f"abs(value - {x}) AS {alias}")
        elif kind == "arith":
            a, b = draw(st.integers(1, 9)), draw(st.integers(1, 99))
            dims.append(Dimension(expr=f"value * {a} + user_id - {b}", alias=alias))
            selects.append(f"value * {a} + user_id - {b} AS {alias}")
        elif kind == "hour":
            dims.append(Dimension(expr="hour(ts)", alias=alias))
            selects.append(f"hour(ts)::INT AS {alias}")
        elif kind == "case":
            x = draw(st.integers(5, 300))
            dims.append(Dimension(
                expr=f"case when value > {x} then user_id else -1 end",
                alias=alias))
            selects.append(
                f"CASE WHEN value > {x} THEN user_id ELSE -1 END AS {alias}")
        elif kind == "raw":
            dims.append(Dimension(expr="event_type", alias=alias))
            selects.append(f"event_type AS {alias}")
        else:  # round
            n = draw(st.integers(0, 3))
            dims.append(Dimension(expr=f"round(value, {n})", alias=alias))
            selects.append(f"round(value, {n}) AS {alias}")
    filters = draw(st.lists(filter_pair(), min_size=0, max_size=2,
                            unique_by=lambda p: p[0]))
    limit = draw(st.sampled_from([10, 50, 200]))

    from aresdb_spark.aql import Measure, Query
    where = (" WHERE " + " AND ".join(f[1] for f in filters)) if filters else ""
    sql = (f"SELECT {', '.join(selects)} FROM events{where} "
           f"ORDER BY event_id LIMIT {limit}")
    q = Query(table="events", dimensions=dims,
              measures=[Measure(expr="1")],
              filters=[f[0] for f in filters],
              sorts=[SortField("event_id")], limit=limit)
    return q, sql


# ---------------------------------------------------------------------------
# the differential check
# ---------------------------------------------------------------------------

def _run_both(spark, duck, q, sql):
    from aresdb_spark.aql.planner import plan_query

    df = plan_query(spark, SF_DIR, q)
    assert_df_matches_duck(df, duck, sql, approx=True, tol=1e-6)


@settings(max_examples=N_EXAMPLES, deadline=None, derandomize=DERANDOMIZE,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(pair=agg_query_pair())
def test_fuzz_agg_queries_match_duckdb(spark, duck, pair):
    _run_both(spark, duck, *pair)


@settings(max_examples=N_EXAMPLES, deadline=None, derandomize=DERANDOMIZE,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(pair=nonagg_query_pair())
def test_fuzz_nonagg_projection_match_duckdb(spark, duck, pair):
    _run_both(spark, duck, *pair)


@st.composite
def join_query_pair(draw):
    """Random dimension-join aggregates on the TPC-H-ish star: lineitem
    LEFT JOIN part/supplier (+ optional nation snowflake hop), dims from
    either side, fact filters, LEFT-join miss⇒NULL semantics."""
    from aresdb_spark.aql import Dimension, Join, Measure, Query

    use_supplier = draw(st.booleans())
    snowflake = use_supplier and draw(st.booleans())
    i = draw(st.integers(0, 10_000))

    joins = []
    oracle_joins = []
    if use_supplier:
        joins.append(Join(table="supplier", alias="s",
                          conditions=["s.s_suppkey = l_suppkey"]))
        oracle_joins.append(
            "LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey")
        if snowflake:
            joins.append(Join(table="nation", alias="n",
                              conditions=["n.n_nationkey = s.s_nationkey"]))
            oracle_joins.append(
                "LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey")
        dim_pool = [("s.s_nationkey", "s.s_nationkey"),
                    ("l_returnflag", "l.l_returnflag")]
        if snowflake:
            dim_pool.append(("n.n_name", "n.n_name"))
    else:
        joins.append(Join(table="part", alias="p",
                          conditions=["p.p_partkey = l_partkey"]))
        oracle_joins.append("LEFT JOIN part p ON p.p_partkey = l.l_partkey")
        dim_pool = [("p.p_brand", "p.p_brand"),
                    ("p.p_size % 10", "p.p_size % 10"),
                    ("l_linestatus", "l.l_linestatus")]

    picks = draw(st.lists(st.sampled_from(range(len(dim_pool))),
                          min_size=1, max_size=len(dim_pool), unique=True))
    dims = [Dimension(expr=dim_pool[k][0], alias=f"jd{i}_{k}")
            for k in picks]
    dim_sql = [f"{dim_pool[k][1]} AS jd{i}_{k}" for k in picks]

    measure_kind = draw(st.sampled_from(["count", "sum", "avg"]))
    if measure_kind == "count":
        measures = [Measure(expr="count(*)", alias="cnt")]
        msr_sql = ["count(*) AS cnt"]
    elif measure_kind == "sum":
        measures = [Measure(expr="sum(l_quantity)", alias="qty")]
        msr_sql = ["sum(l.l_quantity) AS qty"]
    else:
        measures = [Measure(expr="round(avg(l_extendedprice), 4)",
                            alias="avg_price")]
        msr_sql = ["round(avg(l.l_extendedprice), 4) AS avg_price"]

    filters, filter_sql = [], []
    if draw(st.booleans()):
        x = draw(st.integers(1, 49))
        filters.append(f"l_quantity > {x}")
        filter_sql.append(f"l.l_quantity > {x}")
    if draw(st.booleans()):
        rf = draw(st.sampled_from(["A", "N", "R"]))
        filters.append(f"l_returnflag = '{rf}'")
        filter_sql.append(f"l.l_returnflag = '{rf}'")

    where = (" WHERE " + " AND ".join(filter_sql)) if filter_sql else ""
    group = ", ".join(str(k + 1) for k in range(len(dims)))
    sql = (f"SELECT {', '.join(dim_sql + msr_sql)} FROM lineitem l "
           f"{' '.join(oracle_joins)}{where} GROUP BY {group}")
    q = Query(table="lineitem", joins=joins, dimensions=dims,
              measures=measures, filters=filters)
    return q, sql


@settings(max_examples=N_EXAMPLES, deadline=None, derandomize=DERANDOMIZE,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(pair=join_query_pair())
def test_fuzz_join_queries_match_duckdb(spark, duck, pair):
    _run_both(spark, duck, *pair)


@st.composite
def sql_query_pair(draw):
    """A random query through the SQL dialect front end (aql/sql.py):
    the same component pools rendered as dialect SQL on one side and
    DuckDB SQL on the other. Exercises the SQL parser → Query → planner
    chain the reference's sql_parser.go serves."""
    def is_plain(p):
        # dialect SQL side: only expression-backed dims (numeric/time
        # bucketizers go through aql_* macros — covered by test_sql.py;
        # keep this family on the plain-expression grammar)
        return p[0].numeric_bucketizer is None and p[0].time_bucketizer is None

    dims = draw(st.lists(dim_pair(), min_size=1, max_size=2,
                         unique_by=lambda p: p[0].alias))
    dims = [d for d in dims if is_plain(d)] or \
        [draw(dim_pair().filter(is_plain))]
    measures = draw(st.lists(
        measure_pair().filter(lambda m: m[2] is None),  # no FILTER in dialect
        min_size=1, max_size=2, unique_by=lambda p: p[0].alias))
    filters = draw(st.lists(filter_pair(), min_size=0, max_size=2,
                            unique_by=lambda p: p[0]))

    # optional HAVING over the first measure's output alias (the dialect
    # applies having to output names; DuckDB allows alias refs too)
    having = ""
    if draw(st.booleans()) and measures[0][0].expr == "count(*)":
        k = draw(st.integers(1, 50))
        having = f" HAVING {measures[0][0].alias} > {k}"

    dim_sqls = [f"{d[0].expr} AS {d[0].alias}" for d in dims]
    msr_sqls = [f"{m[0].expr} AS {m[0].alias}" for m in measures]
    where = (" WHERE " + " AND ".join(f[0] for f in filters)) if filters else ""
    group = ", ".join(str(i + 1) for i in range(len(dims)))
    dialect_sql = (f"SELECT {', '.join(dim_sqls + msr_sqls)} FROM events"
                   f"{where} GROUP BY {group}{having}")

    oracle_select = ", ".join([d[1] for d in dims] + [m[1] for m in measures])
    oracle_where = (" WHERE " + " AND ".join(f[1] for f in filters)) \
        if filters else ""
    oracle = (f"SELECT {oracle_select} FROM events{oracle_where} "
              f"GROUP BY {group}{having}")
    return dialect_sql, oracle


@settings(max_examples=N_EXAMPLES, deadline=None, derandomize=DERANDOMIZE,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(pair=sql_query_pair())
def test_fuzz_sql_dialect_match_duckdb(spark, duck, pair):
    from aresdb_spark.aql.planner import plan_query
    from aresdb_spark.aql.sql import sql_to_query

    dialect_sql, oracle = pair
    df = plan_query(spark, SF_DIR, sql_to_query(dialect_sql))
    assert_df_matches_duck(df, duck, oracle, approx=True, tol=1e-6)


@st.composite
def composite_query_pair(draw):
    """Random composite-measure query (WITH legs, NATURAL LEFT JOIN,
    derived ratio) vs its single-pass DuckDB FILTER-clause twin. The
    last leg is always an unfiltered count(*) so the ratio denominator
    is never 0/NULL."""
    k = draw(st.integers(2, 9))
    dim = draw(st.sampled_from([f"user_id % {k}", "event_type"]))
    n_legs = draw(st.integers(2, 3))
    legs, oracle_measures, aliases = [], [], []
    for li in range(n_legs):
        alias = f"leg{li}"
        last = li == n_legs - 1
        agg = "count(*)" if last else draw(
            st.sampled_from(["count(*)", "sum(value)", "min(value)"]))
        flt = None if last else draw(st.one_of(st.none(), filter_pair()))
        where = f" WHERE {flt[0]}" if flt else ""
        legs.append(f"m{li} ({alias}) AS (SELECT {agg} AS {alias} "
                    f"FROM events{where} GROUP BY {dim})")
        oracle_measures.append(
            f"{agg} FILTER (WHERE {flt[1]}) AS {alias}" if flt
            else f"{agg} AS {alias}")
        aliases.append(alias)
    ratio = f"{aliases[0]}/{aliases[-1]}"
    sel = ", ".join(aliases + [f"{ratio} AS ratio"])
    rel = " NATURAL LEFT JOIN ".join(f"m{li}" for li in range(n_legs))
    dialect = f"WITH {', '.join(legs)} SELECT {sel} FROM {rel}"
    oracle_ratio = oracle_measures[0].rsplit(" AS ", 1)[0] \
        + f" / ({oracle_measures[-1].rsplit(' AS ', 1)[0]})"
    oracle = (f"SELECT {dim} AS d0, {', '.join(oracle_measures)}, "
              f"{oracle_ratio} AS ratio FROM events GROUP BY 1")
    return dialect, oracle


@settings(max_examples=N_EXAMPLES, deadline=None, derandomize=DERANDOMIZE,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(pair=composite_query_pair())
def test_fuzz_composite_measures_match_duckdb(spark, duck, pair):
    from aresdb_spark.aql.planner import plan_query
    from aresdb_spark.aql.sql import sql_to_query

    dialect_sql, oracle = pair
    df = plan_query(spark, SF_DIR, sql_to_query(dialect_sql))
    assert_df_matches_duck(df, duck, oracle, approx=True, tol=1e-6)


@st.composite
def topk_agg_query_pair(draw):
    """Aggregate + ORDER BY measure DESC + dim tiebreaks + LIMIT — the
    top-k path (TakeOrdered plan) under random dims/filters. The sort is
    made total (measure, then every dim) so the LIMIT boundary is
    deterministic on both engines."""
    from aresdb_spark.aql import Measure, Query, SortField

    dims = draw(st.lists(dim_pair(), min_size=1, max_size=2,
                         unique_by=lambda p: p[0].alias))
    i = draw(st.integers(0, 10_000))
    malias = f"tk{i}"
    agg, arg = draw(st.sampled_from(
        [("count", "*"), ("sum", "user_id"), ("max", "user_id")]))
    measure = Measure(expr=f"{agg}({arg})", alias=malias)
    filters = draw(st.lists(filter_pair(), min_size=0, max_size=2,
                            unique_by=lambda p: p[0]))
    k = draw(st.sampled_from([5, 17, 100]))

    select = ", ".join([d[1] for d in dims] + [f"{agg}({arg}) AS {malias}"])
    where = (" WHERE " + " AND ".join(f[1] for f in filters)) if filters else ""
    group = ", ".join(str(j + 1) for j in range(len(dims)))
    order = ", ".join([f"{malias} DESC"] + [d[0].alias for d in dims])
    sql = (f"SELECT {select} FROM events{where} GROUP BY {group} "
           f"ORDER BY {order} LIMIT {k}")
    q = Query(table="events",
              dimensions=[d[0] for d in dims], measures=[measure],
              filters=[f[0] for f in filters],
              sorts=[SortField(malias, "desc")] +
                    [SortField(d[0].alias) for d in dims],
              limit=k)
    return q, sql


@settings(max_examples=N_EXAMPLES, deadline=None, derandomize=DERANDOMIZE,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(pair=topk_agg_query_pair())
def test_fuzz_topk_agg_match_duckdb(spark, duck, pair):
    _run_both(spark, duck, *pair)


@st.composite
def grouping_set_query_pair(draw):
    """ROLLUP / CUBE group types (extension; SURVEY §2.4) under random
    dims, measures and filters — subtotal rows carry NULL dim keys on
    both engines, so the row-set compare covers the grouping-set NULL
    semantics too."""
    from aresdb_spark.aql import Dimension, Measure, Query

    gt = draw(st.sampled_from(["rollup", "cube"]))
    i = draw(st.integers(0, 10_000))
    # expression pool rendered identically on both sides (the oracle's
    # GROUP BY ROLLUP/CUBE needs raw exprs, not ordinals)
    pool = [("event_type", "event_type"),
            (f"user_id % {draw(st.integers(2, 5))}",) * 2,
            ("hour(ts)", "hour(ts)::INT"),
            (f"floor(value / 100) * 100",) * 2]
    picks = draw(st.lists(st.sampled_from(range(len(pool))),
                          min_size=1, max_size=2, unique=True))
    dims = [Dimension(expr=pool[k][0], alias=f"g{i}_{k}") for k in picks]
    dim_sql = [f"{pool[k][1]} AS g{i}_{k}" for k in picks]
    rollup_exprs = ", ".join(pool[k][1] for k in picks)

    agg, arg = draw(st.sampled_from(
        [("count", "*"), ("sum", "value"), ("avg", "value"),
         ("min", "user_id")]))
    measure_sql = f"{agg}({arg}) AS gm{i}"
    filters = draw(st.lists(filter_pair(), min_size=0, max_size=1))
    where = (" WHERE " + " AND ".join(f[1] for f in filters)) if filters else ""
    sql = (f"SELECT {', '.join(dim_sql)}, {measure_sql} FROM events{where} "
           f"GROUP BY {gt.upper()} ({rollup_exprs})")
    q = Query(table="events", dimensions=dims,
              measures=[Measure(expr=f"{agg}({arg})", alias=f"gm{i}")],
              filters=[f[0] for f in filters], group_type=gt)
    return q, sql


@settings(max_examples=N_EXAMPLES, deadline=None, derandomize=DERANDOMIZE,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(pair=grouping_set_query_pair())
def test_fuzz_grouping_sets_match_duckdb(spark, duck, pair):
    _run_both(spark, duck, *pair)


@st.composite
def setop_query_pair(draw):
    """UNION [ALL] / INTERSECT / EXCEPT over two random agg queries with
    the same output schema but independently drawn filters (small value
    ranges so the branches overlap and the distinct/difference semantics
    actually bite). Measures are integer-exact — float sums would make
    cross-engine row equality (what set ops compare on) flaky."""
    from aresdb_spark.aql import Dimension, Measure, Query

    op = draw(st.sampled_from(["union", "union all", "intersect", "except"]))
    i = draw(st.integers(0, 10_000))
    dim_expr, dim_sql = draw(st.sampled_from(
        [("event_type", "event_type"),
         ("user_id % 7", "user_id % 7"),
         ("hour(ts)", "hour(ts)::INT")]))
    agg, arg = draw(st.sampled_from(
        [("count", "*"), ("sum", "user_id"), ("min", "user_id")]))

    def branch(x):
        q = Query(table="events",
                  dimensions=[Dimension(expr=dim_expr, alias=f"sd{i}")],
                  measures=[Measure(expr=f"{agg}({arg})", alias=f"sm{i}")],
                  filters=[f"value > {x}"])
        sql = (f"SELECT {dim_sql} AS sd{i}, {agg}({arg}) AS sm{i} "
               f"FROM events WHERE value > {x} GROUP BY 1")
        return q, sql

    # a narrow draw range makes equal cutoffs (fully overlapping branches)
    # common — the interesting case for INTERSECT/EXCEPT
    q1, sql1 = branch(draw(st.sampled_from([50, 100, 150])))
    q2, sql2 = branch(draw(st.sampled_from([50, 100, 150])))
    oracle = f"({sql1}) {op.upper()} ({sql2})"
    return op, [q1, q2], oracle


@settings(max_examples=N_EXAMPLES, deadline=None, derandomize=DERANDOMIZE,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(triple=setop_query_pair())
def test_fuzz_set_ops_match_duckdb(spark, duck, triple):
    from aresdb_spark.aql.api import plan_set_op

    op, queries, oracle = triple
    df = plan_set_op(spark, SF_DIR, op, queries)
    assert_df_matches_duck(df, duck, oracle, approx=True, tol=1e-6)


@st.composite
def frontdoor_query_pair(draw):
    """A random query through the FULL JSON front door (execute_query →
    nested result with reference-formatted keys), with the expected
    nested dict rebuilt independently from DuckDB rows — keys rendered
    in SQL per the reference's formatting rules (dimval.go:146-210)."""
    kind = draw(st.sampled_from(["hour", "day", "minute5", "dow", "hod",
                                 "second_unit"]))
    et = draw(st.sampled_from(EVENT_TYPES))
    d0 = draw(st.integers(5, 20))
    frm, to = f"2024-01-{d0:02d}", f"2024-01-{d0 + 3:02d}"
    where = (f"event_type = '{et}' AND ts >= TIMESTAMP '{frm}' "
             f"AND ts < TIMESTAMP '{to}' + INTERVAL 1 DAY")

    dim = {"alias": "b", "sqlExpression": "ts"}
    if kind == "hour":
        dim["timeBucketizer"] = "hour"
        key = "strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00')"
    elif kind == "day":
        dim["timeBucketizer"] = "day"
        key = "strftime(date_trunc('day', ts), '%Y-%m-%d')"
    elif kind == "minute5":
        dim["timeBucketizer"] = "5 minutes"
        key = ("strftime(to_timestamp((epoch(ts)::BIGINT // 300) * 300), "
               "'%Y-%m-%d %H:%M')")
    elif kind == "dow":
        dim["timeBucketizer"] = "day of week"
        key = "dayname(ts)"  # duckdb full weekday name
    elif kind == "hod":
        dim["timeBucketizer"] = "hour of day"
        key = "lpad(hour(ts)::VARCHAR, 2, '0') || ':00'"
    else:  # timeUnit=second → numeric epoch keys
        dim["timeBucketizer"] = "hour"
        dim["timeUnit"] = "second"
        key = "epoch(date_trunc('hour', ts))::BIGINT::VARCHAR"

    query = {"table": "events",
             "measures": [{"alias": "v", "sqlExpression": "count(*)"}],
             "dimensions": [dim],
             "timeFilter": {"column": "ts", "from": frm, "to": to}}
    sql = f"SELECT {key} AS k, count(*) FROM events WHERE {where} GROUP BY 1"
    query["measures"][0]["rowFilters"] = [f"event_type = '{et}'"]
    return query, sql


@settings(max_examples=N_EXAMPLES, deadline=None, derandomize=DERANDOMIZE,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(pair=frontdoor_query_pair())
def test_fuzz_frontdoor_nested_result_keys(spark, duck, pair):
    from aresdb_spark.aql.api import execute_query

    query, sql = pair
    got = execute_query(spark, SF_DIR, query)
    want = {k: c for k, c in duck.execute(sql).fetchall()}
    assert got == want


@st.composite
def array_fn_query_pair(draw):
    """Array scalar functions over the embeddings table: 0-based
    element_at (functor.hpp:540-569 — duckdb is 1-based, so oracle index
    = i + 1 for i >= 0), negative from-the-end indices, contains, and
    length, composed into filters and dimensions."""
    kind = draw(st.sampled_from(["elem_cmp", "elem_neg", "len_dim",
                                 "contains"]))
    i = draw(st.integers(0, 10_000))
    if kind == "elem_cmp":
        idx = draw(st.integers(0, 63))
        x = draw(st.sampled_from([-0.5, 0.0, 0.25, 0.5]))
        op = draw(st.sampled_from([">", "<", ">=", "<="]))
        where_aql = f"element_at(embedding, {idx}) {op} {x}"
        where_sql = f"embedding[{idx + 1}] {op} {x}"
    elif kind == "elem_neg":
        idx = draw(st.integers(1, 64))
        x = draw(st.sampled_from([-0.25, 0.0, 0.25]))
        where_aql = f"element_at(embedding, -{idx}) > {x}"
        where_sql = f"embedding[-{idx}] > {x}"
    elif kind == "len_dim":
        where_aql = where_sql = None
    else:
        v = draw(st.sampled_from([0.0, 0.25, 0.5, 1.0]))
        where_aql = f"contains(embedding, {v})"
        where_sql = f"list_contains(embedding, {v})"

    from aresdb_spark.aql import Dimension, Measure, Query

    dims = [Dimension(expr="length(embedding)" if kind == "len_dim"
                      else "label % 4", alias=f"ad{i}")]
    dim_sql = ("len(embedding)::INT" if kind == "len_dim"
               else "label % 4") + f" AS ad{i}"
    q = Query(table="embeddings", dimensions=dims,
              measures=[Measure(expr="count(*)", alias=f"ac{i}")],
              filters=[where_aql] if where_aql else [])
    where = f" WHERE {where_sql}" if where_sql else ""
    sql = (f"SELECT {dim_sql}, count(*) AS ac{i} FROM embeddings{where} "
           f"GROUP BY 1")
    return q, sql


@settings(max_examples=N_EXAMPLES, deadline=None, derandomize=DERANDOMIZE,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(pair=array_fn_query_pair())
def test_fuzz_array_functions_match_duckdb(spark, duck, pair):
    _run_both(spark, duck, *pair)


@settings(max_examples=max(N_EXAMPLES // 2, 5), deadline=None,
          derandomize=DERANDOMIZE,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(pair=composite_query_pair())
def test_fuzz_composite_derived_only_front_door(spark, duck, pair):
    """The ADVICE-r5 bug class, fuzzed at the FRONT DOOR: a composite
    whose outer SELECT keeps only the derived ratio (every WITH leg a
    supporting measure) must shape as the nested aggregate map — and its
    values must match DuckDB's single-pass twin."""
    dialect_sql, oracle = pair
    # rewrite the OUTER select (the last " SELECT ") to keep only the
    # derived ratio term
    head, outer = dialect_sql.rsplit(" SELECT ", 1)
    sel, rel = outer.split(" FROM ", 1)
    ratio_term = sel.rsplit(", ", 1)[1]        # "legA/legB AS ratio"
    dialect_only = f"{head} SELECT {ratio_term} FROM {rel}"

    from aresdb_spark.aql.sql import execute_sql
    res = execute_sql(spark, SF_DIR, dialect_only)
    assert "matrixData" not in res  # aggregate-shaped, not a matrix

    want_rows = duck.execute(
        f"SELECT d0, ratio FROM ({oracle})").fetchall()
    want = {"NULL" if d is None else str(d): r for d, r in want_rows}
    assert set(res) == set(want)
    for k, v in want.items():
        got = res[k]
        if v is None:
            assert got is None, (k, got)
        else:
            assert got == pytest.approx(v, rel=1e-9), (k, got, v)
