"""Golden end-to-end test of the example requests (the reference's
integration/ golden-query pattern: POST .aql files, compare exact JSON)."""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
EXAMPLES = os.path.join(os.path.dirname(HERE), "examples", "queries")

# exact expected nested results at sf0.001 (pinned now=1706190420).
# Keys use the reference's formatted rendering for hour buckets without
# timeUnit ("2006-01-02 15:00", query/common/dimval.go:195-200).
GOLDEN_TOTAL_EVENTS = {
    "2024-01-24 15:00": 1, "2024-01-24 21:00": 1, "2024-01-25 01:00": 1,
    "2024-01-25 02:00": 1, "2024-01-25 03:00": 1, "2024-01-25 05:00": 1,
    "2024-01-25 06:00": 1, "2024-01-25 07:00": 1,
}


def test_total_events_aql_golden(spark):
    from aresdb_spark.aql.api import execute_request

    with open(os.path.join(EXAMPLES, "total_events.aql")) as f:
        req = json.load(f)
    res = execute_request(spark, "/root/testdata/sf0.001", req)
    assert res["results"][0] == GOLDEN_TOTAL_EVENTS
    assert "errors" not in res


def test_sql_twin_matches_aql_golden(spark):
    from aresdb_spark.aql.sql import execute_sql

    with open(os.path.join(EXAMPLES, "total_events.sql")) as f:
        sql_req = json.load(f)
    res = execute_sql(spark, "/root/testdata/sf0.001", sql_req["queries"][0])
    assert res == GOLDEN_TOTAL_EVENTS


def test_click_share_composite_golden(spark, duck):
    """Composite-measure SQL example end-to-end: dim key → [clicks,
    total, share] with the share derived post-aggregation. Counts
    cross-checked against DuckDB, share = clicks/total exactly."""
    from aresdb_spark.aql.sql import execute_sql

    with open(os.path.join(EXAMPLES, "click_share.sql")) as f:
        sql_req = json.load(f)
    res = execute_sql(spark, "/root/testdata/sf0.001", sql_req["queries"][0])
    exp = {
        str(b): [c, t, c / t]
        for b, c, t in duck.execute(
            "SELECT user_id % 2, "
            "count(*) FILTER (WHERE event_type='click'), count(*) "
            "FROM events GROUP BY 1").fetchall()}
    assert res == exp


def test_concurrent_fanout_same_results(spark):
    from aresdb_spark.aql.api import execute_request

    with open(os.path.join(EXAMPLES, "total_events.aql")) as f:
        q = json.load(f)["queries"][0]
    req = {"queries": [q, q, q]}
    serial = execute_request(spark, "/root/testdata/sf0.001", req)
    threaded = execute_request(spark, "/root/testdata/sf0.001", req, max_workers=3)
    assert serial == threaded
    assert all(r == GOLDEN_TOTAL_EVENTS for r in threaded["results"])
