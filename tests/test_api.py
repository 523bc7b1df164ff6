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

    # golden: hourly buckets from duckdb; keys use the reference's
    # formatted rendering for hour buckets without timeUnit
    # ("2006-01-02 15:00", query/common/dimval.go:195-200)
    rows = duck.execute(f"""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS k,
               count(*) AS c
        FROM events
        WHERE event_type = 'click'
          AND ts >= date_trunc('hour', to_timestamp({NOW})) - INTERVAL 24 HOUR
          AND ts < to_timestamp((epoch(to_timestamp({NOW}))::BIGINT // 900) * 900 + 900)
        GROUP BY 1
    """).fetchall()
    want0 = {k: c for k, c in rows}
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
    # every matrix cell is a string — the reference marshals []*string
    # rows (aql_postprocessor.go:129-143)
    assert [tuple(r) for r in res["matrixData"]] == \
        [tuple(str(v) for v in r) for r in want]


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


def test_verbose_adds_context(spark):
    """verbose > 0 attaches one serialized query context per query, like
    the reference marshalling qcs into "context"
    (api/query_handler.go:209-212). Non-verbose responses must not carry
    the key (reference writes it only under the flag)."""
    from aresdb_spark.aql.api import execute_request

    req = {"queries": [
        {"table": "events",
         "measures": [{"alias": "c", "sqlExpression": "count(*)"}],
         "dimensions": [{"alias": "et", "sqlExpression": "event_type"}]},
        {"table": "nation",
         "measures": [{"alias": "c", "sqlExpression": "count(*)"}]},
    ]}
    plain = execute_request(spark, SF_DIR, req)
    assert "context" not in plain

    res = execute_request(spark, SF_DIR, dict(req, verbose=1))
    assert len(res["context"]) == 2
    c0 = res["context"][0]
    assert c0["table"] == "events" and c0["aggregate"] is True
    assert c0["dimensions"] == ["event_type"]
    # the Catalyst physical plan is the OOPK-context analog: a real
    # formatted explain with the scan visible
    assert "Physical Plan" in c0["physicalPlan"]
    assert "parquet" in c0["physicalPlan"]
    # verbose alone does NOT time stages (that's debug's escalation)
    assert "timings" not in c0


def test_debug_forces_verbose_and_times_stages(spark):
    """debug > 0 forces verbose and adds per-stage timings — the
    reference's escalation rule (api/query_handler.go:268-270: Debug>0 ⇒
    qc.Debug = true; aqlRequest.Verbose = 1)."""
    from aresdb_spark.aql.api import execute_request

    res = execute_request(spark, SF_DIR, {
        "debug": 1,  # note: no verbose key — debug must imply it
        "queries": [{"table": "events",
                     "measures": [{"alias": "c",
                                   "sqlExpression": "count(*)"}]}],
    })
    [ctx] = res["context"]
    t = ctx["timings"]
    assert t["compileMs"] > 0 and t["executeMs"] > 0
    assert t["totalMs"] >= max(t["compileMs"], t["executeMs"])


def test_verbose_context_none_for_failed_query(spark):
    """A failed query contributes an error and a null context slot —
    per-query isolation extends to the verbose surface."""
    from aresdb_spark.aql.api import execute_request

    res = execute_request(spark, SF_DIR, {"verbose": 1, "queries": [
        {"table": "nope",
         "measures": [{"alias": "c", "sqlExpression": "count(*)"}]},
        {"table": "events",
         "measures": [{"alias": "c", "sqlExpression": "count(*)"}]},
    ]})
    assert res["context"][0] is None
    assert res["context"][1]["table"] == "events"
    assert "nope" in res["errors"][0] and res["errors"][1] is None


def test_time_dim_key_formatting(spark):
    """Time-dimension JSON keys follow the reference's postprocessor
    (query/common/dimval.go:146-210): formatted strings without timeUnit,
    numeric unit division with it; recurring buckets render weekday/time
    names; week+ grains fall back to numeric epoch."""
    from aresdb_spark.aql.api import execute_query

    def run(dim):
        return execute_query(spark, SF_DIR, {
            "table": "events",
            "measures": [{"alias": "c", "sqlExpression": "count(*)"}],
            "dimensions": [dim],
            "timeFilter": {"column": "ts", "from": "2024-01-23",
                           "to": "2024-01-23"},
        })

    hour = run({"alias": "b", "sqlExpression": "ts", "timeBucketizer": "hour"})
    assert all(k.startswith("2024-01-23 ") and k.endswith(":00")
               for k in hour)

    day = run({"alias": "b", "sqlExpression": "ts", "timeBucketizer": "day"})
    assert list(day) == ["2024-01-23"]

    qh = run({"alias": "b", "sqlExpression": "ts",
              "timeBucketizer": "quarter-hour"})
    assert all(len(k) == 16 and k[13] == ":" for k in qh)  # "....-.. ..:.."

    dow = run({"alias": "b", "sqlExpression": "ts",
               "timeBucketizer": "day of week"})
    assert list(dow) == ["Tuesday"]  # 2024-01-23 was a Tuesday

    hod = run({"alias": "b", "sqlExpression": "ts",
               "timeBucketizer": "hour of day"})
    assert all(len(k) == 5 and k.endswith(":00") for k in hod)

    how = run({"alias": "b", "sqlExpression": "ts",
               "timeBucketizer": "hour of week"})
    assert all(k.startswith("Tuesday ") for k in how)

    # timeUnit set → numeric keys in that unit (dimval.go:149-163)
    hour_s = run({"alias": "b", "sqlExpression": "ts",
                  "timeBucketizer": "hour", "timeUnit": "second"})
    assert all(k.isdigit() for k in hour_s)
    hour_h = run({"alias": "b", "sqlExpression": "ts",
                  "timeBucketizer": "hour", "timeUnit": "hour"})
    assert {int(k) * 3600 for k in hour_h} == {int(k) for k in hour_s}

    # week grain: ParseRegularTimeBucketizer fallback → numeric epoch
    week = run({"alias": "b", "sqlExpression": "ts",
                "timeBucketizer": "week"})
    assert all(k.isdigit() for k in week)


def test_supporting_measures_via_json_front_door(spark):
    """The JSON shape's supportingMeasures field (query/common/aql.go
    SupportingMeasures) computes but does not emit: the derived ratio
    references the supporting count by alias, and only the selected
    measures appear in the result."""
    from aresdb_spark.aql.api import execute_request

    res = execute_request(spark, SF_DIR, {"queries": [{
        "table": "events",
        "dimensions": [{"alias": "b", "sqlExpression": "user_id % 2"}],
        "measures": [
            {"alias": "clicks", "sqlExpression": "count(*)",
             "rowFilters": ["event_type = 'click'"]},
            {"alias": "share", "sqlExpression": "clicks/total"},
        ],
        "supportingMeasures": [
            {"alias": "total", "sqlExpression": "count(*)"}],
    }]})
    assert "errors" not in res
    out = res["results"][0]
    assert set(out) == {"0", "1"}
    for row in out.values():
        clicks, share = row
        assert share > 0 and clicks > 0
    # sf0.001 golden: same numbers as the click_share example
    assert out["1"][0] == 93 and abs(out["1"][1] - 93 / 438) < 1e-12
    assert out["0"][0] == 117 and abs(out["0"][1] - 117 / 562) < 1e-12


def test_composite_derived_only_is_aggregate_shaped(spark):
    """A composite query whose outer SELECT holds only derived measures
    (every WITH leg lands in supporting_measures) must shape as the
    nested aggregate map, not headers/matrixData — _is_aggregate_query
    mirrors the planner's is_agg over measures + supporting_measures."""
    from aresdb_spark.aql.sql import execute_sql

    res = execute_sql(spark, SF_DIR, """
        WITH m1 (clicks) AS (SELECT count(*) AS clicks FROM events
                             WHERE event_type = 'click'
                             GROUP BY user_id % 2),
             m2 (total) AS (SELECT count(*) AS total FROM events
                            GROUP BY user_id % 2)
        SELECT clicks/total AS ctr FROM m1 NATURAL LEFT JOIN m2""")
    # nested aggregate map: dim value → scalar, no matrix keys
    assert "headers" not in res and "matrixData" not in res
    assert set(res) == {"0", "1"}
    assert abs(res["1"] - 93 / 438) < 1e-12
    assert abs(res["0"] - 117 / 562) < 1e-12


def test_sharded_query_timeout_cancels_jobs(spark, tmp_path):
    """The broker bounds its whole scatter/gather with a request
    timeout (broker/executor.go:29 executorTimeoutSeconds, :50
    context.WithTimeout) — a straggler shard fails the request rather
    than hanging the broker. Spark analog: the scatter runs in its own
    job group; a watchdog cancels the group past the deadline and the
    call raises the named error. An already-expired deadline must
    cancel the very first shard job; without a timeout the same query
    completes."""
    import pytest
    from pyspark.sql import functions as F

    from aresdb_spark.aql import Dimension, Measure, Query
    from aresdb_spark.aql.api import QueryTimeoutError, execute_query_sharded
    from tests.conftest import load_events

    ev = load_events(spark)
    # pad each shard so its count job runs long enough for the 50ms
    # watchdog cadence to land mid-job deterministically
    fat = ev.unionByName(ev).unionByName(ev).unionByName(ev)
    dirs = []
    for i in (0, 1):
        d = str(tmp_path / f"s{i}")
        fat.filter(F.col("user_id") % 2 == i) \
           .write.parquet(f"{d}/events.parquet")
        dirs.append(d)
    q = Query(table="events",
              dimensions=[Dimension(expr="event_type", alias="et")],
              measures=[Measure(expr="count(*)", alias="cnt")])

    res = execute_query_sharded(spark, dirs, q)   # unbounded: completes
    assert sum(res.values()) == fat.count()

    with pytest.raises(QueryTimeoutError, match="executor bound"):
        execute_query_sharded(spark, dirs, q, timeout_seconds=0.0)

    # the group cleanup leaves the session usable for the next query
    res2 = execute_query_sharded(spark, dirs, q,
                                 timeout_seconds=120.0)
    assert res2 == res


def test_sharded_concurrent_scatter_identity(spark, tmp_path):
    """max_workers > 1 fans the per-shard jobs out from driver threads
    (the broker's parallel datanode goroutines, broker/executor.go) —
    results must be IDENTICAL to the sequential scatter for every merge
    rule, and the timeout watchdog must reach concurrently running
    shard jobs (workers re-tag the job group per thread)."""
    import pytest
    from pyspark.sql import functions as F

    from aresdb_spark.aql import Dimension, Measure, Query
    from aresdb_spark.aql.api import QueryTimeoutError, execute_query_sharded
    from tests.conftest import load_events

    ev = load_events(spark)
    dirs = []
    for i in (0, 1, 2):
        d = str(tmp_path / f"s{i}")
        ev.filter(F.col("user_id") % 3 == i) \
          .write.parquet(f"{d}/events.parquet")
        dirs.append(d)

    def q(measure):
        return Query(table="events",
                     dimensions=[Dimension(expr="event_type", alias="et")],
                     measures=[Measure(expr=measure, alias="m")])

    for m in ("count(*)", "sum(value)", "avg(value)", "hll(user_id)"):
        seq = execute_query_sharded(spark, dirs, q(m))
        par = execute_query_sharded(spark, dirs, q(m), max_workers=3)
        assert par == seq, m

    with pytest.raises(QueryTimeoutError, match="executor bound"):
        execute_query_sharded(spark, dirs, q("count(*)"),
                              timeout_seconds=0.0, max_workers=3)


def test_sharded_scan_node_retries_transient_failures(spark, tmp_path,
                                                      monkeypatch):
    """The broker's scan node retries a failed datanode fetch
    (broker/query_plan_agg.go:37 rpcRetries=2, :167): one transient
    shard failure is absorbed, a persistently dead shard exhausts its
    attempts and fails the request."""
    import pytest
    from pyspark.sql import functions as F

    import aresdb_spark.aql.api as api
    from aresdb_spark.aql import Dimension, Measure, Query
    from tests.conftest import load_events

    ev = load_events(spark)
    dirs = []
    for i in (0, 1):
        d = str(tmp_path / f"s{i}")
        ev.filter(F.col("user_id") % 2 == i) \
          .write.parquet(f"{d}/events.parquet")
        dirs.append(d)
    q = Query(table="events",
              dimensions=[Dimension(expr="event_type", alias="et")],
              measures=[Measure(expr="count(*)", alias="cnt")])

    real, calls = api.execute_query, {"n": 0}

    def flaky(spark_, cat, qq):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient datanode hiccup")
        return real(spark_, cat, qq)

    monkeypatch.setattr(api, "execute_query", flaky)
    res = api.execute_query_sharded(spark, dirs, q)
    assert sum(res.values()) == ev.count()
    assert calls["n"] == 3  # shard0 failed once + retried, shard1 once

    def dead(*a, **k):
        raise RuntimeError("shard down")

    monkeypatch.setattr(api, "execute_query", dead)
    with pytest.raises(RuntimeError, match="shard down"):
        api.execute_query_sharded(spark, dirs, q)
