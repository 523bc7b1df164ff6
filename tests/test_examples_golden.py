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


def test_lifecycle_walkthrough_golden(spark, tmp_path):
    """examples/run_table_lifecycle.py is deterministic (injected
    clock): the week of scheduler ticks produces this exact job log and
    final state — archiving every day, backfill flush from day 1, the
    daily purge on alternating ticks (QualifyForPurge's strict
    `now > last + interval`, purge_manager.go:47-51, with exactly-24h
    ticks), retention dropping days 0-1, late rows folded in."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_table_lifecycle",
        os.path.join(os.path.dirname(HERE), "examples",
                     "run_table_lifecycle.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.run(spark, str(tmp_path))

    # r9: the ledger-reaper gc job (sources/lifecycle.py GC) rides the
    # same strict `now > last + 24h` rule as purge, so it fires on the
    # alternating ticks too
    assert out["jobs"] == [
        "day0: trips|0|archiving",
        "day1: trips|0|archiving", "day1: trips|0|backfill",
        "day2: trips|0|archiving", "day2: trips|0|backfill",
        "day2: trips|0|gc", "day2: trips|0|purge",
        "day3: trips|0|archiving", "day3: trips|0|backfill",
        "day4: trips|0|archiving", "day4: trips|0|backfill",
        "day4: trips|0|gc", "day4: trips|0|purge",
        "day5: trips|0|archiving", "day5: trips|0|backfill",
        "day6: trips|0|archiving", "day6: trips|0|backfill",
        "day6: trips|0|gc", "day6: trips|0|purge",
    ]
    # retention 4: days 2024-01-10/11 purged; late corrections (2 per
    # interior day, fare 99/100) folded into their true day
    assert out["daily"] == {
        "2024-01-12": [12, 364.0],
        "2024-01-13": [12, 374.0],
        "2024-01-14": [12, 384.0],
        "2024-01-15": [12, 394.0],
        "2024-01-16": [10, 205.0],
    }
    assert out["cold_days"] == ["2024-01-12", "2024-01-13", "2024-01-14",
                                "2024-01-15", "2024-01-16"]
    assert out["queued_backfill"] == 0


def test_migrate_off_reference_walkthrough_golden(spark, tmp_path):
    """examples/run_migrate_off_reference.py is deterministic: the
    fabricated legacy deployment migrates to exactly these rows (enum
    cases resolved, RLE sort column expanded, deleted column skipped),
    the AQL query sees them, and export→re-migrate round-trips."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_migrate_off_reference",
        os.path.join(os.path.dirname(HERE), "examples",
                     "run_migrate_off_reference.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.run(spark, str(tmp_path))

    assert out["migrated_rows"] == 6
    assert out["validation"]["ok"] is True
    assert all(d["match"] and d["value_match"]
               for d in out["validation"]["days"].values())
    assert out["days"] == ["2019-06-01", "2019-06-02"]
    assert out["by_status"] == {"completed": [3, 47.75],
                                "cancelled": [2, 12.0],
                                "NULL": [1, 9.5]}
    # export rebuilds the enum dictionary sorted (ids may differ from
    # the legacy dictionary; the CASES round-trip, which is what joins
    # and filters see)
    assert out["exported_enums"] == ["cancelled", "completed"]
    assert out["roundtrip_equal"] is True


def test_continuous_crawl_walkthrough_golden(spark, tmp_path):
    """examples/run_continuous_crawl.py is deterministic: three crawl
    days over the documents corpus produce exactly this acceptance log
    — day 2's 56 re-crawled pages are all flagged against history plus
    12 organic near-dups, and compaction leaves n_bands rows per
    retained doc."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_continuous_crawl",
        os.path.join(os.path.dirname(HERE), "examples",
                     "run_continuous_crawl.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.run(spark, str(tmp_path))

    assert out["days"] == [
        {"day": 0, "crawled": 167, "after_exact": 167,
         "after_quality": 167, "near_dup_of_history": 0,
         "accepted": 167},
        {"day": 1, "crawled": 167, "after_exact": 167,
         "after_quality": 167, "near_dup_of_history": 5,
         "accepted": 162},
        {"day": 2, "crawled": 222, "after_exact": 222,
         "after_quality": 222, "near_dup_of_history": 68,
         "accepted": 154},
    ]
    assert out["corpus_size"] == 483
    assert out["expired"] == 48
    assert out["store_rows_after_compaction"] == (483 - 48) * 4
