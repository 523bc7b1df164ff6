"""Broker-style nested-result merge, pinned by the reference's own
broker/result_merge_test.go cases (sum/count add, min/max compare, avg
divides a sum tree by a count tree and errors on shape mismatch, maps
union recursively, type mismatches error)."""

import pytest
from pyspark.sql import functions as F

from aresdb_spark.aql.merge import ResultMergeError, merge_aggregate_results


def test_sum_same_shape():  # result_merge_test.go:27
    got = merge_aggregate_results(
        {"1234": {"foo": 123, "bar": 2}},
        {"1234": {"foo": 1, "bar": 1}}, "sum")
    assert got == {"1234": {"foo": 124, "bar": 3}}
    assert merge_aggregate_results({}, {}, "sum") == {}


def test_sum_different_shape():  # :59 — missing keys take the other side
    got = merge_aggregate_results(
        {"1234": {"foo": 123}},
        {"1234": {"foo": 1, "bar": 1}}, "sum")
    assert got == {"1234": {"foo": 124, "bar": 1}}
    got = merge_aggregate_results(
        {"1234": {"foo": 1, "bar": 1}},
        {"5678": {"foo": 2}}, "count")
    assert got == {"1234": {"foo": 1, "bar": 1}, "5678": {"foo": 2}}


def test_min_max():  # :201, :288
    assert merge_aggregate_results(
        {"a": 3, "b": 9}, {"a": 5, "b": 2}, "max") == {"a": 5, "b": 9}
    assert merge_aggregate_results(
        {"a": 3, "b": 9}, {"a": 5, "b": 2}, "min") == {"a": 3, "b": 2}


def test_avg_divides_sum_by_count():  # :375
    got = merge_aggregate_results(
        {"1234": {"foo": 2, "bar": 1}},
        {"1234": {"foo": 1, "bar": 2}}, "avg")
    assert got == {"1234": {"foo": 2, "bar": 0.5}}
    assert merge_aggregate_results({}, {}, "avg") == {}


def test_avg_errors_on_shape_mismatch():  # :407
    with pytest.raises(ResultMergeError, match="error calculating avg"):
        merge_aggregate_results(
            {"1234": {"foo": 2}},
            {"1234": {"foo": 1, "bar": 1}}, "avg")
    with pytest.raises(ResultMergeError, match="error calculating avg"):
        merge_aggregate_results(
            {"1234": {"foo": 2, "bar": 1}},
            {"1234": {"foo": 1}}, "avg")


def test_type_mismatch_errors():
    with pytest.raises(ResultMergeError, match="different type"):
        merge_aggregate_results(
            {"a": {"x": 1}}, {"a": 2}, "sum")


def test_hll_leaves_merge():  # :448 — sketch leaves merge register-wise
    from aresdb_spark.functions.hll_wire import HLL

    l = HLL(sparse=[(1, 3), (2, 5)], non_zero=2)
    r = HLL(sparse=[(2, 7), (9, 1)], non_zero=2)
    got = merge_aggregate_results({"d": l}, {"d": r}, "hll")
    merged = got["d"]
    assert merged.convert_to_sparse()  # merge densifies; read back sparse
    assert dict(merged.sparse) == {1: 3, 2: 7, 9: 1}

    with pytest.raises(ResultMergeError, match="non-hll"):
        merge_aggregate_results({"d": HLL(sparse=[(1, 1)], non_zero=1)},
                                {"d": HLL(sparse=[], non_zero=0)}, "sum")


def test_end_to_end_two_slices_equal_whole(spark):
    """Splitting a query by time slice and broker-merging the two nested
    results equals running it over the whole window — the datanode
    scatter/gather identity the broker relies on."""
    from aresdb_spark.aql.api import execute_query

    def q(frm, to):
        return execute_query(spark, "/root/testdata/sf0.001", {
            "table": "events",
            "measures": [{"alias": "v", "sqlExpression": "count(*)"}],
            "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
            "timeFilter": {"column": "ts", "from": frm, "to": to}})

    whole = q("2024-01-10", "2024-01-17")
    left, right = q("2024-01-10", "2024-01-13"), q("2024-01-14", "2024-01-17")
    assert merge_aggregate_results(left, right, "count") == whole


def test_matrix_merge_appends_with_running_limit():
    a = {"headers": ["x", "y"], "matrixData": [["1", "a"], ["2", "b"]]}
    b = {"headers": ["x", "y"], "matrixData": [["3", "c"], ["4", "d"]]}
    from aresdb_spark.aql.merge import merge_matrix_results

    got = merge_matrix_results([a, b], limit=3)
    assert got == {"headers": ["x", "y"],
                   "matrixData": [["1", "a"], ["2", "b"], ["3", "c"]]}
    assert merge_matrix_results([a, b])["matrixData"] == \
        a["matrixData"] + b["matrixData"]
    assert merge_matrix_results([]) == {"headers": [], "matrixData": []}

    with pytest.raises(ResultMergeError, match="header mismatch"):
        merge_matrix_results([a, {"headers": ["z"], "matrixData": []}])


def test_review_fixes_merge_edge_cases():
    """Regression pins for review findings: hll over numeric leaves
    errors (no silent division), numeric-vs-HLL leaves are a type error,
    and a JSON-null leaf behaves like a missing key on either side (the
    Go nil convention), erroring only under avg."""
    from aresdb_spark.functions.hll_wire import HLL

    with pytest.raises(ResultMergeError, match="non-HLL leaf"):
        merge_aggregate_results({"a": 10}, {"a": 5}, "hll")
    with pytest.raises(ResultMergeError, match="different type"):
        merge_aggregate_results({"a": 10},
                                {"a": HLL(sparse=[], non_zero=0)}, "sum")
    # null leaf on either side: present side wins under sum
    assert merge_aggregate_results({"a": None}, {"a": 3}, "sum") == {"a": 3}
    assert merge_aggregate_results({"a": 3}, {"a": None}, "sum") == {"a": 3}
    with pytest.raises(ResultMergeError, match="only count"):
        merge_aggregate_results({"a": None}, {"a": 3}, "avg")


def test_execute_query_sharded_scatter_gather_identity(spark, tmp_path):
    """execute_query_sharded over a 2-way row split of events equals the
    single-store result for every broker merge rule — count, sum, min,
    max, the two-phase avg plan, and hll (register trees merge
    sketch-wise, so the estimate is EXACTLY the whole-corpus estimate,
    not an average of partials)."""
    from pyspark.sql import functions as F

    from aresdb_spark.aql.api import execute_query, execute_query_sharded

    whole_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{whole_dir}/events.parquet")
    for i in (0, 1):
        (ev.filter(F.col("event_id") % 2 == i).write.mode("overwrite")
         .parquet(str(tmp_path / f"shard{i}" / "events.parquet")))
    shards = [str(tmp_path / "shard0"), str(tmp_path / "shard1")]

    def q(measure):
        return {"table": "events",
                "measures": [{"alias": "v", "sqlExpression": measure}],
                "dimensions": [{"alias": "et", "sqlExpression": "event_type"}]}

    for m in ("count(*)", "sum(value)", "min(value)", "max(value)",
              "avg(value)", "hll(user_id)"):
        got = execute_query_sharded(spark, shards, q(m))
        want = execute_query(spark, whole_dir, q(m))
        if m in ("sum(value)", "avg(value)"):
            # float sums depend on addition order (shard partials add in
            # a different order than one whole-table fold) — identical
            # to ~1e-9 relative; avg follows the broker's two-phase
            # plan: merged sums / merged ROW counts
            assert set(got) == set(want)
            for k in want:
                assert abs(got[k] - want[k]) <= 1e-9 * max(abs(want[k]), 1), \
                    (k, got[k], want[k])
        else:
            # count/min/max and hll (register-exact merge) are identical
            assert got == want, (m, got, want)


def test_execute_query_sharded_non_agg_gather(spark, tmp_path):
    """The broker's non-agg plan through the sharded executor: per-shard
    row streams append in shard order under the running limit
    (query_plan_non_agg.go getRowsWanted), headers identical."""
    from pyspark.sql import functions as F

    from aresdb_spark.aql.api import execute_query_sharded

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for i in (0, 1):
        (ev.filter(F.col("event_id") % 2 == i).write.mode("overwrite")
         .parquet(str(tmp_path / f"shard{i}" / "events.parquet")))
    shards = [str(tmp_path / "shard0"), str(tmp_path / "shard1")]

    got = execute_query_sharded(spark, shards, {
        "table": "events",
        "measures": [{"sqlExpression": "1"}],
        "dimensions": [{"alias": "event_id", "sqlExpression": "event_id"}],
        "sorts": [{"sqlExpression": "event_id"}],
        "limit": 7})
    assert got["headers"] == ["event_id"]
    assert len(got["matrixData"]) == 7
    ids = [int(r[0]) for r in got["matrixData"]]
    # the first shard (even ids) fills the whole budget before shard 1
    assert all(i % 2 == 0 for i in ids) and ids == sorted(ids)


def test_sharded_avg_null_skipping_matches_single_store(spark, tmp_path):
    """Sharded avg must equal single-store Spark avg when the measure
    column holds NULLs: the count scatter counts NON-NULL rows, not all
    rows (review r6 fix — sum/rowcount would silently shift the mean)."""
    from aresdb_spark.aql.api import execute_query, execute_query_sharded

    rows = [(i, "a" if i % 2 else "b",
             None if i % 3 == 0 else float(i)) for i in range(20)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, "
                                     "value double")
    for i in (0, 1):
        (ev.filter(F.col("event_id") % 2 == i).write.mode("overwrite")
         .parquet(str(tmp_path / f"s{i}" / "events.parquet")))
    q = {"table": "events",
         "measures": [{"alias": "v", "sqlExpression": "avg(value)"}],
         "dimensions": [{"alias": "et", "sqlExpression": "event_type"}]}
    got = execute_query_sharded(
        spark, [str(tmp_path / "s0"), str(tmp_path / "s1")], q)
    whole = str(tmp_path / "whole")
    ev.write.parquet(f"{whole}/events.parquet")
    want = execute_query(spark, whole, q)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), (k, got, want)


def test_sharded_agg_ignores_per_shard_limit(spark, tmp_path):
    """A limit on an aggregate query must NOT truncate per-shard group
    sets before the merge (partial sums would be silently wrong); the
    scatter strips it and merges full partials."""
    from aresdb_spark.aql.api import execute_query_sharded

    rows = [(i, f"g{i % 10}", 1.0) for i in range(100)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, "
                                     "value double")
    for i in (0, 1):
        (ev.filter(F.col("event_id") % 2 == i).write.mode("overwrite")
         .parquet(str(tmp_path / f"s{i}" / "events.parquet")))
    got = execute_query_sharded(
        spark, [str(tmp_path / "s0"), str(tmp_path / "s1")], {
            "table": "events",
            "measures": [{"alias": "v", "sqlExpression": "count(*)"}],
            "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
            "limit": 3})
    assert got == {f"g{i}": 10 for i in range(10)}


def test_sharded_hll_measure_filter_and_time_keys(spark, tmp_path):
    """The hll scatter honors measure-level row filters and formats dim
    keys through the same pipeline as execute_query (epoch-derived
    bucket keys, not str(datetime)) — merged trees compute to the same
    dict as the single store."""
    from aresdb_spark.aql.api import execute_query, execute_query_sharded

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for i in (0, 1):
        (ev.filter(F.col("event_id") % 2 == i).write.mode("overwrite")
         .parquet(str(tmp_path / f"s{i}" / "events.parquet")))
    q = {"table": "events",
         "measures": [{"alias": "v", "sqlExpression": "hll(user_id)",
                       "rowFilters": ["event_type = 'click'"]}],
         "dimensions": [{"alias": "d", "sqlExpression": "ts",
                         "timeBucketizer": "d"}]}
    got = execute_query_sharded(
        spark, [str(tmp_path / "s0"), str(tmp_path / "s1")], q)
    want = execute_query(spark, "/root/testdata/sf0.001", q)
    assert got == want
