"""Broker-style result merging — combining nested AQL results computed
independently (e.g. on separate clusters or time slices) into one.

Reference: broker/result_merge.go (resultMergeContext.run), driven by the
broker's agg-aware plan (broker/query_plan_agg.go): datanode partial
results merge pairwise per the query's aggregate type. Inside ONE Spark
cluster this never runs — the shuffle does it — but the surface matters
for the cross-cluster / incremental case the broker served, and the
merge rules are pinned by the reference's own result_merge_test.go.

Rules (result_merge.go:77-141):
  - count / sum: numeric leaves add
  - min / max:   numeric leaves compare
  - avg:         lhs is the SUM result, rhs the COUNT result — leaves
                 divide (the broker's avg plan merges a sum subtree and
                 a count subtree, then divides); a key present on only
                 one side is an error ("only sum" / "only count")
  - hll:         HLL sketch leaves merge (register-wise max)
  - maps merge recursively; a key missing on one side takes the present
    subtree (except avg); differing leaf/subtree types are an error
"""

from __future__ import annotations

from typing import Any

from aresdb_spark.functions.hll_wire import HLL

_NUMERIC_AGGS = ("count", "sum", "min", "max", "avg")


class ResultMergeError(ValueError):
    pass


def merge_aggregate_results(lhs: dict, rhs: dict, agg: str) -> dict:
    """Merge ``rhs`` into ``lhs`` in place and return ``lhs``.

    ``agg`` is the query's aggregate type: count | sum | min | max |
    avg | hll. For avg, call with (sum_result, count_result)."""
    agg = agg.lower()
    if agg not in (*_NUMERIC_AGGS, "hll"):
        raise ResultMergeError(f"unknown aggregate type {agg!r}")
    _merge(lhs, rhs, agg, [])
    return lhs


def _is_num(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _merge_leaf(l: Any, r: Any, agg: str, path: list[str]) -> Any:
    if isinstance(l, HLL) or isinstance(r, HLL):
        if not (isinstance(l, HLL) and isinstance(r, HLL)):
            raise ResultMergeError(
                f"error merging: different type lhs: {type(l).__name__} "
                f"vs. rhs: {type(r).__name__} at {path}")
        if agg != "hll":
            raise ResultMergeError(
                f"HLL value found for non-hll aggregation at {path}")
        l.merge(r)
        return l
    if agg == "hll":
        raise ResultMergeError(
            f"non-HLL leaf {type(l).__name__} under hll aggregation "
            f"at {path}")
    if not _is_num(l) or not _is_num(r):
        raise ResultMergeError(
            f"unmergeable leaf type {type(l).__name__}/{type(r).__name__} "
            f"at {path}")
    if agg in ("count", "sum"):
        return l + r
    if agg == "max":
        return max(l, r)
    if agg == "min":
        return min(l, r)
    # avg: lhs subtree carries sums, rhs carries counts
    return l / r


def _merge(l: dict, r: dict, agg: str, path: list[str]) -> None:
    for k in list(l):
        lv, rv = l[k], r.get(k)
        # a missing key and a JSON-null leaf are the same case, exactly
        # as in Go where r[k] of an absent key IS nil
        # (result_merge.go:47-66): the non-nil side wins, avg errors
        if rv is None:
            if agg == "avg":
                raise ResultMergeError(
                    f"error calculating avg: some dimension has only sum. "
                    f"path: {path + [k]}")
            continue  # keep lhs subtree
        if lv is None:
            if agg == "avg":
                raise ResultMergeError(
                    f"error calculating avg: some dimension has only "
                    f"count. path: {path + [k]}")
            l[k] = rv
            continue
        if isinstance(lv, dict) != isinstance(rv, dict):
            raise ResultMergeError(
                f"error merging: different type lhs: {type(lv).__name__} "
                f"vs. rhs: {type(rv).__name__} at {path + [k]}")
        if isinstance(lv, dict):
            _merge(lv, rv, agg, path + [k])
        else:
            l[k] = _merge_leaf(lv, rv, agg, path + [k])
    for k in r:
        if k not in l:
            if agg == "avg":
                raise ResultMergeError(
                    f"error calculating avg: some dimension has only "
                    f"count. path: {path + [k]}")
            l[k] = r[k]


def merge_matrix_results(results: list[dict],
                         limit: int | None = None) -> dict:
    """The broker's NON-aggregate gather (broker/query_plan_non_agg.go:
    164-309): datanode row streams append in order with a running
    rows-wanted budget (getRowsWanted = limit - flushed); headers must
    agree across nodes."""
    if not results:
        return {"headers": [], "matrixData": []}
    headers = results[0]["headers"]
    rows: list = []
    for res in results:
        if res["headers"] != headers:
            raise ResultMergeError(
                f"error merging: header mismatch {res['headers']} "
                f"vs {headers}")
        if limit is not None and len(rows) >= limit:
            break
        want = None if limit is None else limit - len(rows)
        rows.extend(res["matrixData"][:want])
    return {"headers": headers, "matrixData": rows}
