"""Property-based checks for the as-of and range joins (hypothesis).

Both operators are compared against a direct pure-Python transcription of
their declared semantics on small random inputs — independent of the
DuckDB oracle used elsewhere, so implementation and oracle can't share a
blind spot.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aresdb_spark.operators.joins import asof_join
from aresdb_spark.operators.range_join import range_join

keys = st.integers(min_value=0, max_value=2)
times = st.integers(min_value=0, max_value=20)
vals = st.integers(min_value=-99, max_value=99)

_settings = settings(max_examples=12, deadline=None,
                     suppress_health_check=[HealthCheck.function_scoped_fixture])


@_settings
@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=8),
    right=st.lists(st.tuples(keys, times, vals), max_size=8,
                   unique_by=lambda r: (r[0], r[1])),
    strict=st.booleans(),
    forward=st.booleans(),
)
def test_asof_join_matches_model(spark, left, right, strict, forward):
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], ["lid", "k", "t"])
    rdf = spark.createDataFrame(right, ["k", "t", "v"]) if right else \
        spark.createDataFrame([], "k int, t int, v int")
    got = {r["lid"]: r["v"] for r in asof_join(
        ldf, rdf, on="t", by=["k"], strict=strict,
        direction="forward" if forward else "backward").collect()}

    def model(k, t):
        if forward:
            cand = [(rt, rv) for rk, rt, rv in right
                    if rk == k and (rt > t if strict else rt >= t)]
            return min(cand)[1] if cand else None
        cand = [(rt, rv) for rk, rt, rv in right
                if rk == k and (rt < t if strict else rt <= t)]
        return max(cand)[1] if cand else None

    assert got == {i: model(k, t) for i, (k, t) in enumerate(left)}


@_settings
@given(
    left=st.lists(st.tuples(st.integers(0, 30)), min_size=1, max_size=8),
    right=st.lists(st.tuples(st.integers(0, 30), st.integers(0, 10)),
                   max_size=6),
    width=st.integers(min_value=1, max_value=7),
)
def test_range_join_matches_model(spark, left, right, width):
    ldf = spark.createDataFrame(
        [(i, x) for i, (x,) in enumerate(left)], ["pid", "x"])
    intervals = [(j, lo, lo + ln) for j, (lo, ln) in enumerate(right)]
    rdf = spark.createDataFrame(intervals, ["rid", "lo", "hi"]) if intervals \
        else spark.createDataFrame([], "rid int, lo int, hi int")
    got = sorted((r["pid"], r["rid"]) for r in range_join(
        ldf, rdf, "x", "lo", "hi", bucket_width=width).collect())
    want = sorted((i, j) for i, (x,) in enumerate(left)
                  for j, lo, hi in intervals if lo <= x <= hi)
    assert got == want
