"""Local mirror of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 next to its
``oracle_sql()`` DuckDB twin and reports row-count / schema / value
matches (columns sorted by name, rows sorted, exact equality).

Usage: python scripts/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

# Approximate queries with no exact oracle still get a BOUNDED check: the
# estimate must sit within rtol of the exact answer computed by DuckDB,
# joined on the key columns. hll() is Spark approx_count_distinct
# (HLL++, default rsd=0.05); 3x the rsd is a generous-but-meaningful
# 3-sigma band. (The driver's row for these stays rows-only.)
def _pq_recall_oracle():
    from __spark_entry__ import QUERY_VEC
    from aresdb_spark.operators.similarity import l2_topk_oracle_sql
    return l2_topk_oracle_sql(QUERY_VEC, k=50)


BOUNDED = {
    "hll_approx_distinct": {
        "oracle": "SELECT event_type AS et, count(DISTINCT user_id) AS n "
                  "FROM events GROUP BY 1",
        "key": "et", "est": "approx_users", "rtol": 0.15,
    },
    # the binary-envelope round-trip serves the same estimates through
    # the reference-exact register pipeline + wire codec; same band
    "hll_result_envelope": {
        "oracle": "SELECT event_type AS et, count(DISTINCT user_id) AS n "
                  "FROM events GROUP BY 1",
        "key": "et", "est": "approx_users", "rtol": 0.15,
    },
    # per-shard register trees merged through the broker algebra then
    # computed once — registers merge exactly, so the same band holds
    "hll_sharded_distinct": {
        "oracle": "SELECT event_type AS et, count(DISTINCT user_id) AS n "
                  "FROM events GROUP BY 1",
        "key": "et", "est": "approx_users", "rtol": 0.15,
    },
    # IVF-PQ is deterministic given the committed constants (md5-sampled
    # k-means training), so recall@(10, exact-50) is a stable number, not
    # a flake source. Ground truth is exact squared-L2 (what ADC
    # approximates). Measured 6/10 at sf0.01; random picks from the
    # 500-vector corpus would expect 1/10 — the floor of 3 separates
    # "working quantizer" from "broken" with a wide margin either side.
    # r15 (VERDICT r14 directive 4): floor 3 → 8 now that ivf_pq_topk
    # re-ranks its top rerank*k ADC candidates with exact squared L2
    # (measured at sf0.01: 6/10 → 10/10 hits in the exact top-50)
    "sim_ivf_pq_topk": {
        "kind": "recall", "oracle": _pq_recall_oracle,
        "id": "vec_id", "min_hits": 8,
    },
}


def norm_rows(cols, rows):
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def nv(v):
        # Deliberately STRICTER than value equality: DuckDB HUGEINT/DECIMAL
        # results surface as Decimal and TIMESTAMPTZ as tz-aware datetime;
        # the driver's compare does not normalize those away, so neither do
        # we — a type quirk must be fixed in the oracle SQL, not masked here.
        from datetime import date, datetime
        from decimal import Decimal
        if isinstance(v, Decimal):
            return f"DECIMAL({v})"
        if isinstance(v, datetime):
            if v.tzinfo is not None:
                return f"TZAWARE({v.isoformat()})"
            return v.isoformat()
        if isinstance(v, date):
            return v.isoformat()
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if v == int(v) and abs(v) < 2**53:
                return float(v)
            return v
        return v

    return sorted([tuple(nv(r[i]) for i in order) for r in rows],
                  key=lambda r: tuple(str(x) for x in r))


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from aresdb_spark.session import get_spark

    spark = get_spark(app_name="contract-check", cpus=8, shuffle_partitions=8)
    duck = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    ran = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        ran += 1
        try:
            df = fn(spark, SF_DIR)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            spec = BOUNDED.get(name)
            if spec is None:
                print(f"ok    {name}: rows={len(srows)} (no oracle, rows-only)")
                continue
            if spec.get("kind") == "recall":
                exact_ids = {r[0] for r in
                             duck.execute(spec["oracle"]()).fetchall()}
                ii = scols.index(spec["id"])
                hits = sum(1 for r in srows if r[ii] in exact_ids)
                if hits < spec["min_hits"]:
                    failures.append(name)
                    print(f"FAIL  {name}: recall check: {hits}/{len(srows)} "
                          f"ids in the exact top-{len(exact_ids)} "
                          f"(floor {spec['min_hits']})")
                else:
                    print(f"ok    {name}: rows={len(srows)} bounded recall "
                          f"({hits}/{len(srows)} in exact "
                          f"top-{len(exact_ids)}, floor {spec['min_hits']})")
                continue
            exact = dict(duck.execute(spec["oracle"]).fetchall())
            ki, ei = scols.index(spec["key"]), scols.index(spec["est"])
            got = {r[ki]: r[ei] for r in srows}
            bad = {k: (got.get(k), exact[k]) for k in exact
                   if got.get(k) is None
                   or abs(got[k] - exact[k]) > spec["rtol"] * max(exact[k], 1)}
            if set(got) != set(exact) or bad:
                failures.append(name)
                print(f"FAIL  {name}: bounded check rtol={spec['rtol']}: "
                      f"keys spark={sorted(got)} exact={sorted(exact)}; "
                      f"out-of-band={bad}")
            else:
                print(f"ok    {name}: rows={len(srows)} bounded "
                      f"(rtol={spec['rtol']}, {len(exact)} groups)")
            continue
        try:
            res = duck.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
        if not problems:
            a, b = norm_rows(scols, srows), norm_rows(dcols, drows)
            ndiff = sum(1 for x, y in zip(a, b) if x != y)
            if ndiff:
                first = next((x, y) for x, y in zip(a, b) if x != y)
                problems.append(f"values: {ndiff}/{len(a)} rows differ; first: {first}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: rows={len(srows)} hash-match")

    print(f"\n{ran - len(failures)}/{ran} queries pass ({len(qs)} registered)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
