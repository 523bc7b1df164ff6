"""Benchmark harness — BASELINE.md §3 query set + LLM-pipeline headliners.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "sf1": {"queries": {...}, "ratio_x10": {...}}}

Each query gets one untimed warmup pass (JIT/codegen/scan cache); the
headline numbers are the median of 3 timed passes (full execution forced
with collect()).

The ``sf1`` section is the scale-stress tier (VERDICT r4 #5): the
shuffle-heavy iterative queries (minhash, both CC variants, as-of join)
re-run on a 10x scale-up of the base dir's documents+events, and
``ratio_x10`` reports t(10x)/t(1x) per query — super-linear growth that
local[32] at sf0.1 hides shows up here as a ratio well above 10.
Disable with SPARK_GRAFT_SF1=0.

The ``sf100`` section (r11, VERDICT r10 directive 3) adds a second
decade for the claims that matter at scale: the 8 scan-class headliners
re-timed at a 100x tier, store resolve over a 5M-row hot base, and the
q7/q15 per-unit probes whose units (µs/candidate, pair_µs) must stay
flat-to-falling. Probes are time-boxed (SPARK_GRAFT_X100_BOX, default
240 s per warmup) and skips are LOGGED in ``sf100.skipped``; the
per-unit numbers re-emit in ``tail_summary.x100_units`` so the graded
line tail always carries them. Disable with SPARK_GRAFT_SF100=0.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF1_ENABLED = os.environ.get("SPARK_GRAFT_SF1", "1") != "0"
# the tier is DERIVED from SF_DIR — key the default cache dir by the
# base sf name so a run at another scale never reuses a stale tier
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".benchdata",
    "sf1_from_" + os.path.basename(SF_DIR.rstrip("/")))
# x100 tier (VERDICT r10 directive 3): a second decade for the claims
# that matter at scale — headline scans, store-resolve vs base size,
# q7/q15 per-unit costs. Same construction as the 10x tier, 100 copies.
SF100_ENABLED = os.environ.get("SPARK_GRAFT_SF100", "1") != "0"
SF100_DIR = os.environ.get("SPARK_GRAFT_SF100_DIR") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".benchdata",
    "sf100_from_" + os.path.basename(SF_DIR.rstrip("/")))
# per-probe wall-clock box for the x100 tier: a probe whose WARMUP
# exceeds this is skipped AND the skip is logged in the payload
# (no silent caps — VERDICT r10 directive 3)
TIME_BOX_SEC = float(os.environ.get("SPARK_GRAFT_X100_BOX", "240"))


# Generation-spec version of the sf1 stress tier (VERDICT r7 #4: q7's
# 10x ratio moved 2.25 -> 3.04 purely across a tier REBUILD, so ratio
# drift must be attributable to code, not data). Bump this when the
# tier's content rules change; a cached tier with a different spec
# re-materializes, and the payload carries spec + content fingerprint
# so BENCH_r{N}.json files are comparable across rounds iff these match.
SF1_SPEC = 1


def _sf1_fingerprint(out_dir: str, spec: int = SF1_SPEC) -> dict:
    """Content fingerprint of a materialized tier: per-table row counts
    + byte sizes (parquet footers/stat — no Spark job), hashed with the
    spec version. Deterministic generation (no RNG anywhere in
    _ensure_sf1) means equal fingerprints ⇒ comparable ratios."""
    import hashlib
    import json as _json

    import pyarrow.dataset as pads

    tables = {}
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".parquet"):
            continue
        d = os.path.join(out_dir, name)
        tables[name[:-8]] = {
            "rows": pads.dataset(d).count_rows(),
            "bytes": sum(e.stat().st_size for e in os.scandir(d)
                         if e.is_file()),
        }
    digest = hashlib.md5(_json.dumps(
        {"spec": spec, "tables": tables},
        sort_keys=True).encode()).hexdigest()[:16]
    return {"spec": spec, "fingerprint": digest, "tables": tables}


def _ensure_sf1(spark, src_dir: str, out_dir: str,
                n_copies: int = 10) -> dict:
    """Materialize the 10x tier once: union 10 copies of documents/events
    with disjoint id spaces. Document text is Caesar-rotated per copy (a
    bijection on words), so intra-copy Jaccard — and therefore the
    duplicate-pair structure the minhash/CC queries chew on — is
    preserved exactly while cross-copy docs share ~no shingles; events
    shift user/event ids so per-user as-of density is unchanged.
    Returns the tier's {spec, fingerprint, tables} metadata.

    ``n_copies=100`` builds the x100 tier with the SAME rules (r11,
    VERDICT r10 directive 3). Note the rotation alphabet cycles at 26:
    at x100 each document has 3-4 identical-text twins (copies k,
    k+26, ...), a DETERMINISTIC extra duplicate structure the
    fingerprint pins — per-unit costs (µs/candidate, pair_µs) stay the
    honest scale signal there, not raw pair counts."""
    import json as _json

    from pyspark.sql import functions as F

    done = os.path.join(out_dir, "_DONE")
    meta_path = os.path.join(out_dir, "_META.json")
    # the marker alone is not enough: a tier built under an older
    # generation spec (or before the newest table joined the stress
    # set) must re-materialize, or cross-round ratios silently compare
    # different data
    if os.path.exists(done) and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = _json.load(f)
        if meta.get("spec") == SF1_SPEC:
            return meta
    if n_copies == 10 and os.path.exists(done) \
            and not os.path.exists(meta_path) and \
            os.path.exists(os.path.join(out_dir, "embeddings.parquet")) and \
            os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        # complete tier from BEFORE fingerprinting existed (no _META at
        # all): generation is deterministic and spec 1 IS the r7 content
        # rule set, so backfill the metadata instead of rebuilding
        # identical data. A tier WITH a meta file under an older spec
        # must NOT take this branch — re-stamping stale data with the
        # new spec would fake comparability; it falls through to the
        # rebuild.
        meta = _sf1_fingerprint(out_dir)
        with open(meta_path, "w") as f:
            _json.dump(meta, f)
        return meta
    alpha = "abcdefghijklmnopqrstuvwxyz"
    ev = spark.read.parquet(f"{src_dir}/events.parquet")
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    evs, ds = [], []
    for k in range(n_copies):
        off = F.lit(k * 10_000_000)
        evs.append(ev.select(
            (F.col("event_id") + off).alias("event_id"), "ts",
            (F.col("user_id") + off).alias("user_id"),
            "event_type", "value", "props"))
        # k % 26: a 26-letter alphabet has 26 distinct rotations; the
        # naive alpha[k:] would silently become the IDENTITY for every
        # k >= 26 (alpha[26:] == ""), giving each doc ~75 identical
        # twins at x100 instead of the documented 3-4
        rot = alpha[k % 26:] + alpha[:k % 26]
        text = F.col("text") if k == 0 else \
            F.translate(F.translate("text", alpha, rot),
                        alpha.upper(), rot.upper())
        ds.append(docs.select(
            (F.col("doc_id") + off).alias("doc_id"), text.alias("text"),
            "lang", "source", "n_chars"))
    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    es = [emb.select((F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                     "embedding", "label")
          for k in range(n_copies)]
    # lineitem ⋈ part (q3's join class): shift BOTH sides' partkeys by
    # the same offset so per-part join fan-out — and therefore the
    # broadcast-join work profile — is preserved exactly at 10x
    li = spark.read.parquet(f"{src_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{src_dir}/part.parquet")
    lis, pts = [], []
    for k in range(n_copies):
        off = F.lit(k * 10_000_000)
        lis.append(li.select(
            (F.col("l_orderkey") + off).alias("l_orderkey"),
            (F.col("l_partkey") + off).alias("l_partkey"),
            "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_returnflag", "l_linestatus",
            "l_shipdate"))
        pts.append(pt.select(
            (F.col("p_partkey") + off).alias("p_partkey"),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    import functools
    functools.reduce(lambda a, b: a.unionByName(b), evs) \
        .write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    functools.reduce(lambda a, b: a.unionByName(b), ds) \
        .write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    functools.reduce(lambda a, b: a.unionByName(b), es) \
        .write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    functools.reduce(lambda a, b: a.unionByName(b), lis) \
        .write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    functools.reduce(lambda a, b: a.unionByName(b), pts) \
        .write.mode("overwrite").parquet(f"{out_dir}/part.parquet")
    meta = _sf1_fingerprint(out_dir)
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    open(done, "w").close()
    return meta


def _queries():
    """name → (spark, sf_dir) → DataFrame. q1-q6 mirror BASELINE.md §3."""
    from pyspark.sql import functions as F

    from aresdb_spark.aql import Dimension, Join, Measure, Query, SortField
    from aresdb_spark.aql.planner import plan_query

    def aql(q):
        return lambda spark, sf: plan_query(spark, sf, q)

    out = {}
    # 1. count(*) filtered + hourly bucket (total_trips.aql shape)
    out["q1_count_hourly"] = aql(Query(
        table="events",
        dimensions=[Dimension(expr="ts", time_bucketizer="hour", alias="bucket")],
        measures=[Measure(expr="count(*)", alias="cnt")],
        filters=["event_type = 'click'"]))
    # 2. sum(measure) with measure-level row filter (total_fare.aql shape)
    out["q2_sum_measure_filter"] = aql(Query(
        table="events",
        dimensions=[Dimension(expr="event_type", alias="et")],
        measures=[Measure(expr="sum(value)", filters=["value > 50"], alias="s")]))
    # 3. dim join + group by dim attribute (trips ⋈ cities pattern)
    out["q3_dim_join"] = aql(Query(
        table="lineitem",
        joins=[Join(table="part", alias="p", conditions=["p.p_partkey = l_partkey"])],
        dimensions=[Dimension(expr="p.p_brand", alias="brand")],
        measures=[Measure(expr="sum(l_quantity)", alias="qty")]))
    # 4. approx distinct (hll) on a key column
    out["q4_hll_distinct"] = aql(Query(
        table="events",
        dimensions=[Dimension(expr="event_type", alias="et")],
        measures=[Measure(expr="hll(user_id)", alias="users")]))
    # 5. non-aggregate projection with LIMIT
    out["q5_non_agg_limit"] = aql(Query(
        table="events",
        dimensions=[Dimension(expr="event_id", alias="event_id"),
                    Dimension(expr="event_type", alias="event_type"),
                    Dimension(expr="value", alias="value")],
        measures=[Measure(expr="1")],
        sorts=[SortField("event_id")],
        limit=1000))
    # 6. array predicates: length / element_at over the embedding column
    out["q6_array_predicates"] = aql(Query(
        table="embeddings",
        measures=[Measure(expr="count(*)", alias="cnt")],
        filters=["length(embedding) = 64", "element_at(embedding, 1) > 0"]))

    # LLM-pipeline headliners (SURVEY §2 extensions)
    def q7(spark, sf):
        from aresdb_spark.operators.dedup import minhash_near_duplicates
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return minhash_near_duplicates(docs, threshold=0.5)

    def q8(spark, sf):
        from aresdb_spark.operators.text import text_stats
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return text_stats(docs).select(
            F.count("*").alias("n"), F.sum("n_tokens").alias("toks"),
            F.sum("quality").alias("q"))

    def q9(spark, sf):
        from aresdb_spark.operators.similarity import brute_force_topk
        qv = [((i * 37 + 11) % 29 - 14) / 14.0 for i in range(64)]
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        return brute_force_topk(emb, qv, k=10)

    def q10(spark, sf):
        from aresdb_spark.catalog import Catalog
        from aresdb_spark.streaming.windows import session
        ev = Catalog(sf).load(spark, "events")
        return session(ev, "ts", "30 minutes", keys=["user_id"],
                       aggs=[F.count("*").alias("cnt")]) \
            .groupBy().agg(F.count("*").alias("n_sessions"),
                           F.sum("cnt").alias("n_events"))

    def q11(spark, sf):
        from aresdb_spark.operators.similarity import ivf_topk
        qv = [((i * 37 + 11) % 29 - 14) / 14.0 for i in range(64)]
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        return ivf_topk(emb, qv, k=10, nprobe=2)

    def q12(spark, sf):
        from aresdb_spark.operators.dedup import duplicate_clusters
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return duplicate_clusters(docs, threshold=0.5) \
            .groupBy().agg(F.count_distinct("cluster_id").alias("n_clusters"))

    def q13(spark, sf):
        from aresdb_spark.catalog import Catalog
        from aresdb_spark.operators.joins import asof_join
        ev = Catalog(sf).load(spark, "events")
        left = ev.filter(F.col("event_type") != "click")
        right = (ev.filter(F.col("event_type") == "click")
                 .select("user_id", "ts", F.col("value").alias("cv")))
        return asof_join(left, right, on="ts", by=["user_id"],
                         value_cols=["cv"]) \
            .groupBy().agg(F.count("*").alias("n"),
                           F.round(F.sum("cv"), 2).alias("s"))

    def q14(spark, sf):
        from aresdb_spark.operators.chunking import pack_text
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return pack_text(docs, ctx_tokens=512, n_shards=32) \
            .groupBy().agg(F.count("*").alias("bins"),
                           F.sum("n_tokens").alias("toks"))

    out["q7_minhash_neardup"] = q7
    out["q8_text_stats"] = q8
    out["q9_cosine_topk"] = q9
    out["q10_session_window"] = q10
    out["q11_ivf_topk"] = q11
    out["q12_dedup_clusters"] = q12
    out["q13_asof_join"] = q13
    out["q14_pack_text"] = q14
    return out


def _stress_queries():
    """The shuffle-heavy iterative subset re-run at the 10x tier, plus the
    star-CC variant (not in the headline set — timed at both scales here
    so its ratio is measured too)."""
    from pyspark.sql import functions as F

    base = _queries()

    def q12s(spark, sf):
        from aresdb_spark.operators.dedup import duplicate_clusters
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return duplicate_clusters(docs, threshold=0.5, algorithm="star") \
            .groupBy().agg(F.count_distinct("cluster_id").alias("n_clusters"))

    def q15_sem(spark, sf):
        # bounded within-cluster self-join class (Σ cluster² cost model);
        # n_rows from the parquet footers (driver-side metadata, no Spark
        # job at plan time — VERDICT r6 #3). r12: adaptive k now routes
        # through the two_level assignment BY DEFAULT (VERDICT r11 #5 —
        # the flat argmax was the engine's last super-linear default);
        # this headline times the production default path.
        import pyarrow.dataset as pads

        from aresdb_spark.operators.similarity import semantic_dedup
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        n = pads.dataset(f"{sf}/embeddings.parquet").count_rows()
        return semantic_dedup(emb, threshold=0.4, n_rows=n) \
            .groupBy().agg(F.count("*").alias("n"),
                           F.sum(F.col("keep").cast("int")).alias("kept"))

    # incremental-dedup probe class: the signature store is built ONCE
    # per tier (on the warmup call — building is the accepted cost of
    # ingesting history); the timed passes measure the per-increment
    # probe, whose claim is "one store scan + broadcast join, never a
    # corpus re-mine" — the 10x ratio should track scan cost, not
    # re-shingling cost
    _sig_stores: dict = {}

    def q16_incremental(spark, sf):
        import tempfile

        from aresdb_spark.operators.dedup import (
            build_signature_store, incremental_near_duplicates)
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        if sf not in _sig_stores:
            path = tempfile.mkdtemp(prefix="bench_sigstore_") + "/store"
            build_signature_store(docs.filter(F.col("doc_id") % 3 == 0),
                                  path)
            _sig_stores[sf] = path
        probe = docs.filter(F.col("doc_id") % 31 == 1)
        return incremental_near_duplicates(spark, probe, _sig_stores[sf],
                                           threshold=0.5) \
            .groupBy().agg(F.count("*").alias("n"))

    # the continuous-crawl sink's cost unit (r7): a MICRO-BATCH-sized
    # probe with prune=True — the bucket filter should keep per-batch
    # cost tracking bucket size, not store size, so the 10x-store ratio
    # stays far below 10 (q16 measures the same store with a large
    # UNpruned batch probe for contrast: its claim is one full scan)
    def q17_pruned_probe(spark, sf):
        from aresdb_spark.operators.dedup import incremental_near_duplicates
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        if sf not in _sig_stores:  # shared store bootstrap (see q16)
            q16_incremental(spark, sf).collect()
        probe = docs.filter(F.col("doc_id").isin([1, 4, 7, 10, 13]))
        return incremental_near_duplicates(
            spark, probe, _sig_stores[sf], threshold=0.5, prune=True) \
            .groupBy().agg(F.count("*").alias("n"))

    # LM train+score class (in the driver window since r8): the scorers
    # persist the trained LM by plan, so the warmup pass pays training
    # at each scale and the timed passes measure the steady-state
    # scoring join over a cached LM — identically at 1x and 10x, so the
    # ratio is apples-to-apples for the scoring path (training cost
    # shows in the warmup, not the median)
    def q18_lm_score(spark, sf):
        from aresdb_spark.operators.text import lm_perplexity, train_bigram_lm
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        lm = train_bigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
        return lm_perplexity(docs.filter(F.col("doc_id") % 2 == 1), lm) \
            .groupBy().agg(F.count("*").alias("n"),
                           F.round(F.avg("ppl"), 2).alias("mean_ppl"))

    # ALL 14 headline queries run at both scales (VERDICT r6 #5: the
    # cheap scans are exactly where a hidden driver-side cost would
    # show as superlinear), plus the five non-headline stress classes
    out = dict(base)
    out["q12s_dedup_clusters_star"] = q12s
    out["q15_semantic_dedup"] = q15_sem   # within-cluster self-join class
    out["q16_incremental_dedup"] = q16_incremental  # store-probe class
    out["q17_pruned_micro_probe"] = q17_pruned_probe  # sink lookup class
    out["q18_lm_score"] = q18_lm_score    # LM scoring-join class (r8)
    return out


def _host_calibration(spark) -> dict:
    """Fixed-work probes timed at bench start (VERDICT r8 #5): the
    container's speed varies 2-3x across sessions (PERF_NOTES tracks
    same-HEAD totals spanning 7.5-12.7 s since r5), so absolute
    wall-clock comparisons across rounds adjudicate the HOST unless a
    calibration constant rides in the payload. Two probes, both fixed
    work (no data dependence):

      - ``numpy_matmul_sec``: single-core 1200x1200 float64 matmul —
        the pure-Python/numpy speed the wire codecs run at
      - ``spark_32task_sec``: one 32-task JVM job (xxhash64 over 6.4M
        longs) — task scheduling + whole-stage-codegen throughput

    Normalization rule (PERF_NOTES): comparing two rounds' totals,
    divide each by its run's probe time (same probe on both sides);
    the ratio of normalized totals is attributable to code. min of 3
    after a warmup pass, same methodology as the queries."""
    import numpy as np

    a = np.random.default_rng(0).random((1200, 1200))
    (a @ a).sum()                                   # warmup
    numpy_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        (a @ a).sum()
        numpy_times.append(time.perf_counter() - t0)

    from pyspark.sql import functions as F

    def spark_probe():
        # bit_xor: overflow-free fold of the per-row hashes (ANSI mode
        # rejects a long sum of xxhash64 outputs)
        return (spark.range(32 * 200_000).repartition(32)
                .select(F.expr("bit_xor(xxhash64(id))")).collect())

    spark_probe()                                   # warmup
    spark_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark_probe()
        spark_times.append(time.perf_counter() - t0)
    return {"numpy_matmul_sec": round(min(numpy_times), 4),
            "spark_32task_sec": round(min(spark_times), 4)}


def main():
    from aresdb_spark.session import get_spark

    spark = get_spark(app_name="aresdb-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        host_index = _host_calibration(spark)
    except Exception as e:   # calibration must never sink the bench
        host_index = {"error": str(e)}
    qs = _queries()

    times, mins = {}, {}
    for name, fn in qs.items():
        fn(spark, SF_DIR).collect()  # warmup (untimed)
        # median of 3 timed passes: a single pass is noise-sensitive on a
        # shared machine (round-3 recorded a 3x outlier that never reproduced)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            samples.append(time.perf_counter() - t0)
        times[name] = round(sorted(samples)[1], 4)
        mins[name] = round(min(samples), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    payload = {
        "metric": "aresdb_spark_bench_total",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        # the host's run-to-run variance band (PERF_NOTES.md records
        # same-HEAD session totals spanning 7.97-10.37s): min-of-passes
        # is the noise floor — compare THIS across rounds, not the
        # median headline alone (VERDICT r5 "What's wrong" #2)
        "variance": {
            "per_query_min": mins,
            "min_total": round(sum(mins.values()), 4),
        },
        # fixed-work host-speed probes (r9): normalize cross-round
        # totals by these before attributing drift to code — see
        # _host_calibration and the PERF_NOTES normalization rule
        "host_index": host_index,
    }

    if SF1_ENABLED:
        try:
            sf1_meta = _ensure_sf1(spark, SF_DIR, SF1_DIR)
            stress = _stress_queries()

            def timed_median(fn, d, n=3):
                fn(spark, d).collect()            # warmup
                samples = []
                for _ in range(n):
                    t0 = time.perf_counter()
                    fn(spark, d).collect()
                    samples.append(time.perf_counter() - t0)
                return round(sorted(samples)[n // 2], 4)

            t1, t10, ratio = {}, {}, {}
            for name, fn in stress.items():
                # base and 10x are timed BACK-TO-BACK per query, median
                # of 3 on both sides (VERDICT r5 #2: reusing the headline
                # medians measured minutes earlier mixed measurement
                # phases — on a host with a ±30% band that manufactured
                # impossible sub-1.0 ratios). Same warmup, same
                # methodology, adjacent in time ⇒ the ratio is
                # apples-to-apples.
                t1[name] = timed_median(fn, SF_DIR)
                t10[name] = timed_median(fn, SF1_DIR)
                ratio[name] = round(t10[name] / max(t1[name], 1e-9), 2)
            payload["sf1"] = {"dir": SF1_DIR, "scale_factor": 10,
                              # ratios are comparable across rounds iff
                              # spec+fingerprint match (tier pinning,
                              # VERDICT r7 #4)
                              "spec": sf1_meta["spec"],
                              "fingerprint": sf1_meta["fingerprint"],
                              "base_sec": t1, "queries": t10,
                              "ratio_x10": ratio}
            try:
                # q7 per-phase attribution (VERDICT r10 directive 4):
                # signature / band-shuffle / verify walls + candidate
                # counts at both scales, so any ratio drift names its
                # phase and normalizes per candidate
                payload["sf1"]["q7_phases"] = {
                    "base": _q7_phases(spark, SF_DIR),
                    "x10": _q7_phases(spark, SF1_DIR)}
            except Exception as e:
                payload["sf1"]["q7_phases"] = {"error": str(e)}
            try:
                # q15 attribution: within-cluster pair counts grow
                # LINEARLY with the corpus by design (fixed cluster
                # size), so the honest scale signal is per-pair cost,
                # not the wall ratio — r10 halved both walls and that
                # RAISES the quotient (fixed overhead stops hiding the
                # linear term at 1x)
                payload["sf1"]["q15_phases"] = {
                    "base": _q15_phases(spark, SF_DIR),
                    "x10": _q15_phases(spark, SF1_DIR)}
            except Exception as e:
                payload["sf1"]["q15_phases"] = {"error": str(e)}
            try:
                # q11 attribution (r12, VERDICT r11 #4): per-phase
                # walls + per-row assignment cost at both scales so
                # the +56% r11 wall band self-adjudicates
                payload["sf1"]["q11_phases"] = {
                    "base": _q11_phases(spark, SF_DIR),
                    "x10": _q11_phases(spark, SF1_DIR)}
            except Exception as e:
                payload["sf1"]["q11_phases"] = {"error": str(e)}
            try:
                # q12 attribution (VERDICT r10 directive 6): edge count,
                # CC round count and per-round walls at both scales, so
                # the quotient band self-adjudicates like q7/q15 — the
                # edge set is q7's verified pairs (linear by tier
                # design) and rounds are diameter-bounded
                payload["sf1"]["q12_phases"] = {
                    "base": _q12_phases(spark, SF_DIR),
                    "x10": _q12_phases(spark, SF1_DIR)}
            except Exception as e:
                payload["sf1"]["q12_phases"] = {"error": str(e)}
        except Exception as e:  # the stress tier must never sink the bench
            payload["sf1"] = {"error": str(e)}

    try:
        payload["ingest"] = _ingest_bench(spark)
    except Exception as e:  # informational tier — never sink the bench
        payload["ingest"] = {"error": str(e)}

    try:
        payload["codecs"] = _codec_bench(spark)
    except Exception as e:  # informational tier — never sink the bench
        payload["codecs"] = {"error": str(e)}

    try:
        payload["media_dedup"] = _media_dedup_bench(spark)
    except Exception as e:  # informational tier — never sink the bench
        payload["media_dedup"] = {"error": str(e)}

    try:
        payload["store_ops"] = _store_ops_bench(spark)
    except Exception as e:  # informational tier — never sink the bench
        payload["store_ops"] = {"error": str(e)}

    x100_units = None
    if SF100_ENABLED:
        try:
            ref = payload.get("store_ops", {})
            payload["sf100"] = _sf100_bench(
                spark, resolve_ref=ref.get("resolve_16_pending_sec")
                if isinstance(ref, dict) else None)
            x100_units = payload["sf100"].get("units")
        except Exception as e:  # x100 tier must never sink the bench
            payload["sf100"] = {"error": str(e)}

    # The driver's graded artifact keeps only the LINE TAIL: r9's
    # host_index sat early in the payload and was truncated out of
    # BENCH_r09, so cross-round totals were once again adjudicated by
    # host speed (VERDICT r10 directive 3). Re-emit the denominators as
    # the LAST keys so the kept tail always carries them; the r11 x100
    # per-unit costs (directive 3's "Done" numbers) ride here too.
    # min_total LEADS (VERDICT r12 directive 6): two rounds running the
    # driver's single-pass totals mis-signaled regressions that the
    # committed multi-pass evidence dispelled — min-of-passes is the
    # noise floor and the cross-round headline (protocol: PERF_NOTES.md)
    payload["tail_summary"] = {
        "min_total_sec": payload["variance"]["min_total"],
        "host_index": host_index,
        "x100_units": x100_units,
        "total_sec": payload["value"],
    }
    print(json.dumps(payload))
    # VERDICT r14 directive 6: the driver clips stdout to the line TAIL
    # and its parse of the kept fragment failed two rounds running
    # (BENCH_r13/r14 "parsed": null — the full payload line is longer
    # than the clip). Emit a compact (<1.5 kB) single-line summary as
    # the LAST stdout line so the clipped tail always ENDS with one
    # complete, parseable JSON line carrying the graded headline keys.
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": "sec",
        "sf": payload["sf"],
        "min_total_sec": payload["variance"]["min_total"],
        "queries": payload["queries"],
        "host_index": host_index,
        "x100_units": x100_units,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1400:  # hard budget: drop detail tiers, keep headline
        compact.pop("x100_units", None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1400:
        compact.pop("queries", None)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


def _q7_phases(spark, d):
    """Per-phase q7 minhash attribution (VERDICT r10 directive 4). Three
    cumulative probes, one warmup + one timed pass each:

      - signature_sec: scan-side signature compute only (the band
        hashes fold into one long per doc, global agg — no shuffle)
      - candidates_sec: the full candidate stage (signatures + the one
        (band,hash) shuffle + bucket pair expansion + distinct)
      - full_sec: candidates + the exact-Jaccard verify stage

    Differences attribute the stages; ``verify_us_per_candidate``
    normalizes the verify margin by the candidate-pair count, so a
    growing 10x ratio is distinguishable from a growing pair count."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators.dedup import (minhash_lsh_candidates,
                                              minhash_near_duplicates,
                                              minhash_signature)

    docs = spark.read.parquet(f"{d}/documents.parquet")

    def timed(fn):
        fn()
        t0 = time.perf_counter()
        r = fn()
        return time.perf_counter() - t0, r

    # r15 attribution fix: the old probe collected the SAME DataFrame
    # twice — Spark reuses the completed shuffle map stage on the
    # second action, so "signature_sec" measured a stage-skipped rerun
    # (0.02 s for a >1 s pass) and band_stage_sec absorbed the whole
    # signature cost. Rebuild the plan per call (fresh shuffle id ⇒ no
    # reuse); explode+sum forces every signature element with the
    # cheapest aggregation shape.
    def sig_probe():
        return (docs.select(F.explode(
            minhash_signature(F.col("text"))).alias("v"))
            .agg(F.sum("v")).collect())

    sig_sec, _ = timed(sig_probe)
    cand_sec, n_cand = timed(
        lambda: minhash_lsh_candidates(docs).count())
    full_sec, n_pairs = timed(
        lambda: minhash_near_duplicates(docs, threshold=0.5).count())
    return {
        "signature_sec": round(sig_sec, 4),
        "candidates_sec": round(cand_sec, 4),
        "full_sec": round(full_sec, 4),
        # clamped: the corrected signature probe (above) shows the
        # signature compute IS essentially the whole candidate stage
        # (md5 shingle hashing; the banding margin is near zero and
        # probe-shape overhead can push the raw difference negative)
        "band_stage_sec": round(max(cand_sec - sig_sec, 0.0), 4),
        "verify_stage_sec": round(full_sec - cand_sec, 4),
        "candidate_pairs": n_cand,
        "verified_pairs": n_pairs,
        "verify_us_per_candidate": round(
            1e6 * max(full_sec - cand_sec, 0.0) / max(n_cand, 1), 1),
    }


def _q15_phases(spark, d, box_sec: "float | None" = None,
                passes: int = 2, assignment: str = "two_level"):
    """q15 semantic-dedup attribution: assignment wall, full wall, and
    the EXACT within-cluster pair count (Σ c·(c-1)/2 over cluster
    sizes — the SemDeDup cost model's unit of work) — computed under
    the SAME assignment the dedup runs (r12: the probe follows the
    production default, two_level under adaptive k; pass
    ``assignment="exact"`` for the labeled Θ(n²/250) baseline). Fixed
    cluster size makes the pair count linear in corpus size by design;
    ``pair_us`` (per-pair wall) is the number that must stay flat.

    The full-wall sink MUST reference ``keep``: a count(*)-only sink
    lets Catalyst ELIMINATE the left join (distinct right side, no
    columns referenced) and then the whole dominated subtree — the
    plan optimizes to a bare parquet row count (plan-verified:
    ReadSchema struct<>, zero joins), and the wall measures DRIVER
    EXPRESSION-OPTIMIZATION time of the k-dot assignment tree, not the
    dedup. Caught r11 when the two-level assignment left the "full
    wall" unchanged; every r10/earlier-r11 full_sec/pair_us from this
    probe measured that artifact. sum(keep) forces the join.

    ``box_sec`` (x100 tier): the full O(pairs) wall is PROJECTED from
    the pair count (4µs/pair — the measured honest gross — x passes);
    a projection over the box skips the full wall LOUDLY
    (``skipped_full`` in the payload — no silent caps). ``passes=1``
    times single cold executions (warmup is <2% of a 100s-class wall;
    it matters for sub-second walls, not these) so the honest x100
    q15 fits its box."""
    import math

    import pyarrow.dataset as pads
    from pyspark.sql import functions as F

    from aresdb_spark.operators.similarity import (
        ivf_assign, ivf_assign_two_level_batched, ivf_centroids,
        semantic_dedup)

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = pads.dataset(f"{d}/embeddings.parquet").count_rows()
    k = max(8, math.ceil(n / 250))
    cents = ivf_centroids(64, k)
    # "two_level" times the SHIPPED Arrow-batched quantizer (r14) —
    # the same function semantic_dedup's two_level path plans
    assign_fn = ivf_assign if assignment == "exact" \
        else ivf_assign_two_level_batched

    def sizes():
        return emb.select(assign_fn(
            F.col("embedding"), cents).alias("c")).groupBy("c").count()

    def timed(fn):
        if passes >= 2:
            fn()
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # ONE timed job yields the pair count AND the assignment wall (the
    # aggregate's input is exactly one assignment pass over the corpus)
    res = {}

    def assign_job():
        res["p"] = sizes().agg(F.sum(
            F.col("count") * (F.col("count") - 1) / 2).alias("p")) \
            .collect()[0][0]

    assign_sec = timed(assign_job)
    n_pairs = int(res["p"])
    out = {"n_rows": n, "n_clusters": k, "assignment": assignment,
           "within_cluster_pairs": n_pairs,
           "assign_sec": round(assign_sec, 4)}
    # 0.5 µs/pair projection: the r15 per-cluster Arrow kernel measured
    # 0.1 µs/pair gross at x100 (was 4 µs under the interpreted fold —
    # the old constant would spuriously box-skip runs that now fit);
    # 5x headroom keeps the skip honest on a loaded host
    projected = n_pairs * 0.5e-6 * passes
    if box_sec is not None and projected > box_sec:
        out["skipped_full"] = {"projected_sec": round(projected, 1),
                               "box_sec": box_sec}
        return out
    full_sec = timed(lambda: semantic_dedup(
        emb, threshold=0.4, n_rows=n, assignment=assignment)
        .groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.col("keep").cast("int")).alias("kept")).collect())
    out["full_sec"] = round(full_sec, 4)
    # net per-pair cost (full - assign): meaningful while assignment is
    # a minor term; gross (full wall / pairs) is the cross-scale upper
    # bound that must stay flat-to-falling.
    out["pair_us"] = round(
        1e6 * max(full_sec - assign_sec, 0.0) / max(n_pairs, 1), 2)
    out["gross_pair_us"] = round(1e6 * full_sec / max(n_pairs, 1), 2)
    return out


def _q11_phases(spark, d):
    """q11 IVF top-k attribution (VERDICT r11 #4: its sf0.1 wall moved
    +56% r10→r11 with no per-phase evidence). The query is two stages:
    a scan-side assignment FILTER (n·k rounded dot products, k=8 —
    pure expressions, no shuffle) and the exact-cosine + TakeOrdered
    over the survivors. Times the filter stage alone (count of probed
    rows — the same assignment expression tree) and the full query;
    ``assign_us_per_row`` is the per-row unit that must stay flat
    across scales, and ``topk_margin_sec`` isolates the scoring tail."""
    import pyarrow.dataset as pads
    from pyspark.sql import functions as F

    from aresdb_spark.operators.similarity import (_ivf_probe_set,
                                                   ivf_assign,
                                                   ivf_centroids,
                                                   ivf_topk)

    qv = [((i * 37 + 11) % 29 - 14) / 14.0 for i in range(64)]
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = pads.dataset(f"{d}/embeddings.parquet").count_rows()
    cents = ivf_centroids(64, 8)
    probed = _ivf_probe_set(qv, cents, 2)
    cand = emb.filter(ivf_assign(F.col("embedding"), cents).isin(probed))

    def timed(fn):
        fn()
        t0 = time.perf_counter()
        r = fn()
        return time.perf_counter() - t0, r

    filter_sec, n_probed = timed(lambda: cand.count())
    full_sec, _ = timed(
        lambda: ivf_topk(emb, qv, k=10, nprobe=2).collect())
    return {"rows_total": n, "rows_probed": n_probed,
            "nprobe": 2, "n_clusters": 8,
            "filter_sec": round(filter_sec, 4),
            "full_sec": round(full_sec, 4),
            "assign_us_per_row": round(1e6 * filter_sec / max(n, 1), 2),
            "topk_margin_sec": round(full_sec - filter_sec, 4)}


def _q12_phases(spark, d):
    """q12 CC attribution (VERDICT r10 directive 6): edge count, round
    count and per-round walls. Edges are localCheckpointed first so the
    timing isolates the CC iterations from the minhash stage (which
    q7_phases already attributes); the edge set is linear in corpus
    size by tier design and rounds are bounded by component diameter,
    so ``cc_sec / edges`` is the per-unit number that must stay flat."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators.dedup import (connected_components,
                                              minhash_near_duplicates)

    docs = spark.read.parquet(f"{d}/documents.parquet")
    edges = minhash_near_duplicates(docs, threshold=0.5) \
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")) \
        .localCheckpoint()
    n_edges = edges.count()
    connected_components(edges).count()            # warmup
    stats: dict = {}
    t0 = time.perf_counter()
    n_labeled = connected_components(edges, stats=stats).count()
    cc_sec = time.perf_counter() - t0
    return {"edges": n_edges, "labeled_nodes": n_labeled,
            "rounds": stats.get("rounds"),
            "round_secs": stats.get("round_secs"),
            "cc_sec": round(cc_sec, 4),
            "cc_us_per_edge": round(1e6 * cc_sec / max(n_edges, 1), 2)}


def _bench_timed(fn):
    """One warmup + one timed pass; returns (seconds, result)."""
    fn()
    t0 = time.perf_counter()
    r = fn()
    return time.perf_counter() - t0, r


def _bench_timed_min3(fn):
    """One warmup + MIN of 3 timed passes (VERDICT r15 directive 4: the
    q3/q8 x100 ratios whiplashed three rounds running because both the
    Spark numerator and the single-pass DuckDB denominator carried the
    host's ±30% band; min-of-3 on BOTH sides is the same noise-floor
    protocol the graded tier already uses). Returns (seconds, result)."""
    fn()
    best = float("inf")
    r = None
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn()
        best = min(best, time.perf_counter() - t0)
    return best, r


def _duck_path(d: str, table: str) -> str:
    """DuckDB read_parquet target for a testdata table: the driver's
    sf dirs hold single files, the x10/x100 tiers hold Spark-written
    parquet DIRECTORIES of part files — glob accordingly."""
    p = f"{d}/{table}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def _q3_phases(spark, d):
    """q3 dim-join attribution (VERDICT r12 directive 3): the ~5-6x
    x100 residual vs DuckDB needs to name its phase without a judge
    plan-read each round. Spark probes:

      - fact_scan_sec: lineitem scan + global sum(l_quantity)
        (column-pruned scan + partial agg; no join, no final shuffle)
      - full_sec: the graded q3 plan (broadcast dim join + group-by)
      - join_agg_stage_sec: the margin the bare scan doesn't explain

    Each phase carries its own same-phase DuckDB denominator run
    in-process on the identical files (all cores, like the driver's
    baseline): scan_ratio isolates JVM parquet+agg constant factors;
    join_stage_ratio isolates the broadcast-join + final-agg margin.
    The adjudication claim (VERDICT r10-r12): the gap is scan-side
    constant factors, so scan_ratio ≈ full_ratio and
    join_agg_stage_sec stays a small slice of full_sec.

    r16 (VERDICT r15 directive 4): every phase — Spark AND DuckDB — is
    min-of-3 after a warmup; the ratios had whiplashed on single-pass
    denominators three rounds running. Keys unchanged, additive fix."""
    import duckdb
    from pyspark.sql import functions as F

    from aresdb_spark.aql import Dimension, Join, Measure, Query
    from aresdb_spark.aql.planner import plan_query

    li = spark.read.parquet(f"{d}/lineitem.parquet")
    scan_sec, _ = _bench_timed_min3(lambda: li.agg(
        F.sum("l_quantity"), F.count("*")).collect())
    q3 = Query(
        table="lineitem",
        joins=[Join(table="part", alias="p",
                    conditions=["p.p_partkey = l_partkey"])],
        dimensions=[Dimension(expr="p.p_brand", alias="brand")],
        measures=[Measure(expr="sum(l_quantity)", alias="qty")])
    full_sec, rows = _bench_timed_min3(
        lambda: plan_query(spark, d, q3).collect())

    con = duckdb.connect()
    duck_scan_sec, _ = _bench_timed_min3(lambda: con.execute(
        f"SELECT sum(l_quantity), count(*) "
        f"FROM read_parquet('{_duck_path(d, 'lineitem')}')").fetchall())
    duck_full_sec, _ = _bench_timed_min3(lambda: con.execute(
        f"SELECT p.p_brand AS brand, sum(l.l_quantity) AS qty "
        f"FROM read_parquet('{_duck_path(d, 'lineitem')}') l "
        f"JOIN read_parquet('{_duck_path(d, 'part')}') p "
        f"ON p.p_partkey = l.l_partkey GROUP BY 1").fetchall())
    con.close()
    join_stage = max(full_sec - scan_sec, 0.0)
    duck_join_stage = max(duck_full_sec - duck_scan_sec, 1e-9)
    return {
        "fact_scan_sec": round(scan_sec, 4),
        "full_sec": round(full_sec, 4),
        "join_agg_stage_sec": round(join_stage, 4),
        "groups": len(rows),
        "duck_fact_scan_sec": round(duck_scan_sec, 4),
        "duck_full_sec": round(duck_full_sec, 4),
        "duck_join_agg_stage_sec": round(duck_join_stage, 4),
        "scan_ratio": round(scan_sec / max(duck_scan_sec, 1e-9), 2),
        "full_ratio": round(full_sec / max(duck_full_sec, 1e-9), 2),
        "join_stage_ratio": round(join_stage / duck_join_stage, 2),
    }


def _q8_phases(spark, d):
    """q8 text_stats attribution (VERDICT r12 directive 3, the other
    x100 residual ~3.1-3.7x): splits the raw parquet-read wall from
    the tokenize/expression wall, each with a same-phase DuckDB twin.

      - read_sec: documents scan + sum(length(text)) + count(*)
        (prices IO + string materialization, no tokenization)
      - full_sec: the graded q8 agg (count / sum n_tokens / sum quality)
      - expr_stage_sec: the scan-side expression margin

    The DuckDB full twin runs the SAME token/quality formulas through
    the committed oracle-SQL builders (operators/text.py), so
    expr_stage_ratio compares tokenizer engines, not different work.

    r16 (VERDICT r15 directive 4): every phase — Spark AND DuckDB — is
    min-of-3 after a warmup; the ratios had whiplashed on single-pass
    denominators three rounds running. Keys unchanged, additive fix."""
    import duckdb
    from pyspark.sql import functions as F

    from aresdb_spark.operators import text as X

    docs = spark.read.parquet(f"{d}/documents.parquet")
    read_sec, _ = _bench_timed_min3(lambda: docs.agg(
        F.sum(F.length("text")), F.count("*")).collect())
    full_sec, _ = _bench_timed_min3(lambda: X.text_stats(docs).select(
        F.count("*").alias("n"), F.sum("n_tokens").alias("toks"),
        F.sum("quality").alias("q")).collect())

    con = duckdb.connect()
    duck_read_sec, _ = _bench_timed_min3(lambda: con.execute(
        f"SELECT sum(length(text)), count(*) "
        f"FROM read_parquet('{_duck_path(d, 'documents')}')").fetchall())
    tok = X.token_count_oracle_sql("text")
    qual = X.quality_score_oracle_sql("text")
    duck_full_sec, _ = _bench_timed_min3(lambda: con.execute(
        f"SELECT count(*) AS n, sum({tok}) AS toks, sum({qual}) AS q "
        f"FROM read_parquet('{_duck_path(d, 'documents')}')").fetchall())
    con.close()
    expr_stage = max(full_sec - read_sec, 0.0)
    duck_expr_stage = max(duck_full_sec - duck_read_sec, 1e-9)
    return {
        "read_sec": round(read_sec, 4),
        "full_sec": round(full_sec, 4),
        "expr_stage_sec": round(expr_stage, 4),
        "duck_read_sec": round(duck_read_sec, 4),
        "duck_full_sec": round(duck_full_sec, 4),
        "duck_expr_stage_sec": round(duck_expr_stage, 4),
        "read_ratio": round(read_sec / max(duck_read_sec, 1e-9), 2),
        "full_ratio": round(full_sec / max(duck_full_sec, 1e-9), 2),
        "expr_stage_ratio": round(expr_stage / duck_expr_stage, 2),
    }


def _sf100_bench(spark, resolve_ref: "float | None" = None):
    """The x100 tier (VERDICT r10 directive 3): a second decade for the
    design claims the x10 tier already pins — scan queries flat-per-row,
    store resolve tracking |pending| not |hot base|, q7 verify cost per
    candidate and q15 cost per pair flat-to-falling. Scope is the
    directive's: the 8 scan-class headliners, store-resolve at a 100x
    (5M-row) hot base, and the q7/q15 per-unit probes. Every probe is
    time-boxed; a skip is LOGGED in ``skipped`` (no silent caps).

    ``resolve_ref``: the 50k-base 16-pending resolve wall from the
    store_ops tier, the denominator of ``resolve_base_scale_ratio``.
    Returns the section dict; its ``units`` sub-dict (per-unit costs)
    is re-emitted in tail_summary so the graded line tail carries it."""
    meta = _ensure_sf1(spark, SF_DIR, SF100_DIR, n_copies=100)
    skipped: list = []
    out: dict = {"dir": SF100_DIR, "scale_factor": 100,
                 "spec": meta["spec"], "fingerprint": meta["fingerprint"],
                 "skipped": skipped}
    units: dict = {}
    out["units"] = units

    def boxed(label, fn):
        """One warmup pass (observes the box), then min of 2 timed
        passes — same method on the base and x100 sides, back-to-back,
        so the ratio is apples-to-apples."""
        t0 = time.perf_counter()
        fn()
        warm = time.perf_counter() - t0
        if warm > TIME_BOX_SEC:
            skipped.append({"probe": label, "warmup_sec": round(warm, 1),
                            "box_sec": TIME_BOX_SEC})
            return None
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 4)

    qs = _queries()
    scan_set = ["q1_count_hourly", "q2_sum_measure_filter", "q3_dim_join",
                "q4_hll_distinct", "q5_non_agg_limit",
                "q6_array_predicates", "q8_text_stats", "q9_cosine_topk"]
    t1, t100, ratio = {}, {}, {}
    for name in scan_set:
        fn = qs[name]
        b = boxed(f"{name}@base",
                  lambda fn=fn: fn(spark, SF_DIR).collect())
        x = boxed(f"{name}@x100",
                  lambda fn=fn: fn(spark, SF100_DIR).collect())
        if b is not None:
            t1[name] = b
        if x is not None:
            t100[name] = x
        if b and x:
            ratio[name] = round(x / max(b, 1e-9), 2)
    out["base_sec"], out["queries"], out["ratio_x100"] = t1, t100, ratio

    try:
        q7 = _q7_phases(spark, SF100_DIR)
        out["q7_phases_x100"] = q7
        units["verify_us_per_candidate"] = q7["verify_us_per_candidate"]
    except Exception as e:
        out["q7_phases_x100"] = {"error": str(e)}
    try:
        # q3/q8 attribution (VERDICT r12 directive 3): the two >2x
        # x100 residuals self-adjudicate — each phase carries its own
        # same-phase DuckDB denominator measured here, back-to-back
        q3p = _q3_phases(spark, SF100_DIR)
        out["q3_phases_x100"] = q3p
        units["q3_scan_ratio"] = q3p["scan_ratio"]
        units["q3_join_stage_share"] = round(
            q3p["join_agg_stage_sec"] / max(q3p["full_sec"], 1e-9), 2)
    except Exception as e:
        out["q3_phases_x100"] = {"error": str(e)}
    try:
        q8p = _q8_phases(spark, SF100_DIR)
        out["q8_phases_x100"] = q8p
        units["q8_read_ratio"] = q8p["read_ratio"]
        units["q8_expr_stage_ratio"] = q8p["expr_stage_ratio"]
    except Exception as e:
        out["q8_phases_x100"] = {"error": str(e)}
    try:
        # single cold executions (passes=1): the honest x100 full wall
        # is 100s-class, where warmup effects are <2% and a
        # warmup+timed pair would blow the box
        q15 = _q15_phases(spark, SF100_DIR, box_sec=TIME_BOX_SEC,
                          passes=1)
        out["q15_phases_x100"] = q15
        if "skipped_full" in q15:
            skipped.append({"probe": "q15_full@x100",
                            **q15["skipped_full"]})
        else:
            # net (full - assign, per pair) is the pair-stage unit;
            # gross (full wall / pairs) the strict upper bound that
            # also absorbs the assignment term
            units["pair_us_net"] = q15["pair_us"]
            units["pair_us_gross"] = q15["gross_pair_us"]
    except Exception as e:
        out["q15_phases_x100"] = {"error": str(e)}

    try:
        # r12: q15_phases_x100 above now runs the PRODUCTION DEFAULT
        # (two_level under adaptive k — VERDICT r11 #5); this probe
        # keeps the exact flat-argmax as the LABELED Θ(n²/250)
        # baseline so the speedup unit stays comparable across rounds
        # (same exact/two_level quotient as r11, denominators swapped).
        # Clusterings differ (valid-quantizer approximation), so walls
        # compare ASSIGNMENT regimes, not identical outputs. sum(keep)
        # forces the join (the count(*)-only elimination trap); one
        # cold pass, boxed.
        import math

        import pyarrow.dataset as pads
        from pyspark.sql import functions as F

        from aresdb_spark.operators.similarity import semantic_dedup
        tl = out.get("q15_phases_x100", {}).get("full_sec")
        if tl is None:
            skipped.append({"probe": "q15_exact@x100",
                            "reason": "default (two_level) full was "
                                      "skipped"})
        else:
            n = pads.dataset(
                f"{SF100_DIR}/embeddings.parquet").count_rows()
            emb = spark.read.parquet(f"{SF100_DIR}/embeddings.parquet")
            t0 = time.perf_counter()
            semantic_dedup(emb, threshold=0.4, n_rows=n,
                           assignment="exact").groupBy().agg(
                F.count("*"),
                F.sum(F.col("keep").cast("int"))).collect()
            ex = round(time.perf_counter() - t0, 4)
            out["q15_exact_x100"] = {
                "full_sec": ex,
                "default_two_level_full_sec": tl,
                "speedup_two_level_vs_exact": round(ex / tl, 2),
                "n_clusters": max(8, math.ceil(n / 250))}
            units["q15_two_level_speedup"] = \
                out["q15_exact_x100"]["speedup_two_level_vs_exact"]
    except Exception as e:
        out["q15_exact_x100"] = {"error": str(e)}

    try:
        so = _store_ops_x100(spark)
        out["store_ops_x100"] = so
        if resolve_ref:
            units["resolve_base_scale_ratio"] = round(
                so["resolve_16_pending_sec"] / max(resolve_ref, 1e-9), 2)
            so["resolve_base_scale_ratio_vs_50k"] = \
                units["resolve_base_scale_ratio"]
    except Exception as e:
        out["store_ops_x100"] = {"error": str(e)}
    return out


def _store_ops_x100(spark):
    """Store resolve at a 100x (5M-row) hot base with the same 16x1k
    pending set as the store_ops tier — the second decade of the
    "resolve tracks |pending|, not |hot base|" claim. Also times ONE
    plain scan of the base (footer-schema parquet count): the semi/anti
    split scans the base twice, so ``resolve / base_scan`` attributes
    how much of the resolve wall is the double scan (VERDICT r10
    directive 5 asks for measurement before any single-pass rework)."""
    import shutil
    import tempfile
    from datetime import datetime

    from pyspark.sql import functions as F

    from aresdb_spark.sources.hotcold import HotColdStore

    root = tempfile.mkdtemp(prefix="bench_storeops100_")
    cutoff = datetime(2024, 1, 15)
    base_rows = 5_000_000
    store = HotColdStore(path=f"{root}/t", time_column="ts",
                         primary_key=("event_id",),
                         sort_columns=("ts",), modes={"value": "add"})
    ev = (spark.range(base_rows)
          .select(F.col("id").alias("event_id"),
                  (F.lit(cutoff) + F.make_interval(secs=F.col("id")))
                  .alias("ts"),
                  (F.col("id") % 97).cast("double").alias("value")))
    store.init_from(ev, cutoff)
    for k in range(16):
        batch = (spark.range(k * 1_000, (k + 1) * 1_000)
                 .select(F.col("id").alias("event_id"),
                         (F.lit(cutoff) + F.make_interval(
                             hours=F.lit(k + 1))).alias("ts"),
                         F.lit(1.0).alias("value"))).localCheckpoint()
        store.ingest(spark, batch, cutoff)

    store.read_hot(spark).count()          # warmup
    t0 = time.perf_counter()
    resolved = store.read_hot(spark).count()
    resolve_sec = time.perf_counter() - t0

    base_dir = store._version_path("hot")
    spark.read.parquet(base_dir).count()   # warmup
    t0 = time.perf_counter()
    spark.read.parquet(base_dir).count()
    scan_sec = time.perf_counter() - t0

    shutil.rmtree(root, ignore_errors=True)
    return {"hot_base_rows": base_rows,
            "resolve_16_pending_sec": round(resolve_sec, 4),
            "base_scan_sec": round(scan_sec, 4),
            "resolve_vs_single_scan": round(
                resolve_sec / max(scan_sec, 1e-9), 2),
            "resolved_rows": resolved}


def _store_ops_bench(spark):
    """Hot/cold store operation costs (informational): the r9 claim
    under measurement is that INGEST IS O(batch) — per-ingest wall must
    not grow with either the hot-base size or the pending-batch count
    (ingest appends one observed-write dir; it never reads the store).
    Reported: per-ingest seconds early (pending 1-4) vs late (pending
    13-16) over a 50k-row hot base, the read-side PK fold with 16
    pending batches, and the archive compaction that consumes them.

    r10 adds the READ-side claim (directive 2): the pending-PK
    broadcast split makes resolve cost track |pending|, not |hot
    base| — ``resolve_16_pending_sec_10x_base`` times the same
    16-pending resolve over a 10x (500k-row) base; the wall ratio
    (``resolve_base_scale_ratio``) stays far below 10 because only the
    matched slice shuffles (the base is scanned narrowly, never
    reshuffled)."""
    import shutil
    import tempfile
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from aresdb_spark.sources.hotcold import HotColdStore

    root = tempfile.mkdtemp(prefix="bench_storeops_")
    store = HotColdStore(path=f"{root}/t", time_column="ts",
                         primary_key=("event_id",),
                         sort_columns=("ts",), modes={"value": "add"})
    base_rows = 50_000
    cutoff = datetime(2024, 1, 15)
    ev = (spark.range(base_rows)
          .select(F.col("id").alias("event_id"),
                  (F.lit(cutoff) + F.make_interval(secs=F.col("id")))
                  .alias("ts"),
                  (F.col("id") % 97).cast("double").alias("value")))
    store.init_from(ev, cutoff)

    batch_rows, n_batches, times = 1_000, 16, []
    for k in range(n_batches):
        batch = (spark.range(k * batch_rows, (k + 1) * batch_rows)
                 .select(F.col("id").alias("event_id"),
                         (F.lit(cutoff) + F.make_interval(
                             hours=F.lit(k + 1))).alias("ts"),
                         F.lit(1.0).alias("value"))).localCheckpoint()
        t0 = time.perf_counter()
        store.ingest(spark, batch, cutoff)
        times.append(time.perf_counter() - t0)

    def med(xs):
        return round(sorted(xs)[len(xs) // 2], 4)

    store.read_hot(spark).count()        # warmup (codegen/broadcast init)
    t0 = time.perf_counter()
    n_resolved = store.read_hot(spark).count()
    resolve_sec = time.perf_counter() - t0

    # same 16-pending resolve over a 10x base: directive-2 evidence
    # that resolve tracks |pending|, not |hot base|
    big = HotColdStore(path=f"{root}/t10", time_column="ts",
                       primary_key=("event_id",),
                       sort_columns=("ts",), modes={"value": "add"})
    ev10 = (spark.range(base_rows * 10)
            .select(F.col("id").alias("event_id"),
                    (F.lit(cutoff) + F.make_interval(secs=F.col("id")))
                    .alias("ts"),
                    (F.col("id") % 97).cast("double").alias("value")))
    big.init_from(ev10, cutoff)
    for k in range(n_batches):
        batch = (spark.range(k * batch_rows, (k + 1) * batch_rows)
                 .select(F.col("id").alias("event_id"),
                         (F.lit(cutoff) + F.make_interval(
                             hours=F.lit(k + 1))).alias("ts"),
                         F.lit(1.0).alias("value"))).localCheckpoint()
        big.ingest(spark, batch, cutoff)
    big.read_hot(spark).count()          # warmup, same as the 1x side
    t0 = time.perf_counter()
    big.read_hot(spark).count()
    resolve_10x_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    store.archive(spark, cutoff + timedelta(minutes=30))
    archive_sec = time.perf_counter() - t0
    out = {"hot_base_rows": base_rows, "batch_rows": batch_rows,
           "ingest_sec_early": med(times[1:5]),
           "ingest_sec_late": med(times[-4:]),
           "resolve_16_pending_sec": round(resolve_sec, 4),
           "resolve_16_pending_sec_10x_base": round(resolve_10x_sec, 4),
           "resolve_base_scale_ratio": round(
               resolve_10x_sec / max(resolve_sec, 1e-9), 2),
           "resolved_rows": n_resolved,
           "archive_compact_sec": round(archive_sec, 4)}
    shutil.rmtree(root, ignore_errors=True)
    return out


def _codec_bench(spark, n_items: int = 256):
    """Per-codec decode throughput through the REAL Arrow-batched
    mapInPandas path (r12 — the unit that prices a 100-TB media
    corpus: decode cost per payload byte). For each container, 96x96
    synthetic payloads are generated executor-side ONCE and
    localCheckpointed (generation excluded from the timing); the timed
    pass runs the same decode_stats/audio_stats pipeline the graded
    rows use. Reports per-codec payload MB, wall seconds, MB/s and
    items/s — informational, not part of the graded total."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from aresdb_spark.operators import multimodal as M
    from aresdb_spark.operators.audio import audio_stats

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])
    ids = spark.range(n_items).select(F.col("id").alias("media_id"))

    def gen_with(build):
        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = [(int(d), build(int(d)))
                        for d in pdf["media_id"].astype("int64")]
                yield pd.DataFrame(rows, columns=["media_id", "payload"])
        return ids.repartition(32).mapInPandas(gen, schema=schema)

    def img(d, ch=1):
        n = 96 * 96 * ch
        px = ((d * 7 + np.arange(n) * 31) % 256).astype(np.uint8)
        return px.reshape((96, 96) if ch == 1 else (96, 96, ch))

    def noise_img(d, ch=3):
        # high-entropy deterministic pixels (splitmix64 finalizer):
        # the linear img() pattern compresses ~30x under PNG, which
        # made payload-MB/s measure the Spark pipeline floor instead
        # of decode cost (r12's 0.29 MB/s headline). Proper noise
        # stays ~raw size, so PNG's number prices the decoder.
        n = 96 * 96 * ch
        with np.errstate(over="ignore"):
            x = (np.arange(n, dtype=np.uint64)
                 + np.uint64(d) * np.uint64(0x9E3779B97F4A7C15))
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
        return (x & np.uint64(0xFF)).astype(np.uint8).reshape(96, 96, ch)

    def build_jpeg(d):
        from aresdb_spark.operators.jpeg import encode_jpeg
        return encode_jpeg(img(d))

    def build_gif(d):
        from aresdb_spark.operators.gif import encode_gif
        return encode_gif(img(d))

    def build_tiff(d):
        from aresdb_spark.operators.tiff import encode_tiff
        return encode_tiff(img(d, 3), compression=5, predictor=2)

    def build_bmp(d):
        from aresdb_spark.operators.bmp import encode_bmp
        return encode_bmp(img(d, 3))

    def build_webp(d):
        from aresdb_spark.operators.webp import encode_webp
        return encode_webp(img(d, 3), subtract_green=True)

    def build_flac(d):
        from aresdb_spark.operators.flac import encode_flac
        s = np.cumsum((d * 7 + np.arange(8192) * 31) % 97 - 48) % 30000
        return encode_flac(s, 16000, block_size=4096, fixed_order=2)

    def build_wav(d):
        from aresdb_spark.operators.audio import encode_wav
        s = ((d * 7 + np.arange(65536) * 31) % 2001 - 1000) \
            .astype(np.int16)
        return encode_wav(s, 16000)

    def build_gif_anim(d):
        # r14: 5-frame animated GIF carrying noise-class gray frames
        # through the GCE compositing path (gray-ramp palette)
        from aresdb_spark.operators.gif import encode_gif_anim
        return encode_gif_anim(
            [(0, 0, noise_img(d * 5 + f, 1)[:, :, 0], 4, 0, None)
             for f in range(5)], 96, 96)

    def build_webp_anim(d):
        # r14: 5-frame animated WebP (lossless VP8L ANMF frames)
        from aresdb_spark.operators.webp import encode_webp_anim
        return encode_webp_anim(
            [(0, 0, noise_img(d * 5 + f), 40, 1, 0) for f in range(5)],
            96, 96)

    def build_sgi(d):
        # r14: RLE-stored SGI RGB (plane-separated Python scanline walk)
        from aresdb_spark.operators.pnm import encode_sgi
        return encode_sgi(noise_img(d), storage=1)

    def build_au(d):
        # r14: big-endian PCM-16 .snd (pure-frombuffer decode floor)
        from aresdb_spark.operators.audio import encode_au
        s = (d * 7 + np.arange(65536) * 31) % 2001 - 1000
        return encode_au(s, 16000)

    codecs = {
        "png": lambda d: M.encode_png(noise_img(d), row_filter="mixed"),
        "jpeg": build_jpeg,
        "gif": build_gif,
        "tiff_lzw": build_tiff,
        "bmp": build_bmp,
        "webp_vp8l": build_webp,
        "flac": build_flac,
        "wav_pcm": build_wav,
        "gif_anim": build_gif_anim,
        "webp_anim": build_webp_anim,
        "sgi_rle": build_sgi,
        "au_pcm": build_au,
    }
    raw_bytes = {                                   # decoded size/item
        "png": 96 * 96 * 3, "jpeg": 96 * 96, "gif": 96 * 96,
        "tiff_lzw": 96 * 96 * 3, "bmp": 96 * 96 * 3,
        "webp_vp8l": 96 * 96 * 3, "flac": 8192 * 2, "wav_pcm": 65536 * 2,
        "gif_anim": 5 * 96 * 96 * 3, "webp_anim": 5 * 96 * 96 * 3,
        "sgi_rle": 96 * 96 * 3, "au_pcm": 65536 * 2,
    }
    from aresdb_spark.operators.audio import decode_wav
    from aresdb_spark.operators.flac import decode_flac
    from aresdb_spark.operators.gif import decode_gif_anim
    from aresdb_spark.operators.webp import decode_webp_anim

    def single_core_rate(name, build):
        # corpus cost at 100 TB = bytes / (per-core decode rate x
        # cores); at 256x96x96 the Spark wall above is scheduling /
        # Arrow floor, not decode, so price the codec directly
        payload = build(0)
        from aresdb_spark.operators.audio import decode_au
        dec = {"flac": decode_flac, "wav_pcm": decode_wav,
               "au_pcm": decode_au,
               "gif_anim": decode_gif_anim,
               "webp_anim": decode_webp_anim}.get(
            name, M._decode_container)
        dec(payload)                                # warmup
        reps, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < 0.25:
            dec(payload)
            reps += 1
        sec = (time.perf_counter() - t0) / reps
        return raw_bytes[name] / 1e6 / sec, len(payload) / 1e6 / sec

    out = {}
    for name, build in codecs.items():
        media = gen_with(build).localCheckpoint(eager=True)
        total_bytes = media.select(
            F.sum(F.length("payload"))).collect()[0][0]
        if name in ("flac", "wav_pcm", "au_pcm"):
            stats = audio_stats(media)
        elif name == "gif_anim":
            from aresdb_spark.operators.gif import gif_anim_stats
            stats = gif_anim_stats(media)
        elif name == "webp_anim":
            from aresdb_spark.operators.webp import webp_anim_stats
            stats = webp_anim_stats(media)
        else:
            stats = M.decode_stats(media)
        stats.count()                               # warmup
        t0 = time.perf_counter()
        stats.count()
        sec = time.perf_counter() - t0
        core_raw, core_payload = single_core_rate(name, build)
        out[name] = {
            "items": n_items,
            "payload_mb": round(total_bytes / 1e6, 2),
            "decode_sec": round(sec, 4),
            "mb_per_sec": round(total_bytes / 1e6 / max(sec, 1e-9), 1),
            # decoded-bytes/s: comparable across compression ratios
            "raw_mb_per_sec": round(
                raw_bytes[name] * n_items / 1e6 / max(sec, 1e-9), 1),
            "items_per_sec": round(n_items / max(sec, 1e-9), 1),
            "single_core_mb_per_sec": round(core_payload, 2),
            "single_core_raw_mb_per_sec": round(core_raw, 2),
        }
    return out


def _ingest_bench(spark):
    """Wire-format ingestion throughput (informational, not part of the
    graded total): encode the sf events table to UpsertBatch V1 blobs
    and decode them back, both executor-side (mapInPandas)."""
    from pyspark.sql import functions as F

    from aresdb_spark.streaming.upsert_wire import (
        decode_upsert_batch_stream, encode_upsert_batch_stream)

    schema_doc = {"name": "events", "columns": [
        {"name": "ts", "type": "Uint32"},
        {"name": "event_id", "type": "Int64"},
        {"name": "user_id", "type": "Int64"},
        {"name": "value", "type": "Float32"}],
        "primaryKeyColumns": [1]}
    df = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("ts", "event_id", "user_id", "value")
    if dict(df.dtypes)["ts"] == "bigint":  # nanos → seconds
        df = df.withColumn("ts", (F.col("ts") / 1_000_000_000).cast("long"))
    # the sf file is a single parquet split; spread it so the encoder's
    # executor-side parallelism shows (at scale the source has many
    # splits naturally) — the repartition shuffle is inside the timing,
    # so the number errs honest-low
    df = df.repartition(int(CPUS)).localCheckpoint()
    n = df.count()

    # warmup: Python-worker + Arrow init dominates the first pass
    encode_upsert_batch_stream(df, schema_doc, arrival_time=0,
                               batch_rows=8192).count()
    t0 = time.perf_counter()
    encode_upsert_batch_stream(df, schema_doc, arrival_time=0,
                               batch_rows=8192).count()
    t_enc = time.perf_counter() - t0

    blobs = encode_upsert_batch_stream(df, schema_doc, arrival_time=0,
                                       batch_rows=8192).localCheckpoint()
    t0 = time.perf_counter()
    decoded_rows = decode_upsert_batch_stream(blobs, schema_doc).count()
    t_dec = time.perf_counter() - t0
    return {"rows": n,
            "encode_sec": round(t_enc, 4),
            "decode_sec": round(t_dec, 4),
            "encode_rows_per_sec": round(n / max(t_enc, 1e-9)),
            "decode_rows_per_sec": round(decoded_rows / max(t_dec, 1e-9))}




def _media_dedup_bench(spark, n_items: int = 192):
    """Per-modality near-dup pipeline throughput (r13, informational):
    for each of image/audio/video, generate n_items synthetic
    near-dup payloads executor-side (localCheckpointed, excluded from
    timing), then time (a) the fingerprint stage alone and (b) the
    full banded-LSH dedup — the two units that price a 100-TB media
    dedup: fingerprint cost scales with corpus bytes, the join with
    corpus rows. clips_per_sec and the join margin are the numbers
    that must stay flat across scale tiers."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators import audio as A
    from aresdb_spark.operators import multimodal as M
    from aresdb_spark.operators import video as V

    ids = spark.range(n_items).select(F.col("id").alias("media_id"))
    tiers = {
        "image": (M.synthetic_near_dup_images, M.phash_media,
                  M.image_near_duplicates),
        "audio": (A.synthetic_near_dup_audio, A.fingerprint_media,
                  A.audio_near_duplicates),
        "video": (V.synthetic_near_dup_videos, V.video_fp_media,
                  V.video_near_duplicates),
    }
    out = {}
    for kind, (gen, fp, dedup) in tiers.items():
        media = gen(ids).localCheckpoint(eager=True)
        payload_mb = media.select(
            F.sum(F.length("payload"))).collect()[0][0] / 1e6
        fp(media).count()                           # warmup
        t0 = time.perf_counter()
        fp(media).count()
        fp_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_pairs = dedup(media).count()
        full_sec = time.perf_counter() - t0
        out[kind] = {
            "items": n_items,
            "payload_mb": round(payload_mb, 2),
            "fingerprint_sec": round(fp_sec, 4),
            "clips_per_sec": round(n_items / max(fp_sec, 1e-9), 1),
            "full_dedup_sec": round(full_sec, 4),
            "join_margin_sec": round(max(full_sec - fp_sec, 0.0), 4),
            "pairs": n_pairs,
        }
    return out


if __name__ == "__main__":
    main()
