"""Continuous-crawl dedup sink: scan-cost plan asserts and crash
injection across its two durability boundaries (VERDICT r6 directives
1-3).

The sink's scale contract is the reference's cuckoo-PK-probe cost model
(memstore/cuckoo_index.go:63): probing history costs O(lookup), never
O(store). The crash contracts mirror the reference's redo-log + snapshot
pair: a torn mutation is either invisible (pointer not flipped) or
confined to the interrupted batch (accepted-write landed, store append
did not — replay re-accepts exactly that batch)."""

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))


def _run_sink(spark, src, store, out, ckpt, threshold=0.8):
    from aresdb_spark.streaming.ingest import file_source, start_dedup_stream

    schema = _docs(spark).schema
    q = start_dedup_stream(
        file_source(spark, f"{src}/*", schema), store, out,
        checkpoint_dir=ckpt, threshold=threshold, available_now=True)
    q.awaitTermination(180)


def test_probe_plan_is_one_pruned_store_scan(spark, tmp_path):
    """The per-micro-batch accepted-set plan reads the signature store
    exactly ONCE (r6 found two full scans), and the read is
    bucket-pruned: a tiny probe's band hashes select a strict subset of
    the store's buckets (SelectedBucketsCount k out of n, k < n)."""
    from aresdb_spark.operators.dedup import (
        build_signature_store, dedup_exact, incremental_near_duplicates)

    docs = _docs(spark)
    store = str(tmp_path / "store")
    build_signature_store(docs.filter(F.col("doc_id") % 3 == 0), store)

    # mirror start_dedup_stream's non-first-batch body for one tiny batch
    batch = dedup_exact(docs.filter(F.col("doc_id") == 1))
    hits = incremental_near_duplicates(spark, batch, store,
                                       threshold=0.8, prune=True)
    accepted = batch.join(
        hits.select(F.col("new_id").alias("doc_id")).distinct(),
        "doc_id", "left_anti")
    plan = accepted._jdf.queryExecution().executedPlan().toString()

    store_scans = plan.count("sigstore_")
    assert store_scans == 1, f"store scanned {store_scans}x:\n{plan}"
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"no bucket pruning in plan:\n{plan}"
    selected, total = int(m.group(1)), int(m.group(2))
    # 1 doc × 4 bands = ≤4 band hashes → ≤4 of 16 buckets
    assert selected < total, plan
    assert selected <= 4, (selected, total)


def test_probe_over_prune_budget_falls_back_to_full_scan(spark, tmp_path):
    """A probe larger than the key budget would touch most buckets
    anyway; the filter is dropped and results stay identical to the
    unpruned plan."""
    from aresdb_spark.operators.dedup import (
        build_signature_store, incremental_near_duplicates)

    docs = _docs(spark)
    store = str(tmp_path / "store")
    build_signature_store(docs.filter(F.col("doc_id") % 3 == 0), store)
    probe = docs.filter(F.col("doc_id") % 3 == 1)

    pruned = incremental_near_duplicates(
        spark, probe, store, threshold=0.5, prune=True)
    capped = incremental_near_duplicates(
        spark, probe, store, threshold=0.5, prune=True, prune_max_keys=2)
    plain = incremental_near_duplicates(
        spark, probe, store, threshold=0.5)
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(pruned) == rows(plain)
    assert rows(capped) == rows(plain)


def test_crash_between_accept_and_store_append(spark, tmp_path):
    """Kill the sink BETWEEN the accepted-parquet write and the store
    append (the documented durability window), restart from the same
    checkpoint, and pin the documented invariant: duplicates in the
    accepted output are byte-identical rows confined to the interrupted
    batch, and one ``.distinct()`` pass restores exactness."""
    import aresdb_spark.operators.dedup as dedup_mod

    docs = _docs(spark)
    src = tmp_path / "in"
    src.mkdir()
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    b1 = docs.filter(F.col("doc_id") % 3 == 0)
    b1.coalesce(1).write.parquet(str(src / "b1"))
    _run_sink(spark, src, store, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == b1.count()

    fresh = docs.filter(F.col("doc_id") % 3 == 1)
    recrawl = (b1.filter(F.col("doc_id") % 9 == 0)
               .withColumn("doc_id", F.col("doc_id") + 1000000))
    fresh.unionByName(recrawl).coalesce(1).write.parquet(str(src / "b2"))

    real_append = dedup_mod.build_signature_store

    def crash_on_append(df, path, *a, **kw):
        if kw.get("mode") == "append" or (a and a[-1] == "append"):
            raise RuntimeError("injected crash before store append")
        return real_append(df, path, *a, **kw)

    dedup_mod.build_signature_store = crash_on_append
    try:
        with pytest.raises(Exception, match="injected crash"):
            _run_sink(spark, src, store, out, ckpt)
    finally:
        dedup_mod.build_signature_store = real_append

    # accepted write landed, store append did not, offsets uncommitted
    mid = spark.read.parquet(out).count()
    assert mid > n1  # batch 2's accepted docs are in the output once

    _run_sink(spark, src, store, out, ckpt)  # replay batch 2
    final = spark.read.parquet(out)
    per_id = final.groupBy("doc_id").count()
    # batch-1 docs stayed singletons: duplicates confined to batch 2
    assert per_id.filter((F.col("count") > 1)
                         & (F.col("doc_id") % 3 == 0)).count() == 0
    dup_ids = per_id.filter(F.col("count") > 1)
    assert dup_ids.count() == mid - n1  # exactly the interrupted batch
    # the duplicates are byte-identical rows: one distinct() pass
    # restores exactness
    cleaned = final.distinct()
    assert cleaned.groupBy("doc_id").count() \
        .filter(F.col("count") > 1).count() == 0
    assert cleaned.count() == final.select("doc_id").distinct().count()

    # a further batch runs clean on the recovered store
    docs.filter(F.col("doc_id") % 3 == 2).coalesce(1) \
        .write.parquet(str(src / "b3"))
    _run_sink(spark, src, store, out, ckpt)


def test_soak_fifty_microbatches_stays_flat(spark, tmp_path):
    """VERDICT r8 directive 6 (soak, deliberately in-suite): run the
    continuous-crawl sink for 50 micro-batches and assert the two
    slow-killer signals stay bounded:

    1. per-batch wall time is FLAT — the pruned probe must track batch
       size, not accumulated store size (late-window batches no slower
       than early ones beyond a noise factor);
    2. small-file accumulation from per-batch bucketed appends is
       folded by one lifecycle compaction back to ~n_buckets files
       with no row lost.
    """
    import glob
    import os
    import statistics

    import pyarrow as pa
    import pyarrow.parquet as pq

    from aresdb_spark.operators.dedup import (
        SIGSTORE_BUCKETS, compact_signature_store, read_signature_store)
    from aresdb_spark.sources.pointer import read_state, version_dir

    n_batches, per_batch = 50, 20
    src = tmp_path / "in"
    src.mkdir()
    # batch k: 15 fresh docs + 5 near-verbatim repeats of batch 0 (the
    # probe must keep rejecting them against ever-older history)
    for k in range(n_batches):
        ids, texts = [], []
        for j in range(per_batch):
            if k > 0 and j >= 15:
                ids.append(k * 1000 + j)
                texts.append(f"repeated crawl document number {j} "
                             f"with stable words " + "lorem ipsum " * 10)
            else:
                ids.append(k * 1000 + j)
                texts.append(f"unique document {k}-{j} " + " ".join(
                    f"w{(k * 37 + j * 11 + i) % 9973}" for i in range(30)))
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            str(src / f"b{k:03d}.parquet"))

    from aresdb_spark.streaming.ingest import dedup_batch_processor

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    schema = _docs(spark).schema
    q = (spark.readStream.format("parquet").schema(schema)
         .option("maxFilesPerTrigger", 1).load(f"{src}/*")
         .writeStream
         .foreachBatch(dedup_batch_processor(spark, store, out,
                                             threshold=0.8))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)

    progress = [p for p in (q.recentProgress or []) if p is not None]
    durs = [p["durationMs"].get("triggerExecution", 0) for p in progress
            if p.get("numInputRows", 0) > 0]
    assert len(durs) >= 40, f"expected ~50 batches, saw {len(durs)}"
    early = statistics.median(durs[5:15])   # skip JIT warmup batches
    late = statistics.median(durs[-10:])
    print(f"\nsoak: {len(durs)} batches, per-batch median early={early}ms "
          f"late={late}ms ratio={late / max(early, 1):.2f}")
    assert late <= max(3.0 * early, early + 2000), \
        f"per-batch time drifted: early median {early}ms late {late}ms"

    # dedup semantics over the whole soak: each repeated TEXT survives
    # exactly once across all 50 batches — ROW count, not distinct-text
    # count (the weaker form passed even when a stale table-file-index
    # cache froze the probe's store view at batch 0; r8's fix refreshes
    # the listing on every store read)
    accepted = spark.read.parquet(out)
    assert accepted.count() == accepted.select("doc_id").distinct().count()
    n_rep_rows = accepted.filter(
        F.col("text").contains("repeated crawl")).count()
    assert n_rep_rows == 5, \
        f"{n_rep_rows} repeated-text rows accepted (want exactly 5)"

    # the store grew with every accepted batch (N_BANDS rows per doc)
    st = read_state(store)
    live = version_dir(store, st["version"])
    files_before = len(glob.glob(os.path.join(live, "*.parquet")))
    rows_before = read_signature_store(spark, store).count()
    assert rows_before == 4 * accepted.count(), \
        f"store rows {rows_before} != 4 x {accepted.count()} accepted"

    # small files: 50 bucketed appends accumulate many part files;
    # one lifecycle compaction folds them to ~n_buckets with no row lost
    assert files_before > 2 * SIGSTORE_BUCKETS  # soak accumulated files
    kept = compact_signature_store(spark, store,
                                   accepted.select("doc_id"))
    assert kept == rows_before  # nothing dropped: all ids retained
    st2 = read_state(store)
    files_after = len(glob.glob(
        os.path.join(version_dir(store, st2["version"]), "*.parquet")))
    print(f"soak: store files {files_before} -> {files_after} "
          f"after compaction ({rows_before} rows kept)")
    assert files_after <= 2 * SIGSTORE_BUCKETS, \
        f"compaction left {files_after} files"


def test_compact_crash_before_pointer_flip_leaves_store_live(
        spark, tmp_path):
    """compact_signature_store writes the new version first and commits
    via one pointer flip (sources/pointer.py). A crash before the flip
    must leave the OLD version fully live — readers see a complete,
    consistent store, and retrying the compaction succeeds."""
    import aresdb_spark.sources.pointer as pointer_mod
    from aresdb_spark.operators.dedup import (
        build_signature_store, compact_signature_store,
        incremental_near_duplicates, read_signature_store)

    docs = _docs(spark)
    store = str(tmp_path / "store")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    build_signature_store(corpus, store)
    before = read_signature_store(spark, store).count()

    retained = corpus.filter(F.col("doc_id") % 4 == 0).select("doc_id")
    real_commit = pointer_mod.commit_state

    def crash_commit(root, state):
        raise RuntimeError("injected crash before pointer flip")

    pointer_mod.commit_state = crash_commit
    try:
        with pytest.raises(RuntimeError, match="pointer flip"):
            compact_signature_store(spark, store, retained)
    finally:
        pointer_mod.commit_state = real_commit

    # old version still committed and complete
    assert read_signature_store(spark, store).count() == before
    probe = docs.filter(F.col("doc_id") % 2 == 1).limit(5)
    incremental_near_duplicates(spark, probe, store, prune=True).collect()

    # retry succeeds; the orphaned version dir never becomes visible
    kept = compact_signature_store(spark, store, retained)
    assert 0 < kept < before
    assert read_signature_store(spark, store).count() == kept


def test_displaced_version_survives_grace_for_inflight_reader(
        spark, tmp_path):
    """VERDICT r7 #1: a reader that resolved the OLD store version
    completes its scan across a concurrent compaction — the flip moves
    the old version into the ``displaced`` ledger instead of deleting
    it, and only ``gc_signature_store`` (age-gated, lifecycle-cadence)
    reaps it."""
    import os

    from aresdb_spark.operators.dedup import (
        build_signature_store, compact_signature_store,
        gc_signature_store, incremental_near_duplicates,
        read_signature_store)
    from aresdb_spark.sources.pointer import read_state, version_dir

    docs = _docs(spark)
    store = str(tmp_path / "store")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    build_signature_store(corpus, store)

    # the in-flight reader: plan resolved against v0, not yet executed
    probe = docs.filter(F.col("doc_id").isin([2, 3, 4, 5]))
    reader = incremental_near_duplicates(spark, probe, store, threshold=0.8)
    expected = {(r.new_id, r.store_id) for r in reader.collect()}

    # concurrent compaction flips to v1 (default grace: old files live)
    retained = corpus.filter(F.col("doc_id") % 4 == 0).select("doc_id")
    compact_signature_store(spark, store, retained)
    st = read_state(store)
    assert st["version"] == 1
    assert [d["version"] for d in st["displaced"]] == [0]
    assert os.path.isdir(version_dir(store, 0))  # old files intact

    # the old-version reader finishes its scan with correct results
    assert {(r.new_id, r.store_id) for r in reader.collect()} == expected

    # GC after the window (forced): old version reaped, ledger empty
    assert gc_signature_store(spark, store, grace_seconds=0) == 1
    assert not os.path.isdir(version_dir(store, 0))
    assert read_state(store)["displaced"] == []
    # live version unaffected
    assert read_signature_store(spark, store).count() > 0


def test_gc_reaps_only_expired_displaced_versions(spark, tmp_path):
    """The ledger accumulates across flips; GC is age-gated — a huge
    grace reaps nothing, grace 0 reaps everything, and re-running GC
    after a partial crash re-reaps as a no-op."""
    import os

    from aresdb_spark.operators.dedup import (
        build_signature_store, compact_signature_store, gc_signature_store)
    from aresdb_spark.sources.pointer import read_state, version_dir

    docs = _docs(spark)
    store = str(tmp_path / "store")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    build_signature_store(corpus, store)
    compact_signature_store(spark, store, corpus.select("doc_id"))
    compact_signature_store(spark, store, corpus.select("doc_id"))
    st = read_state(store)
    assert [d["version"] for d in st["displaced"]] == [0, 1]
    assert gc_signature_store(spark, store, grace_seconds=3600) == 0
    assert os.path.isdir(version_dir(store, 0))
    assert gc_signature_store(spark, store, grace_seconds=0) == 2
    assert not os.path.isdir(version_dir(store, 0))
    assert not os.path.isdir(version_dir(store, 1))
    assert gc_signature_store(spark, store, grace_seconds=0) == 0  # idempotent


def test_sigstore_mutations_are_single_writer(spark, tmp_path):
    """Store mutations AND the ledger GC end in whole-state commits, so
    racing writers would be last-commit-wins: one version flip silently
    rolled back — after which the next writer deletes the rolled-back
    version dir as an 'orphan'. The writer lock turns that destruction
    into a loud ConcurrentWriteError; readers never take it (the
    read-grace window is their protection)."""
    from aresdb_spark.operators.dedup import (
        build_signature_store, compact_signature_store, gc_signature_store,
        incremental_near_duplicates)
    from aresdb_spark.sources.pointer import ConcurrentWriteError, write_lock

    docs = _docs(spark)
    store = str(tmp_path / "store")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    build_signature_store(corpus, store)

    with write_lock(store):  # a writer in flight
        with pytest.raises(ConcurrentWriteError, match="single-writer"):
            build_signature_store(corpus, store, mode="append")
        with pytest.raises(ConcurrentWriteError):
            compact_signature_store(spark, store, corpus.select("doc_id"))
        with pytest.raises(ConcurrentWriteError):
            gc_signature_store(spark, store, grace_seconds=0)
        # readers are lock-free
        probe = docs.filter(F.col("doc_id") == 3)
        assert incremental_near_duplicates(
            spark, probe, store, threshold=0.8, prune=True).count() >= 1
    # lock released: mutations proceed
    assert compact_signature_store(spark, store,
                                   corpus.select("doc_id")) > 0


def test_crashed_initial_write_is_not_legacy(spark, tmp_path):
    """ADVICE r7: a crash during the first v2 write leaves a partial
    v0/ dir and no pointer. The replayed first batch must take the
    CREATE branch (legacy detection keys on bhp=*/root data files, not
    dir non-emptiness) — the old rule appended bhp=* dirs beside the
    orphan and left the root unreadable."""
    import os

    from aresdb_spark.operators.dedup import (
        build_signature_store, read_signature_store)
    from aresdb_spark.sources.pointer import read_state

    docs = _docs(spark)
    store = tmp_path / "store"
    (store / "v0").mkdir(parents=True)  # partial uncommitted write
    (store / "v0" / "part-00000.parquet.tmp").write_bytes(b"torn")

    build_signature_store(docs.filter(F.col("doc_id") % 7 == 0),
                          str(store), mode="append")  # the sink's replay
    st = read_state(str(store))
    assert st is not None and st["version"] == 0  # fresh v2 store
    assert not [n for n in os.listdir(store) if n.startswith("bhp=")]
    assert read_signature_store(spark, str(store)).count() > 0
    assert not (store / "v0" / "part-00000.parquet.tmp").exists()  # orphan gone


def test_legacy_conversion_respects_read_grace(spark, tmp_path):
    """First compaction of a pre-v2 store: the root-level legacy files
    enter the ledger as ``legacy_root`` and survive until GC, so a
    reader mid-scan on the legacy layout is safe too."""
    import glob

    from aresdb_spark.operators.dedup import (
        compact_signature_store, gc_signature_store, read_signature_store,
        signature_bands)
    from aresdb_spark.sources.pointer import read_state

    docs = _docs(spark)
    store = str(tmp_path / "store")
    corpus = docs.filter(F.col("doc_id") % 5 == 0)
    signature_bands(corpus).write.partitionBy("bhp").parquet(store)  # legacy
    n = compact_signature_store(spark, store, corpus.select("doc_id"))
    assert n > 0
    st = read_state(store)
    assert st["displaced"][0]["legacy_root"] is True
    assert glob.glob(f"{store}/bhp=*")          # legacy files still live
    assert gc_signature_store(spark, store, grace_seconds=0) == 1
    assert not glob.glob(f"{store}/bhp=*")      # reaped after the window
    assert read_signature_store(spark, store).count() == n


def test_sink_tolerates_precreated_empty_store_dir(spark, tmp_path):
    """mkdir -p of work dirs before starting the stream must still count
    as a first batch: an empty dir has no state and no data, and
    treating it as an existing store would read parquet from nothing
    (and freeze the store on the legacy layout)."""
    import os

    from aresdb_spark.operators.dedup import read_signature_store
    from aresdb_spark.sources.pointer import read_state

    docs = _docs(spark)
    src = tmp_path / "in"
    src.mkdir()
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    os.makedirs(store)  # the pre-created empty dir
    docs.filter(F.col("doc_id") % 7 == 0).coalesce(1) \
        .write.parquet(str(src / "b1"))
    _run_sink(spark, src, store, out, str(tmp_path / "ckpt"))
    assert read_state(store) is not None  # v2 layout, not legacy
    assert read_signature_store(spark, store).count() > 0


def test_store_reregisters_in_fresh_catalog(spark, tmp_path):
    """Bucket metadata lives in the session catalog; a LATER session
    must rebuild the external table from the _state.json record (same
    name, same bucket spec) and keep pruning. Simulated by dropping the
    table between build and read."""
    from aresdb_spark.operators.dedup import (
        build_signature_store, incremental_near_duplicates,
        read_signature_store)
    from aresdb_spark.sources.pointer import read_state

    docs = _docs(spark)
    store = str(tmp_path / "store")
    build_signature_store(docs.filter(F.col("doc_id") % 3 == 0), store)
    state = read_state(store)
    spark.sql(f"DROP TABLE {state['table']}")  # "new session"

    df = read_signature_store(spark, store)
    assert df.count() > 0
    assert spark.catalog.tableExists(state["table"])  # re-registered
    hits = incremental_near_duplicates(
        spark, docs.filter(F.col("doc_id") == 9), store,
        threshold=0.8, prune=True)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"SelectedBucketsCount: \d+ out of \d+", plan)
    assert hits.filter(F.col("new_id") == F.col("store_id")).count() == 1


def test_corrupt_pointer_raises_named_error(tmp_path):
    """A torn/hand-edited pointer file raises StateCorruptionError with
    recovery guidance, never a bare JSONDecodeError (and never reads as
    'no store here' — that would silently re-initialize over live
    data)."""
    from aresdb_spark.sources import pointer

    root = str(tmp_path / "s")
    pointer.commit_state(root, {"version": 3})
    with open(f"{root}/{pointer.STATE_FILE}", "w") as f:
        f.write("")  # zero-length, the classic torn-write symptom
    with pytest.raises(pointer.StateCorruptionError,
                       match="restore the pointer"):
        pointer.read_state(root)


def test_pointer_commit_is_atomic_roundtrip(tmp_path):
    """pointer.commit_state publishes via write-temp + rename: after any
    successful commit the state file parses and matches; next_version
    monotonically increases; gc_dir never raises."""
    from aresdb_spark.sources import pointer

    root = str(tmp_path / "s")
    assert pointer.read_state(root) is None
    assert pointer.next_version(None) == 0
    pointer.commit_state(root, {"version": 0, "x": "a"})
    st = pointer.read_state(root)
    assert st == {"version": 0, "x": "a"}
    assert pointer.next_version(st) == 1
    pointer.commit_state(root, {"version": 1})
    assert pointer.read_state(root)["version"] == 1
    assert not pointer.gc_dir(str(tmp_path / "nope"))  # missing: no raise
