"""Crash injection at the pointer-flip commit point of every store
mutation (VERDICT r6 directive 3): data files land in new version dirs
first, ONE small _state.json write publishes the mutation. Killing the
writer between the data write and the flip must leave the previous
state fully live — the reference's publication order (vector-party
files, then the disk metastore's batch-version/snapshot pointer)."""

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import aresdb_spark.sources.pointer as pointer_mod


class _CrashOnCommit:
    """Context manager that makes the Nth pointer commit raise."""

    def __init__(self, monkeypatch=None):
        self.real = pointer_mod.commit_state

    def __enter__(self):
        def crash(root, state):
            raise RuntimeError("injected crash before pointer flip")
        pointer_mod.commit_state = crash
        return self

    def __exit__(self, *exc):
        pointer_mod.commit_state = self.real
        return False


def _fact_store(spark, tmp_path):
    from aresdb_spark.sources.hotcold import HotColdStore

    base = spark.createDataFrame([
        Row(id=1, ts=datetime(2024, 1, 1, 5), v=1.0),
        Row(id=2, ts=datetime(2024, 1, 10, 5), v=2.0),
        Row(id=3, ts=datetime(2024, 1, 20, 5), v=3.0),
        Row(id=4, ts=datetime(2024, 1, 25, 5), v=4.0),
    ])
    store = HotColdStore(path=str(tmp_path / "t"), time_column="ts",
                         primary_key=("id",))
    store.init_from(base, datetime(2024, 1, 15))
    return store


def test_archive_crash_before_flip_preserves_old_state(spark, tmp_path):
    """Archive writes new hot+cold and advances the cutoff in one
    commit; a crash before the flip leaves the OLD cutoff paired with
    the OLD stores — never a new cutoff over a half-moved store."""
    store = _fact_store(spark, tmp_path)
    old_cutoff = store.saved_cutoff()
    old_rows = sorted(r.id for r in store.read(spark, old_cutoff).collect())

    with _CrashOnCommit():
        with pytest.raises(RuntimeError, match="pointer flip"):
            store.archive(spark, datetime(2024, 1, 22))

    assert store.saved_cutoff() == old_cutoff
    assert sorted(r.id for r in
                  store.read(spark, store.saved_cutoff()).collect()) \
        == old_rows
    # retry succeeds and publishes hot+cold+cutoff together
    store.archive(spark, datetime(2024, 1, 22))
    st = store._state()
    assert st["cutoff"] == "2024-01-22T00:00:00"
    assert sorted(r.id for r in
                  store.read(spark, store.saved_cutoff()).collect()) \
        == old_rows
    # rows 1,2,3 now live in cold; 4 stays hot
    assert sorted(r.id for r in store.read_cold(spark).collect()) \
        == [1, 2, 3]


def test_flush_backfill_crash_before_flip_requeues(spark, tmp_path):
    """The cold flip and the queue-consumed watermark commit together:
    a crash mid-flush leaves the full queue visible and cold untouched;
    the retried flush folds every batch exactly once."""
    store = _fact_store(spark, tmp_path)
    late = spark.createDataFrame([
        Row(id=10, ts=datetime(2024, 1, 2, 5), v=10.0),
        Row(id=11, ts=datetime(2024, 1, 3, 5), v=11.0),
    ])
    store.ingest(spark, late, cutoff=datetime(2024, 1, 15),
                 defer_backfill=True)
    assert len(store.queued_backfill_batches()) == 1
    cold_before = store.read_cold(spark).count()

    with _CrashOnCommit():
        with pytest.raises(RuntimeError, match="pointer flip"):
            store.flush_backfill(spark)

    assert len(store.queued_backfill_batches()) == 1  # still queued
    assert store.read_cold(spark).count() == cold_before  # cold untouched

    assert store.flush_backfill(spark) == 1
    assert store.queued_backfill_batches() == []
    assert sorted(r.id for r in store.read_cold(spark).collect()) \
        == [1, 2, 10, 11]
    # a batch queued after the flush numbers ABOVE the watermark even
    # though the consumed dirs are gone (no number reuse)
    store.ingest(spark, late.withColumn("id", F.col("id") + 5),
                 cutoff=datetime(2024, 1, 15), defer_backfill=True)
    names = store.queued_backfill_batches()
    assert len(names) == 1
    assert int(names[0].split("=")[1]) > store._state()["backfill_consumed"]


def test_dimension_snapshot_crash_before_flip(spark, tmp_path):
    """Snapshot writes snap_v<N+1> then flips snap+journal watermark in
    one commit: a crash before the flip keeps the old snapshot + full
    journal (read() replays it, nothing lost); the retry compacts."""
    from aresdb_spark.sources.hotcold import DimensionStore

    dim = DimensionStore(path=str(tmp_path / "d"), primary_key=("k",))
    dim.init_from(spark.createDataFrame([Row(k=1, name="a"),
                                         Row(k=2, name="b")]))
    dim.journal_ingest(spark.createDataFrame([Row(k=2, name="B"),
                                              Row(k=3, name="c")]))
    want = {(1, "a"), (2, "B"), (3, "c")}
    assert {(r.k, r.name) for r in dim.read(spark).collect()} == want

    with _CrashOnCommit():
        with pytest.raises(RuntimeError, match="pointer flip"):
            dim.snapshot(spark)

    # old snapshot + journal still live and consistent
    assert len(dim._journal_batches()) == 1
    assert {(r.k, r.name) for r in dim.read(spark).collect()} == want

    assert dim.snapshot(spark) == 2  # retry compacts both mutations
    assert dim._journal_batches() == []
    assert {(r.k, r.name) for r in dim.read(spark).collect()} == want
    # journal numbering continues above the watermark after GC
    dim.journal_ingest(spark.createDataFrame([Row(k=4, name="d")]))
    names = dim._journal_batches()
    assert len(names) == 1
    assert int(names[0].split("=")[1]) > dim._state()["journal_consumed"]
    assert {(r.k, r.name) for r in dim.read(spark).collect()} \
        == want | {(4, "d")}


def test_reinit_is_versioned_and_hides_stale_backfill(spark, tmp_path):
    """Re-initializing an existing store is a normal versioned mutation:
    fresh dirs (never an in-place overwrite of the live hot_v0/cold_v0),
    and backfill batches queued before the re-init stay invisible behind
    the advanced watermark — a later flush must not fold stale pre-reinit
    data into the new dataset."""
    store = _fact_store(spark, tmp_path)
    stale = spark.createDataFrame(
        [Row(id=10, ts=datetime(2024, 1, 2, 5), v=10.0)])
    store.ingest(spark, stale, cutoff=datetime(2024, 1, 15),
                 defer_backfill=True)
    assert len(store.queued_backfill_batches()) == 1

    fresh = spark.createDataFrame([
        Row(id=100, ts=datetime(2024, 1, 1, 5), v=1.0),
        Row(id=101, ts=datetime(2024, 1, 20, 5), v=2.0),
    ])
    store.init_from(fresh, datetime(2024, 1, 15))
    st = store._state()
    assert st["hot"] >= 1 and st["coldset_seq"] >= 1  # fresh, not v0
    assert store.queued_backfill_batches() == []  # stale queue hidden
    assert store.flush_backfill(spark) == 0
    assert sorted(r.id for r in
                  store.read(spark, store.saved_cutoff()).collect()) \
        == [100, 101]

    # dimension re-init: same contract
    from aresdb_spark.sources.hotcold import DimensionStore
    dim = DimensionStore(path=str(tmp_path / "d"), primary_key=("k",))
    dim.init_from(spark.createDataFrame([Row(k=1, name="a")]))
    dim.journal_ingest(spark.createDataFrame([Row(k=2, name="b")]))
    dim.init_from(spark.createDataFrame([Row(k=9, name="z")]))
    assert dim._state()["snap"] == 1
    assert dim._journal_batches() == []  # stale journal hidden
    assert {(r.k, r.name) for r in dim.read(spark).collect()} == {(9, "z")}


def test_reinit_crash_never_pairs_new_schema_with_old_dirs(spark, tmp_path):
    """ADVICE r7: the schema file is versioned and referenced by the
    pointer commit, not overwritten in place — a re-init with a CHANGED
    schema that crashes before its commit must leave the old schema
    paired with the old committed dirs (an in-place _schema.json write
    would have already poisoned every read of the live store)."""
    from pyspark.sql import Row as R

    from aresdb_spark.sources.hotcold import DimensionStore

    store = _fact_store(spark, tmp_path)
    old_fields = [f.name for f in store._schema().fields]
    wider = spark.createDataFrame(
        [Row(id=1, ts=datetime(2024, 2, 1, 5), v=1.0, extra="x")])

    with _CrashOnCommit():
        with pytest.raises(RuntimeError, match="pointer flip"):
            store.init_from(wider, datetime(2024, 2, 15))

    # old schema + old dirs still live and CONSISTENT with each other
    assert [f.name for f in store._schema().fields] == old_fields
    assert sorted(r.id for r in
                  store.read(spark, store.saved_cutoff()).collect()) \
        == [1, 2, 3, 4]
    # retry publishes the new schema WITH the new dirs, displacing the old
    store.init_from(wider, datetime(2024, 2, 15))
    assert [f.name for f in store._schema().fields] == old_fields + ["extra"]
    assert [r.extra for r in store.read(spark).collect()] == ["x"]
    import os
    assert not os.path.exists(os.path.join(store.path, "_schema.json"))

    # dimension store: same contract
    dim = DimensionStore(path=str(tmp_path / "d"), primary_key=("k",))
    dim.init_from(spark.createDataFrame([R(k=1, name="a")]))
    with _CrashOnCommit():
        with pytest.raises(RuntimeError, match="pointer flip"):
            dim.init_from(spark.createDataFrame([R(k=1, name="a", e=2)]))
    assert [f.name for f in dim._schema().fields] == ["k", "name"]
    assert {(r.k, r.name) for r in dim.read(spark).collect()} == {(1, "a")}
    dim.init_from(spark.createDataFrame([R(k=1, name="a", e=2)]))
    assert [f.name for f in dim._schema().fields] == ["k", "name", "e"]


def test_snapshot_journal_window_exactly_once(spark, tmp_path):
    """VERDICT r8 directive 5: the window between a journal append and
    the snapshot's watermark-bounded truncate. The snapshot's commit
    flips snap + watermark + displaced-ledger together and deletes
    NOTHING at the flip -- consumed journal dirs and the old snapshot
    survive the read-grace window, so (a) a reader that resolved the
    OLD state mid-replay finishes over intact files, and (b) a reader
    of the NEW state applies every mutation exactly once (the watermark
    hides the surviving dirs: add-mode would read 12, not 11, on a
    double replay). A kill inside the age-gated GC (files deleted,
    ledger commit lost) self-heals: the next pass re-reaps as a no-op."""
    import os

    from aresdb_spark.sources.hotcold import DimensionStore

    dim = DimensionStore(path=str(tmp_path / "d"), primary_key=("k",),
                         modes={"n": "add"})
    dim.init_from(spark.createDataFrame([Row(k=1, n=10), Row(k=2, n=20)]))
    dim.journal_ingest(spark.createDataFrame([Row(k=1, n=1)]))   # 10+1
    dim.journal_ingest(spark.createDataFrame([Row(k=3, n=30)]))
    want = {(1, 11), (2, 20), (3, 30)}
    # the in-flight reader: plan resolved against snap_v0 + journal
    reader = dim.read(spark)
    assert {(r.k, r.n) for r in reader.collect()} == want

    assert dim.snapshot(spark) == 2
    # nothing deleted at the flip: consumed dirs + old snap ledgered
    on_disk = [n for n in os.listdir(dim.journal_path)
               if n.startswith("batch=")]
    assert len(on_disk) == 2
    assert dim._journal_batches() == []          # hidden by watermark
    ledger = {e["dir"] for e in dim._state()["displaced"]}
    assert {"journal/" + n for n in on_disk} <= ledger
    # old-state reader finishes its replay across the snapshot commit
    assert {(r.k, r.n) for r in reader.collect()} == want
    # new-state reader: exactly once (add-mode not re-applied)
    assert {(r.k, r.n) for r in dim.read(spark).collect()} == want
    assert dim.snapshot(spark) == 0  # nothing left to compact

    # a writer appending AFTER the snapshot numbers above the watermark
    # even though the consumed dirs still exist (no number reuse)
    dim.journal_ingest(spark.createDataFrame([Row(k=1, n=5)]))
    names = dim._journal_batches()
    assert len(names) == 1
    assert int(names[0].split("=")[1]) > dim._state()["journal_consumed"]
    assert {(r.k, r.n) for r in dim.read(spark).collect()} \
        == {(1, 16), (2, 20), (3, 30)}

    # crash INSIDE the reaper between file deletes and the ledger
    # commit: files are gone, ledger still lists them
    real_commit = pointer_mod.commit_state

    def crash_commit(root, state):
        raise RuntimeError("injected kill after GC deletes")

    pointer_mod.commit_state = crash_commit
    try:
        with pytest.raises(RuntimeError, match="GC deletes"):
            dim.gc(grace_seconds=0)
    finally:
        pointer_mod.commit_state = real_commit
    left = [n for n in os.listdir(dim.journal_path)
            if n.startswith("batch=")]
    assert len(left) < 2                         # deletes happened
    assert dim._state()["displaced"]             # ledger survived crash
    assert {(r.k, r.n) for r in dim.read(spark).collect()} \
        == {(1, 16), (2, 20), (3, 30)}           # readers unaffected
    dim.gc(grace_seconds=0)                      # re-reap: no-op + clean
    assert dim._state()["displaced"] == []


def test_pre_r8_store_layout_reads_and_upgrades(spark, tmp_path):
    """Stores committed before schema versioning / the displaced ledger
    (flat _schema.json, state without "schema"/"displaced") must read
    as-is, and the next mutation upgrades them in place: new mutations
    ledger what they displace, the schema file goes versioned on the
    next re-init, and the legacy flat file is ledgered, not orphaned."""
    import json
    import os

    from aresdb_spark.sources.hotcold import HotColdStore

    # fabricate the r7 layout: versioned MONOLITHIC data dirs + flat
    # schema file + a pointer without the r8/r9 keys (no ledger, no
    # per-day cold map)
    from aresdb_spark.sources.writer import write_archive

    store = _fact_store(spark, tmp_path)
    st = store._state()
    write_archive(store.read_cold(spark),
                  os.path.join(store.path, "cold_v0"), "ts", ("ts",))
    flat = os.path.join(store.path, "_schema.json")
    os.replace(store._schema_path(st), flat)
    legacy_state = {k: v for k, v in st.items()
                    if k not in ("schema", "displaced",
                                 "cold_days", "coldset_seq")}
    legacy_state["cold"] = 0
    pointer_mod.commit_state(store.path, legacy_state)

    # reads resolve through the legacy fallback
    assert sorted(r.id for r in
                  store.read(spark, store.saved_cutoff()).collect()) \
        == [1, 2, 3, 4]
    # a mutation on the legacy store CONVERTS it (one full rewrite) and
    # ledgers both displaced monoliths normally
    store.archive(spark, datetime(2024, 1, 22))
    st2 = store._state()
    ledger = {e["dir"] for e in st2["displaced"]}
    assert {"hot_v0", "cold_v0"} <= ledger
    assert "cold" not in st2 and "cold_days" in st2  # converted
    assert "schema" not in st2  # schema untouched until re-init
    assert sorted(r.id for r in store.read(spark).collect()) == [1, 2, 3, 4]
    # re-init versions the schema and ledgers the flat legacy file
    store.init_from(spark.createDataFrame(
        [Row(id=9, ts=datetime(2024, 2, 1, 5), v=9.0)]),
        datetime(2024, 2, 15))
    assert store._state()["schema"] == 0
    assert "_schema.json" in {e["dir"] for e in store._state()["displaced"]}
    assert os.path.exists(flat)            # grace: still on disk
    store.gc(grace_seconds=0)
    assert not os.path.exists(flat)
    assert [r.id for r in store.read(spark).collect()] == [9]


def test_fact_reader_survives_concurrent_archive(spark, tmp_path):
    """The hot/cold union a reader resolved BEFORE an archive commit
    keeps working after it: the displaced hot/cold version dirs are
    ledgered (committed with the flip), not deleted — ``gc`` reaps them
    only past the read-grace window, like the reference keeping
    displaced archive batch versions until purge."""
    import os

    store = _fact_store(spark, tmp_path)
    reader = store.read(spark, store.saved_cutoff())
    want = sorted(r.id for r in reader.collect())

    # archive: hot compacts (displaced), cold-day dirs are APPENDED
    # (nothing cold-side is unreferenced — r9 per-day map)
    store.archive(spark, datetime(2024, 1, 22))
    st = store._state()
    ledger = {e["dir"] for e in st["displaced"]}
    assert "hot_v0" in ledger
    assert os.path.isdir(os.path.join(store.path, "hot_v0"))

    # the old-state reader completes its scan with the same rows
    assert sorted(r.id for r in reader.collect()) == want
    # a backfill flush REWRITES an affected day: its old dir is
    # displaced, and a reader resolved pre-flush still completes
    reader2 = store.read(spark, store.saved_cutoff())
    store.ingest(spark, spark.createDataFrame(
        [Row(id=2, ts=datetime(2024, 1, 10, 6), v=20.0)]),
        cutoff=store.saved_cutoff(), defer_backfill=True)
    store.flush_backfill(spark)
    ledger2 = {e["dir"] for e in store._state()["displaced"]}
    assert any("__day=2024-01-10" in d for d in ledger2)
    assert sorted(r.id for r in reader2.collect()) == want
    # purge (the lifecycle reaper) with grace elapsed reaps the ledger
    assert store.gc(grace_seconds=0) >= 2
    assert not os.path.isdir(os.path.join(store.path, "hot_v0"))
    assert store._state()["displaced"] == []
    assert sorted(r.id for r in
                  store.read(spark, store.saved_cutoff()).collect()) == want


def test_ingest_crash_before_flip_drops_whole_batch(spark, tmp_path):
    """A fact ingest that dies before its commit leaves the store
    EXACTLY as before — the batch is all-or-nothing even when it
    touches both hot and cold (the reference's redo-log replay gives
    the same whole-batch retry unit)."""
    store = _fact_store(spark, tmp_path)
    cutoff = datetime(2024, 1, 15)
    both_sides = spark.createDataFrame([
        Row(id=20, ts=datetime(2024, 1, 2, 5), v=20.0),   # cold side
        Row(id=21, ts=datetime(2024, 1, 20, 6), v=21.0),  # hot side
    ])
    before = sorted(r.id for r in store.read(spark, cutoff).collect())

    with _CrashOnCommit():
        with pytest.raises(RuntimeError, match="pointer flip"):
            store.ingest(spark, both_sides, cutoff=cutoff)

    assert sorted(r.id for r in store.read(spark, cutoff).collect()) \
        == before
    store.ingest(spark, both_sides, cutoff=cutoff)  # retry lands whole
    assert sorted(r.id for r in store.read(spark, cutoff).collect()) \
        == before + [20, 21]


def test_sigstore_catalog_registration_crash_window(spark, tmp_path):
    """VERDICT r8 #6: a signature-store writer dying BETWEEN its
    bucketed saveAsTable (catalog write) and its pointer commit leaves
    a catalog entry for an uncommitted version. The store must stay
    readable off the committed pointer (the catalog stale entry is
    never resolved by readers), and a retry — even with a DIFFERENT
    bucket spec — must repair the stale entry rather than reuse it."""
    import os

    from aresdb_spark.operators.dedup import (_sigstore_table,
                                              build_signature_store,
                                              incremental_near_duplicates,
                                              read_signature_store)

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps over the lazy dog")
         for i in range(40)], "doc_id long, text string")
    path = str(tmp_path / "sig")
    build_signature_store(docs, path)                    # v0 committed
    v0_rows = read_signature_store(spark, path).count()
    assert pointer_mod.read_state(path)["version"] == 0

    more = spark.createDataFrame(
        [(100 + i, f"pack my box with five dozen liquor jugs {i}")
         for i in range(40)], "doc_id long, text string")
    with _CrashOnCommit():
        with pytest.raises(RuntimeError, match="pointer flip"):
            build_signature_store(docs.unionByName(more), path)

    # files + catalog entry for v1 exist, but the pointer still says v0
    st = pointer_mod.read_state(path)
    assert st["version"] == 0
    stale = _sigstore_table(path, 1)
    assert spark.catalog.tableExists(stale)
    # the read path resolves via the committed pointer — stale entry
    # ignored, old version served intact
    assert read_signature_store(spark, path).count() == v0_rows

    # retry with a DIFFERENT bucket count: the repair line must drop
    # the stale v1 definition (8-bucket spec must win, not the crashed
    # 16-bucket one — a reused stale spec would silently mis-prune)
    build_signature_store(docs.unionByName(more), path, n_buckets=8)
    st = pointer_mod.read_state(path)
    assert st["version"] == 1 and st["n_buckets"] == 8
    desc = spark.sql(f"DESCRIBE EXTENDED {st['table']}").collect()
    buckets = {r["data_type"] for r in desc
               if r["col_name"] == "Num Buckets"}
    assert buckets == {"8"}
    assert read_signature_store(spark, path).count() > v0_rows
    # and the pruned probe (the bucket filter consumer) stays correct
    probe = docs.limit(3)
    hits = incremental_near_duplicates(spark, probe, path,
                                       threshold=0.9, prune=True)
    assert {r["store_id"] for r in hits.collect()} >= \
        {r["doc_id"] for r in probe.collect()}


def test_hot_reader_survives_concurrent_compaction(spark, tmp_path):
    """r9 append-only hot store: a reader that resolved base + PENDING
    BATCH DIRS just before an archive/compaction keeps working after
    it — consumed hotbatch dirs are ledgered with the flip (read-grace
    window), not deleted; gc reaps them only past the grace."""
    import os

    store = _fact_store(spark, tmp_path)
    cutoff = datetime(2024, 1, 15)
    for h in (1, 2, 3):
        store.ingest(spark, spark.createDataFrame(
            [Row(id=30 + h, ts=datetime(2024, 1, 21, h), v=float(h))]),
            cutoff=cutoff)
    assert len(store._pending_hot_batches()) == 3
    reader = store.read_hot(spark)           # resolves pending dirs
    want = sorted(r.id for r in reader.collect())

    store.compact_hot(spark)                 # consumes the batch dirs
    ledger = {e["dir"] for e in store._state()["displaced"]}
    assert any(d.startswith("hotbatch/batch=") for d in ledger)
    batch_dirs = [os.path.join(store.path, d) for d in ledger
                  if d.startswith("hotbatch/")]
    assert all(os.path.isdir(d) for d in batch_dirs)   # grace: intact

    # the old-state reader completes its scan with the same rows
    assert sorted(r.id for r in reader.collect()) == want
    # fresh readers resolve the compacted base, same logical rows
    assert sorted(r.id for r in store.read_hot(spark).collect()) == want
    # past the grace the reaper takes the consumed dirs with the ledger
    assert store.gc(grace_seconds=0) >= 3
    assert not any(os.path.isdir(d) for d in batch_dirs)
    assert store._state()["displaced"] == []


def test_compact_cold_days_crash_before_flip(spark, tmp_path):
    """VERDICT r10 directive 7: the day-compactor writes merged day
    dirs into a fresh coldset_v<k> and commits the map update LAST — a
    crash between the write and the flip leaves the old multi-dir map
    serving reads byte-identically, and the orphan coldset is reclaimed
    by number reuse on the retry."""
    import os

    store = _fact_store(spark, tmp_path)
    # two archives landing rows in the SAME day give that day 2 dirs
    store.archive(spark, datetime(2024, 1, 20, 12))   # id3 (01-20 05:00)
    store.ingest(spark, spark.createDataFrame(
        [Row(id=5, ts=datetime(2024, 1, 20, 18), v=5.0)]),
        cutoff=datetime(2024, 1, 20, 12))
    store.archive(spark, datetime(2024, 1, 21))       # id5 → 01-20 again
    m0 = store._cold_day_map()
    assert len(m0["2024-01-20"]) == 2
    rows0 = sorted((r.id, r.v) for r in store.read_cold(spark).collect())
    orphan_k = store._state()["coldset_seq"] + 1

    with _CrashOnCommit():
        with pytest.raises(RuntimeError, match="pointer flip"):
            store.compact_cold_days(spark)

    # old map still live, reads identical; the crashed write's dir is
    # an uncommitted orphan
    assert store._cold_day_map() == m0
    assert sorted((r.id, r.v)
                  for r in store.read_cold(spark).collect()) == rows0
    orphan = os.path.join(store.path, f"coldset_v{orphan_k}")
    assert os.path.isdir(orphan)          # present but invisible

    # retry reuses the number (reclaiming the orphan) and compacts
    assert store.compact_cold_days(spark) == 1
    m1 = store._cold_day_map()
    assert len(m1["2024-01-20"]) == 1
    assert store._state()["coldset_seq"] == orphan_k
    assert sorted((r.id, r.v)
                  for r in store.read_cold(spark).collect()) == rows0
    # the displaced 2-dir generation reaps after the grace window
    assert store.gc(grace_seconds=0) >= 2
    for rel in m0["2024-01-20"]:
        assert not os.path.isdir(os.path.join(store.path, rel))


def test_purge_per_day_map_crash_before_flip(spark, tmp_path):
    """Per-day purge is a pure metadata mutation: a crash at the commit
    leaves every expired day committed and readable; the retried purge
    drops the map entries in one write, the dirs survive in the
    displaced ledger for in-flight readers, and gc reaps them."""
    import os

    store = _fact_store(spark, tmp_path)       # cold: 01-01, 01-10
    m0 = store._cold_day_map()
    assert sorted(m0) == ["2024-01-01", "2024-01-10"]

    with _CrashOnCommit():
        with pytest.raises(RuntimeError, match="pointer flip"):
            store.purge(spark, datetime(2024, 1, 5))

    assert store._cold_day_map() == m0          # nothing dropped
    assert sorted(r.id for r in store.read_cold(spark).collect()) == [1, 2]

    store.purge(spark, datetime(2024, 1, 5))    # retry: 01-01 expires
    assert sorted(store._cold_day_map()) == ["2024-01-10"]
    assert sorted(r.id for r in store.read_cold(spark).collect()) == [2]
    # expired day's dir survives the flip (read grace), then reaps
    expired_rel = m0["2024-01-01"][0]
    assert os.path.isdir(os.path.join(store.path, expired_rel))
    assert store.gc(grace_seconds=0) >= 1
    assert not os.path.isdir(os.path.join(store.path, expired_rel))


def test_deferred_enqueue_crash_before_commit_is_invisible(spark, tmp_path):
    """ADVICE r11 #1: deferred-backfill durability is gated on the
    batch's pointer commit, never on mere directory presence. A crash
    between the queue-dir write and the commit must leave the cold half
    INVISIBLE (no torn batch whose cold rows flush while its hot rows
    were never committed), and a streaming replay of the micro-batch
    must not double-count add-mode columns at flush."""
    from datetime import datetime as dt

    from aresdb_spark.sources.hotcold import HotColdStore

    cutoff = dt(2024, 1, 15)
    store = HotColdStore(path=str(tmp_path / "t"), time_column="ts",
                         primary_key=("id",), modes={"v": "add"})
    store.init_from(spark.createDataFrame([
        Row(id=1, ts=dt(2024, 1, 2, 5), v=1.0),      # cold
        Row(id=2, ts=dt(2024, 1, 20, 5), v=2.0),     # hot
    ]), cutoff)

    # one micro-batch with a hot row AND a cold (add-mode) update
    batch = spark.createDataFrame([
        Row(id=20, ts=dt(2024, 1, 21, 5), v=20.0),   # hot
        Row(id=1, ts=dt(2024, 1, 2, 5), v=5.0),      # cold add
    ])
    with _CrashOnCommit():
        with pytest.raises(RuntimeError, match="pointer flip"):
            store.ingest(spark, batch, cutoff, defer_backfill=True)

    # the torn batch is fully invisible: queue dir exists on disk but is
    # not ledgered; the hot dir is an uncommitted orphan
    import os
    assert any(n.startswith("batch=")
               for n in os.listdir(store.backfill_path))
    assert store.queued_backfill_batches() == []
    assert store._pending_hot_batches() == []
    assert sorted(r.id for r in store.read(spark).collect()) == [1, 2]

    # the streaming replay of the SAME micro-batch is clean
    store.ingest(spark, batch, cutoff, defer_backfill=True)
    assert len(store.queued_backfill_batches()) == 1
    assert store.flush_backfill(spark) == 1
    got = {r.id: r.v for r in store.read(spark).collect()}
    # add-mode fold counted the cold update ONCE (1+5), not twice (1+5+5)
    assert got == {1: 6.0, 2: 2.0, 20: 20.0}


def test_backfill_ledger_adopts_legacy_stores(spark, tmp_path):
    """A store whose committed state predates the backfill_batches
    ledger (pre-r11) keeps the old listing rule until its next deferred
    ingest, which adopts the legacy dirs into the ledger — nothing
    queued under old code is lost."""
    from datetime import datetime as dt

    from aresdb_spark.sources import pointer
    from aresdb_spark.sources.hotcold import HotColdStore

    cutoff = dt(2024, 1, 15)
    store = HotColdStore(path=str(tmp_path / "t"), time_column="ts",
                         primary_key=("id",), modes={"v": "add"})
    store.init_from(spark.createDataFrame([
        Row(id=1, ts=dt(2024, 1, 2, 5), v=1.0),
        Row(id=2, ts=dt(2024, 1, 20, 5), v=2.0),
    ]), cutoff)
    store.ingest(spark, spark.createDataFrame(
        [Row(id=10, ts=dt(2024, 1, 3, 5), v=10.0)]),
        cutoff, defer_backfill=True)

    # simulate a pre-ledger store: strip the key from committed state
    st = store._state()
    st.pop("backfill_batches")
    pointer.commit_state(store.path, st)
    assert store.queued_backfill_batches() == ["batch=0"]  # legacy rule

    # next deferred ingest adopts the legacy dir into the ledger
    store.ingest(spark, spark.createDataFrame(
        [Row(id=11, ts=dt(2024, 1, 4, 5), v=11.0)]),
        cutoff, defer_backfill=True)
    assert store._state()["backfill_batches"] == [0, 1]
    assert store.queued_backfill_batches() == ["batch=0", "batch=1"]
    assert store.flush_backfill(spark) == 2
    assert store._state()["backfill_batches"] == []
    got = {r.id: r.v for r in store.read_cold(spark).collect()}
    assert got == {1: 1.0, 10: 10.0, 11: 11.0}
