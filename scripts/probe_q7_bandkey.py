"""q7 band-key exchange experiment (VERDICT r15 directive 3).

Premise check first: the directive says "the band-explode currently
shuffles full 100-element signatures". The committed plan
(plans/r15/q7_minhash_neardup_after.txt and the candidate plan dumped
here) shows the exchange input is (id, band, bh) — the md5 band hash is
computed SCAN-SIDE inside the explode projection and the signature
array never crosses the exchange. The remaining narrowing available
inside the fixed algorithm is the key representation: bh is a 32-char
hex STRING (~32 bytes + UTF8String overhead); `unhex(bh)` is the same
value as 16 raw bytes, and unhex is injective on md5 hex output, so
grouping on (band, unhex(bh)) builds byte-for-byte the same buckets
and the same candidate pairs.

Measures wall (min of 3 after warmup) AND actual shuffle write bytes
(REST API) for both variants at the given tier.

Usage: python scripts/probe_q7_bandkey.py <sf_dir> [out_json]
"""
import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1_from_sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else None


def main():
    from pyspark.sql import functions as F

    from aresdb_spark.operators.dedup import (MAX_BUCKET_SIZE, N_BANDS,
                                              ROWS_PER_BAND, _band_hash,
                                              _parallelize,
                                              minhash_signature)
    from aresdb_spark.session import get_spark

    spark = get_spark(app_name="probe-q7-bandkey",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    app_url = f"{ui}/api/v1/applications/{app_id}"

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def candidates(key_mode):
        sig = minhash_signature(F.col("text"))
        base = _parallelize(docs.select(F.col("doc_id").alias("id"),
                                        F.col("text"))) \
            .select("id", sig.alias("sig"))
        def bh(b):
            h = _band_hash(F.col("sig"), b, ROWS_PER_BAND)
            return F.unhex(h) if key_mode == "unhex" else h
        bands = base.select(
            "id",
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"), bh(b).alias("bh"))
                for b in range(N_BANDS)])).alias("bb"),
        ).select("id", "bb.band", "bb.bh")
        buckets = (bands.groupBy("band", "bh")
                   .agg(F.array_sort(F.collect_list("id")).alias("ids"))
                   .filter(F.size("ids") >= 2))
        combos = F.flatten(F.transform(
            F.col("ids"),
            lambda a, i: F.transform(
                F.slice(F.col("ids"), i + 2,
                        F.greatest(F.lit(0), F.size(F.col("ids")) - i - 1)),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")))))
        return (buckets.select(F.explode(combos).alias("p"))
                .select("p.id_a", "p.id_b").distinct())

    def shuffle_bytes_snapshot():
        stages = json.loads(urllib.request.urlopen(
            app_url + "/stages?status=complete", timeout=10).read())
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)

    out = {"sf_dir": SF_DIR, "variants": {}}
    for mode in ("hex", "unhex", "hex"):   # hex twice: order-bias check
        cand = None
        walls = []
        candidates(mode).count()           # warmup
        sb0 = shuffle_bytes_snapshot()
        t0 = time.perf_counter()
        cand = candidates(mode).count()
        first_wall = time.perf_counter() - t0
        sb1 = shuffle_bytes_snapshot()
        walls.append(first_wall)
        for _ in range(2):
            t0 = time.perf_counter()
            candidates(mode).count()
            walls.append(time.perf_counter() - t0)
        key = mode if mode not in out["variants"] else mode + "_rerun"
        out["variants"][key] = {
            "n_candidates": cand,
            "wall_min3": round(min(walls), 4),
            "walls": [round(w, 4) for w in walls],
            "shuffle_write_bytes_one_pass": sb1 - sb0,
        }
        print(key, out["variants"][key], flush=True)
    if OUT:
        with open(OUT, "w") as f:
            json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
