"""Continuous-crawl dedup walkthrough: the incremental pipeline a
training-data team runs every crawl cycle, composed from this repo's
operators — history is NEVER re-mined.

Per cycle (three deterministic "days" sliced from the documents table):

  1. exact dedup WITHIN the batch (`dedup_exact` — cheapest first, and
     it protects LSH from degenerate identical-text buckets),
  2. quality gate (`quality_score` threshold — drop boilerplate before
     paying for signatures),
  3. incremental near-dup check against the persisted signature store
     (`incremental_near_duplicates` — broadcast probe, one store scan,
     zero re-shingling of history),
  4. accepted docs append to the corpus AND to the store
     (`build_signature_store(mode="append")`),
  5. a retention compaction at the end
     (`compact_signature_store` — purged docs must stop matching).

Usage: python examples/run_continuous_crawl.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def run(spark, workdir: str, sf_dir: str = SF_DIR) -> dict:
    from pyspark.sql import functions as F

    from aresdb_spark.operators.dedup import (
        build_signature_store, compact_signature_store, dedup_exact,
        incremental_near_duplicates)
    from aresdb_spark.operators.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store = os.path.join(workdir, "sigstore")
    corpus_ids: set = set()
    log = []

    for day in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == day)
        if day == 2:
            # day 2 re-crawls a third of day 0's pages under new urls —
            # exactly what a recurring crawl produces
            recrawl = (docs.filter(F.col("doc_id") % 9 == 0)
                       .withColumn("doc_id", F.col("doc_id") + 1000000))
            batch = batch.unionByName(recrawl)
        n_raw = batch.count()

        # 1. exact dedup within the batch
        batch = dedup_exact(batch)
        n_exact = batch.count()

        # 2. quality gate
        batch = batch.filter(quality_score(F.col("text")) >= 0.3)
        n_quality = batch.count()

        # 3. incremental near-dup vs history (skip day 0: empty store)
        if day == 0:
            dup_ids = set()
        else:
            hits = incremental_near_duplicates(spark, batch, store,
                                               threshold=0.8)
            dup_ids = {r.new_id for r in hits.select("new_id")
                       .distinct().collect()}
        accepted = batch.filter(~F.col("doc_id").isin(list(dup_ids))
                                if dup_ids else F.lit(True))
        n_accepted = accepted.count()

        # 4. append accepted docs to the store
        build_signature_store(accepted, store,
                              mode="overwrite" if day == 0 else "append")
        corpus_ids |= {r.doc_id for r in accepted.select("doc_id")
                       .collect()}
        log.append({"day": day, "crawled": n_raw, "after_exact": n_exact,
                    "after_quality": n_quality,
                    "near_dup_of_history": len(dup_ids),
                    "accepted": n_accepted})

    # 5. retention: expire the oldest tenth of the corpus
    expired = sorted(corpus_ids)[:len(corpus_ids) // 10]
    retained = spark.createDataFrame(
        [(i,) for i in sorted(corpus_ids - set(expired))],
        "doc_id long")
    kept_rows = compact_signature_store(spark, store, retained)

    return {"days": log, "corpus_size": len(corpus_ids),
            "expired": len(expired),
            "store_rows_after_compaction": kept_rows}


def main():
    from aresdb_spark.session import get_spark

    spark = get_spark(app_name="crawl-example", cpus=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR
    print(json.dumps(run(spark, tempfile.mkdtemp(prefix="crawl_"),
                         sf_dir), indent=2))


if __name__ == "__main__":
    main()
