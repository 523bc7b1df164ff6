"""Deterministic sampling/splitting, decontamination, PII redaction,
vocabulary extraction — oracle-checked against DuckDB."""

import pyspark.sql.functions as F
import pytest
from conftest import SF_DIR, assert_df_matches_duck

from aresdb_spark.operators import sampling as SA


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# --- hash split / sample ------------------------------------------------------


def test_hash_split_matches_oracle(spark, duck):
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = SA.hash_split(_docs(spark), "doc_id", splits) \
        .groupBy("split").agg(F.count("*").alias("cnt"))
    lbl = SA.split_label_sql("doc_id", splits)
    assert_df_matches_duck(
        df, duck,
        f"SELECT {lbl} AS split, count(*) AS cnt FROM documents GROUP BY 1",
        sort_by=["split"])


def test_hash_split_is_deterministic_and_total(spark):
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = SA.hash_split(_docs(spark), "doc_id", splits).select("doc_id", "split")
    b = SA.hash_split(_docs(spark), "doc_id", splits).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0
    counts = dict(a.groupBy("split").count().collect())
    n = sum(counts.values())
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] / n == pytest.approx(0.8, abs=0.05)


def test_split_fractions_must_sum_to_one(spark):
    with pytest.raises(ValueError):
        SA.split_label(F.col("doc_id"), {"train": 0.5, "val": 0.1})


def test_hash_sample_fraction(spark, duck):
    df = SA.hash_sample(_docs(spark), "doc_id", 0.25).select("doc_id")
    pred = SA.hash_sample_sql_pred("doc_id", 0.25)
    assert_df_matches_duck(
        df, duck, f"SELECT doc_id FROM documents WHERE {pred}",
        sort_by=["doc_id"])


def test_stratified_sample(spark, duck):
    from aresdb_spark.operators.text import language_id, language_id_oracle_sql

    fractions = {"en": 0.5, "de": 1.0}
    docs = _docs(spark).withColumn("lang", language_id(F.col("text")))
    df = SA.stratified_sample(docs, "lang", "doc_id", fractions,
                              default=0.1).select("doc_id", "lang")
    pred = SA.stratified_sample_sql_pred("lang", "doc_id", fractions, default=0.1)
    assert_df_matches_duck(
        df, duck,
        f"SELECT doc_id, lang FROM (SELECT doc_id, "
        f"{language_id_oracle_sql('text')} AS lang FROM documents) WHERE {pred}",
        sort_by=["doc_id"])


def test_shuffle_key_reproducible_and_seed_sensitive(spark):
    docs = _docs(spark).limit(50)
    o1 = [r["doc_id"] for r in
          docs.orderBy(SA.shuffle_key(F.col("doc_id"), "s1")).collect()]
    o2 = [r["doc_id"] for r in
          docs.orderBy(SA.shuffle_key(F.col("doc_id"), "s1")).collect()]
    o3 = [r["doc_id"] for r in
          docs.orderBy(SA.shuffle_key(F.col("doc_id"), "s2")).collect()]
    assert o1 == o2            # same seed → same order
    assert o1 != o3            # different seed → different order
    assert sorted(o1) == sorted(o3)


# --- decontamination ----------------------------------------------------------


def test_decontaminate_matches_oracle(spark, duck):
    from aresdb_spark.operators.dedup import (decontaminate,
                                              decontaminate_oracle_sql)

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    survivors = decontaminate(corpus, bench).select("doc_id")
    assert_df_matches_duck(
        survivors, duck,
        decontaminate_oracle_sql("doc_id % 17 <> 0", "doc_id % 17 = 0"),
        sort_by=["doc_id"])
    # sanity: decontamination removed something but not everything
    n_corpus, n_kept = corpus.count(), survivors.count()
    assert 0 < n_kept < n_corpus


def test_decontaminate_drops_verbatim_overlap(spark):
    from aresdb_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "an entirely different sentence with no overlap here")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "quick brown fox appears in this benchmark")],
        ["doc_id", "text"])
    kept = [r["doc_id"] for r in decontaminate(corpus, bench).collect()]
    assert kept == [2]


# --- PII redaction ------------------------------------------------------------


def test_redact_pii_patterns(spark):
    from aresdb_spark.operators.text import redact_pii

    rows = spark.createDataFrame(
        [("reach me at jo.doe+x@mail.example.org or 555-867-5309",),
         ("ssn 123-45-6789 ip 10.0.255.1 phone 123.456.7890",),
         ("no pii here, just 12345 and v1.2 text",)],
        ["text"]).select(redact_pii(F.col("text")).alias("r")).collect()
    assert rows[0]["r"] == "reach me at <EMAIL> or <PHONE>"
    assert rows[1]["r"] == "ssn <SSN> ip <IP> phone <PHONE>"
    assert rows[2]["r"] == "no pii here, just 12345 and v1.2 text"


def test_redact_pii_matches_oracle(spark, duck):
    from aresdb_spark.operators.text import redact_pii, redact_pii_oracle_sql

    # synthesize deterministic PII from doc_id so replacement is exercised
    pii = F.concat(F.lit("u"), F.col("doc_id").cast("string"),
                   F.lit("@ex.com t 555-123-4567 "), F.col("text"))
    df = _docs(spark).select("doc_id", redact_pii(pii).alias("red"))
    pii_sql = "('u' || doc_id::VARCHAR || '@ex.com t 555-123-4567 ' || text)"
    assert_df_matches_duck(
        df, duck,
        f"SELECT doc_id, {redact_pii_oracle_sql(pii_sql)} AS red FROM documents",
        sort_by=["doc_id"])


# --- vocabulary / n-grams -----------------------------------------------------


def test_top_terms_matches_oracle(spark, duck):
    from aresdb_spark.operators.text import top_terms, top_terms_oracle_sql

    df = top_terms(_docs(spark), k=50)
    assert_df_matches_duck(df, duck, top_terms_oracle_sql(k=50))


def test_ngram_counts_matches_oracle(spark, duck):
    from aresdb_spark.operators.text import ngram_counts, ngram_counts_oracle_sql

    df = ngram_counts(_docs(spark), n=2, k=40)
    assert_df_matches_duck(df, duck, ngram_counts_oracle_sql(n=2, k=40))


def test_ngram_counts_short_docs_empty(spark):
    from aresdb_spark.operators.text import ngram_counts

    df = spark.createDataFrame([("one",), ("",), ("two words",)], ["text"])
    rows = ngram_counts(df, n=2, k=10).collect()
    assert [(r["gram"], r["cnt"]) for r in rows] == [("two words", 1)]


# --- chunking / packing -------------------------------------------------------


def test_chunk_documents_matches_oracle(spark, duck):
    from aresdb_spark.operators.chunking import (chunk_documents,
                                                 chunk_documents_oracle_sql)

    df = chunk_documents(_docs(spark), chunk_tokens=16)
    assert_df_matches_duck(df, duck, chunk_documents_oracle_sql(chunk_tokens=16))


def test_chunk_documents_overlap_and_edges(spark):
    from aresdb_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, ""), (3, "x")], ["doc_id", "text"])
    rows = sorted([(r["doc_id"], r["chunk_id"], r["chunk"], r["n_tokens"])
                   for r in chunk_documents(df, chunk_tokens=3, stride=2).collect()])
    # doc 1: windows at 1,3,5 → "a b c","c d e","e"; doc 2 empty; doc 3 single
    assert rows == [(1, 0, "a b c", 3), (1, 1, "c d e", 3), (1, 2, "e", 1),
                    (3, 0, "x", 1)]


def test_pack_sequences_matches_oracle(spark, duck):
    from aresdb_spark.operators.chunking import (pack_sequences,
                                                 pack_sequences_oracle_sql)

    df = pack_sequences(_docs(spark), ctx_tokens=100, n_shards=4)
    assert_df_matches_duck(df, duck,
                           pack_sequences_oracle_sql(ctx_tokens=100, n_shards=4))


def test_pack_sequences_bins_are_dense(spark):
    from aresdb_spark.operators.chunking import pack_sequences

    packed = pack_sequences(_docs(spark), ctx_tokens=200, n_shards=4)
    # every doc binned; offsets strictly increase with id within a shard
    agg = packed.groupBy("shard", "bin").agg(
        F.sum("n_tokens").alias("tok")).collect()
    assert all(r["tok"] > 0 for r in agg)
    # a bin only exceeds ctx by at most one straddling document
    per = packed.groupBy("shard").agg(F.count("*").alias("n")).collect()
    assert sum(r["n"] for r in per) == _docs(spark).count()


def test_repetition_ratio_matches_oracle(spark, duck):
    from aresdb_spark.operators.text import (repetition_ratio,
                                             repetition_ratio_oracle_sql)

    df = _docs(spark).select(
        "doc_id", repetition_ratio(F.col("text")).alias("rep"))
    assert_df_matches_duck(
        df, duck,
        f"SELECT doc_id, {repetition_ratio_oracle_sql('text')} AS rep "
        f"FROM documents")


def test_repetition_ratio_values(spark):
    from aresdb_spark.operators.text import repetition_ratio

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "all distinct words here"), (3, "x"), (4, "")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r["rep"] for r in df.select(
        "doc_id", repetition_ratio(F.col("text")).alias("rep")).collect()}
    # doc1: 5 bigrams {a b, b a} → 1 - 2/5 = 0.6; doc2 all unique → 0.0
    assert rows == {1: 0.6, 2: 0.0, 3: 0.0, 4: 0.0}


def test_pack_text_matches_oracle(spark, duck):
    from aresdb_spark.operators.chunking import (pack_text,
                                                 pack_text_oracle_sql)

    df = pack_text(_docs(spark), ctx_tokens=150, n_shards=4)
    assert_df_matches_duck(df, duck,
                           pack_text_oracle_sql(ctx_tokens=150, n_shards=4))


def test_pack_text_concat_order(spark):
    from aresdb_spark.operators.chunking import pack_text

    df = spark.createDataFrame(
        [(3, "c c"), (1, "a a"), (2, "b b")], ["doc_id", "text"])
    rows = pack_text(df, ctx_tokens=100, n_shards=1).collect()
    assert len(rows) == 1
    assert rows[0]["seq"] == "a a b b c c"   # id order, not input order
    assert rows[0]["n_tokens"] == 6 and rows[0]["n_docs"] == 3


def test_weighted_sample_matches_oracle(spark, duck):
    from aresdb_spark.operators.sampling import (weighted_sample,
                                                 weighted_sample_sql_pred)
    from aresdb_spark.operators.text import (quality_score,
                                             quality_score_oracle_sql)

    df = weighted_sample(_docs(spark), "doc_id",
                         quality_score(F.col("text"))).select("doc_id")
    pred = weighted_sample_sql_pred("doc_id", quality_score_oracle_sql("text"))
    assert_df_matches_duck(
        df, duck, f"SELECT doc_id FROM documents WHERE {pred}")


def test_weighted_sample_extremes(spark):
    from aresdb_spark.operators.sampling import weighted_sample

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    assert weighted_sample(df, "doc_id", F.lit(0.0)).count() == 0
    assert weighted_sample(df, "doc_id", F.lit(1.5)).count() == 200
    frac = weighted_sample(df, "doc_id", F.lit(0.5)).count() / 200
    assert 0.3 < frac < 0.7


def test_cap_per_group_matches_oracle(spark, duck):
    from aresdb_spark.operators.sampling import (cap_per_group,
                                                 cap_per_group_sql)

    df = cap_per_group(_docs(spark).select("doc_id", "source"),
                       ["source"], "doc_id", n=20)
    assert_df_matches_duck(
        df, duck,
        cap_per_group_sql("SELECT doc_id, source FROM documents",
                          ["source"], "doc_id", n=20,
                          select="doc_id, source"))


def test_cap_per_group_enforces_quota(spark):
    from aresdb_spark.operators.sampling import cap_per_group

    capped = cap_per_group(_docs(spark).select("doc_id", "source"),
                           ["source"], "doc_id", n=5)
    per = capped.groupBy("source").count().collect()
    assert per and all(r["count"] <= 5 for r in per)
