"""Document chunking + sequence packing for LLM training-data prep.

Two ops a tokenize-and-train pipeline runs right before writing shards:

  - ``chunk_documents``: split each document into fixed-token windows
    (optionally overlapping, stride < chunk) — the "context window
    chunking" step. Pure scan-side expression: tokenize once per row
    (let-bound), build the window-start list, explode. No shuffle, no
    UDF; at 100 TB it rides the scan like every other text op.

  - ``pack_sequences``: assign every document a (shard, bin) so that
    concatenating a bin's documents in order yields ~ctx_tokens tokens —
    the "sequence packing" step that keeps training batches dense.
    Deterministic: docs are md5-hashed into shards, ordered by id within
    the shard, and binned by their running token offset. The window
    cumsum is PARTITIONED by shard — each shard's window state is
    independent, so the sort is per-shard (no global single-partition
    window, which would serialize at scale). n_shards scales with the
    cluster; packing quality is unaffected because bins never span
    shards.

Both have exact DuckDB oracle renderings (committed tokenizer + md5
bucketing), so the driver's hash-match gate covers them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aresdb_spark.operators.sampling import hash_bucket, hash_bucket_sql
from aresdb_spark.operators.text import (token_count, token_count_oracle_sql,
                                         tokens, tokens_oracle_sql)
from aresdb_spark.operators.util import let as _let


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 64,
                    stride: int | None = None) -> DataFrame:
    """Explode each document into fixed-token-window chunks.

    Window starts are 1, 1+stride, 1+2·stride, … ≤ n_tokens, so with
    stride == chunk_tokens (default) chunks tile the document with a
    partial tail chunk; stride < chunk_tokens overlaps them. Empty
    documents produce no chunks. Returns (id, chunk_id, chunk, n_tokens).
    """
    stride = stride or chunk_tokens
    struct_t = "array<struct<chunk_id:int,chunk:string,n_tokens:int>>"

    def build(toks):
        starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)),
                            F.lit(stride))
        chunks = F.transform(starts, lambda s: F.struct(
            ((s - 1) / stride).cast("int").alias("chunk_id"),
            F.array_join(F.slice(toks, s, chunk_tokens), " ").alias("chunk"),
            F.least(F.size(toks) - s + 1, F.lit(chunk_tokens)).cast("int")
             .alias("n_tokens")))
        return F.when(F.size(toks) > 0, chunks) \
                .otherwise(F.array().cast(struct_t))

    exploded = df.select(
        F.col(id_col), F.explode(_let(tokens(F.col(text_col)), build)).alias("c"))
    return exploded.select(id_col, "c.chunk_id", "c.chunk", "c.n_tokens")


def chunk_documents_oracle_sql(table: str = "documents",
                               text_col: str = "text", id_col: str = "doc_id",
                               chunk_tokens: int = 64,
                               stride: int | None = None) -> str:
    stride = stride or chunk_tokens
    toks = tokens_oracle_sql(text_col)
    return f"""
WITH t AS (SELECT {id_col}, {toks} AS toks FROM {table}),
s AS (SELECT {id_col}, toks,
             unnest(range(1, len(toks) + 1, {stride})) AS st
      FROM t WHERE len(toks) > 0)
SELECT {id_col}, ((st - 1) // {stride})::INT AS chunk_id,
       array_to_string(toks[st:st + {chunk_tokens - 1}], ' ') AS chunk,
       least(len(toks) - st + 1, {chunk_tokens})::INT AS n_tokens
FROM s
"""


def pack_sequences(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", ctx_tokens: int = 256,
                   n_shards: int = 16, salt: str = "pack") -> DataFrame:
    """Assign (shard, offset, bin) to every document: concatenating a
    (shard, bin) group's documents in id order yields roughly ctx_tokens
    tokens per bin. offset = running token count of the docs before this
    one within the shard; bin = offset // ctx_tokens (documents are not
    split — a doc straddling the boundary belongs to the bin its first
    token lands in)."""
    shard = hash_bucket(F.col(id_col), n_shards, salt)
    cnt = token_count(F.col(text_col))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    base = df.select(F.col(id_col), shard.alias("shard"), cnt.alias("n_tokens"))
    return (base
            .withColumn("offset", F.coalesce(F.sum("n_tokens").over(w),
                                             F.lit(0)).cast("long"))
            .withColumn("bin", (F.col("offset") / ctx_tokens).cast("int")))


def pack_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              ctx_tokens: int = 256, n_shards: int = 16,
              salt: str = "pack", sep: str = " ") -> DataFrame:
    """Materialize the packed sequences: one row per (shard, bin) with the
    documents concatenated in id order plus token/doc counts — the shard
    file a training job would read. Deterministic order via array_sort
    over (id, text) structs (sorts by id first). Two shuffles: the
    per-shard offset window, then the (shard, bin) aggregation; both keys
    lead with shard so partition counts stay cluster-sized, and each bin
    is ~ctx_tokens of text regardless of data volume."""
    shard = hash_bucket(F.col(id_col), n_shards, salt)
    cnt = token_count(F.col(text_col))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    asg = (df.select(F.col(id_col), F.col(text_col).alias("__text"),
                     shard.alias("shard"), cnt.alias("n_tokens"))
           .withColumn("offset", F.coalesce(F.sum("n_tokens").over(w),
                                            F.lit(0)).cast("long"))
           .withColumn("bin", (F.col("offset") / ctx_tokens).cast("int")))
    ordered = F.array_sort(F.collect_list(F.struct(id_col, "__text")))
    return (asg.groupBy("shard", "bin")
            .agg(F.array_join(F.transform(ordered, lambda s: s["__text"]),
                              sep).alias("seq"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 F.count("*").alias("n_docs")))


def pack_text_oracle_sql(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id", ctx_tokens: int = 256,
                         n_shards: int = 16, salt: str = "pack",
                         sep: str = " ") -> str:
    shard = hash_bucket_sql(id_col, n_shards, salt)
    cnt = token_count_oracle_sql(text_col)
    sq = sep.replace("'", "''")
    return f"""
WITH b AS (SELECT {id_col}, {text_col} AS t, {shard} AS shard,
                  {cnt} AS n_tokens FROM {table}),
a AS (SELECT *, (coalesce(sum(n_tokens) OVER (
        PARTITION BY shard ORDER BY {id_col}
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        // {ctx_tokens})::INT AS bin FROM b)
SELECT shard, bin, string_agg(t, '{sq}' ORDER BY {id_col}) AS seq,
       sum(n_tokens)::BIGINT AS n_tokens, count(*) AS n_docs
FROM a GROUP BY 1, 2
"""


def pack_sequences_oracle_sql(table: str = "documents",
                              text_col: str = "text", id_col: str = "doc_id",
                              ctx_tokens: int = 256, n_shards: int = 16,
                              salt: str = "pack") -> str:
    shard = hash_bucket_sql(id_col, n_shards, salt)
    cnt = token_count_oracle_sql(text_col)
    return f"""
WITH b AS (SELECT {id_col}, {shard} AS shard, {cnt} AS n_tokens FROM {table})
SELECT {id_col}, shard, n_tokens,
       coalesce(sum(n_tokens) OVER (
         PARTITION BY shard ORDER BY {id_col}
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS "offset",
       (coalesce(sum(n_tokens) OVER (
         PARTITION BY shard ORDER BY {id_col}
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {ctx_tokens})::INT AS bin
FROM b
"""
