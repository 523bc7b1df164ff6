"""Ingestion: upsert-by-PK semantics, streaming ingest, backfill, retention.

Reference write path: memstore/ingestion.go (ApplyUpsertBatch),
memstore/common/upsert_batch_builder.go (per-column update modes),
memstore/backfill.go, memstore/purge.go. The Spark re-expression is
declarative: batches collapse + merge via joins/aggregations, streaming via
Structured Streaming foreachBatch.
"""

from aresdb_spark.streaming.upsert import (  # noqa: F401
    UpdateMode, apply_upsert_batch, collapse_batch)
