"""Ingestion: upsert-by-PK semantics, streaming ingest, backfill, retention.

Reference write path: memstore/ingestion.go (ApplyUpsertBatch),
memstore/common/upsert_batch_builder.go (per-column update modes),
memstore/backfill.go, memstore/purge.go. The Spark re-expression is
declarative: batches collapse + merge via joins/aggregations, streaming via
Structured Streaming foreachBatch.
"""

from aresdb_spark.streaming.upsert import (  # noqa: F401
    UpdateMode, apply_upsert_batch, collapse_batch)
from aresdb_spark.streaming.upsert_wire import (  # noqa: F401
    UpsertBatchBuilder, decode_upsert_batch_stream,
    encode_upsert_batch_stream, iter_redo_log, parse_upsert_batch,
    upsert_batch_to_df, write_redo_log)
from aresdb_spark.streaming.data_handler import (  # noqa: F401
    DataHandler, recover_from_redo_log)
from aresdb_spark.streaming.job_config import JobConfig  # noqa: F401
from aresdb_spark.streaming.redolog_browser import RedoLogBrowser  # noqa: F401
from aresdb_spark.streaming.connector import Connector  # noqa: F401
