"""Subscriber job configuration — the consume→transform→sink rule set.

Reference: subscriber/common/rules/job_config.go (JobConfig wrapping
controller/models/job.go:55-62: ``job`` name, ``streamConfig`` Kafka
params, ``aresTableConfig`` carrying the destination table schema and a
per-column ``updateMode`` map). The reference derives, per non-deleted
column, a destination (table/column/update-mode) and a transformation
(source field, type, default value) — transformations are NoOp-with-
rename plus default substitution (rules/transformation.go:20-50).

Here the same document compiles to Spark artifacts:

- ``decode_schema()`` — the StructType for the JSON payload decoder
  (``ingest.decode_json_values``), one field per live column.
- ``transform(df)`` — the per-column rule application: select live
  columns, lowercase case-insensitive enums, substitute typed default
  values for NULLs (the reference's transformation default path).
- ``update_modes()`` — column → UpdateMode name for
  ``apply_upsert_batch``: primary keys are always overwrite-not-null;
  other columns read the job's updateMode map
  (job_config.go:226-234, 366-381).

The whole pipeline for a job is then
``kafka_source(...)`` / file source → ``decode_json_values`` →
``job.transform`` → ``start_upsert_stream(store, modes=job.update_modes())``.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# parseUpdateMode (job_config.go:366-381); unknown strings fall back to
# overwrite-not-null exactly like the reference
_UPDATE_MODES = {
    "overwrite_notnull": "overwrite",
    "overwrite_force": "force",
    "addition": "add",
    "min": "min",
    "max": "max",
}

def _spark_type(type_name: str) -> str:
    """JSON payloads carry enum strings (the metastore map is the single
    source of truth)."""
    from aresdb_spark.metastore import spark_type_for

    return spark_type_for(type_name)


class JobConfig:
    """Parsed subscriber job document. ``columns`` keeps only live
    (non-tombstoned) columns; a duplicated column name keeps the later
    definition, matching the reference's columnDict overwrite."""

    def __init__(self, doc: dict[str, Any]):
        self.doc = doc
        self.name = doc.get("job", "")
        table_cfg = doc.get("aresTableConfig") or {}
        self.table_doc = table_cfg.get("schema") or {}
        self.table = self.table_doc.get("name", "")
        self._mode_overrides = {
            k: v for k, v in (table_cfg.get("updateMode") or {}).items()}
        stream = doc.get("streamConfig") or {}
        self.topic = stream.get("topic", "")
        self.kafka_broker = stream.get("kafkaBroker", "")
        self.batch_size = stream.get("batchSize", 32768)

        cols: dict[str, dict] = {}
        for c in self.table_doc.get("columns") or []:
            if not c.get("deleted"):
                cols[c["name"]] = c  # later duplicate wins (columnDict)
        self.columns = cols
        pk_ids = self.table_doc.get("primaryKeyColumns") or []
        all_cols = self.table_doc.get("columns") or []
        self.primary_keys = [all_cols[i]["name"] for i in pk_ids
                             if i < len(all_cols)]

    @classmethod
    def from_json(cls, obj: "dict | str") -> "JobConfig":
        return cls(json.loads(obj) if isinstance(obj, str) else obj)

    # -- derived artifacts --------------------------------------------------

    def decode_schema(self):
        """StructType for the JSON payload: one field per live column
        (the reference reads each destination column's source field of
        the same name). Built without a live session (unlike
        _parse_datatype_string) so job documents parse anywhere."""
        from pyspark.sql import types as T

        atomic = {
            "boolean": T.BooleanType(), "tinyint": T.ByteType(),
            "smallint": T.ShortType(), "int": T.IntegerType(),
            "bigint": T.LongType(), "float": T.FloatType(),
            "string": T.StringType(),
        }

        def dtype(name: str):
            if name.startswith("array<"):
                return T.ArrayType(atomic[name[6:-1]])
            return atomic[name]

        return T.StructType([
            T.StructField(name, dtype(_spark_type(c["type"])))
            for name, c in self.columns.items()])

    def update_modes(self) -> dict[str, str]:
        """getUpdateMode: PKs force overwrite-not-null; others read the
        job's updateMode map with unknown strings falling back."""
        out = {}
        for name in self.columns:
            if name in self.primary_keys:
                out[name] = "overwrite"
            else:
                out[name] = _UPDATE_MODES.get(
                    str(self._mode_overrides.get(name, "")).lower(),
                    "overwrite")
        return out

    def _default_lit(self, c: dict) -> "Column | None":
        d = c.get("defaultValue")
        if d is None:
            return None
        return F.lit(d).cast(_spark_type(c["type"]))

    def transform(self, df: DataFrame,
                  substitute_defaults: bool = False) -> DataFrame:
        """The per-column transformation pass: select live columns in
        schema order and lowercase case-insensitive enums (memstore enum
        translation behavior). NULLs stay NULL — the reference's NoOp
        transformation passes nil through (transformation.go:36-39), and
        substituting the schema default here would defeat
        overwrite-not-null on upsert (a NULL in a late batch would
        clobber an existing value with the default). Schema defaults are
        a storage/query-level concern; pass ``substitute_defaults=True``
        only for append-only sinks where that hazard can't occur.
        Missing source fields materialize as NULL columns."""
        out: list[Column] = []
        for name, c in self.columns.items():
            col = F.col(name) if name in df.columns \
                else F.lit(None).cast(_spark_type(c["type"]))
            if c.get("caseInsensitive") and c["type"] in (
                    "SmallEnum", "BigEnum"):
                col = F.lower(col)
            if substitute_defaults:
                default = self._default_lit(c)
                if default is not None:
                    col = F.coalesce(col, default)
            out.append(col.alias(name))
        return df.select(*out)

    def start(self, spark, store, cutoff_fn, checkpoint_dir: str,
              path: str | None = None, fmt: str = "parquet",
              available_now: bool = False):
        """Wire the full job: source (file-backed for tests; Kafka via
        ``ingest.kafka_source`` when a broker exists) → transform →
        upsert stream into the HotColdStore."""
        from aresdb_spark.streaming import ingest

        if path is not None:
            src = ingest.file_source(spark, path, self.decode_schema(), fmt)
        else:
            src = ingest.kafka_source(spark, self.kafka_broker, self.topic,
                                      self.decode_schema())
        return ingest.start_upsert_stream(
            src, store, cutoff_fn, checkpoint_dir,
            transform=self.transform, available_now=available_now,
            modes=self.update_modes())
