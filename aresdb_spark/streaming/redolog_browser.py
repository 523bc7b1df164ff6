"""Redo-log browser — the debug surface for inspecting redo log files.

Reference: memstore/redo_log_browser.go (ListLogFiles / ListUpsertBatch /
ReadData), served over HTTP by api/debug_handler.go. Operators use it to
inspect what a shard would replay on recovery without actually replaying.

Same shapes here: creation-time-named ``<ts>.redolog`` files in a table
shard directory, batch START offsets (from the 0xADDAFEED header, so the
first batch is always at offset 4 — redo_log_browser.go:74), and row
slices decoded through the V1 wire codec with column ids resolved to
names via the schema document."""

from __future__ import annotations

import os
import struct

from aresdb_spark.streaming.upsert_wire import (REDO_LOG_MAGIC,
                                                parse_upsert_batch)


class RedoLogBrowser:
    def __init__(self, table_dir: str, schema_doc: dict):
        self.table_dir = table_dir
        self.schema_doc = schema_doc

    def list_log_files(self) -> list[int]:
        """Creation times of the shard's redo log files, ascending
        (diskstore ListLogFiles analog)."""
        out = []
        for name in os.listdir(self.table_dir):
            stem, dot, ext = name.partition(".")
            if ext == "redolog" and stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def _read(self, creation_time: int) -> bytes:
        with open(os.path.join(self.table_dir,
                               f"{creation_time}.redolog"), "rb") as f:
            return f.read()

    def list_upsert_batch(self, creation_time: int) -> list[int]:
        """Start offsets (of the 4-byte size prefix) of every batch in
        the file; the magic header is validated first and a short file
        is an error, not a silent truncation — this is a debug reader,
        not recovery (redo_log_browser.go:60-100)."""
        data = self._read(creation_time)
        if len(data) < 4 or \
                struct.unpack_from("<I", data, 0)[0] != REDO_LOG_MAGIC:
            raise ValueError("invalid redo log magic header")
        offsets, off = [], 4
        while off < len(data):
            if off + 4 > len(data):
                raise ValueError(f"truncated size prefix at offset {off}")
            (size,) = struct.unpack_from("<I", data, off)
            if off + 4 + size > len(data):
                raise ValueError(f"truncated batch at offset {off}")
            offsets.append(off)
            off += 4 + size
        return offsets

    def read_data(self, creation_time: int, batch_offset: int,
                  start: int, length: int):
        """Decode the batch at ``batch_offset`` and return
        ``(rows, column_names, num_rows)`` for the ``[start, start +
        length)`` row slice, clamped to the batch like the reference
        (upsert_batch.go:408-419: a slice that starts at/past the end is
        "Invalid start or length")."""
        data = self._read(creation_time)
        (size,) = struct.unpack_from("<I", data, batch_offset)
        batch = parse_upsert_batch(
            data[batch_offset + 4:batch_offset + 4 + size])

        cols = self.schema_doc.get("columns") or []
        names = []
        for c in batch.columns:
            if c.column_id >= len(cols):
                raise ValueError(f"column id {c.column_id} out of range")
            names.append(cols[c.column_id]["name"])

        length = min(length, batch.num_rows - start)
        if start < 0 or length <= 0:
            raise ValueError("Invalid start or length")
        rows = [list(r) for r in batch.rows()[start:start + length]]
        return rows, names, batch.num_rows
