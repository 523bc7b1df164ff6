"""Client connector — the reference Go client's ``Insert`` path.

Reference: client/connector.go (Insert :149-192, prepareUpsertBatch
:382-520, checkPrimaryKeys :251-260, checkTimeColumnExistence :263-279,
prepareEnumCases :285-378, computeHLLValue :200-227) and
client/schema.go (TranslateEnum :114-142, PrepareEnumCases :199-240).

A reference application ingests row-shaped data through this surface:
the connector validates the shape, auto-extends enum dictionaries,
translates enum strings to wire ids, drops invalid rows (the
"abandoned rows" accounting), builds the binary UpsertBatch, and posts
it to ``/data/{table}/{shard}``. Here the POST lands on the in-process
``DataHandler``; everything else mirrors the Go client rule-for-rule."""

from __future__ import annotations

import json
import struct
from typing import Any

from aresdb_spark.metastore import SchemaStore

# client/connector.go:43 — enum strings longer than this abandon the row
MAX_ENUM_STRING = 1024

# memCom.ColumnUpdateMode — wire update modes
UPDATE_OVERWRITE_NOTNULL = 0
UPDATE_FORCE_OVERWRITE = 1

# metastore/common/model.go:170-177 — every OTHER type is overwrite-only
_NON_OVERWRITE_ONLY_TYPES = {"Uint8", "Int8", "Uint16", "Int16",
                             "Uint32", "Int32", "Float32", "Int64"}

_ENUM_TYPES = ("SmallEnum", "BigEnum")
_ENUM_ARRAY_TYPES = ("SmallEnum[]", "BigEnum[]")


class ConnectorError(ValueError):
    pass


class Connector:
    """Row-based ingestion client over a SchemaStore + DataHandler pair
    (the in-process analog of ConnectorConfig.NewConnector)."""

    def __init__(self, schema_store: SchemaStore, data_handler):
        self.store = schema_store
        self.handler = data_handler

    # the Insert entry point (connector.go:149-192)
    def insert(self, table: str, column_names: list[str],
               rows: list[list[Any]],
               update_modes: "list[int] | None" = None,
               shard: int = 0) -> int:
        """Insert rows; returns the number of rows actually ingested
        (invalid rows are dropped, not errored — connector.go's
        abandoned-rows accounting)."""
        if not column_names:
            raise ConnectorError("No column names specified")
        if update_modes is None:
            update_modes = [UPDATE_OVERWRITE_NOTNULL] * len(column_names)
        if len(update_modes) != len(column_names):
            raise ConnectorError(
                f"length of column update modes {len(update_modes)} does "
                f"not equal to number of columns {len(column_names)}")
        if not rows:
            return 0
        for row in rows:
            if len(row) != len(column_names):
                raise ConnectorError(
                    f"Length of column names should match length of a "
                    f"single row, length of column names: "
                    f"{len(column_names)}, length of row: {len(row)}")

        buf, n_rows = self._prepare_upsert_batch(
            table, column_names, update_modes, rows)
        status, body = self.handler.post_data(table, shard, buf)
        if status != 200:
            raise ConnectorError(
                f"Failed to post upsert batch, table: {table}, "
                f"shard: {shard}: {body}")
        return n_rows

    # -- schema checks -------------------------------------------------------

    def _check_primary_keys(self, schema: dict,
                            column_names: list[str]) -> None:
        cols = schema.get("columns") or []
        for cid in schema.get("primaryKeyColumns") or []:
            if cols[cid]["name"] not in column_names:
                raise ConnectorError("Missing primary key column")

    def _check_time_column(self, schema: dict,
                           column_names: list[str]) -> None:
        if not schema.get("isFactTable") or \
                (schema.get("config") or {}).get("allowMissingEventTime"):
            return
        cols = schema.get("columns") or []
        if cols and cols[0]["name"] in column_names:
            return
        raise ConnectorError("Missing time column")

    # -- enum preparation (prepareEnumCases) ---------------------------------

    def _prepare_enum_cases(self, table: str, col: dict, col_idx: int,
                            rows: list[list[Any]],
                            abandoned: set[int]) -> None:
        is_array = col["type"] in _ENUM_ARRAY_TYPES
        ci = bool(col.get("caseInsensitive"))
        cases: set[str] = set()
        for ri, row in enumerate(rows):
            if ri in abandoned:
                continue
            value = row[col_idx]
            if value is None:
                continue
            if not isinstance(value, str):
                abandoned.add(ri)  # "Enum value should be string"
                continue
            if len(value) > MAX_ENUM_STRING:
                abandoned.add(ri)  # "Enum string value is too long"
                continue
            if is_array:
                # array enums travel as a JSON-encoded list of strings
                try:
                    items = json.loads(value)
                    assert isinstance(items, list)
                except (ValueError, AssertionError):
                    abandoned.add(ri)
                    continue
                bad = False
                for item in items:
                    if item is None:
                        continue
                    if not isinstance(item, str):
                        bad = True
                        break
                    cases.add(item.lower() if ci else item)
                if bad:
                    abandoned.add(ri)
            else:
                cases.add(value.lower() if ci else value)
        if cases and not col.get("disableAutoExpand"):
            known = set(self.store.get_enum_cases(table, col["name"]))
            new = sorted(cases - known)
            if new:
                self.store.extend_enum_dict(table, col["name"], new)

    def _enum_dict(self, table: str, col: dict) -> tuple[dict, "int | None"]:
        """One ``{case: id}`` map per column (the Go client builds
        ``enumDict`` once in TranslateEnum's caller, client/schema.go:199-240
        — resolving the cases list per cell would be O(rows × cases))
        plus the pre-resolved defaultValue id."""
        known = self.store.get_enum_cases(table, col["name"])
        ids = {case: i for i, case in enumerate(known)}
        default = col.get("defaultValue")
        return ids, ids.get(default) if default is not None else None

    @staticmethod
    def _translate_enum(col: dict, value: str, enum_ids: dict,
                        default_id: "int | None"):
        """String case → wire id; unknown → the column's defaultValue id,
        else None (TranslateEnum: unknown = -1 ⇒ nil)."""
        if col.get("caseInsensitive"):
            value = value.lower()
        return enum_ids.get(value, default_id)

    # -- the batch builder (prepareUpsertBatch) ------------------------------

    def _prepare_upsert_batch(self, table: str, column_names: list[str],
                              update_modes: list[int],
                              rows: list[list[Any]]) -> tuple[bytes, int]:
        from aresdb_spark.streaming.upsert_wire import UpsertBatchBuilder

        schema = self.store.get_table(table)
        self._check_primary_keys(schema, column_names)
        self._check_time_column(schema, column_names)

        cols = schema.get("columns") or []
        id_by_name = {c["name"]: i for i, c in enumerate(cols)
                      if not c.get("deleted")}
        pk = set(schema.get("primaryKeyColumns") or [])
        sort = set(schema.get("archivingSortColumns") or [])
        is_fact = bool(schema.get("isFactTable"))
        allow_missing_time = bool(
            (schema.get("config") or {}).get("allowMissingEventTime"))

        # resolve input columns; unknown names are skipped silently
        resolved: list[tuple[int, int, dict, int]] = []  # (input, cid, col, mode)
        abandoned: set[int] = set()
        for in_idx, name in enumerate(column_names):
            cid = id_by_name.get(name)
            if cid is None:
                continue
            col = cols[cid]
            # overwrite-only rule (connector.go:409-418): dimension
            # tables, PK/sort columns, and non-numeric types accept only
            # overwrite modes
            overwrite_only = (not is_fact or cid in pk or cid in sort
                              or col["type"] not in _NON_OVERWRITE_ONLY_TYPES)
            if overwrite_only and update_modes[in_idx] > UPDATE_FORCE_OVERWRITE:
                raise ConnectorError(
                    f"column {name} only supports overwrite")
            if col["type"] in _ENUM_TYPES + _ENUM_ARRAY_TYPES:
                self._prepare_enum_cases(table, col, in_idx, rows, abandoned)
            resolved.append((in_idx, cid, col, update_modes[in_idx]))

        # enum dictionaries resolve ONCE per column, after auto-expansion
        enum_dicts = {cid: self._enum_dict(table, col)
                      for _i, cid, col, _m in resolved
                      if col["type"] in _ENUM_TYPES + _ENUM_ARRAY_TYPES}

        # translate each surviving row; PK/time nils drop the row
        out_rows: list[list[Any]] = []
        for ri, row in enumerate(rows):
            if ri in abandoned:
                continue
            vals: list[Any] = []
            ok = True
            for in_idx, cid, col, _mode in resolved:
                value = row[in_idx]
                if value is None and cid in pk:
                    ok = False  # "PrimaryKey column is nil"
                    break
                if value is None and is_fact and cid == 0 \
                        and not allow_missing_time:
                    ok = False  # "Time column is nil"
                    break
                if col["type"] in _ENUM_TYPES and value is not None:
                    value = self._translate_enum(col, value, *enum_dicts[cid])
                elif col["type"] in _ENUM_ARRAY_TYPES and value is not None:
                    items = json.loads(value)
                    value = [None if i is None
                             else self._translate_enum(col, i,
                                                       *enum_dicts[cid])
                             for i in items]
                elif (col.get("hllConfig") or {}).get("isHLLColumn") \
                        and value is not None:
                    value = self._compute_hll_value(col["type"], value)
                elif value is not None:
                    # the reference's SetValue runs memCom.ConvertToXxx —
                    # string forms ("123", "1.5", "true", dashed UUIDs,
                    # "Point(a b)") coerce per the column dtype; an
                    # unconvertible value drops the row, same as the Go
                    # client's RemoveRow on SetValue error
                    try:
                        value = self._coerce_value(col["type"], value)
                    except (ValueError, TypeError, IndexError):
                        ok = False
                        break
                vals.append(value)
            if ok:
                out_rows.append(vals)

        b = UpsertBatchBuilder(arrival_time=0)
        for _in_idx, cid, col, mode in resolved:
            wire_type = col["type"]
            if (col.get("hllConfig") or {}).get("isHLLColumn"):
                wire_type = "Uint32"  # hll register values travel as u32
            b.add_column(cid, wire_type, update_mode=mode)
        for r, vals in enumerate(out_rows):
            b.add_row()
            for ci, v in enumerate(vals):
                if v is not None:
                    b.set_value(r, ci, v)
        return b.to_byte_array(), len(out_rows)

    @staticmethod
    def _coerce_value(type_name: str, value):
        """memCom.ConvertToXxx analog: accept the string forms a CSV (or
        any loosely-typed client) naturally holds."""
        from aresdb_spark.streaming.upsert_wire import _bridge_to_wire_scalar

        if type_name == "Bool":
            if isinstance(value, str):
                low = value.strip().lower()
                if low in ("true", "1"):
                    return True
                if low in ("false", "0"):
                    return False
                raise ValueError(f"not a bool: {value!r}")
            return bool(value)
        if type_name == "Float32":
            return float(value)
        if type_name in ("UUID", "GeoPoint", "GeoShape"):
            # GeoShape: ConvertToGeoShape analog (data_type.go:514-531) —
            # a WKT polygon string (or nested lat/long lists); an invalid
            # shape raises and drops the row like the Go client's RemoveRow
            return _bridge_to_wire_scalar(type_name, value)
        if type_name.endswith("[]"):
            # item-wise coercion (UUID[]/GeoPoint[] strings, numeric
            # strings); enum arrays were already translated above
            item = type_name[:-2]
            return [None if v is None else Connector._coerce_value(item, v)
                    for v in value]
        if type_name in ("SmallEnum", "BigEnum"):
            return value  # already translated to an id
        return int(value)  # all integer widths

    @staticmethod
    def _compute_hll_value(type_name: str, value) -> int:
        """Precomputed-HLL column: the client hashes the raw value into
        the packed (rho << 16 | index) register value before sending
        (connector.go computeHLLValue:200-227)."""
        from aresdb_spark.functions.hll_wire import hll_value

        if type_name in ("Uint32", "Int32"):
            return hll_value(struct.pack("<i" if type_name == "Int32"
                                         else "<I", int(value)))
        if type_name == "Int64":
            return hll_value(struct.pack("<q", int(value)))
        raise ConnectorError(
            f"invalid type {type_name} for fast hll value")
