"""Schema metastore — table DDL documents, validation, and the schema
endpoint surface.

The reference manages table schemas through a disk metastore
(metastore/disk_metastore.go) fronted by REST handlers
(api/schema_handler.go:46-54). This module re-creates that surface
without the HTTP server (documented scope: COVERAGE.md):

- ``Table`` documents are plain dicts in the reference's exact JSON shape
  (metastore/common/model.go:40-151 — ``name``/``columns``/
  ``primaryKeyColumns``/``isFactTable``/``config``/
  ``archivingSortColumns``/``version``).
- ``validate_table`` implements the schema validator
  (metastore/validator.go:51-256): column types, fact-table time column,
  primary key and sort-column integrity, and the immutability rules for
  schema *updates* (no column-id reuse, append-only columns, frozen PK,
  prefix-only sort-column growth).
- ``SchemaStore`` is the metastore: in-memory with optional JSON-per-table
  persistence like the disk store's ``<base>/<table>/schema.json``
  (disk_metastore.go:450-683, 1024-1099). Column deletes mark
  ``deleted`` and keep the column id, exactly like the reference.
- ``SchemaHandler`` mirrors api/schema_handler.go's eight routes as pure
  functions returning ``(status, body)`` pairs, so tests (and any HTTP
  frontend a user wires up) get reference-shaped behavior.
- ``catalog_from_store`` turns the schema documents into the planner's
  ``Catalog``/``TableDef``s — the metastore actually *drives* query
  planning (fact flag → time pruning; PK → upsert keys; sort columns →
  archive write order), it is not a parity veneer.
"""

from __future__ import annotations

import json
import os
from typing import Any

# --- data types (metastore/common/data_type.go:24-52) ----------------------

SCALAR_TYPES = (
    "Bool", "Int8", "Uint8", "Int16", "Uint16", "Int32", "Uint32",
    "Float32", "SmallEnum", "BigEnum", "UUID", "GeoPoint", "GeoShape",
    "Int64",
)
ARRAY_TYPES = tuple(f"{t}[]" for t in SCALAR_TYPES if t != "GeoShape")
VALID_TYPES = frozenset(SCALAR_TYPES + ARRAY_TYPES)

# Spark dtypes for each reference type — THE single source of truth
# (wire codec and job config derive from it via spark_type_for);
# unsigned widens to the next signed size.
TYPE_TO_SPARK = {
    "Bool": "boolean", "Int8": "tinyint", "Uint8": "smallint",
    "Int16": "smallint", "Uint16": "int", "Int32": "int", "Uint32": "bigint",
    "Float32": "float", "SmallEnum": "string", "BigEnum": "string",
    "UUID": "string", "GeoPoint": "string", "GeoShape": "string",
    "Int64": "bigint",
}


def spark_type_for(type_name: str, enum_ids: bool = False) -> str:
    """Spark dtype for a reference type, arrays included. With
    ``enum_ids=True`` (wire batches: enums travel as dictionary ids)
    SmallEnum/BigEnum map to their id widths instead of strings."""
    scalars = dict(TYPE_TO_SPARK)
    if enum_ids:
        scalars.update({"SmallEnum": "smallint", "BigEnum": "int"})
    if type_name.endswith("[]"):
        return f"array<{scalars.get(type_name[:-2], 'string')}>"
    return scalars.get(type_name, "string")

# --- default table config (disk_metastore.go:36-64) ------------------------

DEFAULT_TABLE_CONFIG: dict[str, Any] = {
    "batchSize": 2097152,
    "archivingIntervalMinutes": 180,
    "archivingDelayMinutes": 1440,
    "backfillMaxBufferSize": 4294967296,
    "backfillIntervalMinutes": 60,
    "backfillThresholdInBytes": 2097152,
    "backfillStoreBatchSize": 20000,
    "recordRetentionInDays": 90,
    "snapshotIntervalMinutes": 360,
    "snapshotThreshold": 6291456,
    "redoLogRotationInterval": 10800,
    "maxRedoLogFileSize": 1 << 30,
}


# --- errors (metastore/common/errors.go) ------------------------------------

class MetaStoreError(ValueError):
    """Base for metastore validation/mutation errors; ``message`` matches
    the reference error text so handler responses compare equal."""


def _err(name: str, message: str) -> type[MetaStoreError]:
    return type(name, (MetaStoreError,), {"__init__": lambda self, m=message:
                                          MetaStoreError.__init__(self, m)})


ErrTableDoesNotExist = _err("ErrTableDoesNotExist", "Table does not exist")
ErrTableAlreadyExist = _err("ErrTableAlreadyExist", "Table already exists")
ErrColumnDoesNotExist = _err("ErrColumnDoesNotExist", "Column does not exist")
ErrDeleteTimeColumn = _err("ErrDeleteTimeColumn", "Time column cannot be deleted")
ErrDeletePrimaryKeyColumn = _err(
    "ErrDeletePrimaryKeyColumn", "Primary key column cannot be deleted")
ErrChangePrimaryKeyColumn = _err(
    "ErrChangePrimaryKeyColumn", "Primary key column cannot be changed")
ErrAllColumnsInvalid = _err("ErrAllColumnsInvalid", "All columns are invalid")
ErrMissingPrimaryKey = _err(
    "ErrMissingPrimaryKey", "Primary key columns not specified")
ErrColumnNonExist = _err("ErrColumnNonExist", "Column does not exist")
ErrColumnDeleted = _err("ErrColumnDeleted", "Column already deleted")
ErrInvalidDataType = _err("ErrInvalidDataType", "Invalid data type")
ErrMissingTimeColumn = _err(
    "ErrMissingTimeColumn",
    "Fact table must have a time column as first column (Uint32)")
ErrSchemaUpdateNotAllowed = _err(
    "ErrSchemaUpdateNotAllowed", "Illegal schame update on immutable field")
ErrInsufficientColumnCount = _err(
    "ErrInsufficientColumnCount", "Insufficient column count")
ErrReusingColumnIDNotAllowed = _err(
    "ErrReusingColumnIDNotAllowed", "Reusing column id not allowed")
ErrIllegalChangeSortColumn = _err(
    "ErrIllegalChangeSortColumn", "Illegal changes on sort columns")
ErrDuplicatedColumn = _err(
    "ErrDuplicatedColumn", "Illegal deplicated use of column")
ErrDuplicatedColumnName = _err(
    "ErrDuplicatedColumnName", "Duplicated column name found")
ErrInvalidPrimaryKeyDataType = _err(
    "ErrInvalidPrimaryKeyDataType", "Primary key does not allow array type column")
ErrInvalidSortColumnDataType = _err(
    "ErrInvalidSortColumnDataType", "Sort column does not allow array type column")
ErrTimeColumnDoesNotAllowDefault = _err(
    "ErrTimeColumnDoesNotAllowDefault", "Time column does not allow default value")
ErrNotEnumColumn = _err("ErrNotEnumColumn", "Column is not enum type")
ErrEnumCardinalityOverflow = _err(
    "ErrEnumCardinalityOverflow", "Enum column cardinality exceeds limit")

ENUM_TYPES = frozenset({"SmallEnum", "BigEnum", "SmallEnum[]", "BigEnum[]"})
# enum file case separator (metastore/common/data_type.go:19)
ENUM_DELIMITER = "\u0000\n"


def enum_cardinality(column_type: str) -> int:
    """metastore/common/model.go:180-189."""
    if column_type in ("SmallEnum", "SmallEnum[]"):
        return 1 << 8
    if column_type in ("BigEnum", "BigEnum[]"):
        return 1 << 16
    return 0


# --- validation (metastore/validator.go:51-256) -----------------------------

def _columns(table: dict) -> list[dict]:
    return table.get("columns") or []


def _check_id_list(table: dict, ids: list[int], array_err) -> None:
    """Shared PK/sort-column id checks: exists, not deleted, no dup, no
    array type (validator.go:131-171)."""
    cols = _columns(table)
    seen: set[int] = set()
    for cid in ids:
        if cid >= len(cols) or cid < 0:
            raise ErrColumnNonExist()
        if cols[cid].get("deleted"):
            raise ErrColumnDeleted()
        if cid in seen:
            raise ErrDuplicatedColumn()
        if cols[cid]["type"].endswith("[]"):
            raise array_err()
        seen.add(cid)


def validate_table(new: dict, old: dict | None = None) -> None:
    """Validate a table document, or a schema update when ``old`` is given.
    Reference: metastore/validator.go:51-256 (same rule order).

    Note the duplicate-name check counts TOMBSTONED columns too — exact
    reference parity (validator.go:88-92 does not skip deleted columns),
    so a deleted column's name cannot be reused via add_column; the
    "reused name" tolerance in update_column/_enum_column is defensive
    handling for documents produced by older deployments."""
    cols = _columns(new)
    names: set[str] = set()
    non_deleted = 0
    for cid, col in enumerate(cols):
        if not col.get("deleted"):
            non_deleted += 1
        if col["name"] in names:
            raise ErrDuplicatedColumnName()
        names.add(col["name"])
        if col["type"] not in VALID_TYPES:
            raise ErrInvalidDataType()
        if new.get("isFactTable") and cid == 0 and col["type"] != "Uint32":
            raise ErrMissingTimeColumn()
        if col.get("defaultValue") is not None \
                and new.get("isFactTable") and cid == 0:
            raise ErrTimeColumnDoesNotAllowDefault()
    if non_deleted == 0:
        raise ErrAllColumnsInvalid()
    if not new.get("primaryKeyColumns"):
        raise ErrMissingPrimaryKey()
    _check_id_list(new, new["primaryKeyColumns"], ErrInvalidPrimaryKeyDataType)
    if new.get("isFactTable"):
        _check_id_list(new, new.get("archivingSortColumns") or [],
                       ErrInvalidSortColumnDataType)

    if old is None:
        return

    # update rules (validator.go:185-255)
    if new.get("name") != old.get("name") \
            or bool(new.get("isFactTable")) != bool(old.get("isFactTable")):
        raise ErrSchemaUpdateNotAllowed()
    old_cols = _columns(old)
    if len(cols) < len(old_cols):
        raise ErrInsufficientColumnCount()
    for oc, nc in zip(old_cols, cols):
        if oc.get("deleted") and not nc.get("deleted"):
            raise ErrReusingColumnIDNotAllowed()
        if oc["name"] != nc["name"] or oc["type"] != nc["type"] \
                or oc.get("defaultValue") != nc.get("defaultValue"):
            raise ErrSchemaUpdateNotAllowed()
    if list(new.get("primaryKeyColumns") or []) != \
            list(old.get("primaryKeyColumns") or []):
        raise ErrChangePrimaryKeyColumn()
    old_sort = list(old.get("archivingSortColumns") or [])
    new_sort = list(new.get("archivingSortColumns") or [])
    if len(new_sort) < len(old_sort) or new_sort[:len(old_sort)] != old_sort:
        raise ErrIllegalChangeSortColumn()


# --- the store (disk_metastore.go) ------------------------------------------

class SchemaStore:
    """Table-schema metastore: in-memory, optionally persisted one JSON
    document per table under ``base_dir/<table>/schema.json`` like the
    reference disk store. All mutations validate first; column deletes
    tombstone (``deleted: true``) and never reuse ids."""

    def __init__(self, base_dir: str | None = None):
        self.base_dir = base_dir
        self._tables: dict[str, dict] = {}
        self._enums: dict[tuple[str, str], list[str]] = {}
        if base_dir and os.path.isdir(base_dir):
            for name in sorted(os.listdir(base_dir)):
                # "schema.json" is this store's name; bare "schema" is the
                # reference's (disk_metastore.go getSchemaFilePath) — read
                # either so a reference metastore dir loads as-is
                for fn in ("schema.json", "schema"):
                    p = os.path.join(base_dir, name, fn)
                    if os.path.isfile(p):
                        with open(p) as f:
                            self._tables[name] = json.load(f)
                        break
                ed = os.path.join(base_dir, name, "enums")
                if os.path.isdir(ed):
                    for col in sorted(os.listdir(ed)):
                        with open(os.path.join(ed, col)) as f:
                            raw = f.read()
                        # reference format: every case (incl. an empty
                        # one) is FOLLOWED by the delimiter — an empty
                        # FILE means no cases, but a file holding one
                        # delimiter means one empty-string case; trim
                        # one trailing delimiter then split
                        # (disk_metastore.go:1169)
                        if raw == "":
                            self._enums[(name, col)] = []
                        else:
                            if raw.endswith(ENUM_DELIMITER):
                                raw = raw[:-len(ENUM_DELIMITER)]
                            self._enums[(name, col)] = \
                                raw.split(ENUM_DELIMITER)

    # -- persistence (writeSchemaFile analog) --
    def _persist(self, table: dict) -> None:
        if not self.base_dir:
            return
        d = os.path.join(self.base_dir, table["name"])
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "schema.json"), "w") as f:
            json.dump(table, f, indent=2, sort_keys=True)

    def _unpersist(self, name: str) -> None:
        if not self.base_dir:
            return
        p = os.path.join(self.base_dir, name, "schema.json")
        if os.path.isfile(p):
            os.remove(p)

    def _get(self, name: str) -> dict:
        if name not in self._tables:
            raise ErrTableDoesNotExist()
        return self._tables[name]

    # -- reads --
    def list_tables(self) -> list[str]:
        return sorted(self._tables)

    def get_table(self, name: str) -> dict:
        return self._get(name)

    # -- mutations --
    def create_table(self, table: dict) -> None:
        """disk_metastore.go:450-501 — config defaults merge under the
        caller's config, then full validation."""
        if table["name"] in self._tables:
            raise ErrTableAlreadyExist()
        table = dict(table)
        table["config"] = {**DEFAULT_TABLE_CONFIG, **(table.get("config") or {})}
        table.setdefault("version", 0)
        validate_table(table)
        self._tables[table["name"]] = table
        self._persist(table)

    def update_table(self, table: dict) -> None:
        """Full-schema update path (disk_metastore.go:532-566): validated
        against the existing schema with the immutability rules."""
        old = self._get(table["name"])
        validate_table(table, old)
        table = dict(table)
        table["version"] = old.get("version", 0) + 1
        self._tables[table["name"]] = table
        self._persist(table)

    def update_table_config(self, name: str, config: dict) -> None:
        """Deviation from disk_metastore.go:504-528 (which replaces the
        whole config, zero-filling absent fields and skipping
        validation): absent fields here fall back to the defaults —
        a partial-update PUT can't silently zero batchSize/retention."""
        table = self._get(name)
        table["config"] = {**DEFAULT_TABLE_CONFIG, **(config or {})}
        self._persist(table)

    def delete_table(self, name: str) -> None:
        """Reference removeTable deletes the whole table dir — enum
        dictionaries must go too, or a recreated same-named table would
        inherit stale case→id mappings."""
        self._get(name)
        del self._tables[name]
        for key in [k for k in self._enums if k[0] == name]:
            del self._enums[key]
        self._unpersist(name)
        if self.base_dir:
            import shutil
            d = os.path.join(self.base_dir, name)
            if os.path.isdir(d):
                shutil.rmtree(d)

    def add_column(self, name: str, column: dict,
                   add_to_sort_order: bool = False) -> None:
        """disk_metastore.go:1024-1049: append-only; the new id may also be
        appended to the archiving sort order."""
        table = self._get(name)
        candidate = json.loads(json.dumps(table))
        new_id = len(candidate["columns"])
        candidate["columns"].append(column)
        if add_to_sort_order:
            candidate.setdefault("archivingSortColumns", []).append(new_id)
        validate_table(candidate, table)
        candidate["version"] = table.get("version", 0) + 1
        self._tables[name] = candidate
        self._persist(candidate)

    def update_column(self, name: str, column_name: str, config: dict) -> None:
        """disk_metastore.go:1051-1065: only the column *config* (preloading
        days / priority) is mutable; deleted columns are skipped so a
        reused name resolves to the live column."""
        table = self._get(name)
        for col in _columns(table):
            if col["name"] == column_name and not col.get("deleted"):
                col["config"] = dict(config or {})
                self._persist(table)
                return
        raise ErrColumnDoesNotExist()

    # -- enum dictionaries (disk_metastore.go:686-756, 1440-1470) --
    def _enum_column(self, name: str, column_name: str) -> dict:
        table = self._get(name)
        for col in _columns(table):
            if col["name"] == column_name and not col.get("deleted"):
                if col["type"] not in ENUM_TYPES:
                    raise ErrNotEnumColumn()
                return col
        raise ErrColumnDoesNotExist()

    def _persist_enums(self, name: str, column_name: str) -> None:
        if not self.base_dir:
            return
        d = os.path.join(self.base_dir, name, "enums")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, column_name), "w") as f:
            # reference byte format: each case followed by the delimiter
            # (disk_metastore.go writeEnumFile) — unambiguous even when a
            # legitimate case is the empty string
            f.write("".join(c + ENUM_DELIMITER
                            for c in self._enums[(name, column_name)]))

    def get_enum_cases(self, name: str, column_name: str) -> list[str]:
        """ListEnumCases analog: cases in enum-id order."""
        self._enum_column(name, column_name)
        return list(self._enums.get((name, column_name), []))

    def extend_enum_dict(self, name: str, column_name: str,
                         enum_cases: list[str]) -> list[int]:
        """ExtendEnumDict (disk_metastore.go:686-756): idempotent append —
        existing cases return their ids, new cases get the next ids; the
        whole batch is rejected if it would exceed the type's cardinality
        (SmallEnum 2^8, BigEnum 2^16). The cardinality check runs BEFORE
        dedup — reference parity (disk_metastore.go:728-731), so a
        near-full dictionary can reject a retry of already-known cases;
        callers should diff against get_enum_cases first when retrying
        large payloads."""
        col = self._enum_column(name, column_name)
        existing = self._enums.setdefault((name, column_name), [])
        ids = {c: i for i, c in enumerate(existing)}
        if len(existing) + len(enum_cases) > enum_cardinality(col["type"]):
            raise ErrEnumCardinalityOverflow()
        out = []
        for case in enum_cases:
            if case not in ids:
                ids[case] = len(existing)
                existing.append(case)
            out.append(ids[case])
        self._persist_enums(name, column_name)
        return out

    def delete_column(self, name: str, column_name: str) -> None:
        """disk_metastore.go:1067-1099: tombstone, keep the id; the fact
        time column (id 0) and primary-key columns cannot be deleted."""
        table = self._get(name)
        for cid, col in enumerate(_columns(table)):
            if col["name"] == column_name and not col.get("deleted"):
                if table.get("isFactTable") and cid == 0:
                    raise ErrDeleteTimeColumn()
                if cid in (table.get("primaryKeyColumns") or []):
                    raise ErrDeletePrimaryKeyColumn()
                col["deleted"] = True
                self._persist(table)
                if col["type"] in ENUM_TYPES:  # removeEnumColumn analog
                    self._enums.pop((name, column_name), None)
                    if self.base_dir:
                        p = os.path.join(self.base_dir, name, "enums",
                                         column_name)
                        if os.path.isfile(p):
                            os.remove(p)
                return
        raise ErrColumnDoesNotExist()


# --- handler layer (api/schema_handler.go:46-54) ----------------------------

class SchemaHandler:
    """The eight schema routes as pure functions returning ``(status,
    body)``: 200 with a JSON-able body on success (list/table/None), 400
    for malformed creations, 404 for missing tables, and the metastore
    error message otherwise — matching the reference ResponseWriter
    behavior (schema_handler.go:74-283)."""

    def __init__(self, store: SchemaStore):
        self.store = store

    @staticmethod
    def _run(fn):
        try:
            return 200, fn()
        except ErrTableDoesNotExist as e:
            return 404, {"message": str(e)}
        except MetaStoreError as e:
            return 400, {"message": str(e)}
        except (KeyError, TypeError, AttributeError) as e:
            # malformed body (missing 'name'/'column'/... fields) — the
            # reference's ReadRequest decode failure path returns 400
            return 400, {"message": f"malformed request: {e!r}"}

    # GET /schema/tables
    def list_tables(self):
        return self._run(self.store.list_tables)

    # GET /schema/tables/{table}
    def get_table(self, table: str):
        return self._run(lambda: self.store.get_table(table))

    # POST /schema/tables
    def add_table(self, body: dict):
        return self._run(lambda: self.store.create_table(body))

    # PUT /schema/tables/{table}
    def update_table_config(self, table: str, body: dict):
        return self._run(lambda: self.store.update_table_config(table, body))

    # DELETE /schema/tables/{table}
    def delete_table(self, table: str):
        return self._run(lambda: self.store.delete_table(table))

    # POST /schema/tables/{table}/columns
    def add_column(self, table: str, body: dict):
        return self._run(lambda: self.store.add_column(
            table, body["column"], bool(body.get("addToArchivingSortOrder"))))

    # PUT /schema/tables/{table}/columns/{column}
    def update_column(self, table: str, column: str, body: dict):
        return self._run(lambda: self.store.update_column(table, column, body))

    # DELETE /schema/tables/{table}/columns/{column}
    def delete_column(self, table: str, column: str):
        return self._run(lambda: self.store.delete_column(table, column))

    # GET /schema/tables/{table}/columns/{column}/enum-cases
    # (api/enum_handler.go:43,53-88)
    def list_enum_cases(self, table: str, column: str):
        return self._run(lambda: self.store.get_enum_cases(table, column))

    # POST /schema/tables/{table}/columns/{column}/enum-cases
    # (api/enum_handler.go:44,90-128 — body {"enumCases": [...]} → ids)
    def add_enum_case(self, table: str, column: str, body: dict):
        return self._run(lambda: self.store.extend_enum_dict(
            table, column, list(body.get("enumCases") or [])))


# --- bridge into the query catalog ------------------------------------------

def table_def_from_schema(table: dict, hotcold: bool = False):
    """A planner ``TableDef`` from a schema document: fact flag, time
    column (= column 0 of a fact table, query/aql_compiler.go:1013-1017),
    primary key and sort columns by id → name (skipping tombstones).
    ``hotcold=True`` marks the table as ingestion-backed (a HotColdStore
    root instead of a plain parquet file — the live+archive scan)."""
    from aresdb_spark.catalog import TableDef

    cols = _columns(table)

    def names(ids):
        return tuple(cols[i]["name"] for i in ids or []
                     if i < len(cols) and not cols[i].get("deleted"))

    is_fact = bool(table.get("isFactTable"))
    return TableDef(
        name=table["name"],
        is_fact=is_fact,
        time_column=cols[0]["name"] if (is_fact and cols) else None,
        primary_key=names(table.get("primaryKeyColumns")),
        sort_columns=names(table.get("archivingSortColumns")),
        hotcold=hotcold,
    )


def catalog_from_store(sf_dir: str, store: SchemaStore,
                       hotcold: set[str] | None = None):
    """A query ``Catalog`` whose table defs come from the metastore — the
    reference's metastore→memstore schema flow (schema changes propagate
    to query planning). Tables named in ``hotcold`` resolve to
    HotColdStore roots under ``sf_dir`` (ingestion-backed live+archive
    scans) instead of plain parquet files."""
    from aresdb_spark.catalog import Catalog

    hotcold = hotcold or set()
    return Catalog(sf_dir=sf_dir, tables={
        name: table_def_from_schema(store.get_table(name),
                                    hotcold=name in hotcold)
        for name in store.list_tables()})
