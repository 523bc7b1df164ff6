"""Read a reference on-disk deployment (an "ares-root") into the engine.

The reference persists each table shard under a root directory
(diskstore/diskstore_util.go:104-112, metastore/disk_metastore.go):

    {root}/metastore/{table}/schema                    table schema JSON
    {root}/metastore/{table}/enums/{column}            enum cases, "\\x00\\n"
    {root}/metastore/{table}/shards/{n}/version        archiving cutoff
    {root}/metastore/{table}/shards/{n}/batches/{day}  "version[-seq],size"
    {root}/metastore/{table}/shards/{n}/snapshot       "redolog,offset,batch,index"
    {root}/data/{table}_{n}/archiving_batches/{YYYY-MM-DD}_{ver}[-{seq}]/{col}.data
    {root}/data/{table}_{n}/snapshots/{redolog}_{offset}/{batch}/{col}.data

Each ``{col}.data`` file is one serialized vector party
(memstore/vector_party.go:435-506 Write/Read): a 24-byte header — uint32
magic 0xFADEFACE (vector_party_serializer.go:24), int32 length, uint32
data type, int32 nonDefaultValueCount, uint16 column mode, 6 pad bytes —
followed by up to three vectors gated by the mode (0 = all default, no
vectors; 1 = values; 2 = values + validity bits; 3 = values + validity +
uint32 counts of length+1, the RLE form archiving produces for sort
columns).  Every vector is padded to a 64-byte multiple
(vectors/vector.go CalculateVectorBytes), bools are 1-bit little-endian,
and a validity bit of 1 means NOT NULL (vector_party.go:161-169
GetValidity).

This module is the migration path for a reference user switching to this
engine: ``migrate_ares_root`` walks the metastore exactly like the
reference's recovery does — latest archive batch version per day under
the shard's archiving cutoff (disk_metastore.go:881-960
GetArchiveBatchVersion), latest snapshot for dimension tables — and
lands each table as day-partitioned sorted parquet (fact) or a plain
parquet snapshot (dimension), ready for the AQL planner.

At 100 TB the unit of decode parallelism is the archive batch (one day ×
one shard): batch directories fan out over executors via
``mapInPandas`` — the driver only lists the metastore (pure metadata,
bytes per shard), so a 1000-shard migration decodes 1000-wide with no
driver collect.  One batch is bounded by the reference's own batch size
(it had to fit the node that archived it), so per-task memory is bounded
by construction.
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass
from datetime import datetime, timezone
from aresdb_spark.streaming.upsert_wire import (
    DATA_TYPES,
    TYPE_NAMES,
    _bits,
    _bridge_to_wire_scalar,
    _read_fixed_vectorized,
    _read_scalar,
    _wire_to_bridge_scalar,
)

# vector_party_serializer.go:24
VP_MAGIC = 0xFADEFACE
# memstore/list/archive_vector_party.go:31 — array columns use their own
# magic and layout (offset/length pairs + packed ArrayValue payloads)
LIST_VP_MAGIC = 0xFADEFACF
# data_value.go:41 — offset flag distinguishing an EMPTY array row from a
# NULL row (both have element count 0)
ZERO_LENGTH_ARRAY_FLAG = 0xFFFFFFFF

# memstore/common/vector_party.go:30-44 (ColumnMode)
ALL_VALUES_DEFAULT = 0
ALL_VALUES_PRESENT = 1
HAS_NULL_VECTOR = 2
HAS_COUNT_VECTOR = 3
_MAX_COLUMN_MODE = 4

_HEADER = struct.Struct("<IiIiH6x")  # magic, length, type, nonDefault, mode
assert _HEADER.size == 24


class VectorPartyCorruptError(ValueError):
    """Raised for a bad magic header or mode — the reference refuses to
    guess at corrupt files (vector_party.go:512-548)."""


def _vector_bytes(type_name: str, size: int) -> int:
    """CalculateVectorBytes (vectors/vector.go:75-85): unitBits * size
    rounded up to 512 bits (64 bytes)."""
    bits = _bits(DATA_TYPES[type_name]) * size
    rem = bits % 512
    if rem:
        bits += 512 - rem
    return bits // 8


@dataclass
class VectorParty:
    """One decoded vector party. ``values`` holds the STORED entries in
    bridge (Spark-facing) form — UUIDs dashed-lower, GeoPoints
    ``point(lat lng)`` — with ``None`` for nulls; for mode 3 the stored
    entries are run-length groups and ``counts`` holds the length+1
    cumulative row offsets."""

    type_name: str
    length: int
    mode: int
    non_default_count: int
    values: list
    counts: "list[int] | None" = None

    def num_rows(self) -> int:
        """Logical row count: counts[-1] for RLE parties, else length."""
        if self.mode == HAS_COUNT_VECTOR:
            return int(self.counts[-1]) if self.counts else 0
        return self.length

    def rows(self) -> list:
        """Per-row values with mode-3 run-length groups expanded."""
        if self.mode != HAS_COUNT_VECTOR:
            return list(self.values)
        out: list = []
        for i, v in enumerate(self.values):
            out.extend([v] * (int(self.counts[i + 1]) - int(self.counts[i])))
        return out


def _pack_values(type_name: str, values: list) -> bytes:
    """Pack non-null-normalized stored entries into the value vector
    (nulls write their slot as zero, like the reference's unset
    memory)."""
    bits = _bits(DATA_TYPES[type_name])
    n = len(values)
    if type_name == "Bool":
        buf = bytearray((n + 7) // 8)
        for i, v in enumerate(values):
            if v:
                buf[i // 8] |= 1 << (i % 8)
        return bytes(buf)
    buf = bytearray(n * bits // 8)
    for i, v in enumerate(values):
        if v is None:
            continue
        w = _bridge_to_wire_scalar(type_name, v)
        off = i * bits // 8
        if type_name == "UUID":
            struct.pack_into("<QQ", buf, off, *w)
        elif type_name == "GeoPoint":
            struct.pack_into("<ff", buf, off, *w)
        else:
            from aresdb_spark.streaming.upsert_wire import _PACK

            struct.pack_into(_PACK[type_name], buf, off, w)
    return bytes(buf)


def _pad64(b: bytes) -> bytes:
    rem = len(b) % 64
    return b if rem == 0 else b + b"\x00" * (64 - rem)


def _list_element_bytes(item_type: str, length: int) -> int:
    """CalculateListElementBytes (data_value.go:790-800): uint32 count +
    packed items + validity bits, rounded to 8 bytes — but 0 for an
    empty array (unlike the wire format's GetSerBytes, which pads empty
    arrays to 8; the archive layout flags them in the offset vector
    instead)."""
    if length == 0:
        return 0
    bits = _bits(DATA_TYPES[item_type])
    return (4 * 8 + (bits * length + 7) // 8 * 8 + (length + 7) // 8 * 8
            + 63) // 64 * 8


def write_list_vector_party_bytes(type_name: str, values: list) -> bytes:
    """Serialize an array-typed vector party in the list-archive file
    format (memstore/list/archive_vector_party.go:197-249 Write): the
    same 24-byte header under magic 0xFADEFACF with nonDefaultValueCount
    0 and mode AllValuesPresent, then the (offset, elemCount) uint32
    pair vector, a uint64 totalValueBytes, and the packed ArrayValue
    payloads. A NULL row is the pair (0, 0); an empty-but-valid array is
    (ZeroLengthArrayFlag, 0) with no payload (vector_party.go:54-67
    SetOffsetLength)."""
    item = type_name[:-2]
    if item not in DATA_TYPES or item in ("GeoShape",):
        raise NotImplementedError(f"unsupported array item type {item}")
    item_bits = _bits(DATA_TYPES[item])
    n = len(values)
    offsets: list[int] = []
    payload = bytearray()
    for v in values:
        if v is None:
            offsets += [0, 0]
            continue
        if len(v) == 0:
            offsets += [ZERO_LENGTH_ARRAY_FLAG, 0]
            continue
        offsets += [len(payload), len(v)]
        row = bytearray(_list_element_bytes(item, len(v)))
        struct.pack_into("<I", row, 0, len(v))
        item_base = 4
        for j, x in enumerate(v):
            if x is None:
                continue
            w = _bridge_to_wire_scalar(item, x)
            if item == "Bool":
                if w:
                    row[item_base + j // 8] |= 1 << (j % 8)
            elif item == "UUID":
                struct.pack_into("<QQ", row, item_base + j * 16, *w)
            elif item == "GeoPoint":
                struct.pack_into("<ff", row, item_base + j * 8, *w)
            else:
                from aresdb_spark.streaming.upsert_wire import _PACK

                struct.pack_into(_PACK[item], row,
                                 item_base + j * item_bits // 8, w)
        # validity bits start at the byte boundary after the items
        # (CalculateListNilOffset, data_value.go:802-804)
        nil_base = item_base + (item_bits * len(v) + 7) // 8
        for j, x in enumerate(v):
            if x is not None:
                row[nil_base + j // 8] |= 1 << (j % 8)
        payload += row
    out = bytearray(_HEADER.pack(LIST_VP_MAGIC, n, DATA_TYPES[type_name],
                                 0, ALL_VALUES_PRESENT))
    out += _pad64(struct.pack(f"<{2 * n}I", *offsets))
    out += struct.pack("<Q", len(payload))
    out += _pad64(bytes(payload))
    return bytes(out)


def _read_list_vector_party(data: bytes) -> VectorParty:
    """Parse a list-archive vector party
    (list/archive_vector_party.go:252-345 Read)."""
    _magic, length, raw_type, _nd, mode = _HEADER.unpack_from(data)
    if raw_type not in TYPE_NAMES or not TYPE_NAMES[raw_type].endswith("[]"):
        raise VectorPartyCorruptError(
            f"unknown array data type {raw_type:#x}")
    if mode >= _MAX_COLUMN_MODE:
        raise VectorPartyCorruptError(f"Invalid mode {mode}")
    if length < 0:
        raise VectorPartyCorruptError(f"negative vector length {length}")
    type_name = TYPE_NAMES[raw_type]
    item = type_name[:-2]
    off_base = _HEADER.size
    offsets = struct.unpack_from(f"<{2 * length}I", data, off_base)
    val_base = off_base + _vector_bytes("Uint32", 2 * length) + 8
    from aresdb_spark.streaming.upsert_wire import _read_array_value

    values: list = []
    for i in range(length):
        off, cnt = offsets[2 * i], offsets[2 * i + 1]
        if cnt == 0:
            values.append([] if off == ZERO_LENGTH_ARRAY_FLAG else None)
            continue
        raw = _read_array_value(data, val_base + off, item)
        values.append([_wire_to_bridge_scalar(item, x) for x in raw])
    return VectorParty(type_name, length, ALL_VALUES_PRESENT,
                       sum(v is not None for v in values), values)


def write_vector_party_bytes(type_name: str, values: list,
                             counts: "list[int] | None" = None) -> bytes:
    """Serialize one vector party in the reference's archive/snapshot
    file format (vector_party.go:435-506 Write). The mode is judged the
    way the archiving prune does (JudgeMode): all entries null → mode 0;
    ``counts`` given → mode 3; any null → mode 2; else mode 1.  The
    default value is NULL (the reference's default default,
    data_value.go), so nonDefaultValueCount = number of valid entries."""
    if type_name.endswith("[]"):
        if counts is not None:
            raise ValueError("array columns are never sort columns — the "
                             "list-archive format has no count vector")
        return write_list_vector_party_bytes(type_name, values)
    if type_name == "GeoShape":
        if counts is not None:
            raise ValueError("GeoShape columns are never sort columns")
        return write_go_vector_party_bytes(type_name, values)
    if type_name not in DATA_TYPES:
        raise NotImplementedError(f"unknown data type {type_name}")
    n = len(values)
    non_default = sum(1 for v in values if v is not None)
    if counts is not None:
        if len(counts) != n + 1:
            raise ValueError("counts must have length+1 entries "
                             "(cumulative row offsets)")
        mode = HAS_COUNT_VECTOR
    elif non_default == 0:
        mode = ALL_VALUES_DEFAULT
    elif non_default < n:
        mode = HAS_NULL_VECTOR
    else:
        mode = ALL_VALUES_PRESENT
    out = bytearray(_HEADER.pack(VP_MAGIC, n, DATA_TYPES[type_name],
                                 non_default, mode))
    if mode == ALL_VALUES_DEFAULT:
        return bytes(out)
    out += _pad64(_pack_values(type_name, values))
    if mode >= HAS_NULL_VECTOR:
        nulls = bytearray((n + 7) // 8)
        for i, v in enumerate(values):
            if v is not None:
                nulls[i // 8] |= 1 << (i % 8)  # 1 = valid (GetValidity)
        out += _pad64(bytes(nulls))
    if mode == HAS_COUNT_VECTOR:
        out += _pad64(struct.pack(f"<{n + 1}I", *counts))
    return bytes(out)


def read_vector_party_bytes(data: bytes) -> VectorParty:
    """Parse one vector party file (vector_party.go:508-618 Read).

    A zero-length buffer decodes as an all-default party of unknown
    length (the reference's OpenVectorPartyFileForRead treats a missing
    file the same way, vector_party_serializer.go:104-118) — callers
    resolve the length from a sibling column."""
    if len(data) == 0:
        return VectorParty("Uint32", -1, ALL_VALUES_DEFAULT, 0, [])
    if len(data) < _HEADER.size:
        raise VectorPartyCorruptError(
            "vector party file shorter than its 24-byte header")
    magic, length, raw_type, non_default, mode = _HEADER.unpack_from(data)
    if magic == LIST_VP_MAGIC:
        return _read_list_vector_party(data)
    if magic != VP_MAGIC:
        # error message parity: vector_party.go:517
        raise VectorPartyCorruptError(
            "Magic number does not match, vector party file may be "
            "corrupted")
    if raw_type not in TYPE_NAMES:
        raise VectorPartyCorruptError(f"unknown data type {raw_type:#x}")
    if mode >= _MAX_COLUMN_MODE:
        raise VectorPartyCorruptError(f"Invalid mode {mode}")
    if length < 0:
        # a negative count would silently misdecode (np.frombuffer
        # reads the whole buffer for count<0) — refuse like the other
        # header checks
        raise VectorPartyCorruptError(f"negative vector length {length}")
    type_name = TYPE_NAMES[raw_type]
    if mode == ALL_VALUES_DEFAULT:
        return VectorParty(type_name, length, mode, non_default,
                           [None] * length)
    val_base = _HEADER.size
    null_base = val_base + _vector_bytes(type_name, length)
    null_base_bit = null_base * 8 if mode >= HAS_NULL_VECTOR else None
    values = _read_fixed_vectorized(data, type_name, length, val_base,
                                    null_base_bit)
    if values is None:  # UUID / GeoPoint keep the scalar loop
        bits = _bits(DATA_TYPES[type_name])
        values = []
        for i in range(length):
            if null_base_bit is not None and not (
                    data[null_base + i // 8] >> (i % 8) & 1):
                values.append(None)
            else:
                values.append(_wire_to_bridge_scalar(
                    type_name,
                    _read_scalar(data, val_base + i * bits // 8,
                                 type_name)))
    counts = None
    if mode == HAS_COUNT_VECTOR:
        count_base = null_base + _vector_bytes("Bool", length)
        counts = list(struct.unpack_from(f"<{length + 1}I", data,
                                         count_base))
    return VectorParty(type_name, length, mode, non_default, values,
                       counts)


# --------------------------------------------------------------------------
# Go-type vector parties (GeoShape columns — goLiveVectorParty)
# --------------------------------------------------------------------------

def write_go_vector_party_bytes(type_name: str, values: list) -> bytes:
    """Serialize a Go-type vector party (GeoShape columns) in the
    goLiveVectorParty file format (memstore/live_vector_party.go:191-237
    Write): uint64 totalBytes (the memory-reporting hint — Σ points ×
    SizeOfGeoPoint=8 over valid shapes, data_value.go:506-513), uint32
    length, uint32 numValidValues, then each valid value as [uint32 row
    index, omitted when all rows are valid] + the GeoShapeGo payload
    (uint32 numPolygons, per polygon uint32 numPoints + (lat, lng)
    float32 pairs — data_value.go:562-580). The format carries no magic
    or type header, so reading requires the schema's column type.

    ``values`` are WKT strings or nested (lat, lng) sequences, None for
    null rows."""
    from aresdb_spark.streaming.upsert_wire import _shape_polygons

    if type_name != "GeoShape":
        raise NotImplementedError(
            f"{type_name} is not a Go-type column (only GeoShape)")
    polys = [None if v is None else _shape_polygons(v) for v in values]
    n = len(polys)
    valid = [i for i, p in enumerate(polys) if p is not None]
    total_bytes = sum(len(ring) * 8 for i in valid for ring in polys[i])
    out = bytearray(struct.pack("<QII", total_bytes, n, len(valid)))
    all_valid = len(valid) == n
    for i in valid:
        if not all_valid:
            out += struct.pack("<I", i)
        out += struct.pack("<I", len(polys[i]))
        for ring in polys[i]:
            out += struct.pack("<I", len(ring))
            for lat, lng in ring:
                out += struct.pack("<ff", lat, lng)
    return bytes(out)


def read_go_vector_party_bytes(data: bytes,
                               type_name: str = "GeoShape") -> VectorParty:
    """Parse a goLiveVectorParty file
    (live_vector_party.go:241-280 Read). Returns WKT bridge values."""
    from aresdb_spark.streaming.upsert_wire import geo_shape_to_wkt

    if type_name != "GeoShape":
        raise NotImplementedError(
            f"{type_name} is not a Go-type column (only GeoShape)")
    _total, n, n_valid = struct.unpack_from("<QII", data, 0)
    off = 16
    all_valid = n_valid == n
    values: list = [None] * n
    for k in range(n_valid):
        if all_valid:
            idx = k
        else:
            (idx,) = struct.unpack_from("<I", data, off)
            off += 4
        (n_poly,) = struct.unpack_from("<I", data, off)
        off += 4
        polygons = []
        for _ in range(n_poly):
            (n_pts,) = struct.unpack_from("<I", data, off)
            off += 4
            pts = struct.unpack_from(f"<{n_pts * 2}f", data, off)
            off += n_pts * 8
            polygons.append([(pts[j], pts[j + 1])
                             for j in range(0, n_pts * 2, 2)])
        values[idx] = geo_shape_to_wkt(polygons)
    return VectorParty(type_name, n, ALL_VALUES_PRESENT
                       if all_valid else HAS_NULL_VECTOR,
                       n_valid, values)


# --------------------------------------------------------------------------
# disk metastore (metastore/disk_metastore.go)
# --------------------------------------------------------------------------

from aresdb_spark.metastore import ENUM_DELIMITER  # noqa: E402  "\x00\n"


def parse_batch_versions(text: str) -> list[tuple[int, int, int]]:
    """Parse a ``batches/{day}`` file into (version, seqNum, size)
    tuples. Lines are ``version,size`` or ``version-seq,size``
    (disk_metastore.go:806-828); versions are archiving cutoffs and the
    file is append-ordered, so it is sorted."""
    out = []
    for line in text.rstrip("\n").split("\n"):
        if not line:
            continue
        ver_str, _, size_str = line.partition(",")
        ver, dash, seq = ver_str.partition("-")
        out.append((int(ver), int(seq) if dash else 0, int(size_str)))
    return out


def select_batch_version(entries: list[tuple[int, int, int]],
                         cutoff: int) -> tuple[int, int, int]:
    """GetArchiveBatchVersion (disk_metastore.go:896-960): the last
    entry whose version is <= cutoff, or (0, 0, 0) when every version is
    newer (the batch does not exist yet at that cutoff)."""
    import bisect

    idx = bisect.bisect_right([e[0] for e in entries], cutoff)
    return entries[idx - 1] if idx else (0, 0, 0)


def _batch_date(batch_id: int) -> str:
    """Archive batch directory date: batch id is days since epoch
    (diskstore_util.go:107 "batch_id is UTC date")."""
    return datetime.fromtimestamp(batch_id * 86400,
                                  tz=timezone.utc).strftime("%Y-%m-%d")


def archive_batch_dir(root: str, table: str, shard: int, batch_id: int,
                      version: int, seq: int = 0) -> str:
    """GetPathForTableArchiveBatchDir (diskstore_util.go:117-130): seq 0
    renders ``{date}_{version}``, otherwise ``{date}_{version}-{seq}``."""
    name = (f"{_batch_date(batch_id)}_{version}-{seq}" if seq
            else f"{_batch_date(batch_id)}_{version}")
    return os.path.join(root, "data", f"{table}_{shard}",
                        "archiving_batches", name)


@dataclass
class ShardMeta:
    shard: int
    archiving_cutoff: int
    # batch_id -> (version, seqNum, size) selected at the cutoff
    batches: dict[int, tuple[int, int, int]]
    snapshot: "tuple[int, int, int, int] | None"  # redolog,offset,batch,index


@dataclass
class TableMeta:
    name: str
    schema: dict
    enums: dict[str, list[str]]  # column name -> cases in id order
    shards: list[ShardMeta]


def read_table_meta(root: str, table: str) -> TableMeta:
    """Read one table's disk metastore the way recovery does: schema
    JSON, enum case files, and per shard the archiving cutoff
    (``version`` file, disk_metastore.go GetArchivingCutoff), the batch
    version selected at that cutoff for every listed day, and the
    snapshot pointer ``redoLogFile,offset,batchID,index``
    (GetSnapshotProgress)."""
    mdir = os.path.join(root, "metastore", table)
    with open(os.path.join(mdir, "schema")) as f:
        schema = json.load(f)
    enums: dict[str, list[str]] = {}
    edir = os.path.join(mdir, "enums")
    if os.path.isdir(edir):
        for col in os.listdir(edir):
            with open(os.path.join(edir, col)) as f:
                raw = f.read()
            if raw.endswith(ENUM_DELIMITER):
                raw = raw[:-len(ENUM_DELIMITER)]
            enums[col] = raw.split(ENUM_DELIMITER) if raw else []
    shards = []
    sdir = os.path.join(mdir, "shards")
    shard_names = []
    if os.path.isdir(sdir):
        for name in os.listdir(sdir):
            try:
                shard_names.append(int(name))
            except ValueError:
                continue  # stray files skipped, like ListArchiveBatches
    for shard_name in map(str, sorted(shard_names)):
        shard_dir = os.path.join(sdir, shard_name)
        cutoff = 0
        vpath = os.path.join(shard_dir, "version")
        if os.path.exists(vpath):
            with open(vpath) as f:
                cutoff = int(f.read().strip() or 0)
        batches: dict[int, tuple[int, int, int]] = {}
        bdir = os.path.join(shard_dir, "batches")
        if os.path.isdir(bdir):
            for bname in os.listdir(bdir):
                try:
                    batch_id = int(bname)
                except ValueError:
                    continue  # skipped like ListArchiveBatches
                with open(os.path.join(bdir, bname)) as f:
                    entries = parse_batch_versions(f.read())
                sel = select_batch_version(entries, cutoff)
                if sel[2] > 0:  # version 0 size 0 = not yet archived
                    batches[batch_id] = sel
        snapshot = None
        spath = os.path.join(shard_dir, "snapshot")
        if os.path.exists(spath):
            with open(spath) as f:
                parts = f.read().strip().split(",")
            snapshot = tuple(int(p) for p in parts)  # type: ignore
        shards.append(ShardMeta(int(shard_name), cutoff, batches,
                                snapshot))
    return TableMeta(table, schema, enums, shards)


def list_tables(root: str) -> list[str]:
    mdir = os.path.join(root, "metastore")
    return sorted(
        t for t in os.listdir(mdir)
        if os.path.exists(os.path.join(mdir, t, "schema")))


# --------------------------------------------------------------------------
# batch decode
# --------------------------------------------------------------------------

def _parse_default(type_name: str, s: "str | None"):
    """Parse a schema ``defaultValue`` string the way the reference's
    SetDefaultValue does (memstore/common/schema.go:116 →
    ValueFromString): typed for scalars, the case string itself for
    enums (translation is skipped — the default IS the case)."""
    if s is None:
        return None
    if type_name in ("SmallEnum", "BigEnum", "GeoPoint", "GeoShape"):
        return s
    if type_name == "Bool":
        return str(s).lower() in ("true", "1")
    if type_name == "Float32":
        return float(s)
    if type_name == "UUID":
        w = _bridge_to_wire_scalar("UUID", str(s))
        return _wire_to_bridge_scalar("UUID", w)
    return int(s)


def read_batch_columns(batch_dir: str, schema: dict,
                       enums: dict[str, list[str]]) -> dict[str, list]:
    """Decode every column file of one archive/snapshot batch directory
    into per-row bridge values, RLE-expanded, enum ids translated to
    their cases.  Missing, empty, and all-default column files resolve
    to NULL rows of the batch's length (the reference backfills absent
    columns the same way); deleted columns are skipped."""
    cols = [c for c in schema.get("columns") or []]
    parties: dict[int, VectorParty] = {}
    num_rows = 0
    for cid, col in enumerate(cols):
        if col.get("deleted"):
            continue
        path = os.path.join(batch_dir, f"{cid}.data")
        if not os.path.exists(path):
            continue
        with open(path, "rb") as f:
            raw = f.read()
        if col["type"] == "GeoShape" and raw:
            # Go-type columns have no magic header; the schema's type
            # selects the codec, like the reference's factory does
            vp = read_go_vector_party_bytes(raw, col["type"])
        else:
            vp = read_vector_party_bytes(raw)
        parties[cid] = vp
        if vp.length >= 0:
            num_rows = max(num_rows, vp.num_rows())
    out: dict[str, list] = {}
    for cid, col in enumerate(cols):
        if col.get("deleted"):
            continue
        vp = parties.get(cid)
        default = _parse_default(col["type"], col.get("defaultValue"))
        if vp is None or vp.length < 0:
            out[col["name"]] = [default] * num_rows
            continue
        if vp.mode == ALL_VALUES_DEFAULT and default is not None:
            # an all-default file means every row holds the column's
            # CONFIGURED default (schema.go SetDefaultValue), which is
            # NULL only when defaultValue is absent
            out[col["name"]] = [default] * num_rows
            continue
        rows = vp.rows()
        if len(rows) != num_rows:
            raise VectorPartyCorruptError(
                f"column {col['name']} has {len(rows)} rows, batch has "
                f"{num_rows}")
        if col["type"] in ("SmallEnum", "BigEnum"):
            cases = enums.get(col["name"], [])
            rows = [cases[v] if v is not None and v < len(cases) else None
                    for v in rows]
        elif col["type"] in ("SmallEnum[]", "BigEnum[]"):
            cases = enums.get(col["name"], [])
            rows = [None if v is None else
                    [cases[x] if x is not None and x < len(cases) else None
                     for x in v]
                    for v in rows]
        out[col["name"]] = rows
    return out


def _spark_fields(schema: dict):
    from pyspark.sql import types as T

    from aresdb_spark.metastore import spark_type_for

    return T.StructType([
        T.StructField(c["name"],
                      T._parse_datatype_string(spark_type_for(c["type"])))
        for c in schema.get("columns") or [] if not c.get("deleted")])


def _decode_batch_dirs(spark, dirs: list, meta: TableMeta):
    """Shared decode plan for archive and snapshot readers: the driver
    holds only the directory list (pure metadata); each batch directory
    decodes executor-side via ``mapInPandas``, so shards × batches is
    the parallelism width and no batch's data ever lands on the
    driver."""
    import pandas as pd

    out_schema = _spark_fields(meta.schema)
    schema_doc, enums = meta.schema, meta.enums
    names = [f.name for f in out_schema.fields]

    def decode(iterator):
        for pdf in iterator:
            for d in pdf["dir"]:
                cols = read_batch_columns(d, schema_doc, enums)
                yield pd.DataFrame({n: cols.get(n, []) for n in names},
                                   columns=names)

    seed = spark.createDataFrame([(d,) for d in dirs], "dir string") \
        .repartition(max(len(dirs), 1))
    return seed.mapInPandas(decode, schema=out_schema)


def read_archive_table(spark, root: str, meta: TableMeta):
    """All selected archive batches of a fact table as one DataFrame."""
    dirs = []
    for sh in meta.shards:
        for batch_id, (ver, seq, _size) in sorted(sh.batches.items()):
            d = archive_batch_dir(root, meta.name, sh.shard, batch_id,
                                  ver, seq)
            if os.path.isdir(d):
                dirs.append(d)
    return _decode_batch_dirs(spark, dirs, meta)


def read_snapshot_table(spark, root: str, meta: TableMeta):
    """A dimension table's latest snapshot as one DataFrame: per shard,
    the metastore's snapshot pointer names the live directory
    ``snapshots/{redolog}_{offset}`` (diskstore_util.go:66-70) whose
    numbered subdirectories are live batches."""
    dirs = []
    for sh in meta.shards:
        if not sh.snapshot:
            continue
        redolog, offset = sh.snapshot[0], sh.snapshot[1]
        snap = os.path.join(root, "data", f"{meta.name}_{sh.shard}",
                            "snapshots", f"{redolog}_{offset}")
        if os.path.isdir(snap):
            dirs.extend(os.path.join(snap, b)
                        for b in sorted(os.listdir(snap)))
    return _decode_batch_dirs(spark, dirs, meta)


def migrate_ares_root(spark, root: str, dest: str) -> dict[str, dict]:
    """Migrate every table of a reference ares-root into this engine's
    parquet layout: fact tables land day-partitioned and sorted by their
    archiving sort columns (the same layout ``sources.writer`` produces,
    so row-group pruning works immediately), dimension tables land as a
    plain parquet snapshot.  Returns per-table ``{path, rows, kind}``."""
    from pyspark.sql import functions as F

    from aresdb_spark.sources.writer import write_archive

    report: dict[str, dict] = {}
    for table in list_tables(root):
        meta = read_table_meta(root, table)
        cols = meta.schema.get("columns") or []
        path = os.path.join(dest, table)
        if meta.schema.get("isFactTable"):
            df = read_archive_table(spark, root, meta)
            time_col = cols[0]["name"]
            sort_cols = tuple(
                cols[i]["name"]
                for i in meta.schema.get("archivingSortColumns") or [])
            write_archive(
                df.withColumn(time_col,
                              F.col(time_col).cast("timestamp")),
                path, time_col, sort_cols)
            kind = "fact"
        else:
            df = read_snapshot_table(spark, root, meta)
            df.write.mode("overwrite").parquet(path)
            kind = "dimension"
        rows = spark.read.parquet(path).count()
        report[table] = {"path": path, "rows": rows, "kind": kind}
    return report


# --------------------------------------------------------------------------
# export: engine tables -> reference ares-root (the reverse direction)
# --------------------------------------------------------------------------

def _collect_enum_dicts(df, schema: dict) -> dict[str, list[str]]:
    """Build enum dictionaries for every enum-typed column: distinct
    cases in sorted order (deterministic across runs), capped at the
    type's cardinality (metastore/common/model.go:180-189) like
    ExtendEnumDict's limit. The collect is bounded by that cap
    (256 / 65536), never by table size."""
    from aresdb_spark.metastore import enum_cardinality

    enums: dict[str, list[str]] = {}
    for col in schema.get("columns") or []:
        if col["type"] not in ("SmallEnum", "BigEnum",
                               "SmallEnum[]", "BigEnum[]"):
            continue
        c = df[col["name"]]
        if col["type"].endswith("[]"):
            from pyspark.sql import functions as F

            vals = (df.select(F.explode(c).alias("v"))
                    .where("v IS NOT NULL").distinct())
        else:
            vals = df.select(c.alias("v")).where("v IS NOT NULL").distinct()
        cap = enum_cardinality(col["type"])
        cases = sorted(r.v for r in vals.limit(cap + 1).collect())
        if len(cases) > cap:
            raise ValueError(
                f"{col['name']}: {len(cases)} distinct cases exceed the "
                f"{col['type']} cardinality {cap}")
        enums[col["name"]] = cases
    return enums


def export_ares_root(spark, df, root: str, schema: dict,
                     cutoff: "int | None" = None) -> dict:
    """Write a fact-table DataFrame out as a reference-format ares-root
    (the reverse of ``migrate_ares_root``): per-UTC-day archive batch
    directories of vector-party files with sort columns RLE'd, plus the
    disk metastore (schema JSON, enum case files, per-day batch-version
    entries, the shard ``version`` cutoff).  The reference's recovery
    path — and this module's migrate — can both read the result, which
    makes gradual cutover two-way: no lock-in either direction.

    Scale shape: one ``applyInPandas`` task per day writes that day's
    batch directory (the same unit the reference's archiving job
    produces); the driver writes only metastore entries from the
    per-day row counts the tasks return.  ``df``'s time column (schema
    column 0) must be epoch seconds or a timestamp.

    Filesystem requirement: the per-day tasks open ``root``'s paths
    with plain ``open()`` ON THE EXECUTORS, so ``root`` must be a
    SHARED POSIX mount visible at the same path from every executor
    (NFS/Lustre/fuse-mounted bucket) — the same constraint the
    reference's diskstore has (diskstore/local_disk_store.go assumes
    one local root per node). On an unshared cluster, export to a
    node-local root per executor is NOT supported; run the export with
    the data coalesced to executors that mount the target (or export
    from a single-node session). The publication ORDER inside root is
    still crash-safe: batch files land before their metastore
    batch-version entries, version files last (the pointer pattern,
    sources/pointer.py)."""
    import pandas as pd
    from pyspark.sql import functions as F

    cols = [c for c in schema.get("columns") or [] if not c.get("deleted")]
    names = [c["name"] for c in cols]
    table = schema["name"]
    time_col = cols[0]["name"]
    sort_ids = schema.get("archivingSortColumns") or []
    sort_names = [schema["columns"][i]["name"] for i in sort_ids]
    missing = [n for n in names if n not in df.columns]
    if missing:
        raise ValueError(f"DataFrame lacks schema columns {missing}")

    work = df.select(*names)
    if dict(work.dtypes)[time_col].startswith("timestamp"):
        work = work.withColumn(
            time_col, F.unix_timestamp(time_col).cast("long"))
    enums = _collect_enum_dicts(work, schema)
    enum_ids = {k: {c: i for i, c in enumerate(v)} for k, v in enums.items()}
    if work.filter(F.col(time_col).isNull()).limit(1).count():
        raise ValueError(
            f"{time_col} has NULL values: the archive layout keys every "
            "row by its UTC day — drop or backfill null-time rows before "
            "export (the reference's live store holds them un-archived)")
    if cutoff is None:
        max_t = work.agg(F.max(time_col)).first()[0]
        if max_t is None:
            raise ValueError("cannot export an empty DataFrame: no rows "
                             "to derive the archiving cutoff from")
        cutoff = int(max_t) + 1
    work = work.withColumn("__day", (F.col(time_col) / 86400)
                           .cast("long"))

    all_cols = schema["columns"]  # ids include deleted columns

    def write_day(pdf: "pd.DataFrame") -> "pd.DataFrame":
        day = int(pdf["__day"].iloc[0])
        if sort_names:
            pdf = pdf.sort_values(sort_names, na_position="first")
        d = archive_batch_dir(root, table, 0, day, cutoff)
        os.makedirs(d, exist_ok=True)
        for cid, col in enumerate(all_cols):
            if col.get("deleted"):
                continue
            name, tname = col["name"], col["type"]
            series = pdf[name]
            vals = [None if v is None or v != v else v for v in series] \
                if not tname.endswith("[]") else \
                [None if v is None else list(v) for v in series]
            if tname in ("SmallEnum", "BigEnum"):
                ids = enum_ids.get(name, {})
                vals = [None if v is None else ids[v] for v in vals]
            elif tname in ("SmallEnum[]", "BigEnum[]"):
                ids = enum_ids.get(name, {})
                vals = [None if v is None else
                        [None if x is None else ids[x] for x in v]
                        for v in vals]
            elif tname in ("Int8", "Uint8", "Int16", "Uint16", "Int32",
                           "Uint32", "Int64") and vals:
                # pandas promotes nullable int columns to float
                vals = [None if v is None else int(v) for v in vals]
            counts = None
            if cid in sort_ids and not tname.endswith("[]"):
                # archiving RLEs sort columns (mode 3): collapse runs
                runs, offs, n = [], [0], 0
                for v in vals:
                    if runs and ((v is None and runs[-1] is None)
                                 or (v is not None and runs[-1] == v)):
                        offs[-1] += 1
                    else:
                        runs.append(v)
                        offs.append(offs[-1] + 1)
                vals, counts = runs, offs
            with open(os.path.join(d, f"{cid}.data"), "wb") as f:
                f.write(write_vector_party_bytes(tname, vals,
                                                 counts=counts))
        return pd.DataFrame({"day": [day], "rows": [len(pdf)]})

    day_rows = (work.repartition("__day").groupBy("__day")
                .applyInPandas(write_day, "day long, rows long")
                .collect())

    meta = os.path.join(root, "metastore", table)
    os.makedirs(os.path.join(meta, "shards", "0", "batches"),
                exist_ok=True)
    with open(os.path.join(meta, "schema"), "w") as f:
        json.dump(schema, f)
    if enums:
        os.makedirs(os.path.join(meta, "enums"), exist_ok=True)
        for name, cases in enums.items():
            with open(os.path.join(meta, "enums", name), "w") as f:
                f.write("".join(c + ENUM_DELIMITER for c in cases))
    with open(os.path.join(meta, "shards", "0", "version"), "w") as f:
        f.write(str(cutoff))
    for r in day_rows:
        with open(os.path.join(meta, "shards", "0", "batches",
                               str(r.day)), "w") as f:
            f.write(f"{cutoff},{r.rows}\n")
    return {"table": table, "cutoff": cutoff,
            "days": {r.day: r.rows for r in day_rows}}


def export_dimension_snapshot(spark, df, root: str, schema: dict,
                              redo_log: int = 1, offset: int = 0) -> dict:
    """Write a dimension-table DataFrame as a reference-format snapshot:
    ``snapshots/{redolog}_{offset}/{batchID}/{col}.data`` live-batch
    vector parties plus the metastore snapshot pointer
    ``redoLogFile,offset,batchID,index`` (diskstore_util.go:66-70,
    disk_metastore.go GetSnapshotProgress).  Dimension snapshots are
    small by definition (they broadcast-join against facts), so the
    single-batch collect here is bounded the same way the reference's
    snapshot job is."""
    cols = [c for c in schema.get("columns") or [] if not c.get("deleted")]
    names = [c["name"] for c in cols]
    table = schema["name"]
    enums = _collect_enum_dicts(df.select(*names), schema)
    enum_ids = {k: {c: i for i, c in enumerate(v)} for k, v in enums.items()}
    batch_id = -(2 ** 31)  # the live store's base batch id
    d = os.path.join(root, "data", f"{table}_0", "snapshots",
                     f"{redo_log}_{offset}", str(batch_id))
    os.makedirs(d, exist_ok=True)
    rows = df.select(*names).collect()
    n = len(rows)
    for cid, col in enumerate(schema["columns"]):
        if col.get("deleted"):
            continue
        name, tname = col["name"], col["type"]
        vals = [r[name] for r in rows]
        if tname in ("SmallEnum", "BigEnum"):
            ids = enum_ids.get(name, {})
            vals = [None if v is None else ids[v] for v in vals]
        elif tname in ("SmallEnum[]", "BigEnum[]"):
            ids = enum_ids.get(name, {})
            vals = [None if v is None else
                    [None if x is None else ids[x] for x in v]
                    for v in vals]
        elif tname.endswith("[]"):
            vals = [None if v is None else list(v) for v in vals]
        with open(os.path.join(d, f"{cid}.data"), "wb") as f:
            f.write(write_vector_party_bytes(tname, vals))
    meta = os.path.join(root, "metastore", table)
    os.makedirs(os.path.join(meta, "shards", "0"), exist_ok=True)
    with open(os.path.join(meta, "schema"), "w") as f:
        json.dump(schema, f)
    if enums:
        os.makedirs(os.path.join(meta, "enums"), exist_ok=True)
        for name, cases in enums.items():
            with open(os.path.join(meta, "enums", name), "w") as f:
                f.write("".join(c + ENUM_DELIMITER for c in cases))
    with open(os.path.join(meta, "shards", "0", "snapshot"), "w") as f:
        f.write(f"{redo_log},{offset},{batch_id},{max(n - 1, 0)}")
    return {"table": table, "rows": n}


def _day_value_hash(df, day_col, cols: list) -> dict:
    """Order-independent per-day content hash: md5 of each row's JSON
    rendering (covers nested arrays and NULLs), folded per day as an
    exact decimal sum — the contract suite's sorted-row-hash method
    made commutative so no sort is needed. Fully distributed; the
    driver receives one (hash, count) pair per day."""
    from pyspark.sql import functions as F

    row_h = F.conv(
        F.substring(F.md5(F.to_json(F.struct(*[F.col(c) for c in cols]))),
                    1, 14), 16, 10).cast("decimal(38,0)")
    return {r.d: (str(r.h), r.n) for r in (
        df.groupBy(day_col.cast("string").alias("d"))
        .agg(F.sum(row_h).alias("h"), F.count("*").alias("n"))
        .collect())}


def validate_migration(spark, root: str, table: str, migrated_path: str,
                       shard: "int | None" = None,
                       check_values: bool = False) -> dict:
    """Verify a migrated fact table against the source deployment's own
    metadata: the disk metastore records each archive batch's row count
    (the ``size`` field of the batch-version line the migration
    selected), so expected-vs-actual is ONE day-grouped count over the
    migrated parquet — no second read of the legacy data. At 100 TB
    this is the difference between a checkable migration and a leap of
    faith.

    ``check_values=True`` adds a per-day CONTENT hash (``_day_value_hash``)
    computed on both sides — the legacy batches re-decoded through the
    same executor-side codec the migration used, and the migrated
    parquet — catching value corruption that row counts cannot (a
    flipped enum id, a truncated array, a mis-signed integer). This one
    DOES re-read the legacy data; run it as the migration's acceptance
    gate, not per query.

    Returns {day: {"expected", "actual", "match"[, "value_match"]}}
    plus an "ok" rollup over every check performed. Dimension snapshots
    have no per-batch sizes; validate those by count against the source
    store directly."""
    from pyspark.sql import functions as F

    meta = read_table_meta(root, table)
    expected: dict[str, int] = {}
    dirs = []
    for sh in meta.shards:
        if shard is not None and sh.shard != shard:
            continue
        for batch_id, (ver, seq, size) in sorted(sh.batches.items()):
            day = _batch_date(batch_id)
            expected[day] = expected.get(day, 0) + size
            d = archive_batch_dir(root, table, sh.shard, batch_id, ver, seq)
            if os.path.isdir(d):
                dirs.append(d)
    from aresdb_spark.sources.writer import DAY_COL

    migrated = spark.read.parquet(migrated_path)
    actual = {r.d: r.n for r in (
        migrated
        .groupBy(F.col(DAY_COL).cast("string").alias("d"))
        .agg(F.count("*").alias("n")).collect())}

    value_hashes = None
    if check_values:
        cols = [c["name"] for c in meta.schema.get("columns") or []
                if not c.get("deleted")]
        time_col = cols[0]
        legacy = _decode_batch_dirs(spark, dirs, meta).withColumn(
            time_col, F.col(time_col).cast("timestamp"))
        legacy_h = _day_value_hash(
            legacy, F.date_format(time_col, "yyyy-MM-dd"), cols)
        migrated_h = _day_value_hash(migrated, F.col(DAY_COL), cols)
        value_hashes = (legacy_h, migrated_h)

    days = {}
    for day in sorted(set(expected) | set(actual)):
        e, a = expected.get(day, 0), actual.get(day, 0)
        days[day] = {"expected": e, "actual": a, "match": e == a}
        if value_hashes is not None:
            lh, mh = value_hashes
            days[day]["value_match"] = lh.get(day) == mh.get(day)
    ok = all(d["match"] and d.get("value_match", True)
             for d in days.values())
    return {"table": table, "ok": ok, "days": days}
