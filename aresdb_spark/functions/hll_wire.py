"""AresDB ``application/hll`` wire format — register codec, sketch math,
and the binary query-result envelope.

The reference serves HyperLogLog query results in a binary format when the
client sends ``Content-Accept: application/hll`` (reference
query/common/hll.go:43-68 documents the layout; parse at hll.go:364-502,
write at hll.go:871-1000). This module re-implements that surface from the
documented layout so a reference client can consume results produced here
and vice versa:

- register derivation: ``hll_value`` == the GPU ``GetHLLValueFunctor``
  (query/functor.hpp:430-478): murmur3 x64-128 of the raw little-endian
  value, seed 0; index = low 14 bits (HLL_BITS=14,
  query/time_series_aggregate.h:42), rho = count of consecutive zero bits
  above them. NOTE: that raw functor value is an aggregation intermediate;
  SERIALIZED registers store rho + 1 (CopyHLLFunctor adds it when writing
  the hll vector, functor.hpp:1363-1364) — the standard HLL convention the
  estimator below assumes.
- ``HLL``: sparse/dense register store with the reference's exact
  thresholds (sparse→dense at 4096 non-zero registers, hll.go:202-215),
  cache encoding (3-byte sparse records / 16 KiB dense, hll.go:669-733)
  and estimation (hll.go:735-777).
- envelope: ``parse_hll_query_results`` / ``HLLQueryResultsWriter`` for the
  multi-result binary response (magic 0xACED0102).

Estimation parity: raw estimates ≤ 5·2^14 are corrected with the HLL++
empirical bias tables (the public Google bias-correction dataset for
p=14, embedded in hll_bias_data.py; the reference carries the same slice
at hll.go:785-880) via the same 6-nearest-neighbor average — estimates
agree with the reference across the whole range, including the
(15500, 81920] bias band.
"""

from __future__ import annotations

import bisect
import struct

from aresdb_spark.functions.hll_bias_data import BIASES, RAW_ESTIMATES

HLL_P = 14                      # precision (HLL_BITS)
HLL_M = 1 << HLL_P              # number of registers
DENSE_DATA_LENGTH = HLL_M       # dense register vector bytes (16 KiB)
DENSE_THRESHOLD = DENSE_DATA_LENGTH // 4   # sparse→dense cutover
HLL_THRESHOLD = 15500.0         # linear-counting handoff for p=14
HLL_DATA_HEADER = 0xACED0102    # magic (new format)
OLD_HLL_DATA_HEADER = 0xACED0101
ENUM_DELIMITER = b"\x00\n"
NULL_STRING = "NULL"

# --- data type codes (memstore/common/data_type.go:43-74) -------------------

DT_BOOL = 0x00000001
DT_INT8 = 0x00010008
DT_UINT8 = 0x00020008
DT_INT16 = 0x00030010
DT_UINT16 = 0x00040010
DT_INT32 = 0x00050020
DT_UINT32 = 0x00060020
DT_FLOAT32 = 0x00070020
DT_SMALL_ENUM = 0x00080008
DT_BIG_ENUM = 0x00090010
DT_UUID = 0x000A0080
DT_GEOPOINT = 0x000B0040
DT_INT64 = 0x000D0040

_SIGNED = {DT_BOOL, DT_INT8, DT_INT16, DT_INT32, DT_INT64}
_UNSIGNED = {DT_UINT8, DT_UINT16, DT_UINT32, DT_SMALL_ENUM, DT_BIG_ENUM}


def data_type_bytes(dt: int) -> int:
    """Value width in bytes: bits live in the low 16 bits of the code."""
    bits = dt & 0xFFFF
    return max(1, (bits + 7) // 8)


# --- murmur3 x64-128 (public algorithm; the reference GPU kernel uses the
# --- same hash for register derivation, query/utils.hpp:280-310) ------------

_MASK64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_x64_128(key: bytes, seed: int = 0) -> tuple[int, int]:
    """Standard murmur3 x64-128; returns (h1, h2) as unsigned 64-bit ints."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & _MASK64
    n = len(key)
    nblocks = n // 16
    for b in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", key, b * 16)
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = key[nblocks * 16:]
    k1 = k2 = 0
    for i in range(len(tail) - 1, 7, -1):
        k2 = (k2 << 8) | tail[i]
    for i in range(min(len(tail), 8) - 1, -1, -1):
        k1 = (k1 << 8) | tail[i]
    if len(tail) > 8:
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
    if len(tail) > 0:
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def hll_value(key: bytes) -> int:
    """``GetHLLValueFunctor`` (query/functor.hpp:444-478): register value
    ``rho << 16 | index`` from the 64-bit murmur hash of the raw value.

    Mirrors the functor's effective device behavior exactly: its probe
    mask ``1 << (rho + HLL_BITS)`` is a 32-bit int and the probe result
    is truncated to uint32, so only bits 14..31 are ever tested — and
    once the shift reaches 32 the mask is 0 on NVIDIA, so the loop runs
    to its rho=50 bound. Net: when bits 14..31 are all zero (p = 2^-18
    per value), rho is 50 regardless of bits 32..63. Matching the quirk
    keeps sketches byte-exact with reference-built ones; the estimate
    impact is nil (2^-50 vs 2^-18.. reciprocals)."""
    hashed = murmur3_x64_128(key, 0)[0]
    index = hashed & (HLL_M - 1)
    rho = 0
    while rho + HLL_P < 64 and (hashed & (1 << (rho + HLL_P))) == 0:
        rho += 1
    if rho >= 32 - HLL_P:          # bits 14..31 all zero -> device yields 50
        rho = 64 - HLL_P
    return (rho << 16) | index


def hll_values_u32(values) -> "object":
    """Vectorized ``hll_value`` for an array of uint32 values (the
    reference's dominant HLL column type) — numpy uint64 arithmetic, no
    per-row Python. 4-byte keys hit only murmur's tail path, which folds
    to a short straight-line sequence."""
    import numpy as np

    v = np.asarray(values, dtype=np.uint64)
    c1 = np.uint64(0x87C37B91114253D5)
    c2 = np.uint64(0x4CF5AD432745937F)
    n = np.uint64(4)

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    def fmix(k):
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xFF51AFD7ED558CCD)
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xC4CEB9FE1A85EC53)
        k ^= k >> np.uint64(33)
        return k

    with np.errstate(over="ignore"):
        k1 = v * c1
        k1 = rotl(k1, 31) * c2
        h1 = k1.copy()          # h1 = 0 ^ k1
        h2 = np.zeros_like(v)
        h1 ^= n
        h2 ^= n
        h1 += h2
        h2 += h1
        h1 = fmix(h1)
        h2 = fmix(h2)
        h1 += h2
        # h2 unused beyond this point (functor takes hashedOutput[0])
        index = (h1 & np.uint64(HLL_M - 1)).astype(np.uint32)
        # rho = count of consecutive zeros from bit HLL_P upward
        shifted = h1 >> np.uint64(HLL_P)
        rho = np.zeros(len(v), dtype=np.uint32)
        live = np.ones(len(v), dtype=bool)
        for bit in range(64 - HLL_P):
            live &= ((shifted >> np.uint64(bit)) & np.uint64(1)) == 0
            rho += live.astype(np.uint32)
        # device-parity clamp (see hll_value): bits 14..31 all zero -> 50
        rho = np.where(rho >= np.uint32(32 - HLL_P),
                       np.uint32(64 - HLL_P), rho).astype(np.uint32)
        return (rho << np.uint32(16)) | index


def estimate_bias(estimate: float) -> float:
    """HLL++ bias at a raw estimate: average the 6 nearest calibration
    points' biases, "nearest" by squared distance in raw-estimate space
    over a 13-wide candidate window around the insertion point
    (hll.go:639-665 — identical neighbor selection, so corrected
    estimates match the reference exactly)."""
    i = bisect.bisect_right(RAW_ESTIMATES, estimate)
    k = 6
    lo = max(i - 1 - k, 0)
    hi = min(i + k, len(RAW_ESTIMATES))
    nearest = sorted(range(lo, hi),
                     key=lambda j: (RAW_ESTIMATES[j] - estimate) ** 2)[:k]
    return sum(BIASES[j] for j in nearest) / k


class HLL:
    """Reference HLL sketch: sparse list of (index, rho) or dense 16 KiB
    register vector (query/common/hll.go:133-215)."""

    __slots__ = ("sparse", "dense", "non_zero")

    def __init__(self, sparse: list[tuple[int, int]] | None = None,
                 dense: bytearray | None = None, non_zero: int = 0):
        self.sparse = sparse if sparse is not None else ([] if dense is None else None)
        self.dense = dense
        self.non_zero = non_zero

    def __eq__(self, other):
        return (isinstance(other, HLL) and self.sparse == other.sparse
                and (bytes(self.dense) if self.dense is not None else None)
                == (bytes(other.dense) if other.dense is not None else None)
                and self.non_zero == other.non_zero)

    def __repr__(self):
        if self.dense is not None:
            return f"HLL(dense, non_zero={self.non_zero})"
        return f"HLL(sparse={self.sparse!r})"

    # -- mutation (hll.go:148-215) --

    def convert_to_dense(self) -> None:
        if self.dense is not None:
            return
        d = bytearray(HLL_M)
        for index, rho in self.sparse:
            d[index] = rho
        self.dense, self.sparse = d, None

    def convert_to_sparse(self) -> bool:
        if self.non_zero * 4 >= HLL_M:
            return False
        if self.sparse is not None:
            return True
        self.sparse = [(i, r) for i, r in enumerate(self.dense) if r != 0]
        self.dense = None
        return True

    def set(self, index: int, rho: int) -> None:
        """Set a register; caller must set each register at most once."""
        self.non_zero += 1
        if self.dense is not None:
            self.dense[index] = rho
            return
        self.sparse.append((index, rho))
        if self.non_zero * 4 >= HLL_M:
            self.convert_to_dense()

    def merge(self, other: "HLL") -> None:
        self.convert_to_dense()
        regs = other.sparse or []
        if other.dense is not None:
            regs = ((i, r) for i, r in enumerate(other.dense) if r != 0)
        for index, rho in regs:
            old = self.dense[index]
            if old == 0:
                self.non_zero += 1
            if old < rho:
                self.dense[index] = rho

    # -- cache encoding (hll.go:669-733) --

    def encode(self) -> bytes:
        """Dense → 16 KiB raw registers; sparse → 3-byte records
        (index uint16 LE, rho byte)."""
        if self.dense is not None:
            return bytes(self.dense)
        out = bytearray(3 * len(self.sparse))
        for i, (index, rho) in enumerate(self.sparse):
            out[i * 3] = index & 0xFF
            out[i * 3 + 1] = index >> 8
            out[i * 3 + 2] = rho
        return bytes(out)

    def encode_binary(self) -> bytes:
        """Envelope encoding: dense unchanged; sparse as 4-byte records
        ``rho << 16 | index`` (uint32 LE) — what readHLL consumes."""
        if self.dense is not None:
            return bytes(self.dense)
        out = bytearray(4 * len(self.sparse))
        for i, (index, rho) in enumerate(self.sparse):
            struct.pack_into("<I", out, i * 4, ((rho & 0xFF) << 16) | index)
        return bytes(out)

    @classmethod
    def decode(cls, data: bytes) -> "HLL":
        if len(data) == HLL_M:
            return cls(sparse=None, dense=bytearray(data),
                       non_zero=sum(1 for b in data if b != 0))
        sparse = [(data[i * 3] | (data[i * 3 + 1] << 8), data[i * 3 + 2])
                  for i in range(len(data) // 3)]
        return cls(sparse=sparse, non_zero=len(sparse))

    # -- estimation (hll.go:735-777) --

    def compute(self) -> float:
        m = float(HLL_M)
        non_zero = float(self.non_zero)
        s = 0.0
        if self.dense is not None:
            for rho in self.dense:
                s += 1.0 / (1 << rho)
        else:
            for _, rho in self.sparse:
                s += 1.0 / (1 << rho)
            s += m - non_zero  # missing sparse registers contribute 2^0
        alpha = 0.7213 / (1 + 1.079 / m)
        estimate = alpha * m * m / s
        if estimate <= 5.0 * m:
            estimate -= estimate_bias(estimate)
        estimate_h = estimate
        if non_zero < m:
            import math
            estimate_h = m * math.log(m / (m - non_zero))
        if estimate_h <= HLL_THRESHOLD:
            estimate = estimate_h
        return float(int(estimate))


# --- dimension value rendering (query/common/dimval.go:36-120) --------------

def _format_float32_g(val: float) -> str:
    """Go ``strconv.FormatFloat(v, 'g', -1, 32)``: shortest decimal
    digits that round-trip the float32, rendered fixed-point unless the
    decimal exponent is < -4 or >= 6, in which case scientific with a
    signed two-digit exponent (``1e+07``, ``1.5e-05``). Integral values
    render without a trailing ``.0`` — ``10``, not ``10.0`` — so parsed
    dim keys compare equal to reference-rendered ones."""
    import math

    import numpy as np

    f = float(np.float32(val))
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "+Inf" if f > 0 else "-Inf"
    if f == 0.0:
        return "-0" if math.copysign(1.0, f) < 0 else "0"
    # shortest round-trip digits + decimal exponent from numpy
    s = np.format_float_scientific(np.float32(abs(val)), unique=True,
                                   trim="-")
    mant, exp10 = s.split("e")
    digits = mant.replace(".", "")
    exp10 = int(exp10)          # value = 0.digits * 10^(exp10+1)
    sign = "-" if f < 0 else ""
    if exp10 < -4 or exp10 >= 6:
        body = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
        return f"{sign}{body}e{'+' if exp10 >= 0 else '-'}{abs(exp10):02d}"
    dp = exp10 + 1              # digits before the decimal point
    if dp <= 0:
        return sign + "0." + "0" * (-dp) + digits
    if dp >= len(digits):
        return sign + digits + "0" * (dp - len(digits))
    return sign + digits[:dp] + "." + digits[dp:]


def _read_dim_value(buf: memoryview, value_off: int, null_off: int, row: int,
                    dt: int, enum_dict: list[str] | None) -> str | None:
    if buf[null_off + row] == 0:
        return None
    width = data_type_bytes(dt)
    off = value_off + width * row
    raw = bytes(buf[off:off + width])
    if dt == DT_FLOAT32:
        return _format_float32_g(struct.unpack("<f", raw)[0])
    if dt in _SIGNED:
        iv = int.from_bytes(raw, "little", signed=(dt != DT_BOOL))
        return str(iv)
    if dt in _UNSIGNED:
        iv = int.from_bytes(raw, "little", signed=False)
        if enum_dict and 0 <= iv < len(enum_dict):
            return enum_dict[iv]
        return str(iv)
    raise NotImplementedError(f"dimension data type 0x{dt:08x}")


def _dim_start_offsets(num_dims_per_width: list[int], dim_index: int,
                       length: int) -> tuple[int, int]:
    """query/common/dimval.go:122-144: column-major dim vector, dims laid
    out widest (16B) → narrowest (1B); null bytes after all values."""
    start_dim, value_offset = 0, 0
    dim_bytes = 1 << (len(num_dims_per_width) - 1)
    for num_dim in num_dims_per_width:
        if start_dim + num_dim > dim_index:
            value_offset += (dim_index - start_dim) * length * dim_bytes
            break
        start_dim += num_dim
        value_offset += num_dim * length * dim_bytes
        dim_bytes >>= 1
    value_bytes = sum((1 << (len(num_dims_per_width) - i - 1)) * n
                      for i, n in enumerate(num_dims_per_width))
    null_offset = (value_bytes + dim_index) * length
    return value_offset, null_offset


def _align(n: int, to: int = 8) -> int:
    return (n + to - 1) // to * to


# --- single-result payload (hll.go:364-502) ---------------------------------

def parse_hll_result(buf: bytes, ignore_enum: bool = False,
                     old_format: bool = False) -> dict:
    """Parse one query result payload into the nested dict shape of the
    reference's AQLQueryResult: dim-value strings (``"NULL"`` for null) as
    keys level by level, ``HLL`` sketches at the leaves.

    ``old_format`` parses the 0xACED0101 migration layout
    (parseOldTimeseriesHLLResult, hll.go:217-280): the header leads with
    per-width dim counts ``[u8 four][u8 two][u8 one][u8 numEnum]`` (no
    8-byte dims in the old format) then ``[u32 resultSize][u32
    paddedDimLen][4 pad]``; everything from the dim-index vector on is
    byte-identical to the current format."""
    if len(buf) == 0:
        return {}
    mv = memoryview(buf)
    pos = 0
    if old_format:
        four, two, one, num_enum_columns = mv[0], mv[1], mv[2], mv[3]
        num_dims_per_width = [0, 0, four, two, one]
        pos = 4
        result_size, padded_dim_len = struct.unpack_from("<II", mv, pos)
        pos += 8
        pos += 4  # explicit SkipBytes(4), hll.go:259-261
    else:
        num_enum_columns = mv[pos]; pos += 1
        num_dims_per_width = list(mv[pos:pos + 5]); pos += 5
        pos = _align(pos)
        result_size, padded_dim_len = struct.unpack_from("<II", mv, pos)
        pos += 8
    total_dims = sum(num_dims_per_width)
    dim_indexes = list(mv[pos:pos + total_dims]); pos += total_dims
    pos = _align(pos)
    data_types = list(struct.unpack_from(f"<{total_dims}I", mv, pos))
    pos += 4 * total_dims
    pos = _align(pos)
    enum_dicts: dict[int, list[str]] = {}
    for _ in range(num_enum_columns):
        enum_bytes, dim_idx = struct.unpack_from("<IH", mv, pos); pos += 8
        raw = bytes(mv[pos:pos + enum_bytes]); pos += enum_bytes
        cases = raw.split(ENUM_DELIMITER)[:-1]
        # trailing alignment NULs live inside enum_bytes; the reference's
        # writer pads with zeros after the final delimiter
        enum_dicts[dim_idx] = [c.decode("utf-8").rstrip("\x00") for c in cases]
    header_size = pos
    dim_vector_off = header_size
    padded_count_len = _align(2 * result_size)
    count_off = dim_vector_off + padded_dim_len
    hll_off = count_off + padded_count_len

    offsets = [_dim_start_offsets(num_dims_per_width, dim_indexes[i], result_size)
               for i in range(total_dims)]
    result: dict = {}
    hll_pos = hll_off
    for row in range(result_size):
        dim_values = []
        for d in range(total_dims):
            voff, noff = offsets[d]
            enum_dict = None if ignore_enum else enum_dicts.get(d)
            dim_values.append(_read_dim_value(
                mv, dim_vector_off + voff, dim_vector_off + noff, row,
                data_types[d], enum_dict))
        count = struct.unpack_from("<H", mv, count_off + 2 * row)[0]
        if count < DENSE_THRESHOLD:
            sparse = []
            for _ in range(count):
                data = struct.unpack_from("<I", mv, hll_pos)[0]
                sparse.append((data & 0xFFFF, (data >> 16) & 0xFF))
                hll_pos += 4
            hll = HLL(sparse=sparse, non_zero=count)
        else:
            hll = HLL(sparse=None,
                      dense=bytearray(mv[hll_pos:hll_pos + DENSE_DATA_LENGTH]))
            hll.non_zero = sum(1 for b in hll.dense if b != 0)
            hll_pos += DENSE_DATA_LENGTH
        node = result
        for v in dim_values[:-1]:
            node = node.setdefault(NULL_STRING if v is None else v, {})
        leaf_key = (NULL_STRING if dim_values[-1] is None
                    else dim_values[-1]) if dim_values else NULL_STRING
        node[leaf_key] = hll
    return result


# --- multi-result envelope (hll.go:583-637, 950-1000) -----------------------

def parse_hll_query_results(data: bytes, ignore_enum: bool = False
                            ) -> tuple[list[dict | None], list[str | None]]:
    """Parse an ``application/hll`` response body: returns parallel lists
    of results (nested dicts, None for errored queries) and error strings
    (None for successful queries)."""
    magic = struct.unpack_from("<I", data, 0)[0]
    if magic not in (HLL_DATA_HEADER, OLD_HLL_DATA_HEADER):
        raise ValueError(f"bad magic 0x{magic:08x}")
    # the reference parses BOTH headers through the same envelope loop
    # (ParseHLLQueryResults, hll.go:583-607) and dispatches per-result
    # payloads on the magic (NewTimeSeriesHLLResult, hll.go:529-540)
    old_format = magic == OLD_HLL_DATA_HEADER
    pos = 8  # magic + 4 padding
    results: list[dict | None] = []
    errors: list[str | None] = []
    while pos + 8 <= len(data):
        size, is_err = struct.unpack_from("<IB", data, pos)
        pos += 8  # size + err flag + 3 padding
        payload = data[pos:pos + size]
        pos += size
        if is_err:
            results.append(None)
            errors.append(payload.decode("utf-8"))
            # The reference's WriteError appends 8 zero bytes NOT counted
            # in size when the message length is a multiple of 8
            # (hll.go:983: padding = (8 - (len & 7)) & 8). Its own parser
            # misreads them as a spurious empty result; skip them here so
            # reference-written envelopes parse cleanly.
            if size % 8 == 0 and data[pos:pos + 8] == b"\x00" * 8:
                pos += 8
        else:
            results.append(parse_hll_result(payload, ignore_enum,
                                            old_format=old_format))
            errors.append(None)
    return results, errors


class HLLQueryResultsWriter:
    """Serialize query results to the ``application/hll`` envelope
    (reference HLLQueryResults, hll.go:950-1000 + HLLDataWriter
    hll.go:871-948)."""

    def __init__(self):
        self._chunks: list[bytes] = [struct.pack("<II", HLL_DATA_HEADER, 0)]

    def write_error(self, message: str) -> None:
        payload = message.encode("utf-8")
        self._chunks.append(struct.pack("<IB3x", len(payload), 1))
        self._chunks.append(payload)
        # byte parity with the reference writer's padding quirk
        # (hll.go:983): 8 extra zero bytes when len is a multiple of 8
        if len(payload) % 8 == 0:
            self._chunks.append(b"\x00" * 8)

    def write_result(self, rows: list[tuple[list, "HLL"]],
                     data_types: list[int],
                     enum_dicts: dict[int, list[str]] | None = None) -> None:
        """``rows``: (dim_values, hll) pairs; dim value None renders NULL.
        ``data_types``: one reference type code per dimension, in query
        dimension order."""
        payload = serialize_hll_result(rows, data_types, enum_dicts or {})
        self._chunks.append(struct.pack("<IB3x", len(payload), 0))
        self._chunks.append(payload)

    def get_bytes(self) -> bytes:
        return b"".join(self._chunks)


def _width_bucket(dt: int) -> int:
    """Index into NumDimsPerDimWidth: 16B..1B by value width."""
    return {16: 0, 8: 1, 4: 2, 2: 3, 1: 4}[data_type_bytes(dt)]


def serialize_hll_result(rows: list[tuple[list, "HLL"]],
                         data_types: list[int],
                         enum_dicts: dict[int, list[str]]) -> bytes:
    """Build one result payload. Dimensions are physically ordered widest
    first (the reference compiler's dimension layout); ``dim_indexes``
    records the logical→physical mapping."""
    n = len(rows)
    total_dims = len(data_types)
    # physical order: stable sort by width bucket
    order = sorted(range(total_dims), key=lambda i: _width_bucket(data_types[i]))
    num_dims_per_width = [0] * 5
    for i in order:
        num_dims_per_width[_width_bucket(data_types[i])] += 1
    # dim_indexes[k] = physical slot of logical dim k? The parser walks
    # logical dims in order and looks up dimIndexes[i] to find the
    # physical vector — so dim_indexes maps logical → physical.
    phys_of_logical = {logical: phys for phys, logical in enumerate(order)}
    dim_indexes = [phys_of_logical[i] for i in range(total_dims)]

    value_bytes_per_row = sum(data_type_bytes(t) for t in data_types)
    padded_dim_len = _align((value_bytes_per_row + total_dims) * n)

    header = bytearray()
    header.append(len(enum_dicts))
    header.extend(bytes(num_dims_per_width))
    header.extend(b"\x00" * (_align(len(header)) - len(header)))
    header.extend(struct.pack("<II", n, padded_dim_len))
    header.extend(bytes(dim_indexes))
    header.extend(b"\x00" * (_align(len(header)) - len(header)))
    for t in data_types:
        header.extend(struct.pack("<I", t))
    header.extend(b"\x00" * (_align(len(header)) - len(header)))
    for dim_idx in sorted(enum_dicts):
        cases = enum_dicts[dim_idx]
        raw = b"".join(c.encode("utf-8") + ENUM_DELIMITER for c in cases)
        padded = _align(len(raw))
        header.extend(struct.pack("<IH2x", padded, dim_idx))
        header.extend(raw)
        header.extend(b"\x00" * (padded - len(raw)))

    dim_vec = bytearray(padded_dim_len)
    reverse_enum = {d: {c: i for i, c in enumerate(cases)}
                    for d, cases in enum_dicts.items()}
    for logical in range(total_dims):
        dt = data_types[logical]
        voff, noff = _dim_start_offsets(num_dims_per_width,
                                        dim_indexes[logical], n)
        width = data_type_bytes(dt)
        for row, (dims, _hll) in enumerate(rows):
            v = dims[logical]
            if v is None:
                continue
            dim_vec[noff + row] = 1
            if dt == DT_FLOAT32:
                raw = struct.pack("<f", float(v))
            elif dt in (DT_SMALL_ENUM, DT_BIG_ENUM) and isinstance(v, str):
                raw = int(reverse_enum[logical][v]).to_bytes(width, "little")
            else:
                raw = int(v).to_bytes(width, "little",
                                      signed=dt in _SIGNED and dt != DT_BOOL)
            dim_vec[voff + width * row:voff + width * (row + 1)] = raw

    counts = bytearray(_align(2 * n))
    hll_vec = bytearray()
    for row, (_dims, hll) in enumerate(rows):
        if hll.dense is not None:
            # the count entry is the non-zero register count (>= the 4096
            # threshold, so the parser reads dense); fall back to the full
            # register count if the caller didn't track non_zero
            n_regs = hll.non_zero if hll.non_zero >= DENSE_THRESHOLD \
                else DENSE_DATA_LENGTH
            struct.pack_into("<H", counts, 2 * row, n_regs)
            hll_vec.extend(hll.dense)
        else:
            struct.pack_into("<H", counts, 2 * row, len(hll.sparse))
            hll_vec.extend(hll.encode_binary())
    return bytes(header) + bytes(dim_vec) + bytes(counts) + bytes(hll_vec)
