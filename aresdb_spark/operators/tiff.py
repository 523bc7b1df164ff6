"""Clean-room baseline TIFF codec (pure stdlib + numpy) per the public
TIFF 6.0 specification (Adobe, 1992).

TIFF is the scanned-document staple of web corpora and the fourth
lossless image container here (after PNG, GIF and the block-exact JPEG
oracle class). Everything needed is in the public spec: the IFD tag
walk (either byte order), strip assembly, and three baseline
compressions — none (1), PackBits (32773, the run-length coder of
§9) and LZW (5, §13) — plus the horizontal-differencing predictor
(tag 317 = 2) that real writers pair with LZW.

TIFF LZW is NOT GIF LZW, and the differences are implemented for real:
codes pack MSB-first (GIF is LSB-first), the alphabet is fixed at 256
bytes + CLEAR(256)/EOI(257) with 9-bit initial codes, and the code
width increments EARLY — when the next free code is 2^width - 1, one
entry before GIF's rule (spec §13: "because of the deferred nature...
LZW compressors increment the code length one code early").

Scope (honest, spec-cited):
  - decode: baseline gray (PhotometricInterpretation 0/1, 8-bit) and
    RGB (2, 8-bit per sample) in strips, II and MM byte orders,
    compressions 1/5/32773, predictor 1/2; min-is-black inversion for
    photometric 0. Tiles (tag 322+), 16-bit samples, palette color and
    other compressions (CCITT fax, old-JPEG) raise NotImplementedError
    naming the tag/value.
  - encode: matching LE writer for deterministic test payloads — gray
    or RGB, any compression/predictor combination, configurable
    rows-per-strip so multi-strip assembly is exercised by real files.

TIFF is LOSSLESS, so integer-formula images round-trip bit-for-bit and
a DuckDB oracle recomputes decoded statistics exactly across every
compression × predictor × strip layout.
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_SIGNATURES = (b"II*\x00", b"MM\x00*")


# -- PackBits (TIFF 6.0 §9) ----------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find a run of >= 3 equal bytes (2-byte runs encode better as
        # literals unless adjacent to a run; keep the simple spec rule)
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)            # -(run-1) as unsigned
            out.append(data[i])
            i = j + 1
            continue
        # literal stretch: up to the next >=3 run or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += data[i:k]
        i = k
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected and i < len(data):
        b = data[i]
        i += 1
        if b == 128:                                     # noop
            continue
        if b < 128:                                      # literal n+1
            out += data[i:i + b + 1]
            i += b + 1
        else:                                            # repeat 257-b
            if i >= len(data):
                raise ValueError("PackBits run truncated")
            out += bytes([data[i]]) * (257 - b)
            i += 1
    if len(out) < expected:
        raise ValueError("PackBits stream ended early")
    return bytes(out[:expected])


# -- TIFF LZW (TIFF 6.0 §13): MSB-first, early-change --------------------------


class _MsbWriter:
    """Plain MSB-first bit packer (no byte stuffing — that is a JPEG
    entropy-segment rule, not a TIFF one)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | (code & ((1 << width) - 1))
        self.n += width
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    bw = _MsbWriter()

    def reset():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = reset()
    bw.write(CLEAR, width)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        bw.write(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # EARLY change: width grows one entry before the table reaches
        # 2^width (§13 — "increment the code length one code early")
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:                # table nearly full: reset
            bw.write(CLEAR, width)
            table, next_code, width = reset()
        w = c
    if w:
        bw.write(table[w], width)
    bw.write(EOI, width)
    return bw.flush()


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    CLEAR, EOI = 256, 257
    pos = 0
    acc = 0
    nbits = 0
    width = 9
    table: list[bytes] = []
    prev: "bytes | None" = None
    out = bytearray()

    def read_code():
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return EOI                   # tolerate missing EOI pad
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        v = (acc >> nbits) & ((1 << width) - 1)
        return v

    def reset():
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = reset()
    while len(out) < expected:
        code = read_code()
        if code == CLEAR:
            table = reset()
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if code < len(table) and (code < 256 or table[code]):
            seq = table[code]
        elif code == len(table) and prev is not None:
            seq = prev + prev[:1]
        else:
            raise ValueError(f"invalid TIFF LZW code {code}")
        out += seq
        if prev is not None and len(table) < 4096:
            table.append(prev + seq[:1])
        # early change mirrors the encoder, offset by the one entry the
        # decoder always lags (it adds entry k only after reading code
        # k+1): encoder grows at next_code == 2^w - 1, so here the
        # table holds 2^w - 2 entries at the same stream position
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = seq
    if len(out) < expected:
        raise ValueError("TIFF LZW stream ended before the strip size")
    return bytes(out[:expected])


# -- container -----------------------------------------------------------------


def _predict2_encode(rows: np.ndarray, spp: int) -> np.ndarray:
    """Horizontal differencing (tag 317 = 2): each sample stores the
    delta to the same sample of the previous pixel, modulo 256."""
    r = rows.astype(np.int16).reshape(rows.shape[0], -1, spp)
    d = r.copy()
    d[:, 1:, :] = r[:, 1:, :] - r[:, :-1, :]
    return (d & 0xFF).astype(np.uint8).reshape(rows.shape)


def _predict2_decode(rows: np.ndarray, spp: int) -> np.ndarray:
    r = rows.reshape(rows.shape[0], -1, spp).astype(np.int64)
    return (np.cumsum(r, axis=1) & 0xFF).astype(np.uint8) \
        .reshape(rows.shape)


def encode_tiff(pixels: np.ndarray, compression: int = 1,
                predictor: int = 1, rows_per_strip: int = 0) -> bytes:
    """Little-endian TIFF writer: uint8 gray ``(h, w)`` or RGB
    ``(h, w, 3)``; ``compression`` 1 (none) / 5 (LZW) / 32773
    (PackBits); ``predictor`` 2 applies horizontal differencing before
    compression (spec-legal with any compression, customary with LZW);
    ``rows_per_strip`` 0 = single strip."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    spp = 1 if gray else 3
    rps = rows_per_strip if rows_per_strip > 0 else h
    strips = []
    for y0 in range(0, h, rps):
        rows = px[y0:y0 + rps].reshape(-1, w * spp)
        if predictor == 2:
            rows = _predict2_encode(rows, spp)
        raw = rows.tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(tiff_lzw_encode(raw))
        elif compression == 32773:
            strips.append(packbits_encode(raw))
        else:
            raise ValueError(f"unsupported compression {compression}")

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tag, typ, count, value)

    n_strips = len(strips)
    # deterministic layout: header(8) + IFD + aux arrays (RGB
    # BitsPerSample, >4-byte strip offset/count arrays) + strip data —
    # every strip length is known up front, so offsets compute directly
    entries = 11
    aux_base = 8 + 2 + 12 * entries + 4
    aux_len = (0 if gray else 6) + (8 * n_strips if n_strips > 1 else 0)
    data_base = aux_base + aux_len
    strip_off = []
    pos = data_base
    for s in strips:
        strip_off.append(pos)
        pos += len(s)
    aux = bytearray()
    if gray:
        bps_value = 8
    else:
        bps_value = aux_base + len(aux)
        aux += struct.pack("<HHH", 8, 8, 8)
    if n_strips > 1:
        off_off = aux_base + len(aux)
        aux += b"".join(struct.pack("<I", o) for o in strip_off)
        cnt_off = aux_base + len(aux)
        aux += b"".join(struct.pack("<I", len(s)) for s in strips)
    assert len(aux) == aux_len
    ifd = struct.pack("<H", entries)
    ifd += entry(256, 4, 1, w)                       # ImageWidth
    ifd += entry(257, 4, 1, h)                       # ImageLength
    ifd += entry(258, 3, spp, bps_value)             # BitsPerSample
    ifd += entry(259, 3, 1, compression)             # Compression
    ifd += entry(262, 3, 1, 1 if gray else 2)        # Photometric
    if n_strips > 1:
        ifd += entry(273, 4, n_strips, off_off)      # StripOffsets
    else:
        ifd += entry(273, 4, 1, strip_off[0])
    ifd += entry(277, 3, 1, spp)                     # SamplesPerPixel
    ifd += entry(278, 4, 1, rps)                     # RowsPerStrip
    if n_strips > 1:
        ifd += entry(279, 4, n_strips, cnt_off)      # StripByteCounts
    else:
        ifd += entry(279, 4, 1, len(strips[0]))
    ifd += entry(284, 3, 1, 1)                       # PlanarConfig chunky
    ifd += entry(317, 3, 1, predictor)               # Predictor
    ifd += struct.pack("<I", 0)                      # no next IFD
    out = b"II*\x00" + struct.pack("<I", 8) + ifd + bytes(aux) \
        + b"".join(strips)
    return out


def _read_ifd_values(data: bytes, e: str, typ: int, count: int,
                     raw: bytes) -> "list[int]":
    sizes = {1: 1, 3: 2, 4: 4}
    fmts = {1: "B", 3: "H", 4: "I"}
    if typ not in sizes:
        raise NotImplementedError(f"TIFF IFD value type {typ} not "
                                  f"implemented (BYTE/SHORT/LONG only)")
    total = sizes[typ] * count
    if total <= 4:
        if len(raw) < total:
            raise ValueError("truncated TIFF IFD entry")
        buf = raw[:total]
    else:
        (off,) = struct.unpack(e + "I", raw)
        buf = data[off:off + total]
        if len(buf) < total:
            raise ValueError("TIFF IFD value array truncated")
    return list(struct.unpack(f"{e}{count}{fmts[typ]}", buf))


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode a baseline strip TIFF (scope in the module docstring).
    Returns uint8 ``(h, w)`` gray or ``(h, w, 3)`` RGB."""
    data = bytes(payload)
    if data[:4] not in TIFF_SIGNATURES:
        raise ValueError("not a TIFF payload")
    e = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF IFD beyond end of file")
    (n_entries,) = struct.unpack(e + "H", data[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        o = ifd_off + 2 + 12 * i
        if o + 12 > len(data):
            raise ValueError("truncated TIFF IFD")
        tag, typ, count = struct.unpack(e + "HHI", data[o:o + 8])
        if typ in (1, 3, 4):
            tags[tag] = _read_ifd_values(data, e, typ, count,
                                         data[o + 8:o + 12])
    if 322 in tags or 323 in tags:
        raise NotImplementedError(
            "tiled TIFF (tags 322/323) not implemented — strips only")
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as missing:
        raise ValueError(f"TIFF missing required tag {missing}")
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    rps = tags.get(278, [h])[0] or h
    predictor = tags.get(317, [1])[0]
    if any(b != 8 for b in bps):
        raise NotImplementedError(
            f"{bps}-bit TIFF samples not implemented (8-bit only)")
    if photo not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photo} not implemented (gray/RGB only)")
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF needs 3 samples per pixel")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError(
            "planar TIFF (PlanarConfiguration 2) not implemented")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - si * rps)
        if nrows <= 0:
            break
        expected = nrows * w * spp
        raw = data[off:off + cnt]
        if len(raw) < cnt:
            raise ValueError("TIFF strip beyond end of file")
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("uncompressed strip too short")
            buf = raw[:expected]
        elif comp == 5:
            buf = tiff_lzw_decode(raw, expected)
        elif comp == 32773:
            buf = packbits_decode(raw, expected)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} requires a codec library "
                f"(none/LZW/PackBits only)")
        strip = np.frombuffer(buf, dtype=np.uint8).reshape(nrows, w * spp)
        if predictor == 2:
            strip = _predict2_decode(strip, spp)
        elif predictor != 1:
            raise NotImplementedError(
                f"TIFF predictor {predictor} not implemented")
        rows.append(strip)
    px = np.concatenate(rows, axis=0)
    if px.shape[0] != h:
        raise ValueError("TIFF strips do not cover the image height")
    if photo == 2:
        return px.reshape(h, w, spp)[:, :, :3]
    gray = px.reshape(h, w, spp)[:, :, 0] if spp > 1 else px.reshape(h, w)
    if photo == 0:                       # min-is-white: invert
        gray = 255 - gray
    return gray
