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

Scope (honest, spec-cited; widened r12):
  - decode: gray (PhotometricInterpretation 0/1), RGB (2) and PALETTE
    (3, 16-bit ColorMap lookup → uint16 RGB) at 8 OR 16 bits per
    sample, in STRIPS or TILES (§15 — full-size edge tiles, crop after
    assembly), II and MM byte orders, compressions 1/5/32773,
    predictor 1/2 at either depth; min-is-white inversion at the
    sample depth. CCITT fax / old-JPEG compressions, planar layout and
    non-uniform/sub-byte depths raise NotImplementedError naming the
    tag/value.
  - encode: matching LE writer for deterministic test payloads — gray
    / RGB / palette, 8/16-bit, any compression/predictor combination,
    configurable rows-per-strip or tiling so multi-segment assembly is
    exercised by real files.

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
            # trim consumed high bits before shifting: without the
            # mask the accumulator grows with every byte ever read,
            # making each shift O(strip size) — quadratic on a large
            # single-strip file (r14, the JPEG _fill lesson)
            acc = ((acc & ((1 << nbits) - 1)) << 8) | data[pos]
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


def _predict2_encode(rows: np.ndarray, spp: int,
                     bits: int = 8) -> np.ndarray:
    """Horizontal differencing (tag 317 = 2): each sample stores the
    delta to the same sample of the previous pixel, modulo 2^bits."""
    r = rows.astype(np.int64).reshape(rows.shape[0], -1, spp)
    d = r.copy()
    d[:, 1:, :] = r[:, 1:, :] - r[:, :-1, :]
    mask = (1 << bits) - 1
    dt = np.uint8 if bits == 8 else np.uint16
    return (d & mask).astype(dt).reshape(rows.shape)


def _predict2_decode(rows: np.ndarray, spp: int,
                     bits: int = 8) -> np.ndarray:
    r = rows.reshape(rows.shape[0], -1, spp).astype(np.int64)
    mask = (1 << bits) - 1
    dt = np.uint8 if bits == 8 else np.uint16
    return (np.cumsum(r, axis=1) & mask).astype(dt).reshape(rows.shape)


def _compress(raw: bytes, compression: int) -> bytes:
    if compression == 1:
        return raw
    if compression == 5:
        return tiff_lzw_encode(raw)
    if compression == 32773:
        return packbits_encode(raw)
    raise ValueError(f"unsupported compression {compression}")


def encode_tiff(pixels: np.ndarray, compression: int = 1,
                predictor: int = 1, rows_per_strip: int = 0,
                bits: int = 8, tile: "tuple[int, int] | None" = None,
                palette: "np.ndarray | None" = None) -> bytes:
    """Little-endian TIFF writer covering the decode scope (r12): gray
    ``(h, w)`` / RGB ``(h, w, 3)`` at 8 or 16 ``bits`` per sample, or
    PALETTE images (``pixels`` = 8-bit indices + ``palette`` =
    ``(n, 3)`` 16-bit ColorMap values → photometric 3); ``compression``
    1 (none) / 5 (LZW) / 32773 (PackBits); ``predictor`` 2 applies
    horizontal differencing before compression; STRIP layout by
    default (``rows_per_strip`` 0 = single strip) or TILED when
    ``tile=(tw, tl)`` is given (tags 322-325, edge tiles zero-padded
    to full size per spec §15)."""
    pal = None
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint16)
        if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
            raise ValueError(f"palette must be (n<=256, 3): {pal.shape}")
        px = np.asarray(pixels, dtype=np.uint8)
        if px.ndim != 2:
            raise ValueError("palette TIFF needs (h, w) indices")
        if int(px.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        bits = 8
    else:
        dt = np.uint8 if bits == 8 else np.uint16 if bits == 16 else None
        if dt is None:
            raise ValueError(f"bits={bits}: 8 or 16 only")
        px = np.asarray(pixels, dtype=dt)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    spp = 1 if gray else 3
    photo = 3 if pal is not None else (1 if gray else 2)

    segments = []
    if tile is not None:
        tw, tl = tile
        if tw <= 0 or tl <= 0:
            raise ValueError("tile dims must be positive")
        flat = px.reshape(h, w, spp)
        for ty in range(0, h, tl):
            for tx in range(0, w, tw):
                block = np.zeros((tl, tw, spp), px.dtype)
                sub = flat[ty:ty + tl, tx:tx + tw]
                block[:sub.shape[0], :sub.shape[1]] = sub
                rows = block.reshape(tl, tw * spp)
                if predictor == 2:
                    rows = _predict2_encode(rows, spp, bits)
                segments.append(_compress(
                    rows.astype("<u2" if bits == 16 else np.uint8)
                    .tobytes(), compression))
    else:
        rps = rows_per_strip if rows_per_strip > 0 else h
        for y0 in range(0, h, rps):
            rows = px[y0:y0 + rps].reshape(-1, w * spp)
            if predictor == 2:
                rows = _predict2_encode(rows, spp, bits)
            segments.append(_compress(
                rows.astype("<u2" if bits == 16 else np.uint8)
                .tobytes(), compression))

    # generic IFD layout: entries whose values exceed 4 bytes point
    # into an aux area between the IFD and the segment data
    entries: "list[tuple[int, int, list[int]]]" = []

    def add(tag, typ, values):
        entries.append((tag, typ, list(values)))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [bits] * spp)
    add(259, 3, [compression])
    add(262, 3, [photo])
    if tile is not None:
        add(322, 4, [tile[0]])
        add(323, 4, [tile[1]])
        add(324, 4, [0] * len(segments))             # patched below
        add(325, 4, [len(s) for s in segments])
    else:
        add(273, 4, [0] * len(segments))             # patched below
        add(278, 4, [rows_per_strip if rows_per_strip > 0 else h])
        add(279, 4, [len(s) for s in segments])
    add(277, 3, [spp])
    add(284, 3, [1])
    add(317, 3, [predictor])
    if pal is not None:
        # ColorMap: R plane then G then B, 3 * 2^bits SHORT values
        n = 1 << bits
        cmap = np.zeros((3, n), np.uint16)
        cmap[:, :len(pal)] = pal.T
        add(320, 3, cmap.reshape(-1).tolist())
    entries.sort(key=lambda t: t[0])                 # spec: ascending

    sizes = {3: 2, 4: 4}
    fmts = {3: "H", 4: "I"}
    aux_base = 8 + 2 + 12 * len(entries) + 4
    aux_len = sum(sizes[typ] * len(v) for _, typ, v in entries
                  if sizes[typ] * len(v) > 4)
    data_base = aux_base + aux_len
    seg_off = []
    pos = data_base
    for s in segments:
        seg_off.append(pos)
        pos += len(s)
    for i, (tag, typ, v) in enumerate(entries):      # patch offsets
        if tag in (273, 324):
            entries[i] = (tag, typ, seg_off)
    aux = bytearray()
    ifd = struct.pack("<H", len(entries))
    for tag, typ, v in entries:
        nbytes = sizes[typ] * len(v)
        if nbytes <= 4:
            raw = struct.pack(f"<{len(v)}{fmts[typ]}", *v).ljust(4, b"\0")
            ifd += struct.pack("<HHI", tag, typ, len(v)) + raw
        else:
            ifd += struct.pack("<HHII", tag, typ, len(v),
                               aux_base + len(aux))
            aux += struct.pack(f"<{len(v)}{fmts[typ]}", *v)
    assert len(aux) == aux_len
    ifd += struct.pack("<I", 0)                      # no next IFD
    return b"II*\x00" + struct.pack("<I", 8) + ifd + bytes(aux) \
        + b"".join(segments)


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
    try:
        w = tags[256][0]
        h = tags[257][0]
    except KeyError as missing:
        raise ValueError(f"TIFF missing required tag {missing}")
    tiled = 322 in tags or 323 in tags
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    predictor = tags.get(317, [1])[0]
    if any(b != bps[0] for b in bps) or bps[0] not in (8, 16):
        raise NotImplementedError(
            f"{bps}-bit TIFF samples not implemented (uniform 8/16 only)")
    bits = bps[0]
    bwid = bits // 8
    dt = np.uint8 if bits == 8 else np.dtype(e + "u2")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"TIFF photometric {photo} not implemented "
            f"(gray/RGB/palette only)")
    if photo == 3 and (320 not in tags or bits != 8):
        raise ValueError("palette TIFF needs an 8-bit ColorMap")
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF needs 3 samples per pixel")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError(
            "planar TIFF (PlanarConfiguration 2) not implemented")
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} not implemented")

    def segment(raw, cnt, expected):
        if len(raw) < cnt:
            raise ValueError("TIFF segment beyond end of file")
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("uncompressed segment too short")
            return raw[:expected]
        if comp == 5:
            return tiff_lzw_decode(raw, expected)
        if comp == 32773:
            return packbits_decode(raw, expected)
        raise NotImplementedError(
            f"TIFF compression {comp} requires a codec library "
            f"(none/LZW/PackBits only)")

    if tiled:
        # §15: every tile is full-size; edge tiles carry padding that
        # the final crop discards
        try:
            tw = tags[322][0]
            tl = tags[323][0]
            offsets = tags[324]
            counts = tags[325]
        except KeyError as missing:
            raise ValueError(f"tiled TIFF missing tag {missing}")
        if len(offsets) != len(counts):
            raise ValueError("TileOffsets/TileByteCounts length mismatch")
        across = -(-w // tw)
        down = -(-h // tl)
        if len(offsets) < across * down:
            raise ValueError("TIFF tile set does not cover the image")
        full = np.zeros((down * tl, across * tw, spp), dt)
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            if ti >= across * down:
                break
            expected = tl * tw * spp * bwid
            buf = segment(data[off:off + cnt], cnt, expected)
            block = np.frombuffer(buf, dtype=dt).reshape(tl, tw * spp)
            if predictor == 2:
                block = _predict2_decode(block, spp, bits)
            ty, tx = divmod(ti, across)
            full[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw] = \
                block.reshape(tl, tw, spp)
        px = full[:h, :w].reshape(h, w * spp)
    else:
        try:
            offsets = tags[273]
            counts = tags[279]
        except KeyError as missing:
            raise ValueError(f"TIFF missing required tag {missing}")
        rps = tags.get(278, [h])[0] or h
        if len(offsets) != len(counts):
            raise ValueError("StripOffsets/StripByteCounts length "
                             "mismatch")
        rows = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            nrows = min(rps, h - si * rps)
            if nrows <= 0:
                break
            expected = nrows * w * spp * bwid
            buf = segment(data[off:off + cnt], cnt, expected)
            strip = np.frombuffer(buf, dtype=dt).reshape(nrows, w * spp)
            if predictor == 2:
                strip = _predict2_decode(strip, spp, bits)
            rows.append(strip)
        px = np.concatenate(rows, axis=0)
        if px.shape[0] != h:
            raise ValueError("TIFF strips do not cover the image height")

    if photo == 3:                                   # palette → 16-bit RGB
        cmap = np.array(tags[320], np.uint16)
        n = 1 << bits
        if cmap.size < 3 * n:
            raise ValueError("TIFF ColorMap too short")
        planes = cmap[:3 * n].reshape(3, n)
        idx = px.reshape(h, w).astype(np.int64)
        if int(idx.max(initial=0)) >= n:
            raise ValueError("TIFF palette index out of range")
        return np.stack([planes[0][idx], planes[1][idx],
                         planes[2][idx]], axis=2)
    if photo == 2:
        return px.reshape(h, w, spp)[:, :, :3]
    gray = px.reshape(h, w, spp)[:, :, 0] if spp > 1 else px.reshape(h, w)
    if photo == 0:                       # min-is-white: invert at depth
        gray = ((1 << bits) - 1) - gray.astype(np.int64)
        gray = gray.astype(np.uint8 if bits == 8 else np.uint16)
    return gray
