"""Clean-room GIF codec (pure stdlib + numpy): LZW decode/encode per
the public GIF87a/GIF89a specification (CompuServe, 1987/1989).

GIF is the third of the big lossless web image containers (after PNG
and the block-exact JPEG oracle class) and — unlike PNG's zlib — its
compressor is IN SCOPE to build from scratch: GIF LZW is a ~100-line
variable-width dictionary coder, fully specified in the public spec
(Appendix F), with the GIF-specific twists implemented here for real:
LSB-first bit packing across 255-byte data sub-blocks, an initial code
width of ``min_code_size + 1``, CLEAR/END control codes, dictionary
growth capped at 4096 with CLEAR-based reset, and the "deferred clear"
decoder rule (a full table keeps decoding with 12-bit codes until the
encoder sends CLEAR).

Scope (honest, spec-cited):
  - decode: GIF87a and GIF89a; global and local color tables; the
    4-pass interlace row order (spec §23); 89a extension blocks
    (graphic control, comment, application, plain text) skipped by
    their sub-block chain per the spec's block-walk rule. Returns the
    FIRST image frame as RGB uint8 (h, w, 3) — the standard featurize
    choice for a data pipeline; ``decode_gif_frames`` returns every
    frame of an animation (frames are decoded independently; frame
    DISPOSAL/compositing is presentation semantics a pipeline
    statistic does not need and is documented out of scope).
    Transparency (GCE flag) is ignored: the palette color is returned.
  - encode: matching writer for deterministic test payloads — one or
    more 8-bit-palette frames, optional interlace, optional forced
    sub-block size and mid-stream CLEAR codes to exercise the decoder's
    corners with real streams.

GIF is LOSSLESS, so arbitrary integer-formula images round-trip
bit-for-bit and a DuckDB oracle recomputes decoded statistics exactly —
the PNG strategy, now through a from-scratch compression codec rather
than stdlib zlib.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")


# -- LZW ---------------------------------------------------------------------


class _LsbBitWriter:
    """LSB-first bit packer (GIF packs code bits little-endian within
    bytes — the opposite of JPEG)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= (code & ((1 << width) - 1)) << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


class _LsbBitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF LZW stream truncated")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def lzw_encode(indices: "list[int] | np.ndarray", min_code_size: int,
               clear_every: int = 0) -> bytes:
    """GIF LZW compressor (spec Appendix F): starts with a CLEAR code,
    grows the string table to 4095 then resets via CLEAR, widens the
    code size when the next free code would not fit. ``clear_every``
    > 0 additionally forces a CLEAR every that-many emitted codes
    (valid per spec — decoders must accept CLEAR anywhere) to exercise
    reset paths with real streams."""
    clear = 1 << min_code_size
    end = clear + 1
    bw = _LsbBitWriter()

    def reset():
        return {bytes([i]): i for i in range(clear)}, end + 1, \
            min_code_size + 1

    table, next_code, width = reset()
    bw.write(clear, width)
    emitted = 0
    w = b""
    for idx in indices:
        c = bytes([int(idx)])
        if int(idx) >= clear:
            raise ValueError(
                f"pixel index {int(idx)} exceeds palette ({clear})")
        if w + c in table:
            w += c
            continue
        bw.write(table[w], width)
        emitted += 1
        if next_code < 4096:
            table[w + c] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            bw.write(clear, width)
            table, next_code, width = reset()
        if clear_every and emitted % clear_every == 0:
            bw.write(clear, width)
            table, next_code, width = reset()
        w = c
    if w:
        bw.write(table[w], width)
    bw.write(end, width)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int,
               expected: "int | None" = None) -> np.ndarray:
    """GIF LZW decompressor: mirrors the encoder, including the
    code-not-yet-in-table case (KwKwK: output = prev + prev[0]) and the
    deferred-clear rule (a full table stays at 12-bit codes, adding
    nothing, until CLEAR arrives)."""
    clear = 1 << min_code_size
    end = clear + 1
    table: list[bytes] = []
    width = min_code_size + 1
    mask = (1 << width) - 1
    prev: "bytes | None" = None
    out = bytearray()
    # inline LSB-first bit reader (r14): local accumulator + chunked
    # int.from_bytes refills instead of a per-code method call — the
    # read() dispatch was ~40% of decode wall in the codec bench
    acc = 0
    nb = 0
    p = 0
    ln = len(data)

    def reset_table():
        t = [bytes([i]) for i in range(clear)] + [b"", b""]
        return t

    table = reset_table()
    tlen = len(table)
    want = -1 if expected is None else expected
    while True:
        if nb < width:
            t = ln - p
            if t > 6:
                t = 6
            if t <= 0:
                raise ValueError("GIF LZW stream truncated")
            acc |= int.from_bytes(data[p:p + t], "little") << nb
            p += t
            nb += t << 3
        code = acc & mask
        acc >>= width
        nb -= width
        if code == clear:
            table = reset_table()
            tlen = len(table)
            width = min_code_size + 1
            mask = (1 << width) - 1
            prev = None
            continue
        if code == end:
            break
        if code < tlen and (code < clear or table[code]):
            seq = table[code]
        elif code == tlen and prev is not None:
            seq = prev + prev[:1]
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += seq
        if prev is not None and tlen < 4096:
            table.append(prev + seq[:1])
            tlen += 1
            if tlen == (1 << width) and width < 12:
                width += 1
                mask = (1 << width) - 1
        prev = seq
        if want >= 0 and len(out) >= want:
            break
    if expected is not None and len(out) < expected:
        raise ValueError("LZW stream ended before the declared pixels")
    arr = np.frombuffer(bytes(out), dtype=np.uint8)
    return arr[:expected] if expected is not None else arr


# -- container ---------------------------------------------------------------


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))    # spec §23


def _interlace_order(h: int) -> "list[int]":
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows += list(range(start, h, step))
    return rows


def _sub_blocks(data: bytes, block_size: int = 255) -> bytes:
    out = bytearray()
    for i in range(0, len(data), block_size):
        chunk = data[i:i + block_size]
        out.append(len(chunk))
        out += chunk
    out.append(0)                                        # terminator
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-block chain truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("GIF sub-block truncated")
        out += data[pos:pos + n]
        pos += n


def encode_gif(frames: "np.ndarray | list[np.ndarray]",
               palette: "np.ndarray | None" = None,
               interlace: bool = False, block_size: int = 255,
               clear_every: int = 0) -> bytes:
    """GIF89a writer: ``frames`` is one uint8 index array (h, w) or a
    list of them (an animation); ``palette`` is (n, 3) uint8 RGB
    (defaults to the 256-gray ramp). ``interlace`` writes the 4-pass
    row order; ``block_size``/``clear_every`` shrink sub-blocks / force
    mid-stream CLEARs to exercise decoder corners."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if palette is None:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    palette = np.asarray(palette, dtype=np.uint8)
    n_colors = len(palette)
    depth = max(1, int(n_colors - 1).bit_length())
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[:n_colors] = palette
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])
    out += table.tobytes()
    for px in frames:
        fh, fw = px.shape
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, fw, fh)
        out += bytes([0x40 if interlace else 0x00])
        rows = _interlace_order(fh) if interlace else range(fh)
        indices = np.concatenate([np.asarray(px, np.uint8)[r] for r in rows])
        mcs = max(2, depth)
        out += bytes([mcs])
        out += _sub_blocks(lzw_encode(indices, mcs, clear_every),
                           block_size)
    out += b"\x3b"                                       # trailer
    return bytes(out)


def decode_gif_frames(payload: bytes) -> "list[np.ndarray]":
    """Decode every image frame of a GIF to RGB uint8 (h, w, 3) arrays
    (scope in the module docstring)."""
    data = bytes(payload)
    if data[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF payload")
    w, h = struct.unpack("<HH", data[6:10])
    packed, _bg, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                                # trailer
            break
        if block == 0x21:                                # 89a extension
            pos += 1                                     # label
            _, pos = _read_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos:pos + 8])
        fpacked = data[pos + 8]
        pos += 9
        lct = gct
        if fpacked & 0x80:                               # local color table
            n = 2 << (fpacked & 0x07)
            lct = np.frombuffer(data[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("GIF frame has no color table")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = lzw_decode(lzw, mcs, expected=fw * fh)
        if idx.max(initial=0) >= len(lct):
            raise ValueError("GIF pixel index beyond the color table")
        grid = idx.reshape(fh, fw)
        if fpacked & 0x40:                               # interlaced
            un = np.zeros_like(grid)
            un[_interlace_order(fh)] = grid
            grid = un
        frames.append(lct[grid])
    if not frames:
        raise ValueError("GIF contains no image frame")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF as RGB uint8 (h, w, 3)."""
    return decode_gif_frames(payload)[0]
