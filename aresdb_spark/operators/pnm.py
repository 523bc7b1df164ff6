"""Clean-room codecs for the classic portable/legacy raster family —
Netpbm (PNM: P1-P6), Sun rasterfile, SGI RGB and XBM — pure
stdlib/numpy.

PNM (the public Netpbm format specs: pbm(5)/pgm(5)/ppm(5)):
  * P1 (ASCII bitmap — digits MAY be packed without separators),
    P2 (ASCII graymap), P3 (ASCII pixmap), P4 (binary bitmap,
    MSB-first bits, rows padded to a byte), P5/P6 (binary gray/RGB,
    one byte per sample for maxval < 256, two big-endian bytes up to
    65535). Header tokens are whitespace-separated with '#' comments
    legal anywhere in the header; binary rasters start after exactly
    one whitespace byte following the last header token.
  * Decode returns NATIVE sample values (uint8, or uint16 when
    maxval >= 256 — the TIFF convention in this repo; decode_stats
    grades exact integers, so no rescaling to 255). Bitmaps map to
    the display convention 1=black=0, 0=white=255, uint8.
  * Shapes: (h, w) for P1/P2/P4/P5, (h, w, 3) for P3/P6.

Sun rasterfile (the public SunOS sys/rasterfile.h layout):
  * 8 big-endian int32 header: magic 0x59a66a95, width, height,
    depth (1/8/24/32), image length, type (0 old / 1 standard /
    2 byte-encoded RLE / 3 RGB), maptype (0 none / 1 equal-RGB),
    maplength. Rows pad to 16-bit boundaries. 24/32-bit pixel order
    is BGR(X) for types 0-2 and RGB(X) for type 3; 32-bit stores the
    filler byte FIRST. The RLE coding (type 2) is byte-oriented over
    the padded row stream: 0x80 n v = n+1 copies of v, 0x80 0x00 = a
    literal 0x80, anything else literal. maptype 1 stores three
    concatenated R/G/B planes of maplength/3 entries.
  * Decode returns (h, w) uint8 for unmapped 1/8-bit (bitmap 1=black
    =0 as above), (h, w, 3) uint8 for 24/32-bit (filler dropped) and
    colormapped 8-bit.

SGI RGB (the public "SGI image file format" spec, Paul Haeberli):
  * 512-byte big-endian header (magic 474, storage 0 verbatim /
    1 RLE, bpc 1/2, xsize/ysize/zsize, colormap 0 only). Channel
    planes are stored separately, rows BOTTOM-UP. RLE scanlines are
    located by a start-offset table (ysize*zsize uint32s after the
    header); each packet's count byte (uint16 for bpc 2) is
    ``0x80 | n`` = copy the next n pixels, ``n`` = repeat the next
    pixel n times, 0 = end of scanline.
  * Decode returns (h, w) for zsize 1, (h, w, z) otherwise; uint8
    for bpc 1, native uint16 for bpc 2.

XBM (the public X11 bitmap C-source text format):
  * ``#define <name>_width/_height`` then a ``char <name>_bits[]``
    hex-byte array; bits are LSB-first within each byte, rows padded
    to a byte, 1 = foreground. Decoded with the same display
    convention as PBM: 1 = black = 0, 0 = white = 255, uint8 (h, w).

All four decoders are validated against REAL external files this repo
did not encode — CPython's shipped python.ppm/pgm/pbm/ras/sgi/xbm
test fixtures (tests/test_real_fixtures.py). The reference engine at
/root/reference is a Go/C++ OLAP stack with no image code; scope here
follows the public format specs only.
"""

from __future__ import annotations

import struct

import numpy as np

RAS_MAGIC = 0x59A66A95

_WS = b" \t\r\n\x0b\x0c"


def _pnm_tokens(data: bytes, count: int) -> "tuple[list[int], int]":
    """Read ``count`` whitespace-separated ASCII integer tokens
    starting after the magic, skipping '#' comments; returns the
    values and the offset ONE PAST the single whitespace byte that
    terminates the last token (where a binary raster begins)."""
    vals, pos, n = [], 2, len(data)
    while len(vals) < count:
        while pos < n and (data[pos] in _WS or data[pos] == 0x23):
            if data[pos] == 0x23:                   # '#' comment
                while pos < n and data[pos] not in b"\r\n":
                    pos += 1
            else:
                pos += 1
        start = pos
        while pos < n and data[pos] not in _WS and data[pos] != 0x23:
            pos += 1
        if pos == start:
            raise ValueError("PNM header truncated")
        try:
            vals.append(int(data[start:pos]))
        except ValueError:
            raise ValueError("PNM header malformed") from None
        if len(vals) == count:
            if pos < n and data[pos] in _WS:
                pos += 1                            # exactly one WS byte
            return vals, pos
    return vals, pos


def decode_pnm(payload: bytes) -> np.ndarray:
    """Decode a PNM (P1-P6) payload. See module scope."""
    data = bytes(payload)
    if len(data) < 2 or data[0:1] != b"P" or data[1] not in b"123456":
        raise ValueError("not a PNM payload")
    kind = data[1] - 0x30
    bitmap = kind in (1, 4)
    nch = 3 if kind in (3, 6) else 1
    if bitmap:
        (w, h), pos = _pnm_tokens(data, 2)
        maxval = 1
    else:
        (w, h, maxval), pos = _pnm_tokens(data, 3)
        if not 0 < maxval < 65536:
            raise ValueError(f"PNM maxval {maxval} out of range")
    if w <= 0 or h <= 0:
        raise ValueError("PNM has non-positive dimensions")
    need = w * h * nch

    if kind == 1:                                   # ASCII bitmap: the
        vals = []                                   # digits may be packed
        while pos < len(data) and len(vals) < need:
            c = data[pos]
            pos += 1
            if c in _WS:
                continue
            if c == 0x23:
                while pos < len(data) and data[pos] not in b"\r\n":
                    pos += 1
                continue
            if c not in b"01":
                raise ValueError("P1 bitmap contains a non-0/1 digit")
            vals.append(c - 0x30)
        if len(vals) < need:
            raise ValueError("PNM raster truncated")
        bits = np.array(vals, np.uint8).reshape(h, w)
        return ((1 - bits) * 255).astype(np.uint8)
    if kind in (2, 3):                              # ASCII samples: strip
        import re                                   # '#'-to-EOL comments
        toks = re.sub(rb"#[^\r\n]*", b"", data[pos:]).split()
        try:
            vals = [int(t) for t in toks[:need]]
        except ValueError:
            raise ValueError("PNM raster malformed") from None
        if len(vals) < need:
            raise ValueError("PNM raster truncated")
        arr = np.array(vals, np.int64)
        if arr.min() < 0 or arr.max() > maxval:
            raise ValueError("PNM sample exceeds maxval")
        out = arr.astype(np.uint16 if maxval > 255 else np.uint8)
        return out.reshape((h, w) if nch == 1 else (h, w, 3))
    if kind == 4:                                   # packed bitmap
        stride = (w + 7) // 8
        raw = np.frombuffer(data[pos:pos + stride * h], np.uint8)
        if raw.size < stride * h:
            raise ValueError("PNM raster truncated")
        bits = np.unpackbits(raw.reshape(h, stride), axis=1)[:, :w]
        return ((1 - bits) * 255).astype(np.uint8)
    # P5 / P6 binary
    two = maxval > 255
    nbytes = need * (2 if two else 1)
    raw = data[pos:pos + nbytes]
    if len(raw) < nbytes:
        raise ValueError("PNM raster truncated")
    arr = np.frombuffer(raw, ">u2" if two else np.uint8).astype(
        np.uint16 if two else np.uint8)
    if int(arr.max(initial=0)) > maxval:
        raise ValueError("PNM sample exceeds maxval")
    return arr.reshape((h, w) if nch == 1 else (h, w, 3))


def encode_pnm(pixels: np.ndarray, kind: int,
               maxval: "int | None" = None) -> bytes:
    """PNM writer mirroring the decode scope (deterministic corpus
    generation): ``kind`` is 1-6; bitmaps (1/4) take (h, w) arrays of
    0/255 (255=white→'0'); maxval defaults to 255 (65535 for uint16
    input)."""
    px = np.asarray(pixels)
    if kind in (1, 4):
        if px.ndim != 2:
            raise ValueError("bitmap PNM needs (h, w)")
        bits = (px == 0).astype(np.uint8)           # black=1
        h, w = px.shape
        hdr = b"P%d\n%d %d\n" % (kind, w, h)
        if kind == 1:
            body = b"\n".join(
                bytes(row + 0x30) for row in bits)  # packed digits
            return hdr + body + b"\n"
        packed = np.packbits(bits, axis=1)
        return hdr + packed.tobytes()
    if maxval is None:
        maxval = 65535 if px.dtype == np.uint16 else 255
    nch = 3 if kind in (3, 6) else 1
    if (nch == 3) != (px.ndim == 3):
        raise ValueError(f"P{kind} needs {'(h, w, 3)' if nch == 3 else '(h, w)'}")
    h, w = px.shape[:2]
    hdr = b"P%d\n%d %d\n%d\n" % (kind, w, h, maxval)
    flat = px.reshape(-1).astype(np.int64)
    if flat.min(initial=0) < 0 or flat.max(initial=0) > maxval:
        raise ValueError("sample exceeds maxval")
    if kind in (2, 3):
        return hdr + b"\n".join(
            b" ".join(b"%d" % v for v in flat[i:i + 12])
            for i in range(0, len(flat), 12)) + b"\n"
    dt = ">u2" if maxval > 255 else "u1"
    return hdr + flat.astype(dt).tobytes()


# -- Sun rasterfile ----------------------------------------------------------

def _ras_unrle(buf: bytes, need: int) -> bytes:
    """Type-2 byte-encoded stream → raw padded rows."""
    out = bytearray()
    pos, n = 0, len(buf)
    while pos < n and len(out) < need:
        b = buf[pos]
        pos += 1
        if b != 0x80:
            out.append(b)
            continue
        if pos >= n:
            raise ValueError("RAS RLE escape truncated")
        cnt = buf[pos]
        pos += 1
        if cnt == 0:
            out.append(0x80)
            continue
        if pos >= n:
            raise ValueError("RAS RLE run truncated")
        out.extend(buf[pos:pos + 1] * (cnt + 1))
        pos += 1
    if len(out) < need:
        raise ValueError("RAS raster truncated")
    return bytes(out[:need])


def decode_ras(payload: bytes) -> np.ndarray:
    """Decode a Sun rasterfile. See module scope."""
    data = bytes(payload)
    if len(data) < 32:
        raise ValueError("not a RAS payload")
    magic, w, h, depth, _length, rtype, maptype, maplen = struct.unpack(
        ">8i", data[:32])
    if magic != RAS_MAGIC:
        raise ValueError("not a RAS payload")
    if w <= 0 or h <= 0:
        raise ValueError("RAS has non-positive dimensions")
    if depth not in (1, 8, 24, 32):
        raise NotImplementedError(
            f"{depth}-bit RAS is not implemented (1/8/24/32 only)")
    if rtype not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"RAS type {rtype} is not implemented (old/standard/"
            f"byte-encoded/RGB only)")
    if maptype not in (0, 1):
        raise NotImplementedError(f"RAS maptype {maptype} is not implemented")
    cmap = None
    if maptype == 1:
        if maplen % 3 or 32 + maplen > len(data):
            raise ValueError("RAS colormap malformed")
        n_pal = maplen // 3
        planes = np.frombuffer(data[32:32 + maplen], np.uint8)
        cmap = planes.reshape(3, n_pal).T            # R-plane|G|B → (n, 3)
    body = data[32 + maplen:]
    stride = ((w * depth + 15) // 16) * 2            # 16-bit row padding
    need = stride * h
    raw = _ras_unrle(body, need) if rtype == 2 else body[:need]
    if len(raw) < need:
        raise ValueError("RAS raster truncated")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride)
    if depth == 1:
        bits = np.unpackbits(rows, axis=1)[:, :w]
        if cmap is not None:
            if len(cmap) < 2:
                raise ValueError("RAS colormap index out of range")
            return cmap[bits]
        return ((1 - bits) * 255).astype(np.uint8)   # 1=black
    if depth == 8:
        idx = rows[:, :w]
        if cmap is not None:
            if int(idx.max(initial=0)) >= len(cmap):
                raise ValueError("RAS colormap index out of range")
            return cmap[idx]
        return idx.copy()
    nb = depth // 8
    px = rows[:, :w * nb].reshape(h, w, nb)
    if depth == 32:
        px = px[:, :, 1:]                            # filler byte FIRST
    # types 0-2 store BGR; type 3 (RT_FORMAT_RGB) stores RGB
    return px[:, :, ::-1].copy() if rtype != 3 else px.copy()


def encode_ras(pixels: np.ndarray, depth: int = 24, rtype: int = 1,
               palette: "np.ndarray | None" = None) -> bytes:
    """Sun raster writer mirroring the decode scope: (h, w, 3) RGB for
    24/32-bit, (h, w) gray or palette indices for 8-bit, (h, w) 0/255
    for 1-bit. ``rtype`` 1 = standard (BGR), 2 = byte-encoded RLE of
    the standard layout, 3 = RGB order."""
    px = np.asarray(pixels, np.uint8)
    if depth in (24, 32):
        if px.ndim != 3 or px.shape[2] != 3:
            raise ValueError("24/32-bit RAS needs (h, w, 3) RGB")
        h, w = px.shape[:2]
        chans = px if rtype == 3 else px[:, :, ::-1]
        if depth == 32:
            rows_px = np.zeros((h, w, 4), np.uint8)
            rows_px[:, :, 1:] = chans
        else:
            rows_px = chans
        flat = rows_px.reshape(h, -1)
    elif depth == 8:
        if px.ndim != 2:
            raise ValueError("8-bit RAS needs (h, w)")
        h, w = px.shape
        flat = px
    elif depth == 1:
        if px.ndim != 2:
            raise ValueError("1-bit RAS needs (h, w)")
        h, w = px.shape
        flat = np.packbits((px == 0).astype(np.uint8), axis=1)
    else:
        raise NotImplementedError(f"{depth}-bit RAS encode")
    stride = ((w * depth + 15) // 16) * 2
    body = b"".join(bytes(row).ljust(stride, b"\0") for row in flat)
    if rtype == 2:
        out = bytearray()
        i, n = 0, len(body)
        while i < n:
            j = i
            while j < n and j - i < 256 and body[j] == body[i]:
                j += 1
            run = j - i
            if body[i] == 0x80 and run == 1:
                out.extend((0x80, 0x00))             # lone literal 0x80
            elif run >= 3 or body[i] == 0x80:
                out.extend((0x80, run - 1, body[i]))
            else:
                out.extend(body[i:j])
            i = j
        body = bytes(out)
    maptype, maplen, pal_bytes = 0, 0, b""
    if palette is not None:
        pal = np.asarray(palette, np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3:
            raise ValueError("palette must be (n, 3) RGB")
        maptype, maplen = 1, pal.shape[0] * 3
        pal_bytes = pal.T.tobytes()                  # three planes
    hdr = struct.pack(">8i", RAS_MAGIC, w, h, depth, len(body),
                      rtype, maptype, maplen)
    return hdr + pal_bytes + body


# -- SGI RGB -----------------------------------------------------------------

SGI_MAGIC = 474


def _sgi_scanline(data: bytes, pos: int, w: int, bpc: int) -> np.ndarray:
    """One RLE scanline → w pixels (uint8/uint16 native)."""
    out = np.zeros(w, np.uint16 if bpc == 2 else np.uint8)
    x = 0
    while True:
        if bpc == 1:
            if pos >= len(data):
                raise ValueError("SGI RLE scanline truncated")
            c = data[pos]
            pos += 1
        else:
            if pos + 2 > len(data):
                raise ValueError("SGI RLE scanline truncated")
            c = int.from_bytes(data[pos:pos + 2], "big")
            pos += 2
        n = c & 0x7F
        if n == 0:
            return out
        if x + n > w:
            raise ValueError("SGI RLE scanline overruns the row")
        if c & 0x80:                                 # copy n pixels
            nb = n * bpc
            if pos + nb > len(data):
                raise ValueError("SGI RLE scanline truncated")
            out[x:x + n] = np.frombuffer(
                data[pos:pos + nb], ">u2" if bpc == 2 else np.uint8)
            pos += nb
        else:                                        # repeat one pixel
            if pos + bpc > len(data):
                raise ValueError("SGI RLE scanline truncated")
            v = (int.from_bytes(data[pos:pos + 2], "big")
                 if bpc == 2 else data[pos])
            pos += bpc
            out[x:x + n] = v
        x += n


def decode_sgi(payload: bytes) -> np.ndarray:
    """Decode an SGI RGB image. See module scope."""
    data = bytes(payload)
    if len(data) < 512:
        raise ValueError("not an SGI payload")
    magic, storage, bpc, _dim, xs, ys, zs = struct.unpack(
        ">hBBHHHH", data[:12])
    (cmap,) = struct.unpack(">I", data[104:108])
    if magic != SGI_MAGIC:
        raise ValueError("not an SGI payload")
    if bpc not in (1, 2):
        raise ValueError(f"SGI bpc {bpc} illegal (1/2 only)")
    if storage not in (0, 1):
        raise ValueError(f"SGI storage {storage} illegal (0/1 only)")
    if cmap != 0:
        raise NotImplementedError(
            f"SGI colormap {cmap} is not implemented (normal only)")
    if xs < 1 or ys < 1 or zs < 1:
        raise ValueError("SGI has non-positive dimensions")
    dt = ">u2" if bpc == 2 else np.uint8
    planes = np.zeros((zs, ys, xs), np.uint16 if bpc == 2 else np.uint8)
    if storage == 0:                                 # verbatim
        need = xs * ys * zs * bpc
        raw = data[512:512 + need]
        if len(raw) < need:
            raise ValueError("SGI raster truncated")
        arr = np.frombuffer(raw, dt).reshape(zs, ys, xs)
        planes[:] = arr[:, ::-1, :]                  # bottom-up rows
    else:                                            # RLE
        ntab = ys * zs
        tab = np.frombuffer(data[512:512 + 4 * ntab], ">u4")
        if tab.size < ntab:
            raise ValueError("SGI RLE offset table truncated")
        for z in range(zs):
            for y in range(ys):
                start = int(tab[z * ys + y])
                planes[z, ys - 1 - y] = _sgi_scanline(data, start,
                                                      xs, bpc)
    out = planes[0] if zs == 1 else np.moveaxis(planes, 0, 2)
    return out.copy()


def encode_sgi(pixels: np.ndarray, storage: int = 1) -> bytes:
    """SGI writer mirroring the decode scope: (h, w) or (h, w, z)
    uint8/uint16 input; ``storage`` 0 verbatim / 1 RLE."""
    px = np.asarray(pixels)
    bpc = 2 if px.dtype == np.uint16 else 1
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, z = px.shape
    hdr = struct.pack(">hBBHHHH", SGI_MAGIC, storage, bpc, 3, w, h, z)
    hdr += struct.pack(">II", int(px.min(initial=0)),
                       int(px.max(initial=0)))
    hdr += b"\0" * 4 + b"aresdb_spark".ljust(80, b"\0")
    hdr += struct.pack(">I", 0)
    hdr = hdr.ljust(512, b"\0")
    dt = ">u2" if bpc == 2 else "u1"
    if storage == 0:
        body = np.moveaxis(px[::-1], 2, 0).astype(dt).tobytes()
        return hdr + body
    lines, offs, lens = [], [], []
    pos = 512 + 8 * h * z                            # start + length tabs
    for zc in range(z):
        for y in range(h):
            row = px[h - 1 - y, :, zc]
            enc = bytearray()
            x = 0
            while x < w:
                j = x
                while j < w and j - x < 127 and row[j] == row[x]:
                    j += 1
                run = j - x
                if run >= 3:
                    enc += (run.to_bytes(bpc, "big")
                            + int(row[x]).to_bytes(bpc, "big"))
                    x = j
                else:
                    j = x + 1                        # literal stretch
                    while j < w and j - x < 127 and (
                            j + 2 > w or row[j] != row[j + 1]
                            or (j + 2 < w and row[j + 1] != row[j + 2])):
                        j += 1
                    n = j - x
                    enc += (0x80 | n).to_bytes(bpc, "big")
                    enc += row[x:j].astype(dt).tobytes()
                    x = j
            enc += (0).to_bytes(bpc, "big")
            lines.append(bytes(enc))
            offs.append(pos)
            lens.append(len(enc))
            pos += len(enc)
    tab = np.array(offs, ">u4").tobytes() + np.array(lens, ">u4").tobytes()
    return hdr + tab + b"".join(lines)


# -- XBM ---------------------------------------------------------------------

def decode_xbm(payload: bytes) -> np.ndarray:
    """Decode an X11 XBM (C-source text). See module scope."""
    import re

    try:
        text = bytes(payload).decode("ascii")
    except UnicodeDecodeError:
        raise ValueError("not an XBM payload") from None
    mw = re.search(r"#define\s+\w*_?width\s+(\d+)", text)
    mh = re.search(r"#define\s+\w*_?height\s+(\d+)", text)
    if not mw or not mh or "_bits[]" not in text:
        raise ValueError("not an XBM payload")
    w, h = int(mw.group(1)), int(mh.group(1))
    if w < 1 or h < 1:
        raise ValueError("XBM has non-positive dimensions")
    vals = [int(t, 16) for t in re.findall(r"0[xX][0-9a-fA-F]+", text)]
    stride = (w + 7) // 8
    if len(vals) < stride * h:
        raise ValueError("XBM bit array truncated")
    raw = np.array(vals[:stride * h], np.uint8).reshape(h, stride)
    bits = np.unpackbits(raw, axis=1, bitorder="little")[:, :w]
    return ((1 - bits) * 255).astype(np.uint8)       # 1 = foreground


def encode_xbm(pixels: np.ndarray, name: str = "img") -> bytes:
    """XBM writer mirroring the decode scope: (h, w) 0/255 input
    (0 = black = bit 1)."""
    px = np.asarray(pixels, np.uint8)
    if px.ndim != 2:
        raise ValueError("XBM needs (h, w)")
    h, w = px.shape
    bits = (px == 0).astype(np.uint8)
    raw = np.packbits(bits, axis=1, bitorder="little").ravel()
    body = ", ".join(f"0x{b:02X}" for b in raw)
    return (f"#define {name}_width {w}\n#define {name}_height {h}\n"
            f"static char {name}_bits[] = {{\n  {body}}};\n"
            ).encode("ascii")
