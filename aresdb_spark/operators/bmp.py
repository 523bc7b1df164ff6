"""Clean-room BMP (Windows DIB) codec — pure stdlib/numpy.

Scope (the public Microsoft BITMAPINFOHEADER layout): 1/4/8-bit
palettized, 16-bit (BI_RGB implied 5-5-5 and BI_BITFIELDS masked),
24-bit BGR and 32-bit BGRX/masked pixels, uncompressed (BI_RGB) plus
the BI_RLE8/BI_RLE4 run-length codings (runs, absolute mode,
end-of-line/bitmap and delta escapes) and BI_BITFIELDS (r14: masks
read from the V2+ header fields or, for a bare 40-byte header, the
12 bytes that follow it; each mask must be a contiguous,
non-overlapping bit run and channels scale to 8 bits by rounded
max-ratio), bottom-up and top-down row orders, 4-byte row padding,
and V4/V5 headers read as supersets of the 40-byte core. Everything
else (BI_ALPHABITFIELDS, BI_JPEG/BI_PNG embeddings, OS/2 core
headers) raises NotImplementedError naming the field. Decode returns
RGB uint8 (h, w, 3): palette entries are BGRA quads with the reserved
byte dropped; 32-bit BI_RGB pixels drop the undefined fourth byte.
EXCEPTION: a BI_BITFIELDS image with a nonzero alpha mask returns
RGBA (h, w, 4) — there the fourth channel is spec-defined, and the
shape mirrors what decode_png returns for RGBA sources (validated
bit-for-bit against CPython's shipped real python.bmp/python.png
fixture pair in tests/test_real_fixtures.py).

The encoder mirrors the decode scope for deterministic test/oracle
payload generation (reference behavior cross-checked against the spec
prose only — the reference engine at /root/reference is a Go/C++ OLAP
stack with no image code at all).
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"


def _stride(width: int, bit_count: int) -> int:
    return ((width * bit_count + 31) // 32) * 4


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a BMP payload to RGB uint8 (h, w, 3). See module scope."""
    data = bytes(payload)
    if len(data) < 54 or data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError(
            f"BMP header size {hdr_size} (OS/2 core) is not implemented "
            f"(BITMAPINFOHEADER/V4/V5 only)")
    w, h_raw = struct.unpack("<ii", data[18:26])
    _planes, bits = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    (clr_used,) = struct.unpack("<I", data[46:50])
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError("BMP has non-positive dimensions")
    if bits not in (1, 4, 8, 16, 24, 32):
        raise NotImplementedError(
            f"{bits}-bit BMP is not implemented (1/4/8/16/24/32 only)")
    if comp not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"BMP compression {comp} is not implemented "
            f"(BI_RGB/BI_RLE8/BI_RLE4/BI_BITFIELDS only)")
    if comp == 1 and bits != 8 or comp == 2 and bits != 4:
        raise ValueError(f"BMP compression {comp} illegal at {bits} bits")
    if comp == 3 and bits not in (16, 32):
        raise ValueError("BI_BITFIELDS is only legal at 16/32 bits")
    if bits == 16 and comp == 0:
        comp, masks = 3, (0x7C00, 0x03E0, 0x001F, 0)   # implied X1R5G5B5
    elif comp == 3:
        # V2+ headers carry the masks at byte 54; a bare 40-byte header
        # puts them in the 12 bytes that FOLLOW it — the same offset.
        # The alpha mask exists only from V3 (hdr_size >= 56) on.
        if len(data) < 66:
            raise ValueError("BMP BI_BITFIELDS masks truncated")
        masks = struct.unpack("<3I", data[54:66]) + (
            struct.unpack("<I", data[66:70])[0] if hdr_size >= 56 else 0,)
    if comp in (1, 2) and top_down:
        raise ValueError("RLE BMPs must be bottom-up (spec)")

    pal = None
    if bits <= 8:
        n_pal = clr_used or (1 << bits)
        pal_off = 14 + hdr_size
        quads = np.frombuffer(
            data[pal_off:pal_off + 4 * n_pal], np.uint8)
        if quads.size < 4 * n_pal:
            raise ValueError("BMP palette truncated")
        pal = quads.reshape(-1, 4)[:, [2, 1, 0]]   # BGRA → RGB

    if comp in (1, 2):                              # RLE8 / RLE4
        # _decode_rle writes rows at their final display positions
        # (bottom-up input → out[h-1-y]), so no flip afterwards
        idx = _decode_rle(data[pix_off:], w, h, nibble=(comp == 2))
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("BMP palette index out of range")
        return pal[idx]
    else:
        stride = _stride(w, bits)
        need = stride * h
        rows = np.frombuffer(data[pix_off:pix_off + need], np.uint8)
        if rows.size < need:
            raise ValueError("BMP pixel data truncated")
        rows = rows.reshape(h, stride)
        if comp == 3:                               # BI_BITFIELDS (r14)
            px = _decode_bitfields(rows, w, bits, masks)
            return (px if top_down else px[::-1]).copy()
        if bits == 24:
            px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
        elif bits == 32:
            px = rows[:, :w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]
        elif bits == 8:
            idx = rows[:, :w]
            px = None
        else:                                       # 1/4: MSB-first
            per = 8 // bits
            mask = (1 << bits) - 1
            cols = [((rows >> (8 - bits * (k + 1))) & mask)
                    for k in range(per)]
            idx = np.stack(cols, axis=2).reshape(h, -1)[:, :w]
            px = None
        if bits > 8:
            return (px if top_down else px[::-1]).copy()
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("BMP palette index out of range")
    out = pal[idx]
    return out if top_down else out[::-1]


def _decode_bitfields(rows: np.ndarray, w: int, bits: int,
                      masks: "tuple[int, int, int, int]") -> np.ndarray:
    """BI_BITFIELDS channel extraction: ``rows`` is the padded
    (h, stride) byte matrix, ``masks`` = (R, G, B, A) little-endian
    bit masks over the 16/32-bit pixel word. Each mask must be one
    contiguous bit run inside the word and the color masks must not
    overlap; a channel of width k scales to 8 bits by rounded
    ``v * 255 / (2^k - 1)`` (identity for k = 8). Alpha mask 0 →
    RGB output; nonzero → RGBA."""
    h = rows.shape[0]
    word = np.uint16 if bits == 16 else np.uint32
    nbytes = bits // 8
    words = rows[:, :w * nbytes].reshape(h, w, nbytes)[:, :, ::-1]
    vals = np.zeros((h, w), np.uint32)
    for k in range(nbytes):                         # little-endian word
        vals = (vals << 8) | words[:, :, k].astype(np.uint32)
    limit = (1 << bits) - 1
    seen = 0
    for i, m in enumerate(masks[:3]):
        if m == 0 or m > limit:
            raise ValueError(f"BMP BI_BITFIELDS color mask {i} invalid "
                             f"for {bits}-bit pixels: {m:#x}")
        if seen & m:
            raise ValueError("BMP BI_BITFIELDS color masks overlap")
        seen |= m
    amask = masks[3]
    if amask > limit:
        raise ValueError(f"BMP BI_BITFIELDS alpha mask invalid: {amask:#x}")
    nch = 4 if amask else 3
    out = np.zeros((h, w, nch), np.uint8)
    for i, m in enumerate(masks[:nch]):
        shift = (m & -m).bit_length() - 1           # trailing zeros
        width = m.bit_length() - shift
        if m >> shift != (1 << width) - 1:
            raise ValueError(
                f"BMP BI_BITFIELDS mask {m:#x} is not contiguous")
        ch = (vals & np.uint32(m)) >> np.uint32(shift)
        if width == 8:
            out[:, :, i] = ch.astype(np.uint8)
        else:
            maxv = (1 << width) - 1
            out[:, :, i] = np.rint(
                ch.astype(np.float64) * (255.0 / maxv)).astype(np.uint8)
    return out


def _decode_rle(buf: bytes, w: int, h: int, nibble: bool) -> np.ndarray:
    """BI_RLE8/BI_RLE4 state machine (bottom-up row order, spec
    escapes: 0=EOL, 1=EOF, 2=delta(dx, dy) — skipped pixels stay 0)."""
    out = np.zeros((h, w), np.uint8)
    x, y, pos = 0, 0, 0                             # y counts from bottom
    while pos + 2 <= len(buf):
        cnt, val = buf[pos], buf[pos + 1]
        pos += 2
        if cnt:                                     # encoded run
            if nibble:
                vals = [(val >> 4) & 0xF, val & 0xF] * ((cnt + 1) // 2)
            else:
                vals = [val] * cnt
            end = min(x + cnt, w)
            out[h - 1 - y, x:end] = vals[:end - x]
            x = end
            continue
        if val == 0:                                # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif val == 1:                              # end of bitmap
            break
        elif val == 2:                              # delta
            if pos + 2 > len(buf):
                raise ValueError("BMP RLE delta truncated")
            x, y = x + buf[pos], y + buf[pos + 1]
            pos += 2
        else:                                       # absolute mode
            n = val
            nbytes = (n + 1) // 2 if nibble else n
            nbytes += nbytes & 1                    # word-aligned
            chunk = buf[pos:pos + nbytes]
            if len(chunk) < nbytes:
                raise ValueError("BMP RLE absolute run truncated")
            pos += nbytes
            if nibble:
                vals = []
                for b in chunk:
                    vals.extend(((b >> 4) & 0xF, b & 0xF))
                vals = vals[:n]
            else:
                vals = list(chunk[:n])
            end = min(x + n, w)
            out[h - 1 - y, x:end] = vals[:end - x]
            x = end
    return out


def encode_bmp(pixels: np.ndarray, bit_count: int = 24,
               palette: "np.ndarray | None" = None,
               top_down: bool = False, rle: bool = False,
               abs_every: int = 0) -> bytes:
    """BMP writer mirroring the decode scope: ``pixels`` is RGB
    ``(h, w, 3)`` for 24/32-bit, or ``(h, w)`` palette indices with
    ``palette`` = ``(n, 3)`` RGB for 1/4/8-bit. ``rle=True`` writes
    BI_RLE8/BI_RLE4 (bottom-up only); ``abs_every=k`` forces every k-th
    row into ABSOLUTE mode so decoders exercise both RLE branches."""
    if bit_count in (24, 32):
        px = np.asarray(pixels, np.uint8)
        if px.ndim != 3 or px.shape[2] != 3:
            raise ValueError(f"{bit_count}-bit BMP needs (h, w, 3) RGB")
        if rle:
            raise ValueError("RLE is only legal at 4/8 bits")
        h, w = px.shape[:2]
        pal_bytes = b""
    else:
        if bit_count not in (1, 4, 8):
            raise NotImplementedError(f"{bit_count}-bit BMP encode")
        px = np.asarray(pixels, np.uint8)
        if px.ndim != 2:
            raise ValueError("palette BMP needs (h, w) indices")
        pal = np.asarray(palette, np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > (1 << bit_count):
            raise ValueError(f"palette must be (n<=2^{bit_count}, 3)")
        if int(px.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        h, w = px.shape
        quads = np.zeros((len(pal), 4), np.uint8)
        quads[:, [2, 1, 0]] = pal                   # RGB → BGRA quads
        pal_bytes = quads.tobytes()
        if rle and bit_count == 1:
            raise ValueError("RLE is only legal at 4/8 bits")
    if rle and top_down:
        raise ValueError("RLE BMPs must be bottom-up (spec)")

    comp = 0
    if rle:
        comp = 1 if bit_count == 8 else 2
        body = _encode_rle(px, bit_count == 4, abs_every)
    else:
        stride = _stride(w, bit_count)
        rows = []
        order = range(h) if top_down else range(h - 1, -1, -1)
        for y in order:
            if bit_count == 24:
                line = px[y, :, ::-1].tobytes()
            elif bit_count == 32:
                bgrx = np.zeros((w, 4), np.uint8)
                bgrx[:, [2, 1, 0]] = px[y]
                line = bgrx.tobytes()
            elif bit_count == 8:
                line = px[y].tobytes()
            else:
                per = 8 // bit_count
                v = px[y].astype(np.uint16)
                pad = (-w) % per
                if pad:
                    v = np.concatenate([v, np.zeros(pad, np.uint16)])
                v = v.reshape(-1, per)
                b = np.zeros(len(v), np.uint16)
                for k in range(per):
                    b |= v[:, k] << (8 - bit_count * (k + 1))
                line = b.astype(np.uint8).tobytes()
            rows.append(line.ljust(stride, b"\0"))
        body = b"".join(rows)

    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                       1, bit_count, comp, len(body), 2835, 2835,
                       len(pal_bytes) // 4, 0)
    pix_off = 14 + 40 + len(pal_bytes)
    header = BMP_MAGIC + struct.pack("<IHHI", pix_off + len(body),
                                     0, 0, pix_off)
    return header + info + pal_bytes + body


def _encode_rle(px: np.ndarray, nibble: bool, abs_every: int) -> bytes:
    """Row-wise RLE encoder: value runs (RLE4 packs the run value as
    its two alternating nibbles), optional forced absolute-mode rows,
    EOL after every row, EOF at the end."""
    h, w = px.shape
    out = bytearray()
    for i, y in enumerate(range(h - 1, -1, -1)):    # bottom-up
        row = px[y]
        if abs_every and i % abs_every == 0 and w >= 3:
            # absolute mode needs runs of >= 3 pixels per the spec
            x = 0
            while x < w:
                n = min(255, w - x)
                if n < 3:                           # tail: encoded runs
                    for v in row[x:]:
                        out += bytes([1, (int(v) << 4) | int(v)
                                      if nibble else int(v)])
                    break
                out += bytes([0, n])
                seg = row[x:x + n]
                if nibble:
                    vals = seg.tolist() + [0] * (n & 1)
                    packed = bytes((int(vals[j]) << 4) | int(vals[j + 1])
                                   for j in range(0, len(vals), 2))
                else:
                    packed = seg.tobytes()
                out += packed.ljust((len(packed) + 1) & ~1, b"\0")
                x += n
        else:
            x = 0
            while x < w:
                v = int(row[x])
                n = 1
                while x + n < w and int(row[x + n]) == v and n < 255:
                    n += 1
                out += bytes([n, (v << 4) | v if nibble else v])
                x += n
        out += b"\x00\x00"                          # end of line
    out += b"\x00\x01"                              # end of bitmap
    return bytes(out)


ICO_MAGIC = b"\x00\x00\x01\x00"
CUR_MAGIC = b"\x00\x00\x02\x00"


def decode_ico(payload: bytes, entry: "int | None" = None) -> np.ndarray:
    """Decode an ICO/CUR container (the classic favicon format —
    public ICONDIR layout): picks the LARGEST image by pixel count
    unless ``entry`` names one. Each entry is either an embedded PNG
    (dispatched to the stdlib PNG decoder) or a headerless DIB whose
    height field covers the XOR image plus a 1-bit AND mask; the DIB
    reuses this module's BMP decode by synthesizing a file header, and
    transparency comes from the 32-bit alpha channel when present
    (non-zero somewhere) else from the AND mask. Returns RGBA
    ``(h, w, 4)`` uint8 (RGB when fully opaque)."""
    data = bytes(payload)
    if len(data) < 6 or data[:4] not in (ICO_MAGIC, CUR_MAGIC):
        raise ValueError("not an ICO/CUR payload")
    (count,) = struct.unpack("<H", data[4:6])
    if count == 0:
        raise ValueError("ICO with no images")
    entries = []
    for i in range(count):
        o = 6 + 16 * i
        if o + 16 > len(data):
            raise ValueError("truncated ICONDIR")
        ew, eh = data[o], data[o + 1]
        ew, eh = ew or 256, eh or 256
        size, off = struct.unpack("<II", data[o + 8:o + 16])
        entries.append((ew * eh, ew, eh, size, off))
    if entry is None:
        entry = max(range(count), key=lambda i: entries[i][0])
    if not 0 <= entry < count:
        raise ValueError(f"ICO entry {entry} out of range (0..{count - 1})")
    _, ew, eh, size, off = entries[entry]
    img = data[off:off + size]
    if len(img) < size:
        raise ValueError("ICO image data truncated")
    if img[:8] == b"\x89PNG\r\n\x1a\n":
        from aresdb_spark.operators.multimodal import decode_png
        return decode_png(img)
    if len(img) < 40:
        raise ValueError("ICO DIB header truncated")
    (hdr_size,) = struct.unpack("<I", img[:4])
    if hdr_size < 40:
        raise NotImplementedError(
            f"ICO DIB header size {hdr_size} is not implemented")
    w, h2 = struct.unpack("<ii", img[4:12])
    _planes, bits = struct.unpack("<HH", img[12:16])
    (comp,) = struct.unpack("<I", img[16:20])
    (clr_used,) = struct.unpack("<I", img[32:36])
    if comp:
        raise NotImplementedError("compressed ICO DIBs are not implemented")
    h = h2 // 2 if h2 == 2 * eh else h2              # mask-doubled height
    pal_size = 4 * (clr_used or ((1 << bits) if bits <= 8 else 0))
    # synthesize a BMP: file header + the info header patched to the
    # XOR-image height, then the palette + XOR pixel data
    info = bytearray(img[:hdr_size])
    info[8:12] = struct.pack("<i", h)
    xor_bytes = _stride(w, bits) * h
    pix_off = 14 + hdr_size + pal_size
    body = img[hdr_size:hdr_size + pal_size + xor_bytes]
    fake = BMP_MAGIC + struct.pack("<IHHI", pix_off + xor_bytes, 0, 0,
                                   pix_off) + bytes(info) + body
    rgb = decode_bmp(fake)

    alpha = None
    if bits == 32:
        # the 4th XOR byte is the alpha channel when any pixel sets it
        raw = np.frombuffer(
            img[hdr_size + pal_size:hdr_size + pal_size + xor_bytes],
            np.uint8).reshape(h, _stride(w, 32))[:, :w * 4]
        a = raw.reshape(h, w, 4)[:, :, 3][::-1]      # bottom-up
        if a.any():
            alpha = a
    if alpha is None:
        and_off = hdr_size + pal_size + xor_bytes
        and_stride = _stride(w, 1)
        mask = np.frombuffer(img[and_off:and_off + and_stride * h],
                             np.uint8)
        if mask.size < and_stride * h:
            # no AND mask shipped: fully opaque
            alpha = np.full((h, w), 255, np.uint8)
        else:
            rows = mask.reshape(h, and_stride)
            cols = [(rows >> (7 - k)) & 1 for k in range(8)]
            bitsarr = np.stack(cols, axis=2).reshape(h, -1)[:, :w]
            alpha = np.where(bitsarr[::-1] == 1, 0, 255).astype(np.uint8)
    if (alpha == 255).all():
        return rgb
    return np.dstack([rgb, alpha])


def encode_ico(images: "list") -> bytes:
    """ICO writer for test payloads: each item is either
    ``("png", pixels)`` (embedded PNG, any shape the PNG encoder
    takes) or ``("bmp", rgb, alpha_or_None)`` with RGB ``(h, w, 3)``
    uint8 and an optional ``(h, w)`` uint8 alpha written as a 32-bit
    DIB (alpha channel) — plus the spec's AND mask derived as
    alpha == 0."""
    from aresdb_spark.operators.multimodal import encode_png

    blobs = []
    dims = []
    for item in images:
        if item[0] == "png":
            px = np.asarray(item[1], np.uint8)
            blobs.append(encode_png(px))
            dims.append((px.shape[1], px.shape[0]))
        elif item[0] == "bmp":
            rgb = np.asarray(item[1], np.uint8)
            h, w = rgb.shape[:2]
            alpha = item[2]
            a = np.full((h, w), 255, np.uint8) if alpha is None \
                else np.asarray(alpha, np.uint8)
            bgra = np.zeros((h, w, 4), np.uint8)
            bgra[:, :, [2, 1, 0]] = rgb
            bgra[:, :, 3] = a
            xor = bgra[::-1].reshape(h, -1)          # bottom-up, stride ok
            and_stride = _stride(w, 1)
            bitsarr = (a == 0).astype(np.uint8)[::-1]
            pad = (-w) % (and_stride * 8)
            if pad:
                bitsarr = np.concatenate(
                    [bitsarr, np.zeros((h, pad), np.uint8)], axis=1)
            packed = np.zeros((h, and_stride), np.uint8)
            for k in range(8):
                packed |= bitsarr[:, k::8][:, :and_stride] << (7 - k)
            info = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0,
                               xor.size + packed.size, 0, 0, 0, 0)
            blobs.append(info + xor.tobytes() + packed.tobytes())
            dims.append((w, h))
        else:
            raise ValueError(f"unknown ICO item kind {item[0]!r}")
    out = bytearray(ICO_MAGIC + struct.pack("<H", len(blobs)))
    off = 6 + 16 * len(blobs)
    for (w, h), blob in zip(dims, blobs):
        out += bytes([w % 256, h % 256, 0, 0])
        out += struct.pack("<HHII", 1, 32, len(blob), off)
        off += len(blob)
    return bytes(out) + b"".join(blobs)
