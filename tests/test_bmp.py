"""Clean-room BMP codec (operators/bmp.py): round-trips across the
full scope matrix, RLE branch coverage, dispatcher integration, and
named scope errors."""

import itertools

import numpy as np
import pytest

from aresdb_spark.operators.bmp import decode_bmp, encode_bmp


def test_bmp_truecolor_roundtrip_matrix():
    """24/32-bit, both row orders, widths that exercise 4-byte row
    padding (including w=1)."""
    rng = np.random.default_rng(9)
    for bits, td, w in itertools.product([24, 32], [False, True],
                                         [1, 3, 5, 8]):
        px = rng.integers(0, 256, (7, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(px, bit_count=bits, top_down=td))
        assert out.shape == px.shape and np.array_equal(out, px), \
            (bits, td, w)


def test_bmp_palette_roundtrip_matrix():
    """1/4/8-bit palettized (MSB-first sub-byte packing), both row
    orders, BGRA quad palette layout."""
    rng = np.random.default_rng(10)
    for bits, td, w in itertools.product([1, 4, 8], [False, True],
                                         [1, 5, 9, 16]):
        n = 1 << bits
        idx = rng.integers(0, n, (6, w), dtype=np.uint8)
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(idx, bit_count=bits, palette=pal,
                                    top_down=td))
        assert np.array_equal(out, pal[idx]), (bits, td, w)


def test_bmp_rle_roundtrip_and_escapes():
    """BI_RLE8/BI_RLE4: encoded runs, forced absolute-mode rows
    (word-aligned), EOL/EOF escapes — and the delta escape on a
    hand-built stream (skipped pixels stay 0 per spec)."""
    rng = np.random.default_rng(11)
    for bits, abs_every, w in itertools.product([8, 4], [0, 2],
                                                [4, 7, 13]):
        n = 1 << bits
        idx = np.repeat(rng.integers(0, n, (6, (w + 2) // 3),
                                     dtype=np.uint8), 3, axis=1)[:, :w]
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(idx, bit_count=bits, palette=pal,
                                    rle=True, abs_every=abs_every))
        assert np.array_equal(out, pal[idx]), (bits, abs_every, w)
    # delta escape: run of 2 '5's, delta (+1, +1), run of 1 '9', EOF —
    # lands one row up and one pixel right of where the delta started
    pal = np.arange(768, dtype=np.uint32).reshape(256, 3) \
        .astype(np.uint8)
    base = encode_bmp(np.zeros((3, 4), np.uint8), bit_count=8,
                      palette=pal, rle=True)
    import struct
    (pix_off,) = struct.unpack("<I", base[10:14])
    body = bytes([2, 5, 0, 2, 1, 1, 1, 9, 0, 1])
    blob = base[:pix_off] + body
    out = decode_bmp(blob)
    idx = np.zeros((3, 4), np.uint8)
    idx[2, 0] = idx[2, 1] = 5                       # bottom row (y=0)
    idx[1, 3] = 9                                   # after delta(+1, +1)
    assert np.array_equal(out, pal[idx])


def test_bmp_scope_errors_named():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"BM" + b"\0" * 10)
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    blob = bytearray(encode_bmp(px))
    blob[30] = 4                                    # BI_JPEG embedding
    with pytest.raises(NotImplementedError, match="compression 4"):
        decode_bmp(bytes(blob))
    blob = bytearray(encode_bmp(px))
    blob[30] = 6                                    # BI_ALPHABITFIELDS
    with pytest.raises(NotImplementedError, match="compression 6"):
        decode_bmp(bytes(blob))
    blob = bytearray(encode_bmp(px))
    blob[30] = 3                                    # BI_BITFIELDS at 24 bits
    with pytest.raises(ValueError, match="16/32 bits"):
        decode_bmp(bytes(blob))
    blob = bytearray(encode_bmp(px))
    blob[14] = 12                                   # OS/2 core header
    with pytest.raises(NotImplementedError, match="OS/2"):
        decode_bmp(bytes(blob))
    with pytest.raises(ValueError, match="RLE"):
        encode_bmp(np.zeros((2, 2), np.uint8),
                   bit_count=8, palette=np.zeros((2, 3), np.uint8),
                   rle=True, top_down=True)


def _bitfields_bmp(words: np.ndarray, bits: int, masks, hdr_size: int = 40,
                   top_down: bool = False) -> bytes:
    """Hand-build a BI_BITFIELDS BMP: ``words`` is an (h, w) array of
    already-packed 16/32-bit pixel words. A 40-byte header gets the
    three color masks APPENDED after it (spec); hdr_size >= 56 carries
    r/g/b/a in the header fields (V3+/V4/V5 layout, zero-padded)."""
    import struct

    h, w = words.shape
    stride = ((w * bits // 8) + 3) // 4 * 4
    extra = 12 if hdr_size == 40 else 0
    pix_off = 14 + hdr_size + extra
    dt = "<u2" if bits == 16 else "<u4"
    order = range(h) if top_down else range(h - 1, -1, -1)
    body = b"".join(words[y].astype(dt).tobytes().ljust(stride, b"\0")
                    for y in order)
    hdr = struct.pack("<2sIHHI", b"BM", pix_off + len(body), 0, 0, pix_off)
    ih = struct.pack("<IiiHHIIiiII", hdr_size, w,
                     -h if top_down else h, 1, bits, 3, len(body),
                     2835, 2835, 0, 0)
    if hdr_size == 40:
        ih += struct.pack("<3I", *masks[:3])
    else:
        ih += struct.pack("<4I", *masks)
        ih += b"\0" * (hdr_size - 40 - 16)
    return hdr + ih + body


def test_bmp_bitfields_16bit_565_and_implied_555():
    """16-bit decode: explicit R5G6B5 masks via BI_BITFIELDS and the
    BI_RGB implied X1R5G5B5 default, channels scaled by rounded
    max-ratio; both row orders (BI_BITFIELDS legally allows
    top-down, unlike RLE)."""
    rng = np.random.default_rng(13)
    r = rng.integers(0, 32, (5, 7), dtype=np.uint32)
    g = rng.integers(0, 64, (5, 7), dtype=np.uint32)
    b = rng.integers(0, 32, (5, 7), dtype=np.uint32)
    words565 = (r << 11) | (g << 5) | b
    exp565 = np.stack([np.rint(r * 255.0 / 31), np.rint(g * 255.0 / 63),
                       np.rint(b * 255.0 / 31)], axis=2).astype(np.uint8)
    for td in (False, True):
        out = decode_bmp(_bitfields_bmp(
            words565, 16, (0xF800, 0x07E0, 0x001F), top_down=td))
        assert out.shape == (5, 7, 3) and np.array_equal(out, exp565), td

    g5 = g >> 1                                     # 5-bit green for 555
    words555 = (r << 10) | (g5 << 5) | b
    exp555 = np.stack([np.rint(r * 255.0 / 31), np.rint(g5 * 255.0 / 31),
                       np.rint(b * 255.0 / 31)], axis=2).astype(np.uint8)
    blob = bytearray(_bitfields_bmp(words555, 16,
                                    (0x7C00, 0x03E0, 0x001F)))
    blob[30] = 0                                    # comp = BI_RGB
    out = decode_bmp(bytes(blob))
    assert np.array_equal(out, exp555)


def test_bmp_bitfields_32bit_alpha_and_v4_header():
    """32-bit BI_BITFIELDS with 8-bit masks: identity scaling, and a
    nonzero alpha mask (V4 header fields) yields RGBA — matching what
    decode_png returns for RGBA sources."""
    rng = np.random.default_rng(14)
    px = rng.integers(0, 256, (4, 6, 4), dtype=np.uint32)
    words = ((px[:, :, 3] << 24) | (px[:, :, 0] << 16)
             | (px[:, :, 1] << 8) | px[:, :, 2])    # ARGB word order
    masks = (0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)
    out = decode_bmp(_bitfields_bmp(words, 32, masks, hdr_size=108))
    assert out.shape == (4, 6, 4)
    assert np.array_equal(out, px.astype(np.uint8))
    # same file through a bare 40-byte header: only 3 masks exist, so
    # the alpha byte is undefined padding and the result is RGB
    out3 = decode_bmp(_bitfields_bmp(words, 32, masks))
    assert out3.shape == (4, 6, 3)
    assert np.array_equal(out3, px[:, :, :3].astype(np.uint8))


def test_bmp_bitfields_errors_named():
    words = np.zeros((2, 2), np.uint32)
    with pytest.raises(ValueError, match="overlap"):
        decode_bmp(_bitfields_bmp(
            words, 32, (0xFF0000, 0xFF00, 0x1FF, 0), hdr_size=108))
    with pytest.raises(ValueError, match="not contiguous"):
        decode_bmp(_bitfields_bmp(
            words, 32, (0xF000F0, 0x000F00, 0x00000F, 0), hdr_size=108))
    with pytest.raises(ValueError, match="mask 0 invalid"):
        decode_bmp(_bitfields_bmp(words, 32, (0, 0xFF00, 0xFF, 0),
                                  hdr_size=108))


def test_bmp_through_decode_image_and_stats(spark):
    """The dispatcher routes BM payloads to the real codec, and the
    Spark decode_stats pipeline grades BMPs like every other
    container."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    out = M.decode_image(encode_bmp(px))
    assert out.dtype == np.float32 and np.array_equal(
        out, px.astype(np.float32))

    ids = spark.range(0, 21).select(F.col("id").alias("media_id"))
    rows = {r["media_id"]: r.asDict()
            for r in M.decode_stats(M.synthetic_bmp_media(ids)).collect()}
    assert len(rows) == 21
    for d in range(21):
        w, h, v = 4 + d % 9, 3 + d % 5, d % 7
        s = rows[d]
        assert (s["width"], s["height"], s["channels"]) == (w, h, 3), d
        if v <= 1:
            vals = (d * 7 + np.arange(w * h * 3) * 31) % 256
        else:
            bits = {2: 8, 3: 4, 4: 1, 5: 8, 6: 4}[v]
            p = np.arange(w * h)
            if v >= 5:
                p = p // 3
            idx = (d * 3 + p * 19) % (1 << bits)
            j = np.repeat(idx, 3)
            k = np.tile([7, 13, 29], w * h)
            o = np.tile([1, 2, 3], w * h)
            vals = (j * k + o) % 256
        assert s["px_sum"] == int(vals.sum()), d
        assert s["px_min"] == int(vals.min()) and \
            s["px_max"] == int(vals.max()), d


def test_ico_container_roundtrip_and_selection():
    """r12: ICO/CUR favicons — largest-entry selection, mask-doubled
    DIB heights, 32-bit alpha vs AND-mask fallback, embedded PNG
    entries, explicit entry picks."""
    from aresdb_spark.operators.bmp import decode_ico, encode_ico

    rng = np.random.default_rng(14)
    rgb = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    alpha = rng.integers(0, 256, (8, 6), dtype=np.uint8)
    alpha[0, 0] = 0
    out = decode_ico(encode_ico([("bmp", rgb, alpha)]))
    assert out.shape == (8, 6, 4) and np.array_equal(out[:, :, :3], rgb) \
        and np.array_equal(out[:, :, 3], alpha)
    # fully opaque collapses to RGB
    out = decode_ico(encode_ico([("bmp", rgb, None)]))
    assert out.shape == (8, 6, 3) and np.array_equal(out, rgb)
    # largest entry wins; explicit entry overrides
    small = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (16, 12), dtype=np.uint8)
    blob = encode_ico([("bmp", small, None), ("png", big)])
    assert np.array_equal(decode_ico(blob), big)
    assert np.array_equal(decode_ico(blob, entry=0), small)
    # all-zero 32-bit alpha falls back to the AND mask (legacy quirk)
    out = decode_ico(encode_ico([("bmp", rgb, np.zeros((8, 6), np.uint8))]))
    assert out.shape == (8, 6, 4) and (out[:, :, 3] == 0).all()
    with pytest.raises(ValueError, match="not an ICO"):
        decode_ico(b"\x00\x00\x03\x00xx")
    with pytest.raises(ValueError, match="out of range"):
        decode_ico(blob, entry=5)


def test_ico_through_dispatcher(spark):
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M
    from aresdb_spark.operators.bmp import encode_ico

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    out = M.decode_image(encode_ico([("bmp", px, None)]))
    assert np.array_equal(out, px.astype(np.float32))
    ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
    rows = {r["media_id"]: r.asDict()
            for r in M.decode_stats(M.synthetic_ico_media(ids)).collect()}
    assert len(rows) == 12
    for d in range(12):
        w, h, v = 4 + d % 5, 3 + d % 4, d % 3
        ch = {0: 3, 1: 4, 2: 1}[v]
        s = rows[d]
        assert (s["width"], s["height"], s["channels"]) == (w, h, ch), d
