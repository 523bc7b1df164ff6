"""Clean-room TIFF codec (operators/tiff.py, TIFF 6.0 spec) + its
multimodal wiring: exact round trips across every compression ×
predictor × strip × photometric combination (TIFF is lossless), the
TIFF-vs-GIF LZW differences (MSB-first, early change), foreign-layout
streams (big-endian, min-is-white), honest errors at the scope
boundary, and the Spark decode_stats pipeline against the formula.
"""

import struct

import numpy as np
import pytest

from aresdb_spark.operators.tiff import (decode_tiff, encode_tiff,
                                         packbits_decode, packbits_encode,
                                         tiff_lzw_decode, tiff_lzw_encode)


def test_packbits_spec_golden():
    # the TIFF 6.0 §9 worked example
    raw = bytes([0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA,
                 0xAA, 0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA,
                 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA])
    expected = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
                      0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    assert packbits_encode(raw) == expected
    assert packbits_decode(expected, len(raw)) == raw


def test_lzw_roundtrip_and_early_change():
    rng = np.random.default_rng(3)
    blob = bytes(rng.integers(0, 256, 20000, dtype=np.uint8))
    enc = tiff_lzw_encode(blob)
    assert tiff_lzw_decode(enc, len(blob)) == blob
    # deep-dictionary stream crosses 9->10->11->12 bit widths and the
    # 4094 reset; must still round-trip
    runs = np.repeat(rng.integers(0, 3, 3000),
                     rng.integers(1, 60, 3000))[:80000].astype(np.uint8)
    assert tiff_lzw_decode(tiff_lzw_encode(bytes(runs)), len(runs)) \
        == bytes(runs)
    # MSB-first: the first 9-bit code is CLEAR (256) -> first byte 0x80
    assert tiff_lzw_encode(b"\x00")[0] == 0x80


def test_roundtrip_every_layout():
    rng = np.random.default_rng(7)
    for comp in (1, 5, 32773):
        for predictor in (1, 2):
            for rps in (0, 3):
                for rgb in (False, True):
                    h, w = 11, 14
                    shape = (h, w, 3) if rgb else (h, w)
                    px = rng.integers(0, 256, shape, dtype=np.uint8)
                    p = encode_tiff(px, compression=comp,
                                    predictor=predictor,
                                    rows_per_strip=rps)
                    assert p[:4] == b"II*\x00"
                    out = decode_tiff(p)
                    assert (out == px).all(), (comp, predictor, rps, rgb)


def test_big_endian_and_min_is_white():
    """Foreign-layout stream built by hand: MM byte order, photometric
    0 (min-is-white, inverted on decode), uncompressed single strip."""
    px = np.array([[0, 100], [200, 255]], dtype=np.uint8)
    ifd_off = 8
    entries = 8
    data_off = ifd_off + 2 + 12 * entries + 4

    def entry(tag, typ, count, value):
        return struct.pack(">HHII", tag, typ, count,
                           value << 16 if typ == 3 and count == 1 else value)

    out = b"MM\x00*" + struct.pack(">I", ifd_off)
    out += struct.pack(">H", entries)
    out += entry(256, 4, 1, 2)
    out += entry(257, 4, 1, 2)
    out += entry(258, 3, 1, 8)
    out += entry(259, 3, 1, 1)
    out += entry(262, 3, 1, 0)              # min-is-white
    out += entry(273, 4, 1, data_off)
    out += entry(278, 4, 1, 2)
    out += entry(279, 4, 1, 4)
    out += struct.pack(">I", 0)
    out += px.tobytes()
    got = decode_tiff(out)
    assert (got == 255 - px).all()


def test_out_of_scope_tiffs_raise_named():
    px = np.zeros((4, 4), np.uint8)
    p = bytearray(encode_tiff(px))
    # sub-byte samples (r12: 8 AND 16-bit now decode; 1/2/4-bit stay out)
    b4 = bytearray(p)
    i = b4.find(struct.pack("<HHI", 258, 3, 1))
    b4[i + 8] = 4
    with pytest.raises(NotImplementedError, match="uniform 8/16"):
        decode_tiff(bytes(b4))
    # CCITT fax compression (3)
    fax = bytearray(p)
    i = fax.find(struct.pack("<HHI", 259, 3, 1))
    fax[i + 8] = 3
    with pytest.raises(NotImplementedError, match="compression 3"):
        decode_tiff(bytes(fax))
    # a TileWidth tag without TileOffsets: a MALFORMED tiled file now
    # (tiles decode for real in r12), not a scope reject
    tiled = bytearray(p)
    i = tiled.find(struct.pack("<HHI", 278, 4, 1))
    tiled[i:i + 2] = struct.pack("<H", 322)
    with pytest.raises(ValueError, match="tiled TIFF missing"):
        decode_tiff(bytes(tiled))
    # planar configuration 2 stays a named reject
    planar = bytearray(p)
    i = planar.find(struct.pack("<HHI", 284, 3, 1))
    planar[i + 8] = 2
    with pytest.raises(NotImplementedError, match="planar"):
        decode_tiff(bytes(planar))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"NOPE" + bytes(p))
    with pytest.raises(ValueError):
        decode_tiff(bytes(p[:30]))


def test_tiff_tiles_16bit_palette_roundtrip():
    """r12 widening: tiled layouts (full-size edge tiles cropped after
    assembly), 16-bit samples (either predictor, every compression) and
    palette photometric (16-bit ColorMap lookup)."""
    import itertools

    rng = np.random.default_rng(13)
    for comp, pred in itertools.product([1, 5, 32773], [1, 2]):
        px = rng.integers(0, 65536, (6, 5), dtype=np.uint16)
        out = decode_tiff(encode_tiff(px, compression=comp,
                                      predictor=pred, bits=16))
        assert out.dtype == np.uint16 and np.array_equal(out, px)
        px = rng.integers(0, 65536, (6, 5, 3), dtype=np.uint16)
        out = decode_tiff(encode_tiff(px, compression=comp,
                                      predictor=pred, bits=16,
                                      tile=(4, 3)))
        assert np.array_equal(out, px), (comp, pred)
        px8 = rng.integers(0, 256, (10, 13, 3), dtype=np.uint8)
        out = decode_tiff(encode_tiff(px8, compression=comp,
                                      predictor=pred, tile=(8, 4)))
        assert np.array_equal(out, px8), (comp, pred)
    pal = rng.integers(0, 65536, (200, 3), dtype=np.uint16)
    idx = rng.integers(0, 200, (8, 11), dtype=np.uint8)
    out = decode_tiff(encode_tiff(idx, palette=pal, compression=5))
    assert out.dtype == np.uint16 and np.array_equal(
        out, pal[idx.astype(int)])
    out = decode_tiff(encode_tiff(idx, palette=pal, tile=(4, 4),
                                  compression=32773, predictor=2))
    assert np.array_equal(out, pal[idx.astype(int)])


def test_decode_image_dispatches_tiff():
    from aresdb_spark.operators.multimodal import decode_image

    px = np.array([[9, 250], [0, 127]], dtype=np.uint8)
    out = decode_image(encode_tiff(px, compression=5))
    assert out.dtype == np.float32 and out.shape == (2, 2)
    assert (out == px.astype(np.float32)).all()


def test_decode_stats_tiff_formula(spark):
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M

    ids = spark.range(0, 24).select(F.col("id").alias("media_id"))
    stats = {r["media_id"]: r.asDict()
             for r in M.decode_stats(M.synthetic_tiff_media(ids)).collect()}
    assert len(stats) == 24
    for d in range(24):
        h, w = 3 + d % 6, 4 + d % 9
        ch = 1 if d % 2 == 0 else 3
        vals = [(d * 29 + x * 11 + y * 17 + c * 7) % 256
                for y in range(h) for x in range(w) for c in range(ch)]
        s = stats[d]
        assert (s["width"], s["height"], s["channels"]) == (w, h, ch)
        assert s["n_px"] == len(vals) and s["px_sum"] == sum(vals)
        assert s["px_min"] == min(vals) and s["px_max"] == max(vals)


def test_tiff_roundtrip_property():
    """Hypothesis: ANY uint8 image round-trips exactly through any
    compression/predictor/strip combination."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**31),
           st.sampled_from([1, 5, 32773]), st.sampled_from([1, 2]),
           st.sampled_from([0, 2]), st.booleans())
    def run(h, w, seed, comp, predictor, rps, rgb):
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if rgb else (h, w)
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_tiff(encode_tiff(px, compression=comp,
                                      predictor=predictor,
                                      rows_per_strip=rps))
        assert (out == px).all()

    run()


def test_featurize_tiny_images_stay_finite(spark):
    """Regression (r11): images smaller than FEATURE_DIM used to
    mean-pool empty blocks into NaN, which pandas->Arrow nulls and the
    JVM rejects in the non-nullable feat_norm column. Tiny TIFFs (3x4
    gray = 12 px < 16) now zero-pad and featurize finitely."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M

    ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
    rows = M.featurize(M.synthetic_tiff_media(ids)).collect()
    assert len(rows) == 12
    assert all(np.isfinite(r["feat_norm"]) for r in rows)
    v = M.extract_features(np.array([[5]], dtype=np.uint8))
    assert len(v) == M.FEATURE_DIM and np.isfinite(v).all()
