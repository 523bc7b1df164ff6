"""Clean-room baseline JPEG codec (operators/jpeg.py, ITU-T T.81) +
its multimodal wiring. Mirrors the PNG test strategy (r9): spec-level
unit goldens, exact round trips where the math is exact, bounded error
where the format is lossy, honest NotImplementedError at the scope
boundary, and the Spark decode_stats pipeline against integer formulas.
"""

import struct

import numpy as np
import pytest

from aresdb_spark.operators.jpeg import (AC_SPEC, DC_SPEC, ZIGZAG,
                                         _extend, _huff_codes,
                                         decode_jpeg, encode_jpeg)


def test_zigzag_matches_spec_figure5():
    # first two anti-diagonal sweeps + the tail, transcribed from the
    # canonical order
    assert ZIGZAG[:16].tolist() == [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert ZIGZAG[-8:].tolist() == [53, 60, 61, 54, 47, 55, 62, 63]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_extend_matches_t81_f12_semantics():
    # T.81 table F.12: s received bits v map to [-2^s+1..-2^(s-1)] ∪
    # [2^(s-1)..2^s-1]
    assert _extend(0, 0) == 0
    assert _extend(1, 1) == 1 and _extend(0, 1) == -1
    assert _extend(0b10, 2) == 2 and _extend(0b01, 2) == -2
    assert _extend(0b00, 2) == -3 and _extend(0b11, 2) == 3
    assert _extend(0b010, 3) == -5
    assert _extend(0b111_1111_111, 10) == 1023
    assert _extend(0, 10) == -1023


def test_huffman_tables_are_canonical_and_exclude_all_ones():
    dc = _huff_codes(*DC_SPEC)
    assert len(dc) == 12
    assert all(length == 4 for _, length in dc.values())
    assert 0b1111 not in [c for c, _ in dc.values()]     # T.81 C.2
    ac = _huff_codes(*AC_SPEC)
    assert len(ac) == 162
    assert all(length == 8 for _, length in ac.values())
    assert 0xFF not in [c for c, _ in ac.values()]
    # prefix-free by construction (single length class here)
    assert len({c for c, _ in ac.values()}) == 162


def test_constant_blocks_roundtrip_exactly():
    rng = np.random.default_rng(7)
    for wb, hb in [(1, 1), (3, 2), (2, 1), (4, 3)]:
        vals = rng.integers(0, 256, (hb, wb), dtype=np.uint8)
        img = np.kron(vals, np.ones((8, 8), np.uint8))
        out = decode_jpeg(encode_jpeg(img))
        assert out.dtype == np.uint8 and (out == img).all()


def test_restart_markers_roundtrip_and_reject_bad_sequence():
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 256, (2, 4), dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), np.uint8))
    payload = encode_jpeg(img, restart_interval=2)
    assert b"\xff\xdd" in payload                        # DRI emitted
    assert (decode_jpeg(payload) == img).all()
    # corrupt the first RSTn (FFD0..FFD7) -> strict-sequence error
    buf = bytearray(payload)
    for i in range(len(buf) - 1):
        if buf[i] == 0xFF and 0xD0 <= buf[i + 1] <= 0xD7:
            buf[i + 1] = 0xD0 + ((buf[i + 1] - 0xD0 + 3) % 8)
            break
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg(bytes(buf))


def test_lossy_roundtrip_error_is_bounded():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 22), dtype=np.uint8)  # odd size: pad+crop
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    # flat q=8: per-coefficient quantization error <= 4; worst-case
    # pixel error stays well inside 16 for random noise (measured 6)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 16

    rgb = rng.integers(0, 256, (17, 9, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb))
    assert out.shape == rgb.shape
    # YCbCr conversion adds rounding on top of quantization
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 32


def test_smooth_image_high_fidelity():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.round(np.add.outer(x, x) / 2), 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_out_of_scope_streams_raise_named_errors():
    img = np.zeros((8, 8), np.uint8)
    payload = bytearray(encode_jpeg(img))

    def swap_marker(buf, frm, to):
        out = bytearray(buf)
        i = out.find(bytes([0xFF, frm]))
        assert i >= 0
        out[i + 1] = to
        return bytes(out)

    # r11: progressive is IMPLEMENTED — relabeling a baseline stream as
    # SOF2 now fails scan VALIDATION (a full-band Ss=0..Se=63 scan is
    # illegal in progressive, G.1.1.1.1), not a scope gate
    with pytest.raises(ValueError, match="Ss=0 requires Se=0"):
        decode_jpeg(swap_marker(payload, 0xC0, 0xC2))
    # r12: lossless (SOF3) is IMPLEMENTED — relabeling a baseline
    # stream now fails scan VALIDATION (a DCT scan's Ss=0 names no
    # lossless predictor), not a scope gate
    with pytest.raises(ValueError, match="lossless scan header"):
        decode_jpeg(swap_marker(payload, 0xC0, 0xC3))
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(swap_marker(payload, 0xC0, 0xC9))
    # extended sequential (SOF1) at 8-bit is semantically identical to
    # baseline — decodes, no gate
    assert (decode_jpeg(swap_marker(payload, 0xC0, 0xC1))
            == np.zeros((8, 8), np.uint8)).all()
    # r11: declared factors on a SINGLE-component frame are a no-op
    # (T.81 A.2: non-interleaved scan, MCU = one data unit) — this
    # decoded-as-4:4:4 case used to raise pre-4:2:0
    i = bytes(payload).find(bytes([0xFF, 0xC0]))
    sub = bytearray(payload)
    sub[i + 11] = 0x22                       # comp 1 h/v factors
    assert (decode_jpeg(bytes(sub)) == np.zeros((8, 8), np.uint8)).all()
    # fractional factor ratios stay out of scope, named
    rgb = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    i = bytes(rgb).find(bytes([0xFF, 0xC0]))
    rgb[i + 11] = 0x33                       # comp 1: 3x3
    rgb[i + 14] = 0x22                       # comp 2: 2x2 -> ratio 3/2
    with pytest.raises(NotImplementedError, match="fractional"):
        decode_jpeg(bytes(rgb))
    # sampling factor 0 is invalid per spec
    bad = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    i = bytes(bad).find(bytes([0xFF, 0xC0]))
    bad[i + 11] = 0x01                       # comp 1: h=0, v=1
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg(bytes(bad))
    # truncation mid-entropy
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload[:len(payload) // 2]))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_decoder_handles_foreign_table_layout():
    """Interop guard: a stream whose DHT declares DIFFERENT (multi-
    length) Huffman tables than our encoder's single-length ones must
    decode through the generic canonical-table path. Build one by hand:
    a 1-block all-zero image coded with 2-table-id layout and a 2-level
    DC table."""
    # DC table: symbol 0 at length 1 (code 0), symbol 1 at length 2
    dc_bits = [1, 1] + [0] * 14
    dc_vals = [0, 1]
    ac_bits = [1] + [0] * 15                 # EOB at length 1 (code 0)
    ac_vals = [0x00]

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([1]) + bytes([8] * 64))     # table id 1
    out += seg(0xFFC4, bytes([0x03]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xFFC4, bytes([0x13]) + bytes(ac_bits) + bytes(ac_vals))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([5, 0x11, 1]))
    out += seg(0xFFDA, bytes([1, 5, 0x33, 0, 63, 0]))
    # entropy: DC symbol 0 (code 0, 1 bit) + AC EOB (code 0, 1 bit),
    # padded with 1s -> byte 0b00111111
    out += bytes([0b00111111])
    out += b"\xff\xd9"
    px = decode_jpeg(bytes(out))
    assert px.shape == (8, 8) and (px == 128).all()      # DC 0 -> level 128


def test_decode_image_dispatches_jpeg_for_real():
    from aresdb_spark.operators.multimodal import decode_image
    img = np.kron(np.array([[7, 200]], np.uint8), np.ones((8, 8), np.uint8))
    out = decode_image(encode_jpeg(img))
    assert out.dtype == np.float32 and out.shape == (8, 16)
    assert (out == img.astype(np.float32)).all()


def test_decode_stats_mixed_png_jpeg(spark):
    """One decode_stats pass over a table mixing REAL PNG and REAL JPEG
    payloads — dispatch by magic bytes inside the Arrow batch."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M

    ids = spark.range(0, 40).select(F.col("id").alias("media_id"))
    png = M.synthetic_png_media(ids.filter(F.col("media_id") % 2 == 0))
    jpg = M.synthetic_jpeg_media(ids.filter(F.col("media_id") % 2 == 1))
    stats = {r["media_id"]: r.asDict()
             for r in M.decode_stats(png.unionByName(jpg)).collect()}
    assert len(stats) == 40
    for d in range(40):
        s = stats[d]
        if d % 2 == 0:      # PNG formula (synthetic_png_media)
            w, h = 8 + d % 9, 8 + d % 7
            ch = 3 if d % 2 else 1
            vals = [(d * 7 + i * 31) % 256 for i in range(w * h * ch)]
            assert (s["width"], s["height"], s["channels"]) == (w, h, ch)
        else:               # JPEG formula (synthetic_jpeg_media)
            wb, hb = 1 + d % 3, 1 + d % 2
            blocks = [(d * 11 + bx * 37 + by * 53) % 256
                      for by in range(hb) for bx in range(wb)]
            vals = [v for v in blocks for _ in range(64)]
            assert (s["width"], s["height"], s["channels"]) == \
                (8 * wb, 8 * hb, 1)
        assert s["n_px"] == len(vals)
        assert s["px_sum"] == sum(vals)
        assert s["px_min"] == min(vals) and s["px_max"] == max(vals)


def test_featurize_over_jpeg_payloads(spark):
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M

    ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
    feats = M.featurize(M.synthetic_jpeg_media(ids)).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r["features"]) == M.FEATURE_DIM
        assert r["feat_norm"] >= 0.0


def test_constant_block_roundtrip_property():
    """Hypothesis: ANY block-constant grayscale image round-trips
    exactly (the oracle-strategy invariant the contract row relies on),
    with and without restart intervals."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 4), st.integers(1, 3),
           st.lists(st.integers(0, 255), min_size=12, max_size=12),
           st.sampled_from([0, 1, 2]))
    def run(wb, hb, vals, rst):
        vals_arr = np.array(vals[:wb * hb]).reshape(hb, wb) \
            if wb * hb <= 12 else None
        if vals_arr is None:
            return
        img = np.kron(vals_arr.astype(np.uint8),
                      np.ones((8, 8), np.uint8))
        out = decode_jpeg(encode_jpeg(img, restart_interval=rst))
        assert (out == img).all()

    run()


def test_lossy_roundtrip_error_bound_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.integers(1, 30), st.integers(1, 30), st.integers(0, 2**31))
    def run(h, w, seed):
        img = np.random.default_rng(seed).integers(
            0, 256, (h, w), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 16

    run()


def test_420_macroblock_constant_roundtrip_exactly():
    """r11 (VERDICT r10 directive 2): 16x16-macroblock-constant images
    with EQUAL RGB channels survive the full 4:2:0 path exactly — the
    2x2 chroma mean of a constant is the constant, every block is
    DC-only under the flat q=8 table, replication upsampling of a
    constant is exact, and equal-channel RGB→YCbCr is lossless
    (y = c, cb = cr = 128)."""
    rng = np.random.default_rng(13)
    for mw, mh in [(1, 1), (2, 1), (3, 2), (2, 4)]:
        mvals = rng.integers(0, 256, (mh, mw), dtype=np.uint8)
        gray = np.kron(mvals, np.ones((16, 16), np.uint8))
        rgb = np.stack([gray] * 3, axis=2)
        for rst in (0, 1, 3):
            payload = encode_jpeg(rgb, restart_interval=rst,
                                  subsampling="420")
            out = decode_jpeg(payload)
            assert out.shape == rgb.shape and (out == rgb).all(), \
                (mw, mh, rst)
    # the stream really declares 4:2:0 (Y at 2x2 in SOF0)
    i = payload.find(bytes([0xFF, 0xC0]))
    assert payload[i + 11] == 0x22 and payload[i + 14] == 0x11


def test_420_codec_error_vs_subsample_ideal_is_quantization_only():
    """Random RGB under 4:2:0 loses chroma detail BY DESIGN; the codec
    claim is that its output matches the ideal (pad → YCbCr → 2x2-mean
    → replicate → RGB) reference to within the same quantization bound
    the 4:4:4 path carries — separating codec bugs from the format's
    information loss."""
    from aresdb_spark.operators.jpeg import _rgb_to_ycbcr

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (23, 37, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    y, cb, cr = _rgb_to_ycbcr(img)
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    def pool_rep(p):
        pooled = pad(p).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        return np.repeat(np.repeat(pooled, 2, axis=0), 2, axis=1)[:h, :w]

    yv, cbr, crr = pad(y)[:h, :w], pool_rep(cb), pool_rep(cr)
    r = yv + 1.402 * (crr - 128)
    g = yv - 0.344136 * (cbr - 128) - 0.714136 * (crr - 128)
    b = yv + 1.772 * (cbr - 128)
    ideal = np.clip(np.round(np.stack([r, g, b], axis=2)),
                    0, 255).astype(int)
    out = decode_jpeg(encode_jpeg(img, subsampling="420")).astype(int)
    assert out.shape == img.shape
    assert np.abs(out - ideal).max() <= 32   # measured 17; 444 bound 32


def test_420_macroblock_constant_roundtrip_property():
    """Hypothesis: ANY macroblock-constant equal-channel image
    round-trips 4:2:0 exactly (the invariant the mixed contract row's
    oracle relies on), with and without restart intervals."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(st.integers(1, 3), st.integers(1, 2),
           st.lists(st.integers(0, 255), min_size=6, max_size=6),
           st.sampled_from([0, 1, 2]))
    def run(mw, mh, vals, rst):
        mvals = np.array(vals[:mw * mh]).reshape(mh, mw).astype(np.uint8)
        gray = np.kron(mvals, np.ones((16, 16), np.uint8))
        rgb = np.stack([gray] * 3, axis=2)
        out = decode_jpeg(encode_jpeg(rgb, restart_interval=rst,
                                      subsampling="420"))
        assert (out == rgb).all()

    run()


# -- progressive (SOF2, r11) --------------------------------------------------


def test_progressive_stream_shape():
    """The progressive writer emits SOF2 + the 11-scan script (2 DC +
    9 AC for color; 5 scans for grayscale), each with its own SOS."""
    gray = np.kron(np.array([[3, 250]], np.uint8), np.ones((8, 8), np.uint8))
    p = encode_jpeg(gray, progressive=True)
    assert b"\xff\xc2" in p and b"\xff\xc0" not in p
    assert p.count(b"\xff\xda") == 5
    rgb = np.zeros((8, 8, 3), np.uint8)
    p3 = encode_jpeg(rgb, progressive=True)
    assert p3.count(b"\xff\xda") == 11


def test_progressive_equals_baseline_decode():
    """Baseline and progressive streams of the same image carry the SAME
    quantized coefficients, so decodes must be bit-identical — this
    drives every scan type (DC first/refine, AC first with EOB runs and
    ZRL, AC refine with buffered correction bits) with dense random
    content."""
    rng = np.random.default_rng(19)
    for trial in range(8):
        h, w = int(rng.integers(1, 36)), int(rng.integers(1, 36))
        if trial % 3 == 0:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            subs = "444"
        else:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            subs = "420" if trial % 3 == 2 else "444"
        base = decode_jpeg(encode_jpeg(img, subsampling=subs))
        prog = decode_jpeg(encode_jpeg(img, subsampling=subs,
                                       progressive=True))
        assert (base == prog).all(), (trial, h, w, subs)


def test_progressive_restart_intervals():
    """DRI/RSTn inside progressive scans: predictors and the EOB run
    reset per interval in every scan type; a corrupted RST sequence is
    rejected with the same strictness as baseline."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    p = encode_jpeg(img, restart_interval=2, progressive=True)
    assert b"\xff\xdd" in p
    assert (decode_jpeg(p) ==
            decode_jpeg(encode_jpeg(img, restart_interval=2))).all()
    buf = bytearray(p)
    for i in range(len(buf) - 1):
        if buf[i] == 0xFF and 0xD0 <= buf[i + 1] <= 0xD7:
            buf[i + 1] = 0xD0 + ((buf[i + 1] - 0xD0 + 3) % 8)
            break
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg(bytes(buf))


def test_progressive_constant_blocks_roundtrip_exactly():
    """Block-constant images survive the PROGRESSIVE path exactly: DC
    first+refine reassemble the DC bit-for-bit and every AC scan is a
    pure EOB run — the invariant the mixed contract row's oracle
    extends to progressive payloads."""
    rng = np.random.default_rng(29)
    vals = rng.integers(0, 256, (2, 4), dtype=np.uint8)
    gray = np.kron(vals, np.ones((8, 8), np.uint8))
    assert (decode_jpeg(encode_jpeg(gray, progressive=True)) == gray).all()
    # 4:2:0 macroblock-constant equal-channel color
    mvals = rng.integers(0, 256, (1, 2), dtype=np.uint8)
    g16 = np.kron(mvals, np.ones((16, 16), np.uint8))
    rgb = np.stack([g16] * 3, axis=2)
    out = decode_jpeg(encode_jpeg(rgb, subsampling="420", progressive=True))
    assert (out == rgb).all()


def test_progressive_scan_validation():
    """Malformed progressive scan headers are rejected per G.1.1.1.1:
    multi-component AC scans, Ah != Al+1 refinement steps, and
    magnitude >1 symbols inside an AC refinement scan."""
    img = np.zeros((8, 8, 3), np.uint8)
    p = bytearray(encode_jpeg(img, progressive=True))
    # find the FIRST AC scan's SOS (ns=1) and flip it multi-component:
    # ns byte 1 -> 3 makes the header inconsistent with its Ss>0
    i = -1
    while True:
        i = p.find(b"\xff\xda", i + 1)
        assert i >= 0
        ns = p[i + 4]
        ss = p[i + 5 + 2 * ns]
        if ns == 1 and ss > 0:
            break
    bad = bytearray(p)
    # rewrite the SOS body to declare 3 components (with junk ids from
    # the following bytes) while keeping Ss>0
    bad[i + 4] = 3
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    # Ah=2, Al=0 (skips a refinement bit)
    bad2 = bytearray(p)
    bad2[i + 5 + 2 * 1 + 2] = 0x20
    with pytest.raises(ValueError, match="Ah = Al \\+ 1"):
        decode_jpeg(bytes(bad2))


def test_progressive_equals_baseline_property():
    """Hypothesis: random images decode identically from baseline and
    progressive streams — whole-codec equivalence, any shape/layout."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(st.integers(1, 28), st.integers(1, 28), st.integers(0, 2**31),
           st.sampled_from(["gray", "444", "420"]),
           st.sampled_from([0, 3]))
    def run(h, w, seed, layout, rst):
        rng = np.random.default_rng(seed)
        if layout == "gray":
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            subs = "444"
        else:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            subs = layout
        base = decode_jpeg(encode_jpeg(img, restart_interval=rst,
                                       subsampling=subs))
        prog = decode_jpeg(encode_jpeg(img, restart_interval=rst,
                                       subsampling=subs, progressive=True))
        assert (base == prog).all()

    run()


# -- lossless process (SOF3, r12) ----------------------------------------------


def test_lossless_roundtrips_all_predictors_and_depths():
    """Annex H: arbitrary (non-block-constant!) pixels round-trip
    bit-for-bit — all 7 predictors, 8/12/16-bit, gray and raw-RGB,
    restart markers, point transform, mod-2^16 wrap diffs."""
    from aresdb_spark.operators.jpeg import (decode_jpeg,
                                             encode_jpeg_lossless)

    rng = np.random.default_rng(17)
    for pred in range(1, 8):
        px = rng.integers(0, 256, (9, 7), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg_lossless(px, predictor=pred))
        assert out.dtype == np.uint8 and np.array_equal(out, px), pred
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_lossless(px, predictor=4)), px)
    for prec in (12, 16):
        px = rng.integers(0, 1 << prec, (8, 6)).astype(np.uint16)
        out = decode_jpeg(encode_jpeg_lossless(px, precision=prec,
                                               predictor=7))
        assert out.dtype == np.uint16 and np.array_equal(out, px), prec
    px = rng.integers(0, 4096, (7, 9, 3)).astype(np.uint16)
    assert np.array_equal(decode_jpeg(encode_jpeg_lossless(
        px, precision=12, predictor=4, restart_interval=5)), px)
    # point transform codes px >> Pt; decode returns << Pt
    px = rng.integers(0, 256, (5, 5), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_lossless(px, point_transform=2))
    assert np.array_equal(out, (px >> 2) << 2)
    # category 16 (diff = 32768, no extra bits) via max-contrast 16-bit
    px = np.zeros((4, 4), np.uint16)
    px[::2, ::2] = 65535
    px[1::2, 1::2] = 32768
    assert np.array_equal(decode_jpeg(encode_jpeg_lossless(
        px, precision=16)), px)


def test_lossless_scope_and_dispatch():
    import pytest

    from aresdb_spark.operators import multimodal as M
    from aresdb_spark.operators.jpeg import (decode_jpeg,
                                             encode_jpeg_lossless)

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = bytearray(encode_jpeg_lossless(px))
    # subsampled lossless stays out: patch the sampling byte
    i = bytes(blob).find(b"\xff\xc3")
    blob[i + 4 + 6 + 1] = 0x21                   # 2x1 factors
    with pytest.raises(NotImplementedError, match="subsampled lossless"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="2..16|out of T.81"):
        encode_jpeg_lossless(px, precision=17)
    # the image dispatcher routes SOF3 payloads like any other JPEG
    out = M.decode_image(encode_jpeg_lossless(px, predictor=3))
    assert np.array_equal(out, px.astype(np.float32))
