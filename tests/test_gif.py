"""Clean-room GIF codec (operators/gif.py, GIF87a/89a spec) + its
multimodal wiring. Mirrors the PNG/JPEG test strategy: spec-level unit
goldens, exact round trips (GIF is lossless), decoder corners driven by
real streams the encoder can be forced to produce (tiny sub-blocks,
mid-stream CLEARs, interlace), honest errors at the scope boundary, and
the Spark decode_stats pipeline against integer formulas.
"""

import struct

import numpy as np
import pytest

from aresdb_spark.operators.gif import (_interlace_order, decode_gif,
                                        decode_gif_frames, encode_gif,
                                        lzw_decode, lzw_encode)


def test_interlace_order_matches_spec_passes():
    # GIF spec §23: rows 0,8,16.. then 4,12.. then 2,6,10.. then odd
    assert _interlace_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert _interlace_order(1) == [0]
    assert sorted(_interlace_order(33)) == list(range(33))


def test_lzw_golden_and_kwkwk():
    # 'abababab' class forces the code-not-yet-in-table (KwKwK) branch
    seq = np.array([0, 1, 0, 1, 0, 1, 0, 1, 0], dtype=np.uint8)
    assert (lzw_decode(lzw_encode(seq, 2), 2, expected=9) == seq).all()
    # single pixel
    one = np.array([3], dtype=np.uint8)
    assert (lzw_decode(lzw_encode(one, 2), 2, expected=1) == one).all()
    # an index beyond the palette is an encoder error
    with pytest.raises(ValueError, match="palette"):
        lzw_encode(np.array([4], dtype=np.uint8), 2)


def test_lzw_width_growth_and_table_cap():
    """A long low-entropy stream walks the code width 9->12 bits and
    hits the 4096-entry cap (encoder emits CLEAR, decoder resets)."""
    rng = np.random.default_rng(7)
    seq = np.repeat(rng.integers(0, 7, 9000),
                    rng.integers(1, 9, 9000)).astype(np.uint8)[:40000]
    out = lzw_decode(lzw_encode(seq, 8), 8, expected=len(seq))
    assert (out == seq).all()


def test_roundtrip_all_encoder_flags():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (23, 17), dtype=np.uint8)
    exp = np.stack([px] * 3, axis=2)
    for interlace in (False, True):
        for bs, ce in ((255, 0), (7, 0), (255, 4), (1, 3)):
            p = encode_gif(px, interlace=interlace, block_size=bs,
                           clear_every=ce)
            assert p[:6] == b"GIF89a"
            assert (decode_gif(p) == exp).all(), (interlace, bs, ce)


def test_small_palette_and_animation():
    rng = np.random.default_rng(13)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   np.uint8)
    idx = rng.integers(0, 4, (10, 13)).astype(np.uint8)
    assert (decode_gif(encode_gif(idx, palette=pal)) == pal[idx]).all()
    frames = [rng.integers(0, 256, (9, 11), dtype=np.uint8)
              for _ in range(3)]
    out = decode_gif_frames(encode_gif(frames))
    assert len(out) == 3
    for i in range(3):
        assert (out[i][:, :, 2] == frames[i]).all()
    # decode_gif = first frame
    assert (decode_gif(encode_gif(frames))[:, :, 0] == frames[0]).all()


def test_extension_blocks_skip_by_subblock_chain():
    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, (6, 8), dtype=np.uint8)
    p = bytes(encode_gif(px))
    i = 13 + 768                  # header + LSD + 256-entry GCT
    assert p[i] == 0x2C
    comment = b"\x21\xfe\x05hello\x00"
    app = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    p2 = p[:i] + comment + app + gce + p[i:]
    assert (decode_gif(p2)[:, :, 0] == px).all()


def test_gif87a_and_local_color_table():
    """Foreign-layout stream built by hand: 87a signature, NO global
    table, a local color table on the image descriptor."""
    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    lzw = lzw_encode(idx.ravel(), 2)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", 2, 2)
    out += bytes([0x00, 0, 0])                 # no GCT
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2)
    out += bytes([0x80 | 0x00])                # LCT flag, 2 entries
    out += pal.tobytes()
    out += bytes([2])                          # min code size
    out += bytes([len(lzw)]) + lzw + b"\x00"
    out += b"\x3b"
    assert (decode_gif(bytes(out)) == pal[idx]).all()


def test_malformed_streams_raise():
    rng = np.random.default_rng(19)
    px = rng.integers(0, 256, (5, 5), dtype=np.uint8)
    p = bytearray(encode_gif(px))
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTAGIF" + bytes(p))
    with pytest.raises(ValueError):
        decode_gif(bytes(p[:40]))              # truncated in the GCT
    with pytest.raises(ValueError):
        decode_gif(bytes(p[:-10]))             # truncated sub-blocks
    # frame with no color table at all
    bare = bytearray(p)
    bare[10] &= 0x7F                           # clear the GCT flag
    del bare[13:13 + 768]
    with pytest.raises(ValueError, match="color table"):
        decode_gif(bytes(bare))
    # unknown top-level block
    bad = p[:13 + 768] + b"\x7f" + p[13 + 768:]
    with pytest.raises(ValueError, match="unknown GIF block"):
        decode_gif(bytes(bad))


def test_decode_image_dispatches_gif():
    from aresdb_spark.operators.multimodal import decode_image

    px = np.array([[7, 200], [0, 255]], dtype=np.uint8)
    out = decode_image(encode_gif(px))
    assert out.dtype == np.float32 and out.shape == (2, 2, 3)
    assert (out[:, :, 0] == px.astype(np.float32)).all()


def test_decode_stats_three_formats(spark):
    """One decode_stats pass over PNG + JPEG + GIF payloads — dispatch
    by magic bytes inside the Arrow batch, each against its formula."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M

    ids = spark.range(0, 30).select(F.col("id").alias("media_id"))
    png = M.synthetic_png_media(ids.filter(F.col("media_id") % 3 == 0))
    jpg = M.synthetic_jpeg_media(ids.filter(F.col("media_id") % 3 == 1))
    gif = M.synthetic_gif_media(ids.filter(F.col("media_id") % 3 == 2))
    stats = {r["media_id"]: r.asDict()
             for r in M.decode_stats(
                 png.unionByName(jpg).unionByName(gif)).collect()}
    assert len(stats) == 30
    for d in range(2, 30, 3):                  # the GIF rows
        h, w = 4 + d % 7, 4 + 1 + d % 11
        vals = [(d * 19 + x * 7 + y * 13) % 256
                for y in range(h) for x in range(w)]
        s = stats[d]
        assert (s["width"], s["height"], s["channels"]) == (w, h, 3)
        assert s["n_px"] == 3 * len(vals)
        assert s["px_sum"] == 3 * sum(vals)
        assert s["px_min"] == min(vals) and s["px_max"] == max(vals)


def test_gif_roundtrip_property():
    """Hypothesis: ANY uint8 image round-trips exactly through any
    combination of encoder flags — GIF is lossless end to end."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**31),
           st.booleans(), st.sampled_from([255, 5]),
           st.sampled_from([0, 2]))
    def run(h, w, seed, interlace, bs, ce):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        out = decode_gif(encode_gif(px, interlace=interlace,
                                    block_size=bs, clear_every=ce))
        assert (out == np.stack([px] * 3, axis=2)).all()

    run()


def test_lzw_roundtrip_property():
    """Hypothesis: raw LZW over any index stream and min-code-size."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.integers(2, 8), st.integers(0, 2**31), st.integers(1, 400),
           st.sampled_from([0, 3]))
    def run(mcs, seed, n, ce):
        rng = np.random.default_rng(seed)
        seq = rng.integers(0, 1 << mcs, n).astype(np.uint8)
        out = lzw_decode(lzw_encode(seq, mcs, clear_every=ce), mcs,
                         expected=n)
        assert (out == seq).all()

    run()


# -- resize transform (r11, lives in multimodal; tested here with the
# GIF source it composes with in the contract row) -----------------------------


def test_resize_image_nearest_and_box():
    from aresdb_spark.operators.multimodal import resize_image

    rng = np.random.default_rng(61)
    px = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    out = resize_image(px, 3, 5)
    for y in range(3):
        for x in range(5):
            assert out[y, x] == px[(y * 9) // 3, (x * 13) // 5]
    # upscale via nearest repeats samples
    up = resize_image(px, 18, 13)
    assert (up[::2] == px).all() and (up[1::2] == px).all()
    # box: exact round-half-up mean
    quad = np.array([[1, 2], [3, 5]], dtype=np.uint8)
    assert resize_image(quad, 1, 1, "box")[0, 0] == 3   # 11/4 -> 2.75 -> 3
    rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    box = resize_image(rgb, 4, 4, "box")
    s = rgb.reshape(4, 2, 4, 2, 3).astype(np.int64).sum(axis=(1, 3))
    assert (box == ((2 * s + 4) // 8)).all()
    with pytest.raises(ValueError, match="integer factors"):
        resize_image(px, 4, 5, "box")
    with pytest.raises(ValueError, match="method"):
        resize_image(px, 3, 5, "bicubic")


def test_resize_media_composes_across_codecs(spark):
    """decode (GIF) -> resize -> re-encode PNG -> decode_stats: the
    composed pipeline matches a per-id Python replica."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M

    ids = spark.range(0, 16).select(F.col("id").alias("media_id"))
    stats = {r["media_id"]: r.asDict()
             for r in M.decode_stats(M.resize_media(
                 M.synthetic_gif_media(ids), 4, 6)).collect()}
    assert len(stats) == 16
    for d in range(16):
        h, w = 4 + d % 7, 5 + d % 11
        vals = [(d * 19 + ((x * w) // 6) * 7 + ((y * h) // 4) * 13) % 256
                for y in range(4) for x in range(6)]
        s = stats[d]
        assert (s["width"], s["height"], s["channels"]) == (6, 4, 3)
        assert s["n_px"] == 72 and s["px_sum"] == 3 * sum(vals)
        assert s["px_min"] == min(vals) and s["px_max"] == max(vals)


# -- image near-dup dedup via DCT pHash (r11, multimodal) ----------------------


def test_dct_phash_invariances():
    """pHash fundamentals: identical pixels hash identically across
    encoders; a small local retouch moves few bits; distinct blocky
    patterns sit far apart (the separation the planted oracle relies
    on)."""
    from aresdb_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from aresdb_spark.operators.multimodal import (_blocky_pattern,
                                                   dct_phash, decode_png,
                                                   encode_png)

    def ham(a, b):
        return bin(a ^ b).count("1")

    base = _blocky_pattern(7)
    # cross-encoder: block-constant pattern survives JPEG exactly
    assert dct_phash(decode_png(encode_png(base))) \
        == dct_phash(decode_jpeg(encode_jpeg(base)))
    # mild global brightness shift: low-frequency STRUCTURE unchanged
    brighter = np.clip(base.astype(np.int64) + 10, 0, 255).astype(np.uint8)
    assert ham(dct_phash(base), dct_phash(brighter)) <= 8
    # separation across 40 distinct seeds
    hs = [dct_phash(_blocky_pattern(s)) for s in range(40)]
    worst = min(ham(a, b) for i, a in enumerate(hs)
                for b in hs[i + 1:])
    assert worst >= 16
    # RGB equal-channel equals its grayscale
    rgb = np.stack([base] * 3, axis=2)
    assert dct_phash(rgb) == dct_phash(base)


def test_image_near_duplicates_finds_planted_pairs(spark):
    """End-to-end over the r12 mixed corpus (JPEG twins, palette-PNG
    twins, single-tile edits): the distributed banded pipeline must
    reproduce the driver-side brute-force all-pairs enumeration
    EXACTLY — including non-zero-Hamming edit pairs (recall) and the
    exclusion of edits beyond max_hamming."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M

    ids = spark.range(0, 45).select(F.col("id").alias("media_id"))
    pairs = M.image_near_duplicates(
        M.synthetic_near_dup_images(ids)).collect()
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs}
    want = set(M.image_near_dup_oracle_pairs(45, max_hamming=7))
    assert got == want
    # the corpus must actually exercise the recall gap VERDICT r11 #2
    # named: at least one planted pair at NON-ZERO Hamming found, and
    # every Hamming-0 twin present
    assert any(h > 0 for _, _, h in want)
    assert {(a, b) for a, b, h in want if h == 0} <= {(a, b) for a, b, _ in got}
    # threshold 0 keeps exactly the identical-hash twins
    exact = M.image_near_duplicates(
        M.synthetic_near_dup_images(ids), max_hamming=0).collect()
    assert {(r["id_a"], r["id_b"]) for r in exact} \
        == {(a, b) for a, b, h in want if h == 0}


def test_image_near_duplicates_recall_guarantee_enforced(spark):
    """r12 (VERDICT r11 #2): max_hamming >= bands voids the pigeonhole
    recall guarantee (a pair can dirty every band) — the operator must
    REFUSE it, not silently under-report; and a planted single-tile
    edit at a real non-zero Hamming distance must be found through the
    full pipeline with its exact distance."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from aresdb_spark.operators import multimodal as M

    df = spark.createDataFrame([], T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType())]))
    with pytest.raises(ValueError, match="pigeonhole"):
        M.image_near_duplicates(df, max_hamming=8, bands=8)
    with pytest.raises(ValueError, match="pigeonhole"):
        M.image_near_duplicates(df, max_hamming=10, bands=4)

    # a non-zero-Hamming edit pair, alone, end-to-end: pigeonhole says
    # some 8-bit band survives <8 flips untouched, so it MUST collide
    base = M._blocky_pattern(4)           # g=2's pattern (seed 2g)
    edit = M._blocky_edited(4, 2)
    d = bin(M.dct_phash(base) ^ M.dct_phash(edit)).count("1")
    assert 1 <= d <= 7                    # the measured planted distance
    two = spark.createDataFrame(
        [(0, M.encode_png(base)), (1, M.encode_png(edit))],
        T.StructType([T.StructField("media_id", T.LongType()),
                      T.StructField("payload", T.BinaryType())]))
    got = M.image_near_duplicates(two).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in got} == {(0, 1, d)}


def test_image_near_duplicates_hashes_once(spark):
    """Scale shape: the banded self-join must read MATERIALIZED hashes
    on both sides — zero MapInPandas nodes in the executed join plan
    (without the checkpoint the decode+hash would run once PER SIDE)."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M

    ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
    pairs = M.image_near_duplicates(M.synthetic_near_dup_images(ids))
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


def test_gif_anim_compositing_disposal_and_transparency():
    """Animated GIF (r14): GCE semantics — transparent-index elision,
    dispose-to-transparent (2) and restore-previous (3) — composited
    on the logical screen; probe reads delays/disposal/loop."""
    from aresdb_spark.operators import gif as G

    f0 = ((np.arange(7 * 9) * 3) % 256).astype(np.uint8).reshape(7, 9)
    sub = ((np.arange(3 * 4) * 5 + 2) % 256).astype(np.uint8) \
        .reshape(3, 4)
    pl = G.encode_gif_anim(
        [(0, 0, f0, 10, 0, None), (2, 1, sub, 20, 2, None),
         (0, 0, f0, 5, 3, None)], 9, 7, loop_count=3)
    p = G.gif_anim_probe(pl)
    assert (p["n_frames"], p["loop_count"]) == (3, 3)
    assert p["frames"][1]["disposal"] == 2
    frames, delays = G.decode_gif_anim(pl)
    assert delays == [10, 20, 5]
    g0 = np.stack([f0] * 3, axis=2)
    exp1 = g0.copy()
    exp1[1:4, 2:6] = np.stack([sub] * 3, axis=2)
    assert np.array_equal(frames[0], g0)
    assert np.array_equal(frames[1], exp1)
    # disposal 2 cleared the rect; frame 2 repaints the full screen
    assert np.array_equal(frames[2], g0) and frames[2].shape[2] == 3
    # transparency elides pixels; over a bare canvas the output is RGBA
    idx = np.array([[7, 1], [2, 7]], np.uint8)
    fr, _ = G.decode_gif_anim(G.encode_gif_anim(
        [(0, 0, idx, 10, 0, 7)], 4, 4))
    assert fr[0].shape == (4, 4, 4)
    assert fr[0][0, 0, 3] == 0 and fr[0][0, 1, 3] == 255


def test_gif_anim_stats_match_formula_twin():
    """The codec pipeline (encode GIF89a -> GCE walk -> LZW decode ->
    composite) reproduces the codec-free numpy twin — the invariant
    the multimodal_gif_anim contract row's SQL oracle leans on."""
    from aresdb_spark.operators import gif as G

    for d in [0, 1, 2, 3, 5, 8, 13, 97, 194, 2047]:
        w, h, frames = G._gif_anim_frame_specs(d)
        pl = G.encode_gif_anim(frames, w, h, loop_count=d % 4)
        fr, delays = G.decode_gif_anim(pl)
        meta = G.gif_anim_probe(pl)
        px_sum = sum(int(f[:, :, :3].astype(np.int64).sum())
                     for f in fr)
        got = (len(fr), meta["width"], meta["height"],
               int(sum(delays)), px_sum)
        assert got == G.gif_anim_oracle_stats(d), d


def test_gif_anim_routes_to_video_fingerprint():
    """An animated-GIF container twin fingerprints identically to the
    MJPEG MP4 clip carrying the same frames — the r14 fifth container
    of the video near-dup family."""
    from aresdb_spark.operators import gif as G
    from aresdb_spark.operators import video as V
    from aresdb_spark.operators.jpeg import encode_jpeg

    frames = V.near_dup_video_frames(0)
    mp4 = V.encode_mp4_mjpeg([encode_jpeg(f) for f in frames], 64, 64)
    anim = G.encode_gif_anim([(0, 0, f, 4, 0, None) for f in frames],
                             64, 64)
    assert V.video_fingerprint(V.decode_video_frames(mp4)) \
        == V.video_fingerprint(V.decode_video_frames(anim))
