"""Clean-room lossless-WebP (VP8L) codec (operators/webp.py): exact
round trips across the feature matrix (VP8L is lossless), transform
inverses, LZ77/cache/prefix-code internals, dispatcher integration and
named scope errors."""

import struct

import numpy as np
import pytest

from aresdb_spark.operators.webp import (_DIST_MAP, _lz77_code,
                                         _BitReader, _BitWriter,
                                         _ct_delta, _PrefixCode,
                                         _read_lz77_value, decode_webp,
                                         encode_webp)


def test_bit_io_and_lz77_value_coding():
    bw = _BitWriter()
    for v, n in ((0x2F, 8), (5, 3), (1, 1), (1023, 14)):
        bw.write(v, n)
    br = _BitReader(bw.bytes())
    assert [br.read(8), br.read(3), br.read(1), br.read(14)] \
        == [0x2F, 5, 1, 1023]
    # every LZ77 value round-trips through (code, extra, nbits)
    for value in list(range(1, 70)) + [120, 121, 1000, 4096]:
        code, extra, nbits = _lz77_code(value)
        bw = _BitWriter()
        bw.write(extra, nbits)
        assert _read_lz77_value(_BitReader(bw.bytes() or b"\0"),
                                code) == value


def test_prefix_code_canonical_and_single():
    lengths = [0] * 10
    lengths[2], lengths[5], lengths[7], lengths[9] = 1, 2, 3, 3
    code = _PrefixCode(lengths)
    bw = _BitWriter()
    for sym in (2, 9, 5, 7, 2):
        code.encode(bw, sym)
    br = _BitReader(bw.bytes())
    assert [code.decode(br) for _ in range(5)] == [2, 9, 5, 7, 2]
    single = _PrefixCode([0, 0, 1, 0])
    assert single.decode(_BitReader(b"")) == 2    # 0-bit reads
    with pytest.raises(ValueError, match="over-subscribed"):
        _PrefixCode([1, 1, 1])


def test_webp_roundtrip_matrix():
    """Literals, runs, subtract-green, all 14 predictor modes, every
    palette bundling width, color cache, RGBA, edge shapes."""
    rng = np.random.default_rng(4)

    def check(px, **kw):
        out = decode_webp(encode_webp(px, **kw))
        assert out.shape == px.shape and np.array_equal(out, px), kw

    for ch in (3, 4):
        px = rng.integers(0, 256, (9, 7, ch), dtype=np.uint8)
        if ch == 4:
            px[0, 0, 3] = 200                     # keep alpha non-trivial
        check(px, use_lz77=False)
        check(px)
    check(np.repeat(rng.integers(0, 256, (6, 4, 3), dtype=np.uint8),
                    5, axis=1))                   # distance-1 runs
    check(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8),
          subtract_green=True)
    for mode in range(14):
        check(rng.integers(0, 256, (20, 19, 3), dtype=np.uint8),
              predictor=mode)
    for n_colors in (2, 3, 4, 9, 16, 17, 200):   # all bundling widths
        pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        check(pal[rng.integers(0, n_colors, (10, 13))], palette=True)
    px = np.tile(rng.integers(0, 256, (1, 5, 3), dtype=np.uint8),
                 (7, 3, 1))
    check(px, cache_bits=4, use_lz77=False)
    check(px, cache_bits=6)
    check(rng.integers(0, 256, (17, 11, 3), dtype=np.uint8),
          subtract_green=True, predictor=7)      # composed transforms
    for shape in [(1, 1, 3), (1, 8, 3), (8, 1, 3)]:
        check(rng.integers(0, 256, shape, dtype=np.uint8), predictor=11)


def test_webp_scope_and_table_shape():
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(b"RIFF" + struct.pack("<I", 12) + b"WEBP"
                    + b"VP8 " + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="no VP8L"):
        decode_webp(b"RIFF" + struct.pack("<I", 4) + b"WEBP")
    # the short-distance map is format-checked: 120 unique in-range
    # offsets, and the first entries (the ones the spec examples pin)
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)
    assert len(set(_DIST_MAP)) == 120
    # signed fixed-point color-transform delta
    assert _ct_delta(0, 100) == 0
    assert _ct_delta(255, 2) == (-1 * 2) >> 5    # 255 = -1 as int8
    assert _ct_delta(64, 64) == (64 * 64) >> 5


def test_webp_through_dispatcher_and_stats(spark):
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    out = M.decode_image(encode_webp(px))
    assert out.dtype == np.float32 and np.array_equal(
        out, px.astype(np.float32))

    ids = spark.range(0, 18).select(F.col("id").alias("media_id"))
    rows = {r["media_id"]: r.asDict()
            for r in M.decode_stats(
                M.synthetic_webp_media(ids)).collect()}
    assert len(rows) == 18
    for d in range(18):
        w, h, m = 5 + d % 7, 4 + d % 5, d % 6
        ch = 4 if m == 5 else 3
        i = np.arange(w * h * ch)
        if m == 1:
            vals = (d * 7 + ((i // 3) // w) * 31 + (i % 3) * 11) % 256
        elif m == 4:
            k = (d + i // 3) % 4
            kc = np.array([37, 59, 83])[i % 3]
            vals = (k * kc + (i % 3) + d) % 256
        else:
            vals = (d * 7 + i * 31) % 256
        s = rows[d]
        assert (s["width"], s["height"], s["channels"]) == (w, h, ch), d
        assert s["px_sum"] == int(vals.sum()), d
        assert s["px_min"] == int(vals.min()) \
            and s["px_max"] == int(vals.max()), d


def test_webp_twin_in_near_dup_corpus(spark):
    """The pHash dedup corpus's odd-g container twins are WebP VP8L:
    same pixels, same hash, found at Hamming 0 through the full
    pipeline (container diversity is the point of the corpus)."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators import multimodal as M

    # group g=1 (ids 3..5): role-1 twin is WebP (g odd, g % 3 == 1)
    ids = spark.range(3, 6).select(F.col("id").alias("media_id"))
    payloads = {r["media_id"]: bytes(r["payload"])
                for r in M.synthetic_near_dup_images(ids).collect()}
    assert payloads[4][:4] == b"RIFF" and payloads[4][8:12] == b"WEBP"
    pairs = M.image_near_duplicates(M.synthetic_near_dup_images(ids)) \
        .collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs} \
        == {(3, 4, 0)}


def test_predictor_right_edge_and_truncation_spec():
    """Pin the two spec behaviors ADVICE r12 flagged: (a) at the
    rightmost column TR is the LEFTMOST pixel of the CURRENT row
    (libwebp stores rows contiguously so top[1] of the last column
    aliases row y, column 0 — NOT T); (b) mode-13
    ClampAddSubtractHalf computes (ave - TL) / 2 with C truncation
    toward zero, not Python floor. Forward prediction here is written
    by hand from the spec so a decoder regression cannot hide behind
    a mirrored encoder."""
    from aresdb_spark.operators.webp import (_inverse_predictor,
                                             _predict, _Transform)

    def v(*c):
        return np.array(c + (0,) * (4 - len(c)), np.int64)

    # (b): ave=10, TL=13 -> d=-3; trunc(-3/2) = -1 -> 9 (floor gives 8)
    assert _predict(13, v(10), v(10), v(13), v(0))[0] == 9
    # and positive d unchanged: ave=13, TL=10 -> 13 + 1 = 14
    assert _predict(13, v(13), v(13), v(10), v(0))[0] == 14

    # (a): hand-built spec-rule residuals for every TR-using mode,
    # recovered exactly by _inverse_predictor (3x-wide so x == w-1
    # has x > 0 and a decoded out[y, 0] to alias)
    rng = np.random.default_rng(7)
    w = 3
    for mode in (3, 5, 9, 10, 13):
        px = rng.integers(0, 256, (4, w, 4), dtype=np.uint8) \
                .astype(np.int64)
        res = np.zeros_like(px)
        for y in range(4):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = np.array([255, 0, 0, 0], np.int64)
                elif y == 0:
                    pred = px[0, x - 1]
                elif x == 0:
                    pred = px[y - 1, 0]
                else:
                    TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                    pred = _predict(mode, px[y, x - 1], px[y - 1, x],
                                    px[y - 1, x - 1], TR)
                res[y, x] = (px[y, x] - pred) % 256
        t = _Transform("predictor", size_bits=4,
                       data=np.full((1, 1), mode, np.int64))
        out = _inverse_predictor(res.astype(np.uint8), t)
        assert np.array_equal(out, px.astype(np.uint8)), mode


def test_limited_code_lengths_fallback_kraft_complete():
    """The fixed-width fallback over a non-power-of-two alphabet must
    emit a Kraft-COMPLETE code (sum 2^-len == 1): spec-strict decoders
    such as libwebp reject incomplete prefix codes (ADVICE r12)."""
    from fractions import Fraction

    from aresdb_spark.operators.webp import (_limited_code_lengths,
                                             _PrefixCode)

    for n in (3, 5, 6, 7, 9, 11, 33, 100):
        # powers-of-two histogram -> Huffman depth n-1 > cap -> fallback
        hist = [1 << i for i in range(n)]
        cap = max(7, (n - 1).bit_length() + 1)
        assert cap < n - 1 or n <= cap  # fallback fires for n > cap+1
        lengths = _limited_code_lengths(hist, cap)
        assert max(lengths) <= cap
        kraft = sum(Fraction(1, 2 ** ln) for ln in lengths if ln)
        assert kraft == 1, (n, lengths)
        # and the canonical builder accepts it (no over-subscription)
        _PrefixCode(lengths)


# CPython's shipped test fixture Lib/test/test_email/data/python.webp
# (PSF-licensed test data): a REAL libwebp-encoded lossy+alpha WebP —
# VP8X container, VP8L-compressed ALPH plane, lossy VP8 color plane.
# External validation data this repo did not encode.
_PYTHON_WEBP_B64 = """\
UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucY
X+ffKpmImP90cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2
bUYvTsZ2PLbtd/uvKa4hov9J0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGD
txoynjaCfx0pfk52CPuInrOR75lzRugygtv4zEiy90UwfSD9NheMITJWLaXWayO8
XeOlWRXVnIGk2W6WdYoYMQ+KqixQNPowgt+6a1BSKbUtz+lUFAoBAAAAVlA4IL4A
AACQAgCdASoQABAAAwA0JbACdDBPCIUMfAMdCCz96AD+/XSg/QKbH4r3Q3ycN/bS
DK/T/zVo4u6nvclvG/SqxWOuup+XhN9BojvaW+Tv+MvxvX/hr/o/5Qns9LtmX/+q
Kdl/yWznhuasl7nkxvSTI4xf3Y85VSB/lU/8Ofj/b9JrA+ifvIOYZm2x1RP/dhfm
sf5diuSfR7+z+r/+HR3zEo/+XM/B+vkYw73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA"""


def _python_webp() -> bytes:
    import base64
    return base64.b64decode(_PYTHON_WEBP_B64)


def test_real_libwebp_fixture_probe_and_alpha_plane():
    """Pin a REAL libwebp-produced file end-to-end: webp_probe reads
    the VP8X canvas + flags and the lossy VP8 key-frame header, and
    decode_webp_alpha decodes the VP8L-compressed ALPH plane through
    the SAME entropy/prefix-code engine the lossless path uses —
    external validation that the clean-room VP8L decoder (incl. the
    r13 right-edge TR and mode-13 truncation fixes) reads data it did
    not encode. The alpha checksum is pinned; the plane is the Python
    logo silhouette."""
    import hashlib

    from aresdb_spark.operators import webp as W

    fix = _python_webp()
    assert hashlib.md5(fix).hexdigest() == "d4d9cee903091f613295efe4b5935689"
    p = W.webp_probe(fix)
    assert p["kind"] == "extended" and p["has_alpha"] \
        and (p["width"], p["height"]) == (16, 16) \
        and p["chunks"] == ["VP8X", "ALPH", "VP8 "]
    body = dict(zip(p["chunks"], [b for _, b in W._webp_chunks(fix)]))
    hdr = W.vp8_frame_header(body["VP8 "])
    assert hdr["key_frame"] and (hdr["width"], hdr["height"]) == (16, 16)
    a = W.decode_webp_alpha(fix)
    assert a.shape == (16, 16) and int(a.sum()) == 38971 \
        and a.min() == 0 and a.max() == 255
    # the color plane stays an honest raise naming the chunk
    with pytest.raises(NotImplementedError, match="VP8"):
        W.decode_webp(fix)


def test_alph_filter_compression_matrix_roundtrip():
    """encode_alph -> decode_alph across all 4 spec filtering methods
    x both compression modes (raw / headerless VP8L), exact."""
    from aresdb_spark.operators import webp as W

    rng = np.random.default_rng(3)
    for filt in range(4):
        for comp in (0, 1):
            alpha = rng.integers(0, 256, (11, 17), dtype=np.uint8)
            blob = W.encode_alph(alpha, filtering=filt, compression=comp)
            out = W.decode_alph(blob, 17, 11)
            assert np.array_equal(out, alpha), (filt, comp)
    # scope errors name the offender
    with pytest.raises(ValueError, match="compression method 2"):
        W.decode_alph(bytes([2]) + b"\0" * 8, 2, 2)
    with pytest.raises(ValueError, match="truncated raw"):
        W.decode_alph(bytes([0]) + b"\0" * 3, 4, 4)
    with pytest.raises(ValueError, match="no VP8X\\+ALPH"):
        W.decode_webp_alpha(b"RIFF\x04\x00\x00\x00WEBP")


def test_webp_probe_all_container_kinds():
    """webp_probe reads lossless VP8L headers, lossy key-frame tags
    (incl. the 0x9D012A start-code check) and VP8X extended flags
    without any pixel decode."""
    from aresdb_spark.operators import webp as W

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    p = W.webp_probe(encode_webp(px))
    assert p["kind"] == "lossless" and (p["width"], p["height"]) == (4, 4)
    stub = W.vp8_key_frame_stub(640, 480)
    hdr = W.vp8_frame_header(stub)
    assert hdr == {"key_frame": True, "version": 0, "show_frame": 1,
                   "first_partition_len": 0, "width": 640,
                   "width_scale": 0, "height": 480, "height_scale": 0}
    bad = bytearray(stub)
    bad[3] = 0x9C
    with pytest.raises(ValueError, match="start code"):
        W.vp8_frame_header(bytes(bad))
    ext = W.encode_webp_extended(
        np.full((5, 7), 9, np.uint8), W.vp8_key_frame_stub(7, 5))
    pe = W.webp_probe(ext)
    assert pe["kind"] == "extended" and (pe["width"], pe["height"]) == (7, 5)
    assert np.array_equal(W.decode_webp_alpha(ext), np.full((5, 7), 9))


def test_vp8l_inside_vp8x_extended_container_decodes():
    """decode_webp's chunk walk finds a VP8L chunk behind a VP8X
    header (lossless images in extended containers — the docstring's
    claim, pinned): same pixels as the bare container."""
    from aresdb_spark.operators import webp as W

    px = np.arange(60, dtype=np.uint8).reshape(5, 4, 3)
    bare = W.encode_webp(px)
    chunks = dict(W._webp_chunks(bare))
    vp8l = chunks[b"VP8L"]

    def chunk(cid, body):
        out = cid + struct.pack("<I", len(body)) + body
        return out + (b"\0" if len(body) % 2 else b"")

    vp8x = bytes([0, 0, 0, 0]) + (4 - 1).to_bytes(3, "little") \
        + (5 - 1).to_bytes(3, "little")
    payload = chunk(b"VP8X", vp8x) + chunk(b"VP8L", vp8l)
    ext = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" \
        + payload
    assert np.array_equal(W.decode_webp(ext), px)
    p = W.webp_probe(ext)
    assert p["kind"] == "extended" and (p["width"], p["height"]) == (4, 5)


def test_webp_anim_roundtrip_compositing_and_probe():
    """Animated WebP (r14): ANMF frame walk + canvas compositing —
    full-canvas overwrite, subrect paste, dispose-to-background, and
    the probe's metadata (loop count, BGRA->RGBA background, frame
    rects/durations/flags) against hand-built expectations."""
    from aresdb_spark.operators import webp as W

    f0 = ((np.arange(8 * 10 * 3).reshape(8, 10, 3) * 7) % 256) \
        .astype(np.uint8)
    sub = ((np.arange(4 * 6 * 3).reshape(4, 6, 3) * 3 + 9) % 256) \
        .astype(np.uint8)
    pl = W.encode_webp_anim(
        [(0, 0, f0, 100, 1, 1), (2, 2, sub, 80, 1, 0)], 10, 8,
        background_rgba=(9, 8, 7, 255), loop_count=4)
    meta = W.webp_anim_probe(pl)
    assert (meta["width"], meta["height"], meta["n_frames"],
            meta["loop_count"]) == (10, 8, 2, 4)
    assert meta["background_rgba"] == (9, 8, 7, 255)
    assert meta["frames"][0]["duration_ms"] == 100
    assert meta["frames"][0]["dispose_bg"] == 1
    assert meta["frames"][1]["chunks"] == ["VP8L"]
    frames, durs = W.decode_webp_anim(pl)
    assert durs == [100, 80]
    assert np.array_equal(frames[0], f0)
    # dispose-to-background fires AFTER frame 0 displays: frame 1's
    # canvas is the bg color with the subrect painted over it
    exp = np.full((8, 10, 3), (9, 8, 7), np.uint8)
    exp[2:6, 2:8] = sub
    assert np.array_equal(frames[1], exp)
    # probing a still container raises
    with pytest.raises(ValueError, match="animation"):
        W.webp_anim_probe(W.encode_webp(f0))


def test_webp_anim_alpha_blending_spec_formula():
    """Blended (non-opaque) frames follow the container spec's
    non-premultiplied compositing formula, checked against an
    independent scalar computation."""
    from aresdb_spark.operators import webp as W

    base = np.zeros((2, 3, 4), np.uint8)
    base[..., 2] = 200
    base[..., 3] = 255
    top = np.zeros((2, 3, 4), np.uint8)
    top[..., 0] = 100
    top[..., 3] = 128
    pl = W.encode_webp_anim(
        [(0, 0, base, 10, 1, 0), (0, 0, top, 10, 0, 0)], 3, 2)
    frames, _ = W.decode_webp_anim(pl)
    sa, da = 128 / 255.0, 1.0
    oa = sa + da * (1 - sa)
    exp_r = round(100 * sa / oa)
    exp_b = round(200 * da * (1 - sa) / oa)
    got = frames[1][0, 0]
    assert got.shape == (3,)           # composite is fully opaque
    assert abs(int(got[0]) - exp_r) <= 1
    assert got[1] == 0
    assert abs(int(got[2]) - exp_b) <= 1


def test_webp_anim_stats_match_formula_twin():
    """The codec pipeline (encode VP8L frames -> ANMF walk -> decode ->
    composite) reproduces the codec-free numpy twin for the graded
    corpus class — the invariant the multimodal_webp_anim contract
    row's SQL oracle leans on."""
    from aresdb_spark.operators import webp as W

    for d in [0, 1, 2, 3, 5, 8, 13, 41, 82, 123, 4096]:
        w, h, frames, bg, loop = W._anim_frame_specs(d)
        pl = W.encode_webp_anim(frames, w, h, background_rgba=bg,
                                loop_count=loop)
        fr, durs = W.decode_webp_anim(pl)
        meta = W.webp_anim_probe(pl)
        px_sum = sum(int(f[:, :, :3].astype(np.int64).sum()) for f in fr)
        got = (len(fr), meta["loop_count"], meta["width"],
               meta["height"], int(sum(durs)), px_sum)
        assert got == W.webp_anim_oracle_stats(d), d


def test_webp_anim_routes_to_video_fingerprint():
    """An animated-WebP container twin carrying the SAME frames as an
    MJPEG MP4 clip fingerprints identically (Hamming 0) — the r14
    fourth container of the video near-dup family."""
    from aresdb_spark.operators import video as V
    from aresdb_spark.operators import webp as W

    frames = V.near_dup_video_frames(0)
    mp4 = V.encode_mp4_mjpeg(
        [__import__("aresdb_spark.operators.jpeg",
                    fromlist=["encode_jpeg"]).encode_jpeg(f)
         for f in frames], 64, 64)
    anim = W.encode_webp_anim(
        [(0, 0, np.stack([f] * 3, axis=2), 40, 1, 0) for f in frames],
        64, 64)
    fa = V.video_fingerprint(V.decode_video_frames(mp4))
    fb = V.video_fingerprint(V.decode_video_frames(anim))
    assert fa == fb


def test_vp8l_meta_entropy_groups_decode():
    """Hand-written VP8L body with a META ENTROPY IMAGE (two spatial
    groups over 4-px tiles) — the one VP8L decode feature the repo
    encoder never emits (real libwebp files do; spec: group index =
    (red << 8) | green of the meta pixel at (x >> bits, y >> bits)).
    Pins the r15 fast path: list-indexed per-pixel group lookup with
    incremental (x, y) counters, and the shared 8-byte window across a
    mid-row group switch."""
    from aresdb_spark.operators.webp import (_BitReader, _BitWriter,
                                             _decode_image_data,
                                             _write_prefix_code)

    def lengths(alphabet, *syms):
        ln = [0] * alphabet
        for s in syms:
            ln[s] = 1
        return ln

    w, h = 8, 4
    bw = _BitWriter()
    bw.write(0, 1)                          # no color cache
    bw.write(1, 1)                          # meta prefix image present
    bw.write(0, 3)                          # meta_bits = 0 + 2 (4x4 tiles)
    # --- meta image (mw=2, mh=1), read with allow_meta=False ---
    bw.write(0, 1)                          # meta image: no color cache
    _write_prefix_code(bw, lengths(256 + 24, 0, 1))   # green: ids {0,1}
    _write_prefix_code(bw, lengths(256, 0))           # r single -> 0-bit
    _write_prefix_code(bw, lengths(256, 0))           # b
    _write_prefix_code(bw, lengths(256, 0))           # a
    _write_prefix_code(bw, lengths(40, 0))            # dist
    bw.write(0, 1)                          # meta px 0: green sym 0
    bw.write(1, 1)                          # meta px 1: green sym 1
    # --- main image: 2 groups, read in group-id order ---
    _write_prefix_code(bw, lengths(256 + 24, 10))     # g0: green {10}
    _write_prefix_code(bw, lengths(256, 20))          # g0: r {20}
    _write_prefix_code(bw, lengths(256, 30))          # g0: b {30}
    _write_prefix_code(bw, lengths(256, 255))         # g0: a {255}
    _write_prefix_code(bw, lengths(40, 0))            # g0: dist
    _write_prefix_code(bw, lengths(256 + 24, 40, 41))  # g1: green {40,41}
    _write_prefix_code(bw, lengths(256, 50))          # g1: r {50}
    _write_prefix_code(bw, lengths(256, 60))          # g1: b {60}
    _write_prefix_code(bw, lengths(256, 254))         # g1: a {254}
    _write_prefix_code(bw, lengths(40, 0))            # g1: dist
    # pixel data: per row, cols 0-3 are group 0 (all 0-bit codes, no
    # bits), cols 4-7 group 1 (one green bit per pixel: 0,1,0,1)
    for _ in range(h):
        for bit in (0, 1, 0, 1):
            bw.write(bit, 1)

    px = _decode_image_data(_BitReader(bw.bytes()), w, h, True)
    px = px.reshape(h, w, 4)                # [a, r, g, b]
    for y in range(h):
        for x in range(4):                  # left tile: group 0
            assert tuple(px[y, x]) == (255, 20, 10, 30), (y, x)
        for i, x in enumerate(range(4, 8)):  # right tile: group 1
            assert tuple(px[y, x]) == (254, 50, 40 + (i & 1), 60), (y, x)
