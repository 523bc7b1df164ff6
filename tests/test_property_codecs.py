"""Hypothesis round-trip properties for the r12 codecs: any drawn
image/signal survives encode→decode bit-for-bit under any drawn
parameter combination (every codec here is lossless for the encoded
domain — MJPEG-class lossiness is covered by the block-constant suites
in its own test files)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _img(draw, w, h, ch, depth):
    rng = np.random.default_rng(draw)
    hi = 1 << depth
    shape = (h, w) if ch == 1 else (h, w, ch)
    a = rng.integers(0, hi, shape)
    return a.astype(np.uint8 if depth <= 8 else np.uint16)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 12), st.integers(1, 10),
       st.sampled_from([(1, 1), (1, 2), (1, 4), (1, 8), (1, 16),
                        (3, 8), (3, 16), (2, 8), (2, 16),
                        (4, 8), (4, 16)]),
       st.booleans(), st.sampled_from([0, 1, 2, 3, 4, "mixed"]))
def test_png_any_legal_combo_roundtrips(seed, w, h, chdepth, interlace,
                                        row_filter):
    from aresdb_spark.operators.multimodal import decode_png, encode_png

    ch, depth = chdepth
    px = _img(seed, w, h, ch, depth)
    out = decode_png(encode_png(px, depth=depth, interlace=interlace,
                                row_filter=row_filter))
    assert out.shape == px.shape and np.array_equal(out, px)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 11), st.integers(1, 9),
       st.sampled_from([24, 32, 8, 4, 1]), st.booleans(), st.booleans())
def test_bmp_any_combo_roundtrips(seed, w, h, bits, top_down, rle):
    from aresdb_spark.operators.bmp import decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    if bits in (24, 32):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(px, bit_count=bits,
                                    top_down=top_down))
        assert np.array_equal(out, px)
        return
    n = 1 << bits
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    use_rle = rle and bits in (4, 8)
    out = decode_bmp(encode_bmp(
        idx, bit_count=bits, palette=pal,
        top_down=top_down and not use_rle, rle=use_rle,
        abs_every=2 if use_rle else 0))
    assert np.array_equal(out, pal[idx])


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 10), st.integers(1, 9),
       st.sampled_from(["plain", "lz77", "sg", "pred", "pal", "cache"]),
       st.integers(0, 13))
def test_webp_any_combo_roundtrips(seed, w, h, variant, pred_mode):
    from aresdb_spark.operators.webp import decode_webp, encode_webp

    rng = np.random.default_rng(seed)
    if variant == "pal":
        pal = rng.integers(0, 256, (rng.integers(2, 17), 3),
                           dtype=np.uint8)
        px = pal[rng.integers(0, len(pal), (h, w))]
        out = decode_webp(encode_webp(px, palette=True))
    else:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        kw = {"plain": dict(use_lz77=False), "lz77": {},
              "sg": dict(subtract_green=True),
              "pred": dict(predictor=pred_mode),
              "cache": dict(cache_bits=4)}[variant]
        out = decode_webp(encode_webp(px, **kw))
    assert out.shape == px.shape and np.array_equal(out, px)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10**9), st.integers(2, 400),
       st.sampled_from([8, 16, 24]), st.integers(0, 4),
       st.sampled_from(["indep", "left_side", "right_side", "mid_side"]),
       st.integers(0, 2), st.booleans())
def test_flac_any_combo_roundtrips(seed, n, bps, order, stereo,
                                   porder, escape):
    from aresdb_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    lim = 1 << (bps - 1)
    ch = 2 if stereo != "indep" else rng.integers(1, 3)
    s = rng.integers(-lim, lim, (n, int(ch)), dtype=np.int64)
    # block size must be divisible by 2^porder for the partition walk
    bs = 64
    out, rate = decode_flac(encode_flac(
        s, 22050, bps=bps, block_size=bs, fixed_order=order,
        stereo=stereo, partition_order=porder,
        escape_partitions=escape))
    assert rate == 22050 and out.shape == s.shape \
        and np.array_equal(out, s)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 12), st.integers(1, 10),
       st.sampled_from([1, 5, 32773]), st.sampled_from([1, 2]),
       st.sampled_from([(1, 8), (3, 8), (1, 16), (3, 16)]),
       st.booleans())
def test_tiff_any_combo_roundtrips(seed, w, h, comp, pred, chbits,
                                   tiled):
    from aresdb_spark.operators.tiff import decode_tiff, encode_tiff

    ch, bits = chbits
    px = _img(seed, w, h, ch, bits)
    out = decode_tiff(encode_tiff(
        px, compression=comp, predictor=pred, bits=bits,
        tile=(3, 4) if tiled else None,
        rows_per_strip=0 if tiled else 2))
    assert out.shape == px.shape and np.array_equal(out, px)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 600), st.integers(1, 4),
       st.sampled_from(["wav", "flac", "aiff"]))
def test_audio_fingerprint_invariances(seed, n, scale, container):
    """r13 audio fingerprint properties: invariant under any lossless
    container, under integer amplitude scaling (comparisons are
    preserved exactly), and under stereo duplication (mono-mix of two
    identical channels)."""
    from aresdb_spark.operators import audio as A
    from aresdb_spark.operators.flac import encode_flac

    rng = np.random.default_rng(seed)
    s = rng.integers(-6000, 6000, n).astype(np.int16)
    fp = A.audio_fingerprint(s)
    blob = {"wav": lambda: A.encode_wav(s, 16000),
            "flac": lambda: encode_flac(s, 16000, block_size=256,
                                        fixed_order=1),
            "aiff": lambda: A.encode_aiff(s, 16000)}[container]()
    dec, _ = A.decode_audio(blob)
    assert A.audio_fingerprint(dec) == fp
    assert A.audio_fingerprint((s.astype(np.int64) * scale)) == fp
    assert A.audio_fingerprint(np.stack([s, s], axis=1)) == fp


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10**9), st.integers(2, 6))
def test_video_fingerprint_invariances(seed, n_frames):
    """r13 video fingerprint properties: invariant under equal-RGB
    stacking and under MP4 <-> AVI repacking of the same MJPEG bytes;
    sensitive to frame order whenever frames differ."""
    from aresdb_spark.operators import video as V
    from aresdb_spark.operators.avi import encode_avi
    from aresdb_spark.operators.jpeg import encode_jpeg
    from aresdb_spark.operators.multimodal import _blocky_pattern
    from aresdb_spark.operators.video import encode_mp4_mjpeg

    frames = [_blocky_pattern(seed + f) for f in range(n_frames)]
    fp = V.video_fingerprint(frames)
    assert V.video_fingerprint(
        [np.stack([f] * 3, axis=2) for f in frames]) == fp
    jpegs = [encode_jpeg(f) for f in frames]
    mp4 = V.decode_video_frames(encode_mp4_mjpeg(jpegs, 64, 64))
    avi = V.decode_video_frames(encode_avi(jpegs, 64, 64))
    assert V.video_fingerprint(mp4) == fp
    assert V.video_fingerprint(avi) == fp
    if any(not np.array_equal(frames[0], f) for f in frames[1:]):
        assert V.video_fingerprint(frames[::-1]) != fp


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 12), st.integers(1, 9),
       st.sampled_from([1, 2, 3, 4, 5, 6]), st.booleans())
def test_pnm_any_combo_roundtrips(seed, w, h, kind, wide):
    """r14: any drawn Netpbm payload round-trips — ASCII and binary,
    bitmap/gray/RGB, 8- and 16-bit sample widths."""
    from aresdb_spark.operators.pnm import decode_pnm, encode_pnm

    rng = np.random.default_rng(seed)
    if kind in (1, 4):
        px = rng.integers(0, 2, (h, w)).astype(np.uint8) * 255
        out = decode_pnm(encode_pnm(px, kind))
    elif wide:
        shape = (h, w) if kind in (2, 5) else (h, w, 3)
        px = rng.integers(0, 65536, shape, dtype=np.uint16)
        out = decode_pnm(encode_pnm(px, kind))
        assert out.dtype == np.uint16
    else:
        shape = (h, w) if kind in (2, 5) else (h, w, 3)
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_pnm(encode_pnm(px, kind))
    assert out.shape == px.shape and np.array_equal(out, px)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 11), st.integers(1, 9),
       st.sampled_from([(24, 1), (24, 2), (24, 3), (32, 1), (32, 3),
                        (8, 1), (8, 2), (1, 1)]),
       st.booleans(), st.booleans())
def test_ras_any_combo_roundtrips(seed, w, h, depth_type, pal, runny):
    """r14: Sun raster — every depth x type, odd-width 16-bit row
    padding, run-heavy RLE content, optional colormap."""
    from aresdb_spark.operators.pnm import decode_ras, encode_ras

    depth, rtype = depth_type
    rng = np.random.default_rng(seed)
    if depth in (24, 32):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if runny:
            px[:, : w // 2] = px[:, :1]             # long runs
        assert np.array_equal(
            decode_ras(encode_ras(px, depth=depth, rtype=rtype)), px)
    elif depth == 8 and pal:
        n = int(rng.integers(2, 17))
        palette = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (h, w), dtype=np.uint8)
        out = decode_ras(encode_ras(idx, depth=8, rtype=rtype,
                                    palette=palette))
        assert np.array_equal(out, palette[idx])
    elif depth == 8:
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        if runny:
            px[:, : w // 2] = 0x80                  # escape-heavy RLE
        assert np.array_equal(
            decode_ras(encode_ras(px, depth=8, rtype=rtype)), px)
    else:
        px = rng.integers(0, 2, (h, w)).astype(np.uint8) * 255
        assert np.array_equal(
            decode_ras(encode_ras(px, depth=1, rtype=rtype)), px)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 12), st.integers(1, 9),
       st.sampled_from([1, 3, 4]), st.booleans(), st.booleans(),
       st.booleans())
def test_sgi_any_combo_roundtrips(seed, w, h, z, wide, rle, runny):
    """r14: SGI RGB — verbatim and RLE storage, 1/3/4 channels, 8/16
    bpc, run-heavy scanlines through the repeat packets."""
    from aresdb_spark.operators.pnm import decode_sgi, encode_sgi

    rng = np.random.default_rng(seed)
    shape = (h, w) if z == 1 else (h, w, z)
    if wide:
        px = rng.integers(0, 65536, shape, dtype=np.uint16)
    else:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
    if runny:
        px[:, : w // 2] = px[:, :1]
    out = decode_sgi(encode_sgi(px, storage=1 if rle else 0))
    assert out.dtype == px.dtype and np.array_equal(out, px)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 200),
       st.sampled_from([1, 2]),
       st.sampled_from([2, 3, 4, 5, 6, 7]), st.booleans())
def test_au_any_combo_roundtrips(seed, n, ch, enc, note):
    """r14: Sun AU — PCM 8/16/24/32 and float 32/64, mono/stereo,
    annotation-padded offsets; floats drawn dyadic so equality is
    exact."""
    from aresdb_spark.operators.audio import decode_au, encode_au

    rng = np.random.default_rng(seed)
    shape = (n,) if ch == 1 else (n, ch)
    if enc in (6, 7):
        s = rng.integers(-2 ** 20, 2 ** 20, shape) / 256.0
    else:
        lim = 1 << (8 * (enc - 1) - 1)
        s = rng.integers(-lim, lim, shape)
    out, rate = decode_au(encode_au(
        s, 22050, encoding=enc, annotation=b"x" * 7 if note else b""))
    assert rate == 22050
    assert np.array_equal(out.reshape(shape), s)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**9), st.integers(1, 40), st.integers(1, 9))
def test_xbm_any_bitmap_roundtrips(seed, w, h):
    from aresdb_spark.operators.pnm import decode_xbm, encode_xbm

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 2, (h, w)).astype(np.uint8) * 255
    out = decode_xbm(encode_xbm(px))
    assert out.shape == px.shape and np.array_equal(out, px)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10**9), st.integers(0, 9000))
def test_crc16_lane_split_equals_scalar(seed, n):
    """r15 (combine vectorized as a tree in r16): the K-lane vectorized
    CRC-16 (GF(2) lane split + log2(K) tree combine, flac._crc16) must
    equal the per-byte table loop on any payload, across the
    scalar/vector threshold and at every length alignment vs the
    2-byte/K-lane grid."""
    from aresdb_spark.operators.flac import (_CRC16_FAST_MIN, _crc16,
                                             _crc16_scalar)

    rng = np.random.default_rng(seed)
    # bias half the draws to straddle the fast-path threshold
    if n % 2:
        n = _CRC16_FAST_MIN + (n % 512) - 256
    data = rng.integers(0, 256, max(n, 0), dtype=np.uint8).tobytes()
    assert _crc16(data) == _crc16_scalar(data)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10**9), st.integers(2, 60), st.integers(1, 8),
       st.sampled_from([0.5, 0.95, 0.4, 0.499999, 0.9999995]))
def test_semantic_pair_kernel_equals_bruteforce(seed, n, dim, threshold):
    """r15: _semantic_keep_batched (dim-sequential rank-1 dots, margin
    + Decimal fallback, column blocking) must equal a brute-force
    reference that applies Spark's exact semantics pair by pair:
    fold-ordered float64 dot and norms, dot/(na*nb), BigDecimal
    HALF_UP round to 6dp, >= threshold, dominated = any lower-id twin.
    Vectors are drawn coarse (one decimal place) so near-threshold
    cosines — the margin/Decimal path — actually occur."""
    import pandas as pd

    from aresdb_spark.operators.similarity import (_round6_spark_exact,
                                                   _semantic_keep_batched)

    rng = np.random.default_rng(seed)
    X = np.round(rng.uniform(-1, 1, (n, dim)), 1)
    ids = np.sort(rng.choice(10 * n, size=n, replace=False))
    pdf = pd.DataFrame({"id": ids, "cluster": np.int64(7),
                        "v": [list(map(float, row)) for row in X]})
    # shuffle input row order: the kernel must sort by id itself
    pdf = pdf.sample(frac=1.0, random_state=seed % 2**32)

    got = _semantic_keep_batched(pdf, threshold, dim, "vec_id") \
        .sort_values("vec_id")

    def fold_dot(a, b):
        acc = 0.0
        for d in range(dim):
            acc += float(a[d]) * float(b[d])
        return acc

    nrm = []
    for i in range(n):
        acc = 0.0
        for d in range(dim):
            acc += float(X[i, d]) * float(X[i, d])
        nrm.append(acc ** 0.5)
    dominated = [False] * n
    for b in range(n):
        for a in range(b):
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.float64(fold_dot(X[a], X[b])) \
                    / np.float64(nrm[a] * nrm[b])
            if not np.isfinite(cos):
                # zero-norm rows: IEEE gives ±inf/NaN, Spark's round
                # passes them through — only +inf satisfies >= t
                hit = np.isinf(cos) and cos > 0
            else:
                hit = _round6_spark_exact(float(cos)) >= float(threshold)
            if hit:
                dominated[b] = True
                break
    assert list(got["vec_id"]) == list(ids)
    assert list(got["keep"]) == [not d for d in dominated]
