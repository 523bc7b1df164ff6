"""Clean-room WAV (RIFF PCM) codec (operators/audio.py) + its Spark
wiring — the audio analog of test_jpeg.py: exact round trips (PCM is
lossless), spec-rule coverage (chunk skipping, word alignment, sample
widths, channels), honest scope rejections, and the audio_stats
pipeline against the integer formula."""

import struct

import numpy as np
import pytest

from aresdb_spark.operators.audio import (audio_stats, decode_wav,
                                          encode_wav,
                                          synthetic_wav_media)


def test_pcm16_roundtrips_exactly_mono_and_stereo():
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, 777, dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and out.shape == (777, 1)
    assert (out[:, 0] == s).all()

    s2 = rng.integers(-32768, 32768, (100, 2), dtype=np.int16)
    out, rate = decode_wav(encode_wav(s2, 8000))
    assert out.shape == (100, 2) and (out == s2).all()


def test_pcm8_centers_to_signed():
    s8 = np.arange(0, 256, dtype=np.int16)
    out, _ = decode_wav(encode_wav(s8, bits=8))
    assert out.min() == -128 and out.max() == 127
    assert (out[:, 0] == np.arange(256) - 128).all()


def test_unknown_chunks_skip_by_size_with_word_alignment():
    s = np.arange(10, dtype=np.int16)
    b = bytearray(encode_wav(s))
    i = b.find(b"data")
    # odd-sized LIST chunk: the RIFF spec pads to word alignment
    extra = b"LIST" + struct.pack("<I", 7) + b"1234567" + b"\x00"
    b2 = b[:i] + extra + b[i:]
    b2[4:8] = struct.pack("<I", len(b2) - 8)
    out, _ = decode_wav(bytes(b2))
    assert (out[:, 0] == s).all()


def test_out_of_scope_formats_raise_named_errors():
    s = np.zeros(4, dtype=np.int16)
    payload = bytearray(encode_wav(s))
    i = bytes(payload).find(b"fmt ")
    # format tag 0x31 = GSM 6.10 (a perceptual coder, unlike the
    # implemented ADPCM family)
    gsm = bytearray(payload)
    gsm[i + 8] = 0x31
    with pytest.raises(NotImplementedError, match="0x31"):
        decode_wav(bytes(gsm))
    # format tag 85 = MP3-in-WAV
    mp3 = bytearray(payload)
    mp3[i + 8] = 85
    with pytest.raises(NotImplementedError, match="0x55"):
        decode_wav(bytes(mp3))
    # an off-spec PCM width stays a named reject (24/32 decode now)
    p20 = bytearray(payload)
    p20[i + 22] = 20
    with pytest.raises(NotImplementedError, match="20-bit"):
        decode_wav(bytes(p20))
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(bytes(payload[: len(payload) // 2]))


def test_audio_stats_matches_formula(spark):
    from pyspark.sql import functions as F

    ids = spark.range(0, 30).select(F.col("id").alias("media_id"))
    stats = {r["media_id"]: r.asDict()
             for r in audio_stats(synthetic_wav_media(ids)).collect()}
    assert len(stats) == 30
    for d in range(30):
        n = 64 + d % 33
        vals = [(d * 97 + i * 61) % 2001 - 1000 for i in range(n)]
        rate = 8000 * (1 + d % 2)
        s = stats[d]
        assert s["n_samples"] == n and s["channels"] == 1
        assert s["sample_rate"] == rate
        assert s["duration_ms"] == n * 1000 // rate
        assert s["amp_sum"] == sum(vals)
        assert s["amp_min"] == min(vals) and s["amp_max"] == max(vals)
        assert s["abs_sum"] == sum(abs(v) for v in vals)


def test_pcm_roundtrip_property():
    """Hypothesis: ANY int16 sample array round-trips exactly (PCM is
    lossless) across channel counts and rates."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
           st.integers(1, 4), st.sampled_from([8000, 16000, 44100]))
    def run(vals, ch, rate):
        n = (len(vals) // ch) * ch
        if n == 0:
            return
        s = np.array(vals[:n], dtype=np.int16).reshape(-1, ch)
        out, r = decode_wav(encode_wav(s, rate))
        assert r == rate and (out == s).all()

    run()


# -- IEEE float + IMA ADPCM (r11) ---------------------------------------------


def test_float_wav_roundtrips_exactly():
    """Dyadic rationals k/256 are exact in float32, so both widths
    round-trip bit-for-bit; decode always returns float64."""
    from aresdb_spark.operators.audio import encode_wav_float

    k = (np.arange(77) * 53) % 4001 - 2000
    for bits in (32, 64):
        out, rate = decode_wav(encode_wav_float(k / 256.0, 22050, bits=bits))
        assert rate == 22050 and out.dtype == np.float64
        assert (out.ravel() * 256 == k).all()
    # stereo de-interleave
    st = np.stack([k / 256.0, -k / 256.0], axis=1)
    out, _ = decode_wav(encode_wav_float(st, bits=32))
    assert out.shape == (77, 2) and (out == st).all()


def test_extensible_guid_dispatch():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves the real format from the
    SubFormat GUID's first two bytes (PCM here); an unknown GUID tag is
    a named reject."""
    s = np.arange(-5, 5, dtype=np.int16)
    payload = bytearray(encode_wav(s, 8000))
    i = bytes(payload).find(b"fmt ")
    (size,) = struct.unpack("<I", bytes(payload[i + 4:i + 8]))
    assert size == 16
    # rewrite the fmt chunk as extensible: tag 0xFFFE, cbSize 22,
    # valid bits 16, mask 0, SubFormat GUID leading with the PCM tag
    old = bytes(payload[i + 8:i + 8 + 16])
    guid = struct.pack("<H", 1) + b"\x00\x00" + bytes(12)
    new_fmt = struct.pack("<H", 0xFFFE) + old[2:] \
        + struct.pack("<HHI", 22, 16, 0) + guid
    rebuilt = payload[:i + 4] + struct.pack("<I", len(new_fmt)) \
        + new_fmt + payload[i + 8 + 16:]
    rebuilt[4:8] = struct.pack("<I", len(rebuilt) - 8)
    out, rate = decode_wav(bytes(rebuilt))
    assert rate == 8000 and (out[:, 0] == s).all()
    # unknown sub-format (0x99) -> named reject
    bad = bytearray(rebuilt)
    j = bytes(bad).find(guid)
    bad[j] = 0x99
    with pytest.raises(NotImplementedError, match="0x99"):
        decode_wav(bytes(bad))


def test_adpcm_roundtrip_tracks_signal():
    """IMA ADPCM is lossy: decode(encode(x)) must track x within the
    local step size for a band-limited signal, across block boundaries
    (505-sample blocks), and reproduce the length exactly when the
    signal fills whole blocks."""
    from aresdb_spark.operators.audio import encode_adpcm_wav

    rng = np.random.default_rng(11)
    x = np.cumsum(rng.integers(-60, 60, 1010)).clip(-30000, 30000)
    out, rate = decode_wav(encode_adpcm_wav(x, 8000, samples_per_block=505))
    assert rate == 8000 and out.shape == (1010, 1)
    assert np.abs(out.ravel() - x).max() < 1500


def test_adpcm_state_machine_golden():
    """Spec goldens from (pred=0, index=0, step=7): nibble 0x4 gives
    diff = (step>>3) + step = 0 + 7 = 7 and the index walks +2; nibble
    0xF (sign + all magnitude bits) gives -((step>>3) + step + step>>1
    + step>>2) = -(0+7+3+1) = -11 with the index walking +8."""
    from aresdb_spark.operators.audio import _ima_decode_nibble

    assert _ima_decode_nibble(0, 0, 0x4) == (7, 2)
    pred, idx = _ima_decode_nibble(0, 0, 0xF)
    assert pred == -(7 + 3 + 1 + 0) and idx == 8
    # int16 clamp both directions
    assert _ima_decode_nibble(32760, 88, 0x7)[0] == 32767
    assert _ima_decode_nibble(-32760, 88, 0xF)[0] == -32768
    # index clamp at the floor
    assert _ima_decode_nibble(0, 0, 0x0)[1] == 0


def test_adpcm_multichannel_rejected_named():
    # stereo decodes (r11); >2 channels stays a named reject
    from aresdb_spark.operators.audio import _fmt_chunk, _riff

    fmt = _fmt_chunk(0x11, 3, 8000, 768, 4, struct.pack("<HH", 2, 505))
    with pytest.raises(NotImplementedError, match="3-channel"):
        decode_wav(_riff(fmt, bytes(768)))


def test_audio_stats_mixed_formats(spark):
    """One audio_stats pass over PCM + float + ADPCM payloads in one
    table: per-format decode dispatch inside the Arrow batch, float
    stats in exact Q8.8 units, ADPCM stats replayed Python-side."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators.audio import (_ima_decode_nibble,
                                              synthetic_adpcm_wav_media,
                                              synthetic_float_wav_media)

    ids = spark.range(0, 30).select(F.col("id").alias("media_id"))
    pcm = synthetic_wav_media(ids.filter(F.col("media_id") % 3 == 0))
    flt = synthetic_float_wav_media(ids.filter(F.col("media_id") % 3 == 1))
    adp = synthetic_adpcm_wav_media(ids.filter(F.col("media_id") % 3 == 2))
    stats = {r["media_id"]: r.asDict()
             for r in audio_stats(
                 pcm.unionByName(flt).unionByName(adp)).collect()}
    assert len(stats) == 30
    for d in range(30):
        s = stats[d]
        if d % 3 == 0:
            n = 64 + d % 33
            vals = [(d * 97 + i * 61) % 2001 - 1000 for i in range(n)]
        elif d % 3 == 1:
            n = 48 + d % 29
            vals = [(d * 89 + i * 53) % 4001 - 2000 for i in range(n)]
        else:
            pred, idx = (d * 31) % 1001 - 500, d % 89
            vals = [pred]
            for i in range(40 + 2 * (d % 13)):
                pred, idx = _ima_decode_nibble(pred, idx,
                                               (d * 7 + i * 5) % 16)
                vals.append(pred)
            n = len(vals)
        assert s["n_samples"] == n, d
        assert s["amp_sum"] == sum(vals), d
        assert s["amp_min"] == min(vals) and s["amp_max"] == max(vals), d
        assert s["abs_sum"] == sum(abs(v) for v in vals), d


def test_float_dyadic_roundtrip_property():
    """Hypothesis: any dyadic k/256 sample list round-trips exactly at
    both float widths and any channel count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aresdb_spark.operators.audio import encode_wav_float

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(-2 ** 20, 2 ** 20), min_size=1,
                    max_size=48),
           st.integers(1, 3), st.sampled_from([32, 64]))
    def run(ks, ch, bits):
        n = (len(ks) // ch) * ch
        if n == 0:
            return
        s = np.array(ks[:n], dtype=np.float64).reshape(-1, ch) / 256.0
        out, _ = decode_wav(encode_wav_float(s, bits=bits))
        assert (out == s).all()

    run()


def test_adpcm_tracking_property():
    """Hypothesis: for any smooth-ish signal (bounded first difference),
    the codec's reconstruction error stays within a conservative bound
    derived from the max step (the coder can always catch up within a
    few samples at 1.1x step growth)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aresdb_spark.operators.audio import encode_adpcm_wav

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.integers(-300, 300), min_size=2, max_size=200),
           st.integers(-20000, 20000))
    def run(steps, start):
        x = (start + np.cumsum(steps)).clip(-32768, 32767)
        out, _ = decode_wav(encode_adpcm_wav(x, 8000,
                                             samples_per_block=201))
        got = out.ravel()[:len(x)]
        assert np.abs(got - x).max() <= 4000

    run()


def test_pcm_24_and_32_bit_roundtrip():
    """24-bit (3-byte LE, manual widening + sign extension) and 32-bit
    PCM are lossless round trips, mono and stereo."""
    rng = np.random.default_rng(21)
    v24 = rng.integers(-(1 << 23), 1 << 23, 100)
    out, rate = decode_wav(encode_wav(v24, 48000, bits=24))
    assert rate == 48000 and (out.ravel() == v24).all()
    # sign-extension edges
    edges = np.array([-(1 << 23), (1 << 23) - 1, -1, 0, 1])
    assert (decode_wav(encode_wav(edges, bits=24))[0].ravel()
            == edges).all()
    st = np.stack([v24, -v24 - 1], axis=1)
    assert (decode_wav(encode_wav(st, bits=24))[0] == st).all()
    v32 = rng.integers(-(1 << 31), (1 << 31) - 1, 100)
    assert (decode_wav(encode_wav(v32, bits=32))[0].ravel() == v32).all()


def test_adpcm_stereo_roundtrip_tracks_both_channels():
    """Stereo IMA ADPCM: per-channel headers + 4-byte/8-nibble group
    interleave; each channel's state machine is independent, so both
    reconstructions track their own signal."""
    from aresdb_spark.operators.audio import encode_adpcm_wav

    rng = np.random.default_rng(23)
    x = np.stack([
        np.cumsum(rng.integers(-60, 60, 1000)).clip(-30000, 30000),
        np.cumsum(rng.integers(-60, 60, 1000)).clip(-30000, 30000),
    ], axis=1)
    out, rate = decode_wav(encode_adpcm_wav(x, 8000,
                                            samples_per_block=489))
    assert rate == 8000 and out.shape[1] == 2
    assert np.abs(out[:1000] - x).max() < 1500
    # a hard-panned signal must NOT leak across the group interleave:
    # silent right channel stays identically at its header predictor
    pan = np.stack([x[:, 0], np.full(1000, 123)], axis=1)
    out, _ = decode_wav(encode_adpcm_wav(pan, 8000,
                                         samples_per_block=489))
    assert np.abs(out[:1000, 1] - 123).max() <= 2
    # 3 channels stay a named reject
    with pytest.raises(NotImplementedError, match="3-channel"):
        encode_adpcm_wav(np.zeros((16, 3)), samples_per_block=9)
    # stereo block size must make whole 4-byte groups
    with pytest.raises(ValueError, match="4-byte"):
        encode_adpcm_wav(np.zeros((16, 2)), samples_per_block=7)


def test_audio_window_stats_formula_and_edges(spark):
    """Windowed framing over the PCM formula payloads: boundaries, the
    short tail window, and the pair-belongs-to-its-window crossing rule
    all match a brute-force replica; a float payload windows in Q8.8."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators.audio import (audio_window_stats,
                                              synthetic_float_wav_media)

    ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
    rows = audio_window_stats(synthetic_wav_media(ids), window=16).collect()
    got = {(r["media_id"], r["win_idx"]): (r["n"], r["amp_sum"],
                                           r["abs_sum"], r["amp_min"],
                                           r["amp_max"], r["zero_cross"])
           for r in rows}
    expect = {}
    for d in range(12):
        n = 64 + d % 33
        v = [(d * 97 + i * 61) % 2001 - 1000 for i in range(n)]
        for wi in range(-(-n // 16)):
            seg = v[wi * 16:(wi + 1) * 16]
            zc = sum(1 for i in range(wi * 16 + 1, min((wi + 1) * 16, n))
                     if v[i] * v[i - 1] < 0)
            expect[(d, wi)] = (len(seg), sum(seg),
                               sum(abs(x) for x in seg), min(seg),
                               max(seg), zc)
    assert got == expect
    # float payloads window in exact Q8.8 units
    frows = audio_window_stats(
        synthetic_float_wav_media(ids.limit(3)), window=16).collect()
    d0 = [r for r in frows if r["media_id"] == 0]
    k = [(0 * 89 + i * 53) % 4001 - 2000 for i in range(48)]
    assert sum(r["amp_sum"] for r in d0) == sum(k)


def test_g711_goldens_and_byte_roundtrip():
    """ITU-T G.711 reference points: µ-law 0xFF/0x7F are ±0, 0x80 is
    +32124 (max); A-law 0xD5/0x55 are ±8, 0xAA is +32256 (max). Every
    A-law code survives compress(expand(byte)); µ-law has the spec's
    one ±0 ambiguity (0x7F re-encodes as the canonical 0xFF)."""
    from aresdb_spark.operators.audio import (alaw_compress, alaw_expand,
                                              mulaw_compress, mulaw_expand)

    assert mulaw_expand(np.array([0xFF]))[0] == 0
    assert mulaw_expand(np.array([0x7F]))[0] == 0
    assert mulaw_expand(np.array([0x80]))[0] == 32124
    assert mulaw_expand(np.array([0x00]))[0] == -32124
    assert alaw_expand(np.array([0xD5]))[0] == 8
    assert alaw_expand(np.array([0x55]))[0] == -8
    assert alaw_expand(np.array([0xAA]))[0] == 32256
    assert alaw_expand(np.array([0x2A]))[0] == -32256
    allb = np.arange(256, dtype=np.uint8)
    assert (alaw_compress(alaw_expand(allb)) == allb).all()
    mu = mulaw_compress(mulaw_expand(allb))
    assert (mu[allb != 0x7F] == allb[allb != 0x7F]).all()
    assert mu[0x7F] == 0xFF


def test_g711_wav_roundtrip_error_is_segment_bounded():
    """decode(encode(x)) error is bounded by half the local segment
    interval — companding is coarse but monotone."""
    from aresdb_spark.operators.audio import decode_wav, encode_g711_wav

    rng = np.random.default_rng(31)
    x = rng.integers(-30000, 30000, 3000)
    for law in ("mulaw", "alaw"):
        out, rate = decode_wav(encode_g711_wav(x, 8000, law=law))
        assert rate == 8000 and out.shape == (3000, 1)
        err = np.abs(out.ravel() - x)
        # interval at |v| is ~|v|/16 (4 mantissa bits per segment)
        assert (err <= np.maximum(np.abs(x) // 16 + 1, 132)).all(), law
    # stereo de-interleave
    st = np.stack([x[:100], -x[:100]], axis=1)
    out, _ = decode_wav(encode_g711_wav(st, law="alaw"))
    assert out.shape == (100, 2)


def test_g711_synthetic_formula_matches_expansion(spark):
    """The generator's byte formula decoded through the Spark stats
    pipeline equals the closed-form expansion replica (both laws)."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators.audio import (alaw_expand, mulaw_expand,
                                              synthetic_g711_wav_media)

    ids = spark.range(0, 10).select(F.col("id").alias("media_id"))
    rows = {r["media_id"]: r.asDict()
            for r in audio_stats(synthetic_g711_wav_media(ids)).collect()}
    for d in range(10):
        n = 56 + d % 21
        b = ((d * 3 + np.arange(n) * 17) % 256).astype(np.uint8)
        v = mulaw_expand(b) if d % 2 == 0 else alaw_expand(b)
        s = rows[d]
        assert s["n_samples"] == n and s["sample_rate"] == 8000
        assert s["amp_sum"] == int(v.sum())
        assert s["amp_min"] == int(v.min()) and s["amp_max"] == int(v.max())
        assert s["abs_sum"] == int(np.abs(v).sum())


def test_msadpcm_roundtrip_all_predictors():
    """MS ADPCM: decode(encode(x)) tracks x across block boundaries for
    every one of the 7 standard coefficient pairs; the two seed samples
    per block are exact."""
    from aresdb_spark.operators.audio import encode_msadpcm_wav

    rng = np.random.default_rng(43)
    x = np.cumsum(rng.integers(-80, 80, 1100)).clip(-30000, 30000)
    for pred in range(7):
        out, rate = decode_wav(encode_msadpcm_wav(
            x, 8000, samples_per_block=500, predictor=pred))
        assert rate == 8000
        got = out.ravel()[:1100]
        assert (got[0], got[1]) == (x[0], x[1])
        # predictor (0,0) predicts zero — coarser but still bounded
        bound = 600 if pred == 2 else 200
        assert np.abs(got - x).max() < bound, pred


def test_msadpcm_stereo_and_edges():
    from aresdb_spark.operators.audio import encode_msadpcm_wav

    rng = np.random.default_rng(47)
    st = np.stack([
        np.cumsum(rng.integers(-50, 50, 600)).clip(-30000, 30000),
        np.cumsum(rng.integers(-50, 50, 600)).clip(-30000, 30000),
    ], axis=1)
    out, _ = decode_wav(encode_msadpcm_wav(st, samples_per_block=500,
                                           predictor=1))
    assert out.shape[1] == 2
    assert np.abs(out[:600] - st).max() < 200
    with pytest.raises(NotImplementedError, match="3-channel"):
        encode_msadpcm_wav(np.zeros((16, 3)), samples_per_block=10)


def test_msadpcm_synthetic_formula_matches_replica(spark):
    """The generator's formula nibble stream decoded through the Spark
    stats pipeline equals a Python replica of the state machine — the
    same replay the SQL oracle performs."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators.audio import (_msadpcm_step,
                                              MSADPCM_COEFS,
                                              synthetic_msadpcm_wav_media)

    ids = spark.range(0, 14).select(F.col("id").alias("media_id"))
    rows = {r["media_id"]: r.asDict()
            for r in audio_stats(
                synthetic_msadpcm_wav_media(ids)).collect()}
    for d in range(14):
        c1, c2 = MSADPCM_COEFS[d % 7]
        s1, s2 = (d * 29) % 2001 - 1000, (d * 37) % 2001 - 1000
        delta = 16 + (d * 13) % 300
        vals = [s2, s1]
        for i in range(30 + 2 * (d % 11)):
            new, s1, s2, delta = _msadpcm_step(
                s1, s2, delta, c1, c2, (d * 11 + i * 7) % 16)
            vals.append(new)
        s = rows[d]
        assert s["n_samples"] == len(vals)
        assert s["amp_sum"] == sum(vals), d
        assert s["amp_min"] == min(vals) and s["amp_max"] == max(vals)
        assert s["abs_sum"] == sum(abs(v) for v in vals)


def test_msadpcm_predictor_truncates_toward_zero():
    """r12 (ADVICE): the MS ADPCM prediction divides by 256 with C
    TRUNCATION toward zero, like the spec and ffmpeg/libsndfile — a
    floor shift gives -8 where truncation gives -7 on negative sums."""
    from aresdb_spark.operators.audio import _mspred, _msadpcm_step

    assert _mspred(-1900, 0, 256, 0) == -1900   # identity pair is exact
    # c1=1 isolates the division: q = -1900 -> trunc -7 (floor is -8)
    assert _mspred(-1900, 0, 1, 0) == -7
    assert (-1900) >> 8 == -8                  # the floor the fix removed
    assert _mspred(1900, 0, 1, 0) == 7         # positive side unchanged
    # through the step: predictor (0,0) never divides; (256,0) exact;
    # a mixed pair with negative sum shows the one-LSB repair
    new, *_ = _msadpcm_step(-5, -5, 16, 460, -208, 0)
    q = -5 * 460 + -5 * -208                   # -1260 -> trunc -4
    assert new == max(-32768, min(32767, -(1260 >> 8)))


def test_adpcm_fact_chunk_trims_encoder_padding():
    """r12 (ADVICE): a 538-sample input must decode to 538 samples, not
    the padded block multiple — the fact chunk is authoritative for
    both ADPCM families."""
    from aresdb_spark.operators.audio import (encode_adpcm_wav,
                                              encode_msadpcm_wav)

    rng = np.random.default_rng(5)
    x = np.cumsum(rng.integers(-60, 60, 538)).clip(-30000, 30000)
    out, _ = decode_wav(encode_adpcm_wav(x, 8000, samples_per_block=505))
    assert out.shape == (538, 1)
    assert np.abs(out.ravel() - x).max() < 1500
    out, _ = decode_wav(encode_msadpcm_wav(x, 8000, samples_per_block=500))
    assert out.shape == (538, 1)
    # stereo too (whole 4-byte nibble groups; 160 frames in 105-sample blocks)
    st = np.stack([x[:160], -x[:160]], axis=1)
    out, _ = decode_wav(encode_adpcm_wav(st, 8000, samples_per_block=105))
    assert out.shape == (160, 2)


def test_adpcm_short_final_block_decodes_and_torn_header_raises():
    """r12 (ADVICE): a truncated final block decodes the samples it
    actually holds; a block shorter than its own header is a torn file
    and raises instead of being silently dropped."""
    from aresdb_spark.operators.audio import (_fmt_chunk, _riff,
                                              _ima_decode_nibble)

    # one full IMA block would be 4 + 4 nibbles/2 = 6 bytes for
    # samples_per_block=5; ship header + ONE data byte (2 nibbles)
    header = struct.pack("<hBB", 100, 0, 0)
    fmt = _fmt_chunk(0x11, 1, 8000, 6, 4, struct.pack("<HH", 2, 5))
    out, _ = decode_wav(_riff(fmt, header + bytes([0x21])))
    pred, idx = 100, 0
    want = [pred]
    for nib in (0x1, 0x2):                     # low nibble first
        pred, idx = _ima_decode_nibble(pred, idx, nib)
        want.append(pred)
    assert out.ravel().tolist() == want
    # 3 bytes < the 4-byte header: torn
    with pytest.raises(Exception, match="torn"):
        decode_wav(_riff(fmt, header[:3]))
    # MS ADPCM torn header (block_align 8, 5 bytes < 7-byte header)
    extra = struct.pack("<HHH", 32, 4, 7)
    from aresdb_spark.operators.audio import MSADPCM_COEFS
    for a, b in MSADPCM_COEFS:
        extra += struct.pack("<hh", a, b)
    fmt2 = _fmt_chunk(2, 1, 8000, 8, 4, extra)
    with pytest.raises(Exception, match="torn"):
        decode_wav(_riff(fmt2, bytes(5)))


def test_aiff_roundtrip_matrix():
    """r12: AIFF/AIFF-C decode — big-endian PCM at every depth, sowt
    little-endian, fl32 dyadics, G.711 via the shared expanders, and
    the 80-bit extended-float sample rate."""
    from aresdb_spark.operators.audio import (_f80_pack, _f80_unpack,
                                              alaw_compress, alaw_expand,
                                              decode_aiff, encode_aiff,
                                              mulaw_compress, mulaw_expand)

    for r in (8000, 11025, 16000, 44100, 48000, 96000):
        assert _f80_unpack(_f80_pack(r)) == r
    rng = np.random.default_rng(2)
    x = rng.integers(-30000, 30000, (101, 2)).astype(np.int64)
    for bits in (8, 16, 24, 32):
        xx = (x >> 8) if bits == 8 else x
        out, rate = decode_aiff(encode_aiff(xx, 44100, bits=bits))
        assert rate == 44100 and np.array_equal(out, xx), bits
    out, _ = decode_aiff(encode_aiff(x, 8000, compression=b"sowt"))
    assert np.array_equal(out, x)
    k = rng.integers(-2000, 2000, (50, 1))
    out, _ = decode_aiff(encode_aiff(k / 256.0, 16000,
                                     compression=b"fl32"))
    assert (out == k / 256.0).all()
    for law, comp, exp in ((b"ulaw", mulaw_compress, mulaw_expand),
                           (b"alaw", alaw_compress, alaw_expand)):
        out, _ = decode_aiff(encode_aiff(x[:, 0], 8000, compression=law))
        assert np.array_equal(out.ravel(), exp(comp(x[:, 0]))), law


def test_aiff_scope_errors_and_dispatch():
    from aresdb_spark.operators.audio import (decode_aiff, decode_audio,
                                              encode_aiff)

    x = np.arange(40) - 20
    blob = bytearray(encode_aiff(x, 8000, compression=b"sowt"))
    i = bytes(blob).find(b"sowt")
    blob[i:i + 4] = b"ima4"
    with pytest.raises(NotImplementedError, match="ima4"):
        decode_aiff(bytes(blob))
    # Ogg stays an unknown container; fLaC now DISPATCHES to the real
    # decoder (r12, operators/flac.py) — a garbage stream errors from
    # inside the codec, never silently
    with pytest.raises(NotImplementedError, match="4f676753"):
        decode_audio(b"OggS\x00\x00\x00\x00stream")
    with pytest.raises(ValueError, match="STREAMINFO"):
        decode_audio(b"fLaC\x00\x00\x00\x00stream")
    with pytest.raises(ValueError, match="COMM"):
        decode_aiff(b"FORM\x00\x00\x00\x04AIFF")
    # dispatch: WAV and AIFF through the same audio_stats entry point
    out, rate = decode_audio(encode_aiff(x, 8000))
    assert rate == 8000 and np.array_equal(out.ravel(), x)


def test_aiff_stats_pipeline_matches_formula(spark):
    """The Spark audio_stats pass over the mixed AIFF corpus equals the
    generator formulas (the same replay the SQL oracle performs)."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators.audio import (mulaw_expand,
                                              synthetic_aiff_media)

    ids = spark.range(0, 18).select(F.col("id").alias("media_id"))
    rows = {r["media_id"]: r.asDict()
            for r in audio_stats(synthetic_aiff_media(ids)).collect()}
    assert len(rows) == 18
    for d in range(18):
        n, v = 40 + d % 17, d % 6
        rate = 8000 * (1 + d % 2)
        ch = 2 if v == 0 else 1
        i = np.arange(n * ch)
        if v in (0, 3):
            vals = (d * 97 + i * 61) % 2001 - 1000
        elif v == 1:
            vals = (d * 97 + i * 61) % 255 - 127
        elif v == 2:
            vals = (d * 97 + i * 61) % 200001 - 100000
        elif v == 4:
            vals = (d * 89 + i * 53) % 4001 - 2000
        else:
            vals = mulaw_expand(((d * 3 + i * 17) % 256).astype(np.uint8))
        s = rows[d]
        assert (s["n_samples"], s["channels"], s["sample_rate"]) \
            == (n, ch, rate), d
        assert s["duration_ms"] == n * 1000 // rate
        assert s["amp_sum"] == int(vals.sum()), d
        assert s["amp_min"] == int(vals.min()) \
            and s["amp_max"] == int(vals.max()), d
        assert s["abs_sum"] == int(np.abs(vals).sum()), d


def test_audio_fingerprint_and_decode_dispatch():
    """The 64-bit energy-delta fingerprint is a pure function of the
    PCM content: identical samples through WAV, FLAC and AIFF
    containers fingerprint identically; unknown magics raise naming
    the bytes (strict-decode rule)."""
    import numpy as np
    import pytest

    from aresdb_spark.operators import audio as A
    from aresdb_spark.operators.flac import encode_flac

    s = A.near_dup_audio_samples(0)
    fp = A.audio_fingerprint(s)
    for blob in (A.encode_wav(s, 16000),
                 encode_flac(s, 16000, block_size=1024, fixed_order=2),
                 A.encode_aiff(s, 16000)):
        dec, _ = A.decode_audio(blob)
        assert A.audio_fingerprint(dec) == fp, blob[:4]
    with pytest.raises(NotImplementedError, match="4f676753"):
        A.decode_audio(b"OggS" + b"\0" * 32)
    # stereo mono-mix and float Q15 quantization are deterministic
    st = np.stack([s, s], axis=1)
    assert A.audio_fingerprint(st) == fp
    assert A.audio_fingerprint(s.astype(np.float64) / 32767.0) == fp


def test_audio_near_dup_corpus_planted_distances():
    """The corpus plants all three duplicate shapes at MEASURED
    distances: container twins (FLAC / AIFF vs WAV base) at Hamming 0,
    edited twins at 1-10 straddling the max_hamming=7 threshold, and
    independent clips >= 16 bits apart — so the graded row proves
    recall at non-zero distances AND exclusion beyond threshold."""
    import itertools

    from aresdb_spark.operators import audio as A

    fps = [A.audio_fingerprint(A.near_dup_audio_samples(d))
           for d in range(90)]

    def ham(a, b):
        return bin(fps[a] ^ fps[b]).count("1")

    twins, edits = [], []
    for g in range(30):
        (edits if g % 3 == 2 else twins).append(ham(3 * g, 3 * g + 1))
    assert set(twins) == {0}
    assert all(1 <= h <= 10 for h in edits), edits
    assert any(h <= 7 for h in edits) and any(h > 7 for h in edits)
    plant = {(3 * g, 3 * g + 1) for g in range(30)}
    floor = min(ham(a, b)
                for a, b in itertools.combinations(range(90), 2)
                if (a, b) not in plant)
    assert floor >= 16, floor


def test_audio_near_duplicates_pipeline_matches_oracle(spark):
    """End-to-end: the banded-LSH pipeline over the mixed
    WAV/FLAC/AIFF corpus reproduces the brute-force all-pairs oracle
    exactly, with ZERO MapInPandas in the self-join plan (the
    fingerprint stage is localCheckpointed — same double-decode guard
    as image_near_duplicates)."""
    from pyspark.sql import functions as F

    from aresdb_spark.operators import audio as A

    ids = spark.range(0, 90).select(F.col("id").alias("media_id"))
    media = A.synthetic_near_dup_audio(ids)
    # container mix is real: FLAC twin in group 0, AIFF twin in group 1
    pl = {r["media_id"]: bytes(r["payload"])
          for r in media.filter(F.col("media_id") < 6).collect()}
    assert pl[1][:4] == b"fLaC" and pl[4][:4] == b"FORM"
    result = A.audio_near_duplicates(media)
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in result.collect()}
    assert got == set(A.audio_near_dup_oracle_pairs(90))


def test_audio_near_dup_guarantee_enforced():
    """max_hamming >= bands voids the pigeonhole recall guarantee and
    must raise (shared banded_hamming_pairs contract)."""
    import pytest

    from aresdb_spark.operators.multimodal import banded_hamming_pairs

    with pytest.raises(ValueError, match="pigeonhole"):
        banded_hamming_pairs(None, "afp", max_hamming=8, bands=8)
    with pytest.raises(ValueError, match="divide"):
        banded_hamming_pairs(None, "afp", max_hamming=3, bands=7)


def test_au_roundtrip_matrix():
    """Sun/NeXT AU (r14): signed big-endian PCM 8/16/24/32, float
    32/64, annotation-padded data offsets, mono and stereo."""
    from aresdb_spark.operators.audio import decode_au, encode_au

    rng = np.random.default_rng(31)
    for enc, lim in [(2, 127), (3, 30000), (4, 2 ** 23 - 1),
                     (5, 2 ** 31 - 1)]:
        for shape in ((50,), (25, 2)):
            s = rng.integers(-lim, lim, shape)
            out, rate = decode_au(
                encode_au(s, 11025, encoding=enc, annotation=b"note"))
            assert rate == 11025
            assert np.array_equal(out.reshape(shape), s), (enc, shape)
    k = rng.integers(-2000, 2000, (40,))
    for enc in (6, 7):
        out, _ = decode_au(encode_au(k / 256.0, 8000, encoding=enc))
        assert np.array_equal(out.ravel(), k / 256.0), enc


def test_au_g711_raw_streams_and_size_field():
    """raw_bytes G.711 corpora decode through the shared WAV/AIFF
    expanders; the header's data-size field TRUNCATES trailing bytes
    and 0xFFFFFFFF means read-to-EOF (spec)."""
    import struct

    from aresdb_spark.operators.audio import (alaw_expand, decode_au,
                                              encode_au, mulaw_expand)

    raw = bytes((i * 17) % 256 for i in range(64))
    out, _ = decode_au(encode_au(None, 8000, encoding=1, raw_bytes=raw))
    assert np.array_equal(
        out.ravel(), mulaw_expand(np.frombuffer(raw, np.uint8)))
    out, _ = decode_au(encode_au(None, 8000, encoding=27, raw_bytes=raw))
    assert np.array_equal(
        out.ravel(), alaw_expand(np.frombuffer(raw, np.uint8)))

    blob = bytearray(encode_au(None, 8000, encoding=1, raw_bytes=raw))
    blob[8:12] = struct.pack(">I", 10)              # size < payload
    out, _ = decode_au(bytes(blob))
    assert out.shape == (10, 1)
    blob[8:12] = b"\xff\xff\xff\xff"                # unknown size
    out, _ = decode_au(bytes(blob))
    assert out.shape == (64, 1)


def test_au_scope_errors_and_dispatch():
    import struct

    from aresdb_spark.operators.audio import (decode_au, decode_audio,
                                              encode_au)

    with pytest.raises(ValueError, match="not an AU"):
        decode_au(b"snd." + b"\0" * 24)
    blob = bytearray(encode_au(np.arange(8), 8000))
    blob[15] = 23                                   # encoding 23 = G.721
    with pytest.raises(NotImplementedError, match="encoding 23"):
        decode_au(bytes(blob))
    blob = bytearray(encode_au(np.arange(8), 8000))
    blob[4:8] = struct.pack(">I", 4)                # offset < 24
    with pytest.raises(ValueError, match="offset"):
        decode_au(bytes(blob))
    # the audio dispatcher routes .snd and audio_stats grades it
    out, rate = decode_audio(encode_au(np.arange(8) - 4, 22050))
    assert rate == 22050 and np.array_equal(out.ravel(), np.arange(8) - 4)


def test_au_media_corpus_graded(spark):
    """synthetic_au_media through audio_stats matches the DuckDB
    formula oracle from __spark_entry__ (the driver-gate contract for
    multimodal_au_stats)."""
    import duckdb

    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    q = entry.queries()["multimodal_au_stats"]
    sql = entry.oracle_sql()["multimodal_au_stats"]
    got = q(spark, sf_dir).toPandas().sort_values("media_id") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    exp = con.execute(sql).df().sort_values("media_id") \
        .reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for col in ("n_samples", "channels", "sample_rate", "duration_ms",
                "amp_sum", "amp_min", "amp_max", "abs_sum"):
        assert (got[col].astype("int64")
                == exp[col].astype("int64")).all(), col
