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
    # format tag 3 = IEEE float
    f3 = bytearray(payload)
    f3[i + 8] = 3
    with pytest.raises(NotImplementedError, match="IEEE-float"):
        decode_wav(bytes(f3))
    # format tag 85 = MP3-in-WAV
    mp3 = bytearray(payload)
    mp3[i + 8] = 85
    with pytest.raises(NotImplementedError, match="format tag 85"):
        decode_wav(bytes(mp3))
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
