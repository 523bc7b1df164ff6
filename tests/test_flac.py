"""Clean-room FLAC codec (operators/flac.py): exact round trips across
the subframe/stereo/partition matrix (FLAC is lossless), CRC and scope
errors, and the Spark stats pipeline against the generator formulas."""

import numpy as np
import pytest

from aresdb_spark.operators.flac import (_crc8, _crc16, _read_utf8_coded,
                                         _utf8_coded, _MsbReader,
                                         decode_flac, encode_flac)


def test_flac_internals():
    # CRC-8 poly 0x07 / CRC-16 poly 0x8005 spot values
    assert _crc8(b"") == 0 and _crc16(b"") == 0
    assert _crc8(b"\x00") == 0
    assert _crc8(b"\x01") == 0x07
    assert _crc16(b"\x01") == 0x8005
    # UTF-8-coded frame numbers round-trip
    for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF,
              123456789):
        assert _read_utf8_coded(_MsbReader(_utf8_coded(v))) == v


def test_flac_roundtrip_matrix():
    rng = np.random.default_rng(6)
    x = np.cumsum(rng.integers(-50, 50, 700)).clip(-30000, 30000)

    def check(sig, **kw):
        out, rate = decode_flac(encode_flac(sig, 22050, **kw))
        want = sig if sig.ndim == 2 else sig[:, None]
        assert rate == 22050 and out.shape == want.shape \
            and np.array_equal(out, want), kw

    for order in range(5):
        check(x, subframe="fixed", fixed_order=order)
    check(x, subframe="verbatim")
    check(x, subframe="lpc", lpc_coefs=[3, -1], lpc_shift=1)
    check(x, subframe="lpc", lpc_coefs=[7, -3], lpc_shift=2)
    for bps in (8, 16, 24):
        scale = {8: 100, 16: 30000, 24: 8_000_000}[bps]
        xx = (np.cumsum(rng.integers(-50, 50, 500)) % scale) - scale // 2
        check(xx, bps=bps, fixed_order=2)
    st = np.stack([x[:400],
                   np.cumsum(rng.integers(-40, 40, 400))
                   .clip(-20000, 20000)], axis=1)
    for mode in ("indep", "left_side", "right_side", "mid_side"):
        check(st, stereo=mode, fixed_order=3)
    check(x, partition_order=2, fixed_order=2)
    check(x, partition_order=1, escape_partitions=True)
    check(np.full(300, 123, np.int64))              # constant detection
    check(x[:777], block_size=256, fixed_order=1)   # odd final frame


def test_rice_tight_window_retry_matches_hard_bound():
    """r16: _rice_partition_np first walks a tight window sized for the
    expected ~half-ones remainder density; a one-dense partition must
    saturate it, retry on the hard bound, and decode identically. An
    all-ones stream (every code = terminator + all-ones remainder)
    consumes param+1 ones per code > the tight budget of
    (param>>1)+2 for param >= 3, forcing the retry path."""
    from aresdb_spark.operators.flac import (_bits_and_ones,
                                             _rice_partition_np)
    count, param = 50, 3                    # code '1 111' -> v=7 -> -4
    data = b"\xff" * ((count * (param + 1) + 7) // 8)
    bits, ones, csum = _bits_and_ones(data)
    vals, pos = _rice_partition_np(bits, ones, csum, 0, count, param)
    assert pos == count * (param + 1)
    assert np.array_equal(vals, np.full(count, -4, dtype=np.int64))
    # genuinely short stream: both bounds exhaust -> truncated error
    short = b"\xff" * 4                     # 32 bits = 8 codes' worth
    b2, o2, c2 = _bits_and_ones(short)
    with pytest.raises(ValueError, match="truncated"):
        _rice_partition_np(b2, o2, c2, 0, count, param)


def test_flac_crc_and_scope_errors():
    x = np.arange(-100, 100)
    blob = bytearray(encode_flac(x, 8000))
    # flip one residual bit: caught either by the frame CRC-16 or as a
    # truncated/invalid stream (the flip can derail the Rice walk) —
    # never a silent wrong decode
    blob[-10] ^= 0x10
    with pytest.raises(ValueError, match="CRC|truncated|FLAC"):
        decode_flac(bytes(blob))
    # flip the final CRC byte itself: always a CRC mismatch
    blob2 = bytearray(encode_flac(x, 8000))
    blob2[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(blob2))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"OggS\x00\x00")
    with pytest.raises(ValueError, match="bps|range"):
        encode_flac(np.array([40000]), bps=8)


def test_flac_stats_pipeline_matches_formula(spark):
    from pyspark.sql import functions as F

    from aresdb_spark.operators.audio import (audio_stats,
                                              synthetic_flac_media)

    ids = spark.range(0, 18).select(F.col("id").alias("media_id"))
    rows = {r["media_id"]: r.asDict()
            for r in audio_stats(synthetic_flac_media(ids)).collect()}
    assert len(rows) == 18
    for d in range(18):
        n, v = 48 + 4 * (d % 7), d % 6
        rate = 8000 * (1 + d % 2)
        ch = 2 if v == 3 else 1
        i = np.arange(n * ch)
        if v == 5:
            vals = (d * 131 + i * 997) % 2000001 - 1000000
        else:
            vals = (d * 97 + i * 61) % 2001 - 1000
        s = rows[d]
        assert (s["n_samples"], s["channels"], s["sample_rate"]) \
            == (n, ch, rate), d
        assert s["amp_sum"] == int(vals.sum()), d
        assert s["amp_min"] == int(vals.min()) \
            and s["amp_max"] == int(vals.max()), d
        assert s["abs_sum"] == int(np.abs(vals).sum()), d
