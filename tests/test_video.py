"""ISO BMFF metadata probe (operators/video.py): box-walk rules
(declared-size skipping, largesize, to-end boxes), v0/v1 header
variants, honest frame-decode stub, and the Spark probe pipeline
against the integer skeleton formulas."""

import struct

import pytest

from aresdb_spark.operators.video import (decode_video_frames,
                                          encode_mp4_skeleton, probe_mp4,
                                          synthetic_mp4_media,
                                          video_probe_stats)


def _skeleton(ver):
    return encode_mp4_skeleton(12345, 600, [
        {"id": 1, "handler": b"vide", "width": 320, "height": 240,
         "duration_units": 12345},
        {"id": 2, "handler": b"soun", "duration_units": 12345},
    ], version=ver)


@pytest.mark.parametrize("ver", [0, 1])
def test_probe_reads_mvhd_tkhd_hdlr(ver):
    m = probe_mp4(_skeleton(ver))
    assert m["brand"] == "isom"
    assert m["timescale"] == 600 and m["duration_units"] == 12345
    assert m["duration_ms"] == 12345 * 1000 // 600
    assert [t["handler"] for t in m["tracks"]] == ["vide", "soun"]
    v = m["tracks"][0]
    assert (v["id"], v["width"], v["height"]) == (1, 320, 240)


def test_unknown_boxes_skip_and_largesize_parses():
    b = _skeleton(0)
    # prepend an unknown box before moov
    i = b.find(b"moov") - 4
    junk = struct.pack(">I", 16) + b"free" + b"\x00" * 8
    b2 = b[:i] + junk + b[i:]
    assert probe_mp4(b2)["duration_units"] == 12345
    # rewrite moov as a 64-bit largesize box
    (size,) = struct.unpack(">I", b[i:i + 4])
    big = b[:i] + struct.pack(">I", 1) + b"moov" \
        + struct.pack(">Q", size + 8) + b[i + 8:i + size] + b[i + size:]
    assert probe_mp4(big)["tracks"][0]["width"] == 320


def test_malformed_and_stub_paths():
    with pytest.raises(ValueError):
        probe_mp4(b"\x00\x01short")
    b = bytearray(_skeleton(0))
    b[0:4] = struct.pack(">I", 3)            # box size < 8
    with pytest.raises(ValueError, match="bad box size"):
        probe_mp4(bytes(b))
    # ftyp-only payload: no moov
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    with pytest.raises(ValueError, match="moov"):
        probe_mp4(ftyp)
    with pytest.raises(NotImplementedError, match="codec"):
        decode_video_frames(_skeleton(0))


def test_video_probe_stats_matches_formula(spark):
    from pyspark.sql import functions as F

    ids = spark.range(0, 24).select(F.col("id").alias("media_id"))
    stats = {r["media_id"]: r.asDict()
             for r in video_probe_stats(synthetic_mp4_media(ids)).collect()}
    assert len(stats) == 24
    for d in range(24):
        s = stats[d]
        ts = 600 * (1 + d % 2)
        dur = 600 + (d * 37) % 100000
        assert s["brand"] == "isom"
        assert s["timescale"] == ts
        assert s["duration_ms"] == dur * 1000 // ts
        assert s["n_tracks"] == 1 + d % 2
        assert s["video_width"] == 16 * (1 + d % 20)
        assert s["video_height"] == 16 * (1 + d % 15)
