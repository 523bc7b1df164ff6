"""Clean-room ISO BMFF (MP4) metadata probe.

The MP4 *container* is a self-contained public spec (ISO/IEC 14496-12:
length-prefixed boxes), so track/duration metadata parses FOR REAL
without any codec library — which is exactly what a training-data
pipeline needs from video at scan time: duration/track/dimension
filters and frame-sampling plans prune BEFORE any (expensive, GPU-class)
frame decode. Frame decode itself needs H.264/H.265/AV1 codecs the
container doesn't ship, so it stays an honest NotImplementedError —
this module is the "decode metadata, defer pixels" half, the same
split ``multimodal.frame_sample`` models.

Scope:
  - probe: top-level box walk (32-bit and 64-bit largesize boxes),
    ``ftyp`` brand, ``moov/mvhd`` (version 0 and 1) timescale +
    duration, per-``trak`` ``tkhd`` (v0/v1) track id + width/height
    (16.16 fixed point) and ``mdia/mdhd`` + ``hdlr`` handler type.
    Unknown boxes skip by declared size (the spec's rule).
  - encode: a minimal skeleton writer (ftyp + moov tree + empty mdat)
    for deterministic test payloads — parsing is lossless, so integer
    formulas round-trip bit-for-bit for the oracle row.
"""

from __future__ import annotations

import struct

import numpy as np  # noqa: F401  (parity with the other media modules)

MP4_BRANDS = (b"isom", b"iso2", b"mp41", b"mp42", b"avc1", b"M4V ")


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + payload)


def encode_mp4_skeleton(duration_units: int, timescale: int,
                        tracks: "list[dict] | None" = None,
                        version: int = 0) -> bytes:
    """Minimal valid ISO BMFF skeleton: ftyp + moov(mvhd + trak*) +
    empty mdat. ``tracks``: [{"id", "handler" (4 bytes), "width",
    "height", "duration_units"}]. ``version`` 1 writes the 64-bit
    mvhd/tkhd variants (tests the probe's v1 path)."""
    tracks = tracks or []
    if version == 0:
        mvhd = _full(b"mvhd", 0, struct.pack(
            ">IIII", 0, 0, timescale, duration_units)
            + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10
            + b"\x00" * 36 + b"\x00" * 24
            + struct.pack(">I", len(tracks) + 1))
    else:
        mvhd = _full(b"mvhd", 1, struct.pack(
            ">QQIQ", 0, 0, timescale, duration_units)
            + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10
            + b"\x00" * 36 + b"\x00" * 24
            + struct.pack(">I", len(tracks) + 1))
    moov = mvhd
    for t in tracks:
        if version == 0:
            tkhd = _full(b"tkhd", 0, struct.pack(
                ">IIIII", 0, 0, t["id"], 0, t.get("duration_units", 0))
                + b"\x00" * 8 + struct.pack(">hhhH", 0, 0, 0, 0)
                + b"\x00" * 36
                + struct.pack(">II", t.get("width", 0) << 16,
                              t.get("height", 0) << 16))
        else:
            tkhd = _full(b"tkhd", 1, struct.pack(
                ">QQIIQ", 0, 0, t["id"], 0, t.get("duration_units", 0))
                + b"\x00" * 8 + struct.pack(">hhhH", 0, 0, 0, 0)
                + b"\x00" * 36
                + struct.pack(">II", t.get("width", 0) << 16,
                              t.get("height", 0) << 16))
        mdhd = _full(b"mdhd", 0, struct.pack(
            ">IIII", 0, 0, timescale, t.get("duration_units", 0))
            + struct.pack(">HH", 0x55C4, 0))         # language "und"
        hdlr = _full(b"hdlr", 0, struct.pack(">I", 0)
                     + t.get("handler", b"vide") + b"\x00" * 12 + b"\x00")
        mdia = _box(b"mdia", mdhd + hdlr)
        moov += _box(b"trak", tkhd + mdia)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"iso2")
    return ftyp + _box(b"moov", moov) + _box(b"mdat", b"")


def _walk(data: bytes, start: int, end: int):
    """Yield (box type, payload start, payload end); handles 64-bit
    largesize (size == 1) and to-end boxes (size == 0, last box only)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size at byte {pos}")
        yield btype, body, pos + size
        pos += size


def probe_mp4(payload: bytes) -> dict:
    """Parse container metadata; raises ValueError for malformed bytes
    and NotImplementedError when asked for what needs a codec."""
    data = bytes(payload)
    if len(data) < 12:
        raise ValueError("not an ISO BMFF payload")
    out: dict = {"brand": None, "timescale": None, "duration_units": None,
                 "tracks": []}
    saw_moov = False
    for btype, body, bend in _walk(data, 0, len(data)):
        if btype == b"ftyp":
            out["brand"] = data[body:body + 4].decode("latin1")
        elif btype == b"moov":
            saw_moov = True
            for ib, ibody, ibend in _walk(data, body, bend):
                if ib == b"mvhd":
                    ver = data[ibody]
                    if ver == 1:
                        _, _, ts, dur = struct.unpack(
                            ">QQIQ", data[ibody + 4:ibody + 32])
                    else:
                        _, _, ts, dur = struct.unpack(
                            ">IIII", data[ibody + 4:ibody + 20])
                    out["timescale"], out["duration_units"] = ts, dur
                elif ib == b"trak":
                    out["tracks"].append(
                        _probe_trak(data, ibody, ibend))
    if not saw_moov or out["timescale"] is None:
        raise ValueError("ISO BMFF missing moov/mvhd")
    out["duration_ms"] = out["duration_units"] * 1000 // out["timescale"]
    return out


def _probe_trak(data: bytes, start: int, end: int) -> dict:
    t: dict = {"id": None, "handler": None, "width": None, "height": None,
               "duration_units": None}
    for btype, body, bend in _walk(data, start, end):
        if btype == b"tkhd":
            ver = data[body]
            if ver == 1:
                tid, _, dur = struct.unpack(
                    ">IIQ", data[body + 20:body + 36])
                geo = body + 36
            else:
                tid, _, dur = struct.unpack(
                    ">III", data[body + 12:body + 24])
                geo = body + 24
            w, h = struct.unpack(">II", data[geo + 52:geo + 60])
            t.update(id=tid, duration_units=dur,
                     width=w >> 16, height=h >> 16)   # 16.16 fixed point
        elif btype == b"mdia":
            for ib, ibody, _ in _walk(data, body, bend):
                if ib == b"hdlr":
                    t["handler"] = data[ibody + 8:ibody + 12] \
                        .decode("latin1")
    return t


def decode_video_frames(payload: bytes):
    """Frame decode needs an H.264/H.265/AV1 codec library the container
    does not ship — honest stub; the metadata probe above is the
    scan-time half a pipeline filters and plans with."""
    raise NotImplementedError(
        "video frame decode requires a codec library (ffmpeg/libavcodec) "
        "— not available in this container; use probe_mp4 for container "
        "metadata and frame_sample for the sampling plan")


def video_probe_stats(df):
    """media table → exact integer container metadata per payload:
    (media_id, brand fourcc as string, timescale, duration_ms, n_tracks,
    video_width, video_height). Arrow-batched mapInPandas; parsing is
    lossless so the row is oracle-checkable bit-for-bit."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("brand", T.StringType(), False),
        T.StructField("timescale", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("n_tracks", T.LongType(), False),
        T.StructField("video_width", T.LongType(), True),
        T.StructField("video_height", T.LongType(), True),
    ])

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                m = probe_mp4(bytes(payload))
                vids = [t for t in m["tracks"] if t["handler"] == "vide"]
                rows.append((int(mid), m["brand"], m["timescale"],
                             m["duration_ms"], len(m["tracks"]),
                             vids[0]["width"] if vids else None,
                             vids[0]["height"] if vids else None))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return df.select("media_id", "payload").mapInPandas(
        process, schema=out_schema)


def synthetic_mp4_media(ids, id_col: str = "media_id"):
    """Deterministic REAL MP4 skeletons from an id column: timescale
    ``600 * (1 + d % 2)``, movie duration ``600 + (d * 37) % 100000``
    units, ``1 + d % 2`` tracks (track 1 vide ``16*(1 + d % 20)`` x
    ``16*(1 + d % 15)``, track 2 soun), 64-bit mvhd/tkhd variants when
    ``d % 3 == 0`` (exercises the probe's v1 path). Parsing is
    lossless, so a SQL oracle recomputes every probed value."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf[id_col].astype("int64"):
                d = int(d)
                dur = 600 + (d * 37) % 100000
                tracks = [{"id": 1, "handler": b"vide",
                           "width": 16 * (1 + d % 20),
                           "height": 16 * (1 + d % 15),
                           "duration_units": dur}]
                if d % 2:
                    tracks.append({"id": 2, "handler": b"soun",
                                   "duration_units": dur})
                payloads.append(encode_mp4_skeleton(
                    dur, 600 * (1 + d % 2), tracks,
                    version=1 if d % 3 == 0 else 0))
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"),
                                "payload": payloads})

    return ids.mapInPandas(gen, schema=out_schema)
