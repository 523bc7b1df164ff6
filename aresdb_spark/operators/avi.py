"""Clean-room AVI container (RIFF 'AVI ', the classic motion-JPEG
carrier) — pure stdlib/numpy, from the public Microsoft AVI RIFF
specification.

Scope:
  - probe: avih main header (µs/frame, total frames, dimensions,
    stream count) + the first video stream's strh/strf (handler
    fourcc, BITMAPINFOHEADER).
  - decode: frames of the first video stream from the LIST 'movi'
    chunks — '##dc' MJPG frames through the in-repo clean-room T.81
    JPEG codec, and '##db'/BI_RGB uncompressed 24-bit DIB frames
    (bottom-up BGR rows, 4-byte padding). Nested 'rec ' LISTs are
    walked; the optional idx1 index is not needed (chunks stream in
    order). Anything else (cvid/DivX/..., 16-bit DIBs) raises
    NotImplementedError naming the handler.
  - encode: MJPEG and uncompressed-DIB writers for deterministic
    test/oracle payloads.

The reference engine (/root/reference) is a Go/C++ OLAP stack with no
video code; parity target is the public spec only.
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC = (b"RIFF", b"AVI ")


def _chunks(data: bytes, start: int, end: int):
    """Walk RIFF chunks in [start, end): yields (fourcc, body_start,
    body_end, list_type_or_None)."""
    pos = start
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = pos + 8
        if body + size > len(data):
            raise ValueError("AVI chunk beyond end of file")
        if cid == b"LIST":
            ltype = data[body:body + 4]
            yield cid, body + 4, body + size, ltype
        else:
            yield cid, body, body + size, None
        pos = body + size + (size & 1)               # word-aligned


def probe_avi(payload: bytes) -> dict:
    """Parse the hdrl headers: returns {us_per_frame, total_frames,
    width, height, n_streams, handler, bit_count, compression}."""
    data = bytes(payload)
    if len(data) < 12 or data[:4] != AVI_MAGIC[0] \
            or data[8:12] != AVI_MAGIC[1]:
        raise ValueError("not an AVI payload")
    out = None
    for cid, b, e, lt in _chunks(data, 12, len(data)):
        if cid != b"LIST" or lt != b"hdrl":
            continue
        for c2, b2, e2, lt2 in _chunks(data, b, e):
            if c2 == b"avih":
                us, _maxbps, _pad, _flags, total, _init, streams, \
                    _bufsz, w, h = struct.unpack("<10I", data[b2:b2 + 40])
                out = {"us_per_frame": us, "total_frames": total,
                       "width": w, "height": h, "n_streams": streams,
                       "handler": None, "bit_count": None,
                       "compression": None}
            elif c2 == b"LIST" and lt2 == b"strl" and out is not None \
                    and out["handler"] is None:
                fcc_type = handler = None
                for c3, b3, e3, _ in _chunks(data, b2, e2):
                    if c3 == b"strh":
                        fcc_type = data[b3:b3 + 4]
                        handler = data[b3 + 4:b3 + 8]
                    elif c3 == b"strf" and fcc_type == b"vids":
                        bits, = struct.unpack("<H", data[b3 + 14:b3 + 16])
                        comp = data[b3 + 16:b3 + 20]
                        out["handler"] = handler.decode("latin1").strip()
                        out["bit_count"] = bits
                        out["compression"] = comp.decode("latin1") \
                            .strip("\x00")
    if out is None:
        raise ValueError("AVI missing avih header")
    return out


def decode_avi_frames(payload: bytes) -> "list":
    """Decode every frame of the FIRST video stream: MJPG chunks via
    the in-repo JPEG codec; uncompressed BI_RGB 24-bit DIB chunks as
    bottom-up BGR rows. Returns pixel arrays in stream order."""
    from aresdb_spark.operators.jpeg import decode_jpeg

    data = bytes(payload)
    meta = probe_avi(data)
    comp = (meta["compression"] or "").upper()
    mjpg = comp in ("MJPG", "MJPEG") or \
        (meta["handler"] or "").upper() in ("MJPG", "MJPEG")
    if not mjpg and comp not in ("", "\x00\x00\x00\x00"):
        raise NotImplementedError(
            f"AVI video compression {meta['compression']!r} requires a "
            f"codec library — MJPG and uncompressed BI_RGB only")
    if not mjpg and meta["bit_count"] not in (24,):
        raise NotImplementedError(
            f"{meta['bit_count']}-bit uncompressed AVI DIB not "
            f"implemented (24-bit only)")
    w, h = meta["width"], meta["height"]
    frames = []

    def walk_movi(b, e):
        for cid, b2, e2, lt in _chunks(data, b, e):
            if cid == b"LIST" and lt == b"rec ":
                walk_movi(b2, e2)
                continue
            if len(cid) == 4 and cid[:2] == b"00" \
                    and cid[2:4] in (b"dc", b"db"):
                body = data[b2:e2]
                if not body:
                    continue                         # dropped frame
                if mjpg:
                    frames.append(decode_jpeg(body))
                else:
                    stride = ((w * 3 + 3) // 4) * 4
                    if len(body) < stride * h:
                        raise ValueError("AVI DIB frame truncated")
                    rows = np.frombuffer(body[:stride * h], np.uint8) \
                        .reshape(h, stride)[:, :w * 3]
                    frames.append(
                        rows.reshape(h, w, 3)[::-1, :, ::-1].copy())

    for cid, b, e, lt in _chunks(data, 12, len(data)):
        if cid == b"LIST" and lt == b"movi":
            walk_movi(b, e)
    return frames


def encode_avi(frames: "list", width: int, height: int,
               fps: int = 25, mjpeg: bool = True) -> bytes:
    """AVI writer for test payloads: ``frames`` is a list of encoded
    JPEG byte strings (``mjpeg=True``) or RGB ``(h, w, 3)`` uint8
    arrays written as uncompressed bottom-up DIB chunks."""
    movi = bytearray(b"movi")
    for fr in frames:
        if mjpeg:
            body = bytes(fr)
            cid = b"00dc"
        else:
            px = np.asarray(fr, np.uint8)
            stride = ((width * 3 + 3) // 4) * 4
            rows = np.zeros((height, stride), np.uint8)
            rows[:, :width * 3] = px[::-1, :, ::-1].reshape(height, -1)
            body = rows.tobytes()
            cid = b"00db"
        movi += cid + struct.pack("<I", len(body)) + body
        if len(body) % 2:
            movi += b"\0"

    us = 1_000_000 // fps
    avih = struct.pack("<10I", us, 0, 0, 0x10, len(frames), 0, 1, 0,
                       width, height) + bytes(16)
    handler = b"MJPG" if mjpeg else b"\0\0\0\0"
    strh = (b"vids" + handler + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames), 0,
                                            0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1,
                       24, b"MJPG" if mjpeg else b"\0\0\0\0",
                       0, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\0" if len(body) % 2 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_chunk = chunk(b"LIST", bytes(movi))
    body = b"AVI " + hdrl + movi_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body
