"""Clean-room WAV (RIFF PCM) codec + audio feature plumbing.

WAV is the audio analog of PNG: a container whose spec (RIFF chunks +
PCM samples, Microsoft/IBM RIFF spec, public) is self-contained, so it
decodes FOR REAL without a codec library — retiring the audio half of
the multimodal decode stub the same way r9/r10 retired PNG and JPEG.
Compressed codecs (MP3/AAC/Opus) stay honest NotImplementedErrors: their
specs need entropy coders and psychoacoustic filterbanks no container
library here provides.

Scope:
  - decode: RIFF/WAVE with a PCM ``fmt `` chunk (audio format 1),
    8-bit unsigned or 16-bit signed little-endian samples, any channel
    count and sample rate; unknown chunks are skipped by declared size
    (the spec's rule). IEEE-float (format 3) and compressed formats
    raise NotImplementedError naming the format tag.
  - encode: the matching PCM writer for deterministic test payloads.

PCM is LOSSLESS, so (unlike JPEG) arbitrary synthetic sample formulas
round-trip bit-for-bit — the oracle needs no constant-block trick.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_SIGNATURE = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000,
               bits: int = 16) -> bytes:
    """PCM WAV writer: ``samples`` is int16 ``(n,)`` mono or ``(n, ch)``
    interleaved-on-write; ``bits`` 16 (int16) or 8 (uint8)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if bits == 16:
        data = s.astype("<i2").tobytes()
    elif bits == 8:
        data = s.astype(np.uint8).tobytes()
    else:
        raise ValueError(f"bits={bits}: PCM 8/16 only")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV: returns ``(samples int32 (n, ch), sample_rate)``
    — 8-bit samples are centered to signed (-128..127) so amplitude
    stats mean the same thing at both depths."""
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if tag == 3:
                raise NotImplementedError(
                    "IEEE-float WAV (format 3) not implemented — PCM only")
            if tag != 1:
                raise NotImplementedError(
                    f"compressed WAV format tag {tag} requires a codec "
                    f"library — PCM (tag 1) only")
            if bits not in (8, 16):
                raise NotImplementedError(
                    f"{bits}-bit PCM not implemented (8/16 only)")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            pcm = body
        # unknown chunks (LIST, fact, cue ...) skip by declared size;
        # chunks are word-aligned (RIFF pads odd sizes with one byte)
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    ch, rate, bits = fmt
    if bits == 16:
        arr = np.frombuffer(pcm[:len(pcm) - (len(pcm) % (2 * ch))],
                            dtype="<i2").astype(np.int32)
    else:
        arr = np.frombuffer(pcm[:len(pcm) - (len(pcm) % ch)],
                            dtype=np.uint8).astype(np.int32) - 128
    return arr.reshape(-1, ch), rate


def audio_stats(df):
    """media table → exact integer waveform statistics per payload:
    (media_id, n_samples, channels, sample_rate, duration_ms, amp_sum,
    amp_min, amp_max, abs_sum). All-integer so the decode path is
    oracle-checkable bit-for-bit (PCM is lossless — no tolerance).
    Arrow-batched mapInPandas, same shape as multimodal.decode_stats;
    metadata filters prune before any decode."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("channels", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("amp_sum", T.LongType(), False),
        T.StructField("amp_min", T.LongType(), False),
        T.StructField("amp_max", T.LongType(), False),
        T.StructField("abs_sum", T.LongType(), False),
    ])

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, rate = decode_wav(bytes(payload))
                flat = s.astype(np.int64).ravel()
                rows.append((int(mid), s.shape[0], s.shape[1], rate,
                             s.shape[0] * 1000 // rate,
                             int(flat.sum()), int(flat.min()),
                             int(flat.max()), int(np.abs(flat).sum())))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return df.select("media_id", "payload").mapInPandas(
        process, schema=out_schema)


def synthetic_wav_media(ids, id_col: str = "media_id"):
    """Deterministic REAL WAV payloads from an id column, built
    executor-side: for id d, ``n = 64 + d % 33`` mono int16 samples with
    ``sample[i] = ((d*97 + i*61) % 2001) - 1000`` at rate
    ``8000 * (1 + d % 2)`` — pure integer arithmetic, PCM is lossless,
    so a SQL oracle recomputes every decoded statistic exactly.
    Output: (media_id, payload binary)."""
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
                n = 64 + d % 33
                samples = ((d * 97 + np.arange(n) * 61) % 2001 - 1000) \
                    .astype(np.int16)
                payloads.append(encode_wav(
                    samples, sample_rate=8000 * (1 + d % 2)))
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"),
                                "payload": payloads})

    return ids.mapInPandas(gen, schema=out_schema)
