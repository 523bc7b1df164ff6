"""Clean-room legacy-raster codecs (operators/pnm.py: Netpbm P1-P6,
Sun rasterfile, SGI RGB, XBM): round-trips across the scope matrix,
header/comment edge cases, RLE escapes, named scope errors, and
dispatcher + Spark integration. Real-file pins live in
tests/test_real_fixtures.py."""

import numpy as np
import pytest

from aresdb_spark.operators.pnm import (decode_pnm, decode_ras,
                                        encode_pnm, encode_ras)


def test_pnm_roundtrip_matrix():
    rng = np.random.default_rng(21)
    for kind in (1, 4):
        for w in (1, 7, 8, 9):
            px = rng.integers(0, 2, (5, w)).astype(np.uint8) * 255
            out = decode_pnm(encode_pnm(px, kind))
            assert out.dtype == np.uint8 and np.array_equal(out, px), \
                (kind, w)
    for kind in (2, 5):
        px = rng.integers(0, 256, (5, 7), dtype=np.uint8)
        assert np.array_equal(decode_pnm(encode_pnm(px, kind)), px)
    for kind in (3, 6):
        px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        assert np.array_equal(decode_pnm(encode_pnm(px, kind)), px)


def test_pnm_16bit_big_endian_samples():
    """maxval >= 256 → two big-endian bytes per sample, uint16 out
    (native values, the TIFF convention — no rescale)."""
    rng = np.random.default_rng(22)
    for kind, shape in ((5, (4, 6)), (6, (4, 6, 3))):
        px = rng.integers(0, 65536, shape, dtype=np.uint16)
        out = decode_pnm(encode_pnm(px, kind))
        assert out.dtype == np.uint16 and np.array_equal(out, px)
    # odd maxval stays exact (no scaling happens anywhere)
    px = np.array([[0, 999], [1000, 5]], np.uint16)
    blob = encode_pnm(px, 5, maxval=1000)
    assert np.array_equal(decode_pnm(blob), px)


def test_pnm_header_comments_and_packed_p1():
    """'#' comments are legal anywhere in the header and in plain
    rasters; P1 digits may be packed without separators (spec)."""
    blob = b"P2 # a comment\n# another\n 3\n2 # w h\n255\n1 2 3\n4 5 6\n"
    assert np.array_equal(decode_pnm(blob),
                          np.array([[1, 2, 3], [4, 5, 6]], np.uint8))
    blob = b"P1\n# bitmap\n4 2\n0110\n1001\n"
    assert np.array_equal(decode_pnm(blob),
                          255 * np.array([[1, 0, 0, 1], [0, 1, 1, 0]],
                                         np.uint8))
    blob = b"P3 2 1 255\n1 2 3 # tail comment\n4 5 6\n"
    assert np.array_equal(decode_pnm(blob).ravel(),
                          np.array([1, 2, 3, 4, 5, 6], np.uint8))


def test_pnm_errors_named():
    with pytest.raises(ValueError, match="not a PNM"):
        decode_pnm(b"P7\n1 1\n255\n\0")
    with pytest.raises(ValueError, match="truncated"):
        decode_pnm(b"P5 4 4 255\n\0\0")
    with pytest.raises(ValueError, match="truncated"):
        decode_pnm(b"P2 2 2 255\n1 2 3\n")
    with pytest.raises(ValueError, match="maxval"):
        decode_pnm(b"P5 1 1 70000\n\0\0")
    with pytest.raises(ValueError, match="exceeds maxval"):
        decode_pnm(b"P2 1 1 9\n12\n")
    with pytest.raises(ValueError, match="non-0/1"):
        decode_pnm(b"P1 2 1\n02\n")


def test_ras_roundtrip_matrix():
    rng = np.random.default_rng(23)
    for depth, rtype in [(24, 1), (24, 2), (24, 3), (32, 1), (32, 3),
                         (8, 1), (8, 2), (1, 1)]:
        if depth in (24, 32):
            px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        elif depth == 8:
            px = rng.integers(0, 256, (5, 7), dtype=np.uint8)
        else:
            px = rng.integers(0, 2, (5, 7)).astype(np.uint8) * 255
        out = decode_ras(encode_ras(px, depth=depth, rtype=rtype))
        assert np.array_equal(out, px), (depth, rtype)


def test_ras_rle_escapes_and_colormap():
    """Byte-RLE: runs, the 0x80 0x00 literal-0x80 escape, and 16-bit
    row padding through odd widths; maptype-1 planes are three
    concatenated R/G/B arrays."""
    px = np.full((4, 9), 0x80, np.uint8)
    px[1, 3] = 5
    px[2] = np.arange(9)
    out = decode_ras(encode_ras(px, depth=8, rtype=2))
    assert np.array_equal(out, px)
    rng = np.random.default_rng(24)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (3, 5), dtype=np.uint8)
    out = decode_ras(encode_ras(idx, depth=8, rtype=2, palette=pal))
    assert out.shape == (3, 5, 3) and np.array_equal(out, pal[idx])


def test_ras_errors_named():
    with pytest.raises(ValueError, match="not a RAS"):
        decode_ras(b"\0" * 32)
    blob = bytearray(encode_ras(np.zeros((2, 2, 3), np.uint8)))
    blob[15] = 64                                   # depth = 64
    with pytest.raises(NotImplementedError, match="64-bit"):
        decode_ras(bytes(blob))
    blob = bytearray(encode_ras(np.zeros((2, 2, 3), np.uint8)))
    blob[23] = 5                                    # type = 5
    with pytest.raises(NotImplementedError, match="type 5"):
        decode_ras(bytes(blob))
    blob = bytearray(encode_ras(np.zeros((2, 2, 3), np.uint8)))
    blob[31] = 7                                    # maplen not mult of 3
    blob[27] = 1
    with pytest.raises(ValueError, match="colormap"):
        decode_ras(bytes(blob))


def test_pnm_ras_through_dispatcher():
    """Magic sniffing routes P1-P6 and 0x59a66a95 payloads to the new
    codecs; unknown magics still raise the (updated) named error."""
    from aresdb_spark.operators.multimodal import (_decode_container,
                                                   decode_image)
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    for blob in (encode_pnm(px, 6), encode_pnm(px, 3),
                 encode_ras(px, depth=24)):
        assert np.array_equal(_decode_container(blob), px)
    with pytest.raises(NotImplementedError, match="PNM/RAS"):
        decode_image(b"\xde\xad\xbe\xef" + b"\0" * 32)


def test_pnm_media_corpus_graded(spark):
    """The synthetic_pnm_media corpus decodes through the Spark
    decode_stats pipeline and matches the DuckDB formula oracle from
    __spark_entry__ (the driver-gate contract for this row)."""
    import duckdb

    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    q, sql = entry.queries()["multimodal_pnm_stats"], \
        entry.oracle_sql()["multimodal_pnm_stats"]
    got = q(spark, sf_dir).toPandas().sort_values("media_id") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    exp = con.execute(sql).df().sort_values("media_id") \
        .reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for col in ("width", "height", "channels", "n_px", "px_sum",
                "px_min", "px_max"):
        assert (got[col].astype("int64")
                == exp[col].astype("int64")).all(), col


def test_sgi_roundtrip_matrix():
    """SGI RGB: verbatim + RLE storage, 1/3/4 channels, 8- and
    16-bit, bottom-up plane-separated rows."""
    rng = np.random.default_rng(25)
    from aresdb_spark.operators.pnm import decode_sgi, encode_sgi
    for st in (0, 1):
        for shape in ((5, 7), (5, 7, 3), (4, 6, 4), (1, 1), (3, 127)):
            px = rng.integers(0, 256, shape, dtype=np.uint8)
            out = decode_sgi(encode_sgi(px, storage=st))
            assert np.array_equal(out, px), (st, shape)
        px16 = rng.integers(0, 65536, (4, 6, 3), dtype=np.uint16)
        out = decode_sgi(encode_sgi(px16, storage=st))
        assert out.dtype == np.uint16 and np.array_equal(out, px16), st
    # run-heavy content exercises the repeat packets
    px = np.full((4, 9, 3), 7, np.uint8)
    px[2, 4] = (1, 2, 3)
    assert np.array_equal(decode_sgi(encode_sgi(px, storage=1)), px)


def test_sgi_errors_named():
    import struct

    from aresdb_spark.operators.pnm import decode_sgi, encode_sgi
    with pytest.raises(ValueError, match="not an SGI"):
        decode_sgi(b"\0" * 512)
    blob = bytearray(encode_sgi(np.zeros((2, 2), np.uint8)))
    blob[3] = 3                                     # bpc = 3
    with pytest.raises(ValueError, match="bpc 3"):
        decode_sgi(bytes(blob))
    blob = bytearray(encode_sgi(np.zeros((2, 2), np.uint8)))
    blob[104:108] = struct.pack(">I", 1)            # dithered colormap
    with pytest.raises(NotImplementedError, match="colormap 1"):
        decode_sgi(bytes(blob))
    blob = encode_sgi(np.arange(16, dtype=np.uint8).reshape(4, 4),
                      storage=0)
    with pytest.raises(ValueError, match="truncated"):
        decode_sgi(blob[:-3])


def test_xbm_roundtrip_and_errors():
    from aresdb_spark.operators.pnm import decode_xbm, encode_xbm
    rng = np.random.default_rng(26)
    for w in (1, 7, 8, 13):
        px = rng.integers(0, 2, (5, w)).astype(np.uint8) * 255
        assert np.array_equal(decode_xbm(encode_xbm(px)), px), w
    # X11's own layout quirks: unsigned char, hotspot defines, odd
    # whitespace — the parser keys on the _width/_height/_bits tokens
    blob = (b"#define t_width 9\n#define t_height 2\n"
            b"#define t_x_hot 1\n#define t_y_hot 1\n"
            b"static unsigned char t_bits[] = {\n"
            b" 0xFF, 0x01, 0x00, 0x00 };\n")
    out = decode_xbm(blob)
    assert out.shape == (2, 9)
    assert (out[0] == 0).all() and (out[1] == 255).all()
    with pytest.raises(ValueError, match="not an XBM"):
        decode_xbm(b"int main() { return 0; }")
    with pytest.raises(ValueError, match="truncated"):
        decode_xbm(b"#define t_width 32\n#define t_height 4\n"
                   b"static char t_bits[] = { 0x00 };\n")
