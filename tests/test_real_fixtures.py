"""Real-file conformance pins: CPython's shipped test images
(Lib/test/test_email/data + Lib/test/imghdrdata, PSF-licensed test
data — the same provenance as the libwebp ``python.webp`` pin in
test_webp.py). All files encode the SAME 16x16 Python-logo source
image through REAL external encoders (libpng/libjpeg/PIL-era
tooling), so they cross-validate every still-image decoder in this
repo against bytes it did not produce:

  * ``python.ppm`` is binary P6 — raw RGB with a 13-byte ASCII
    header, parsed HERE with numpy alone. That makes it a
    decoder-independent ground truth: no aresdb_spark codec touches
    it.
  * PNG, TIFF and BMP (BI_BITFIELDS, the r14 path) are lossless →
    pinned EXACT against that truth (and BMP against PNG's RGBA,
    alpha plane included — two independent real encoders must agree
    bit-for-bit through two independent clean-room decoders).
  * GIF is 64-color-quantized with a transparent index → pinned
    structurally: most pixels exact, the rest bounded quantization
    error, and every large deviation explained by the encoder's
    transparent-index mapping of semi-transparent source pixels.
  * JPEG is lossy 4:2:0 → pinned by PSNR floor (luma ≥ 33 dB, RGB
    ≥ 21 dB) plus a byte-exact regression hash of our decode; the
    headerless ``python-raw.jpg`` twin (no APP0/JFIF segment) must
    decode to the identical array.
"""

import base64
import hashlib

import numpy as np

# test_email/data/python.ppm (781 bytes, md5 a2b32811bb48fbf84e6a4ffa90b6a81c)
_PPM_B64 = """\
UDYKMTYgMTYKMjU1CgAAAAAAAAAAAAAAAE6NwEqGukiDtER+rUB4pzxxnjdolgAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAEyKvP///0V/r0F5qD50ojpvmzZplAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAEmFt0aAsUJ7qj51oztwnTdqljZplAAA
AAAAAAAAAAAAAAAAAAAAAE6PxEyKv0iFtkN9rT10oTlsljZmkDhslzZplDZplAAA
AAAAAAAAAAAAAAAAAFKRxk+NwUuIu0iDtER9rUB4pj1zoDltmTZplDZplDZplAAA
AP/iVf3dSvnVPgAAAFCPw0yJvEiEtUV/r0F5qD10oTpvmzZplDZplDZplDJghwAA
AP/eS//aQf3VNgAAAE2LvkmFt0aAsEJ7qj51oztwnDdqljZplDVokjJghwAAAOzO
Rf/aQv/WN//TLQAAAEqHuUeBskN8qz92pTZpkxsxRQAAAAAAAAAAAAAAAOLDRf3Z
Qf/XOP/TLf/PIwAAAEaBskR9rUB4pjZnkQAAAPLhbv3pav/mYf/jV//fTf/bQv/X
OP/TLv/PJP3LGwAAAEN9rkF5qD10oRwyS/Xjb//rbP/nYf/jV//fTf/bQ//XOf/T
Lv/PJP/MHPPBGgAAAEB1oz1zojpwnAAAAP/rbP/nYv/jWP/fTv/bQ//XOf/TL//P
JP/MHP/MHMKaEgAAAAAAAAAAAAAAAAAAAP/nYv/jWP/fTujHPevFNOvCKuu+Ieu7
GOu7GMabEgAAAAAAAAAAAAAAAAAAAAAAAP/jWP/fTv/bRP/XOv/TMP/QJf/MHAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAP3eTv/bRP/YOv/UMP/QJv////3LGwAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAPHQP/rTOf3SL//QJv/MHPrHGcCXEgAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAA=="""

# test_email/data/python.png (1020 bytes, md5 91f80d44b0a786e5b0b3049ad61159fa)
_PNG_B64 = """\
iVBORw0KGgoAAAANSUhEUgAAABAAAAAQCAMAAAAoLQ9TAAAAIGNIUk0AAHomAACA
hAAA+gAAAIDoAAB1MAAA6mAAADqYAAAXcJy6UTwAAAHFUExURQAAAE6NwEqGujxx
njdolgAAAAAAAAAAAAAAAAAAAE6PxEyKv0iFtkN9rT10oTlsljZmkAAAAAAAAFKR
xv3dSvnVPgAAADJghwAAAP3VNgAAADVokgAAAOzORQAAADZpkxsxRQAAAAAAAOLD
Rf3ZQQAAAEaBsjZnkQAAAPLhbv3pav3LG0N9rhwyS/Xjb/PBGkB1oz1zogAAAMKa
EgAAAAAAAAAAAAAAAAAAAOjHPevFNOvCKuu+Ieu7GMabEgAAAAAAAAAAAAAAAAAA
AAAAAAAAAP3eTgAAAAAAAAAAAAAAAPHQP/rTOf3SL/rHGcCXEgAAAAAAAAAAAAAA
AAAAAAAAAEiDtER+rUB4p0yKvP///0V/r0F5qD50ojpvmzZplEmFt0aAsUJ7qj51
oztwnTdqljhsl0+NwUuIu0R9rUB4pj1zoDltmf/iVVCPw0yJvEiEtT10of/eS//a
QU2LvkaAsDtwnP/aQv/WN//TLUqHuUeBskN8qz92pf/XOP/PI//mYf/jV//fTf/b
Qv/TLv/PJP/rbP/nYf/bQ//XOf/MHDpwnP/nYv/jWP/fTv/TL//bRP/XOv/TMP/Q
Jf/YOv/UMP/QJpJJAAIAAABWdFJOUwCv7feSCwMoQRV+oKGjp6qqSBi994IKtkPt
JPdPiD22XExHa/dG96pOpvf311uzwm/3S3o0CCE8NaqpqampeSACCRMSLB73QBwF
AUzM99h7Ox1CRTgf+DIQcQAAAAFiS0dEWgO7paIAAAD1SURBVBjTY2AAAkamsPAI
ZhZWNgYoiIyKjomNi2dnhQkkJCYlp6TGc3CCeVzcPLx8/AJp8fGCQiC+cHpGWGZW
dk48UCBXRFSMIS+/IDqmMA7IF5coKpaUYihJKE1KLkuNlxaXkS2vqJRjqKquqZVX
UBRU4lBWqausV2VQy8xS19DUamhsaq5radVWYtCJKdTVa2tvbOrobGnt0udgMDDs
Nmrr6e3r6Oxv7eoyNmEwNTO3APItraxtbG3tOOwZHBydnHv7JkycNLmLw8LFFeJ6
twlTpk6L0nb3cPT0Agt4+/hO6/LzD3CGec400CJIKTgk1BTIBgBAYkJ/yC2b5QAA
ACV0RVh0ZGF0ZTpjcmVhdGUAMjAxNC0wMS0yNlQyMDo1OTozNyswMjowMPuaB3cA
AAAldEVYdGRhdGU6bW9kaWZ5ADIwMTQtMDEtMjZUMjA6NTk6MDArMDI6MDDB74am
AAAAAElFTkSuQmCC"""

# test_email/data/python.bmp (1162 bytes, md5 e3a1f317b1a275e5d5f1b4b0ff04ee01)
_BMP_B64 = """\
Qk2KBAAAAAAAAIoAAAB8AAAAEAAAABAAAAABACAAAwAAAAAEAAAAAAAAAAAAAAAA
AAAAAAAAAAD/AAD/AAD/AAAAAAAA/0JHUnOAwvUoYLgeFSCF6wFAMzMTgGZmJkBm
ZgagmZkJPArXAyRcjzIAAAAAAAAAAAAAAAAEAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAgAAAAdAAAANQAAAEIAAABHAAAARQAAADgAAAAfAAAACAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA/0PFMOdP6zC/S/fcm0P//HMz//xnH
+tgSl8B7AAAAOwAAABIAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAATt7990Tb
//862P//MNT//ybQ////////G8v99wAAAEAAAAAcAAAACQAAAAUAAAABAAAAAgAA
AAkAAAATAAAAEljj//9O3///RNv//zrX//8w0///JdD//xzM//8AAABBAAAANQAA
ACwAAAAeAAAACwAAAAgAAAAhAAAAPAAAADVi5///WOP//07f//89x+iqNMXrqSrC
66khvuupGLvrqRi766kSm8Z5AAAAQQAAACCjdUBvonM995xwOv8AAABLbOv//2Ln
//9Y4///Tt///0Pb//851///L9P//yTP//8czP//HMz//xKawnoAAAA0rn1D16h5
Qf+hdD3/SzIcW2/j9bNs6///Yef//1fj//9N3///Q9v//znX//8u0///JM///xzM
//8awfPCAAAAQbKBRvetfUT/pnhA/5FnNqoAAABObuHypmrp/fdh5v//V+P//03f
//9C2///ONf//y7T//8kz///G8v99wAAAEe5h0r/soFH/6t8Q/+ldj//k2k2tkUx
G1wAAABMAAAASAAAAEcAAABBRcPia0HZ/fc41///LdP//yPP//8AAABGvotN/7eF
Sf+wgEb/qntC/6N1Pv+ccDv/lmo3/5RpNv+SaDX3h2AytgAAAE9FzuyIQtr//zfW
//8t0///AAAAPcOPUP+8iUz/tYRI/69/Rf+oeUH/oXQ9/5tvOv+UaTb/lGk2/5Rp
Nv+HYDK2AAAAQ0ve//9B2v//NtX97QAAACTGkVK9wY1P/7uIS/+0g0j/rX1E/6Z4
QP+gcz3/mW05/5RpNv+UaTb/lGk2/wAAAEhV4v//St399z7V+YIAAAAKAAAAAMSP
Tn6/ikygtoVIoa19Q6OhdD2nlmw5qpBmNqqXbDj/lGk2/5RpNv8AAABIAAAAGAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAC3hUn/sYBG/6p7Qv+jdT7/nXA7/5Zq
N/+UaTb/AAAAQQAAABUAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAvIpM////
//+vf0X/qHlB/6J0Pv+bbzr/lGk2/wAAACgAAAALAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAMCNTq+6hkrttINI/61+RP+neED/nnE895ZoN5IAAAALAAAAAwAA
AAAAAAAAAAAAAA=="""

# test_email/data/python.gif (405 bytes, md5 bb6db723ceadf8ce03d5ad234f9d7273)
_GIF_B64 = """\
R0lGODlhEAAQAPU/AOu7GOu+IfPBGvrHGf3LG//MHOvCKv/PI//PJP/QJf/TLevF
NOjHPf/TMP/UMP3VNvrTOf/XOfnVPv/YOuzORf/aQf/bRP/eS//fTv/iVf/jWP/n
YvLhbvXjb/3pav/rbDJghzZmkDZnkTZpkzdoljdqljlsljpvmzpwnDtwnDxxnj1z
oj50oj92pUB4pkJ7qkN8q0N9rUV/r0aAsUeBskiDtEiFtkqGukyJvEyKvEyKv0+N
wVCPw1KRxv///wAAACH/C0ltYWdlTWFnaWNrB2dhbW1hPTAAIfkEBQAAPwAsAAAA
ABAAEAAABpvAn/C3u81iLRVpyBTmfLMXC1VqMm1RVqo0sv50thjLFDKVqszeDleT
uVSn0fmXuUh+PB1N9oKP/iA/FxUPXzY0UipnIoEUhAo/hzAuXU0VEQoHP0cuIj8c
HhsZGBUTCggEPzFSPx0fGxoYFhENCAUCQispP6+xpacFBVawGAwLBgEAAF6xsw0J
wl4/shEOCT6p0j8QzwUD2uBDQQA7"""

# test_email/data/python.tiff (1326 bytes, md5 d8580e24bfb05ec687436beb33838368)
_TIFF_B64 = """\
SUkqAAgEAAAAAAAAAAAAAAAAAAAAAAAATo3Ar0qGuu1Ig7T/RH6t/0B4p/88cZ73
N2iWkgAAAAsAAAADAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAEyKvP//////
RX+v/0F5qP8+dKL/Om+b/zZplP8AAAAoAAAACwAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAABJhbf/RoCx/0J7qv8+daP/O3Cd/zdqlv82aZT/AAAAQQAAABUAAAAA
AAAAAAAAAAAAAAAATo/EfkyKv6BIhbahQ32toz10oac5bJaqNmaQqjhsl/82aZT/
NmmU/wAAAEgAAAAYAAAAAAAAAAAAAAAAUpHGvU+Nwf9LiLv/SIO0/0R9rf9AeKb/
PXOg/zltmf82aZT/NmmU/zZplP8AAABI/+JV//3dSvf51T6CAAAAClCPw/9Mibz/
SIS1/0V/r/9Beaj/PXSh/zpvm/82aZT/NmmU/zZplP8yYIe2AAAAQ//eS///2kH/
/dU27QAAACRNi77/SYW3/0aAsP9Ce6r/PnWj/ztwnP83apb/NmmU/zVokvcyYIe2
AAAAT+zORYj/2kL//9Y3///TLf8AAAA9Soe5/0eBsv9DfKv/P3al/zZpk7YbMUVc
AAAATAAAAEgAAABHAAAAQeLDRWv92UH3/9c4///TLf//zyP/AAAARkaBsvdEfa3/
QHim/zZnkaoAAABO8uFupv3pavf/5mH//+NX///fTf//20L//9c4///TLv//zyT/
/csb9wAAAEdDfa7XQXmo/z10of8cMktb9eNvs//rbP//52H//+NX///fTf//20P/
/9c5///TLv//zyT//8wc//PBGsIAAABBQHWjbz1zovc6cJz/AAAAS//rbP//52L/
/+NY///fTv//20P//9c5///TL///zyT//8wc///MHP/CmhJ6AAAANAAAAAgAAAAh
AAAAPAAAADX/52L//+NY///fTv/oxz2q68U0qevCKqnrviGp67sYqeu7GKnGmxJ5
AAAAQQAAACAAAAACAAAACQAAABMAAAAS/+NY///fTv//20T//9c6///TMP//0CX/
/8wc/wAAAEEAAAA1AAAALAAAAB4AAAALAAAAAAAAAAAAAAAAAAAAAP3eTvf/20T/
/9g6///UMP//0Cb///////3LG/cAAABAAAAAHAAAAAkAAAAFAAAAAQAAAAAAAAAA
AAAAAAAAAADx0D9M+tM5zP3SL/f/0Cb//8wc//rHGdjAlxJ7AAAAOwAAABIAAAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAACAAAAB0AAAA1AAAAQgAAAEcAAABF
AAAAOAAAAB8AAAAIAAAAAAAAAAAAAAAAEQAAAQMAAQAAABAAAAABAQMAAQAAABAA
AAACAQMABAAAANoEAAADAQMAAQAAAAEAAAAGAQMAAQAAAAIAAAAKAQMAAQAAAAEA
AAANAQIADAAAACIFAAARAQQAAQAAAAgAAAASAQMAAQAAAAEAAAAVAQMAAQAAAAQA
AAAWAQMAAQAAAIAAAAAXAQQAAQAAAAAEAAAcAQMAAQAAAAEAAAApAQMAAgAAAAAA
AQA+AQUAAgAAABIFAAA/AQUABgAAAOIEAABSAQMAAQAAAAIAAAAAAAAACAAIAAgA
CAAACtej/////4DhelT/////AM3MTP////8AmpmZ/////4BmZib/////8ChcD///
//+AGw1Q/////wBYOVT/////cHl0aG9uLnRpZmYA"""

# test_email/data/python.jpg (543 bytes, md5 50e9104383c3f36fa9e9be6148e6fdf3)
_JPG_B64 = """\
/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgG
BgUGCQgKCgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMD
AwQDBAgEBAgQCwkLEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQ
EBAQEBAQEBAQEBAQEBD/wAARCAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAA
AAAAAAAABwQF/8QAJBAAAQQBBAICAwAAAAAAAAAAAQIDBAYFBwgSExEiABQJMTL/
xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAECBQMFAAAAAAAAAAAAAAECEQME
BQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLUlRzzEWPkJWW+ulrs
aUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks51+MiU/Ia
ad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5
SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPx
w2gEKcDQ/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KO
p1KM6iCNvngZHwetf//Z"""

# imghdrdata/python-raw.jpg (525 bytes, md5 0c8e1f05e648beb762aaff3b23124355)
_RAWJPG_B64 = """\
/9j/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgKCgkICQkKDA8MCgsO
CwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkLEBAQEBAQ
EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAAR
CAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQB
BAICAwAAAAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAA
AAAABv/EACMRAAECBQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEA
AhEDEQA/ABSm0mobc8HmExLUlRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuW
PZdskzXmm3fX5m2nF4GlVxx/HOpx4ks51+MiU/Iaad7UcUo4tILoS4kqcWkezS0h
O/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5SWVPuciFKRFLgSrwetnyPIB+
Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ/rs8AuA8VAe0vdl7
VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwetf//Z"""


def _fix(b64: str, md5: str) -> bytes:
    raw = base64.b64decode(b64)
    assert hashlib.md5(raw).hexdigest() == md5, "fixture corrupted"
    return raw


def _truth_rgb() -> np.ndarray:
    """Parse python.ppm (binary P6) with numpy only — no repo codec."""
    ppm = _fix(_PPM_B64, "a2b32811bb48fbf84e6a4ffa90b6a81c")
    assert ppm[:2] == b"P6"
    body = ppm[ppm.index(b"255\n") + 4:]
    return np.frombuffer(body, np.uint8).reshape(16, 16, 3)


def test_png_real_file_exact():
    """Real libpng-encoded python.png decodes bit-exact to the PPM
    truth on RGB; the alpha plane is pinned by hash (the PPM carries
    no alpha to compare against)."""
    from aresdb_spark.operators.multimodal import decode_png

    px = decode_png(_fix(_PNG_B64, "91f80d44b0a786e5b0b3049ad61159fa"))
    assert px.shape == (16, 16, 4) and px.dtype == np.uint8
    assert np.array_equal(px[:, :, :3], _truth_rgb())
    assert hashlib.md5(px[:, :, 3].tobytes()).hexdigest() == "fa1667e19ae1b259be670911674006a6"


def test_tiff_real_file_exact():
    from aresdb_spark.operators.tiff import decode_tiff

    px = decode_tiff(_fix(_TIFF_B64, "d8580e24bfb05ec687436beb33838368"))
    assert px.shape == (16, 16, 3)
    assert np.array_equal(px, _truth_rgb())


def test_bmp_real_file_exact_vs_png_rgba():
    """python.bmp is a V5-header 32-bit BI_BITFIELDS file (masks
    a=ff000000 r=ff0000 g=ff00 b=ff) — the r14 decode path. Its RGBA
    must equal python.png's RGBA bit-for-bit: two real encoders, two
    clean-room decoders, one source image."""
    from aresdb_spark.operators.bmp import decode_bmp
    from aresdb_spark.operators.multimodal import decode_png

    bmp = decode_bmp(_fix(_BMP_B64, "e3a1f317b1a275e5d5f1b4b0ff04ee01"))
    png = decode_png(_fix(_PNG_B64, "91f80d44b0a786e5b0b3049ad61159fa"))
    assert bmp.shape == (16, 16, 4)
    assert np.array_equal(bmp, png)
    assert np.array_equal(bmp[:, :, :3], _truth_rgb())


def test_gif_real_file_quantization_structure():
    """python.gif is 64-color quantized with GCE transparent index
    63 (GCT entry 63 happens to be black). Pins: >= 170/256 pixels
    decode EXACTLY equal to the truth; every remaining pixel is
    either bounded palette-quantization error (max channel diff
    <= 32) or the transparent index — and in that case the PNG twin
    shows the source pixel really was semi-transparent (alpha < 160),
    which is why the encoder sacrificed its color."""
    from aresdb_spark.operators.gif import decode_gif
    from aresdb_spark.operators.multimodal import decode_png

    raw = _fix(_GIF_B64, "bb6db723ceadf8ce03d5ad234f9d7273")
    px = decode_gif(raw)
    truth = _truth_rgb()
    assert px.shape == (16, 16, 3)
    diff = np.abs(px.astype(int) - truth.astype(int)).max(axis=2)
    assert (diff == 0).sum() >= 170
    alpha = decode_png(
        _fix(_PNG_B64, "91f80d44b0a786e5b0b3049ad61159fa"))[:, :, 3]
    gct = np.frombuffer(raw[13:13 + 192], np.uint8).reshape(64, 3)
    for y, x in zip(*np.where(diff > 32)):
        assert np.array_equal(px[y, x], gct[63]), (y, x)
        assert alpha[y, x] < 160, (y, x, alpha[y, x])


def test_jpeg_real_file_psnr_and_headerless_twin():
    """Real libjpeg-encoded baseline 4:2:0 file. The luma plane is
    full-resolution so its PSNR vs the pre-compression truth isolates
    Huffman+dequant+IDCT fidelity (>= 33 dB); RGB adds the inherent
    2x2 chroma-subsampling loss of a 16x16 logo (>= 21 dB). A broken
    entropy decode or IDCT lands far below either floor. Our exact
    output is hash-pinned for regression, and imghdrdata's
    python-raw.jpg (same scan, APP0/JFIF segment absent) must decode
    identically — real-world robustness to headerless JFIF."""
    from aresdb_spark.operators.jpeg import decode_jpeg

    px = decode_jpeg(_fix(_JPG_B64, "50e9104383c3f36fa9e9be6148e6fdf3"))
    truth = _truth_rgb().astype(float)
    dec = px.astype(float)
    assert px.shape == (16, 16, 3)

    def luma(a):
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]

    mse_y = ((luma(dec) - luma(truth)) ** 2).mean()
    mse = ((dec - truth) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse_y) >= 33.0
    assert 10 * np.log10(255 ** 2 / mse) >= 21.0
    assert hashlib.md5(px.tobytes()).hexdigest() == "dbb5d9878836c7edc21cfc2ce6115416"

    raw = decode_jpeg(_fix(_RAWJPG_B64, "0c8e1f05e648beb762aaff3b23124355"))
    assert np.array_equal(raw, px)

# test_email/data/python.pgm (269 bytes, md5 18ceaa0a28ec83628b429486f6a6a437)
_PGM_B64 = """\
UDUKMTYgMTYKMjU1CgAAAACDfXp1b2lhAAAAAAAAAAAAgP92cGxnYQAAAAAAAAAA
AHx3cm1oYmEAAAAAAACFgXx0bGRfZGFhAAAAAACHhH96dG9rZWFhYQDe2dIAhYB7
dnBsZ2FhYVkA2tfSAIF8d3JtaGJhYFkAytfT0AB+eHNuYS4AAAAAwNbU0M0AeHRv
YADc5OLf29jU0M3JAHRwbC/e5uLf29jU0M3KwABta2gA5uPf29jU0c3KypkAAAAA
AOPf28TDwLy5uZoAAAAAAADf29jU0c7KAAAAAAAAAAAA2tjV0c7/yQAAAAAAAAAA
AM3Qz87KxZYAAAAAAAAAAAAAAAAAAAAAAAAAAAA="""

# test_email/data/python.pbm (41 bytes, md5 4128214992ffcd16a57fd47c73558b58)
_PBM_B64 = """\
UDQKMTYgMTYK+3/xv/rf1X+tsVvxpWFfwVgBsAGwAfAH8B/wH/A///8="""

# test_email/data/python.ras (1056 bytes, md5 8c0f739219341ffae245b5ae0a63710f)
_RAS_B64 = """\
WaZqlQAAABAAAAAQAAAAIAAABAAAAAADAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
r06NwO1Khrr/SIO0/0R+rf9AeKf3PHGekjdolgsAAAADAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAAAAP9Mirz//////0V/r/9Beaj/PnSi/zpvm/82aZQoAAAA
CwAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAD/SYW3/0aAsf9Ce6r/PnWj
/ztwnf83apb/NmmUQQAAABUAAAAAAAAAAAAAAAAAAAAAAAAAfk6PxKBMir+hSIW2
o0N9rac9dKGqOWyWqjZmkP84bJf/NmmU/zZplEgAAAAYAAAAAAAAAAAAAAAAAAAA
vVKRxv9PjcH/S4i7/0iDtP9Efa3/QHim/z1zoP85bZn/NmmU/zZplP82aZRIAAAA
///iVff93UqC+dU+CgAAAP9Qj8P/TIm8/0iEtf9Ff6//QXmo/z10of86b5v/NmmU
/zZplP82aZS2MmCHQwAAAP//3kv//9pB7f3VNiQAAAD/TYu+/0mFt/9GgLD/Qnuq
/z51o/87cJz/N2qW/zZplPc1aJK2MmCHTwAAAIjszkX//9pC///WN///0y09AAAA
/0qHuf9HgbL/Q3yr/z92pbY2aZNcGzFFTAAAAEgAAABHAAAAQQAAAGviw0X3/dlB
///XOP//0y3//88jRgAAAPdGgbL/RH2t/0B4pqo2Z5FOAAAApvLhbvf96Wr//+Zh
///jV///303//9tC///XOP//0y7//88k9/3LG0cAAADXQ32u/0F5qP89dKFbHDJL
s/Xjb///62z//+dh///jV///303//9tD///XOf//0y7//88k///MHMLzwRpBAAAA
b0B1o/c9c6L/OnCcSwAAAP//62z//+di///jWP//307//9tD///XOf//0y///88k
///MHP//zBx6wpoSNAAAAAgAAAAhAAAAPAAAADUAAAD//+di///jWP//306q6Mc9
qevFNKnrwiqp674hqeu7GKnruxh5xpsSQQAAACAAAAACAAAACQAAABMAAAASAAAA
///jWP//307//9tE///XOv//0zD//9Al///MHEEAAAA1AAAALAAAAB4AAAALAAAA
AAAAAAAAAAAAAAAAAAAAAPf93k7//9tE///YOv//1DD//9Am//////f9yxtAAAAA
HAAAAAkAAAAFAAAAAQAAAAAAAAAAAAAAAAAAAAAAAABM8dA/zPrTOff90i///9Am
///MHNj6xxl7wJcSOwAAABIAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
CAAAAB0AAAA1AAAAQgAAAEcAAABFAAAAOAAAAB8AAAAIAAAAAAAAAAAAAAAAAAAA"""



def test_pnm_real_files_ppm_pgm_pbm():
    """The PPM truth itself re-parsed through the LIBRARY PNM decoder
    (the test-local numpy parse and operators/pnm.py must agree on a
    real file), plus the real python.pgm (Rec.-709 luma of the same
    image, every sample within 1 of rint(L709) computed from the PPM
    truth) and python.pbm (16x16 bilevel, 149 black pixels, pinned by
    hash)."""
    from aresdb_spark.operators.pnm import decode_pnm

    truth = _truth_rgb()
    assert np.array_equal(
        decode_pnm(_fix(_PPM_B64, "a2b32811bb48fbf84e6a4ffa90b6a81c")),
        truth)

    pgm = decode_pnm(_fix(_PGM_B64, "18ceaa0a28ec83628b429486f6a6a437"))
    assert pgm.shape == (16, 16) and pgm.dtype == np.uint8
    t = truth.astype(np.float64)
    l709 = (0.2126 * t[:, :, 0] + 0.7152 * t[:, :, 1]
            + 0.0722 * t[:, :, 2])
    assert np.abs(pgm.astype(np.float64) - np.rint(l709)).max() <= 1.0

    pbm = decode_pnm(_fix(_PBM_B64, "4128214992ffcd16a57fd47c73558b58"))
    assert pbm.shape == (16, 16)
    assert set(np.unique(pbm).tolist()) <= {0, 255}
    assert (pbm == 0).sum() == 149
    assert hashlib.md5(pbm.tobytes()).hexdigest() == \
        "18f43ca3b9a1b8a8cd74a641bb0faf44"


def test_ras_real_file_exact():
    """python.ras is a REAL Sun rasterfile (type 3 RT_FORMAT_RGB,
    32-bit with filler byte first) — it must decode bit-exact to the
    PPM truth, validating header walk, 16-bit row padding, the
    type-3 channel order and filler handling on bytes this repo did
    not encode."""
    from aresdb_spark.operators.pnm import decode_ras

    px = decode_ras(_fix(_RAS_B64, "8c0f739219341ffae245b5ae0a63710f"))
    assert px.shape == (16, 16, 3)
    assert np.array_equal(px, _truth_rgb())


# -- real audio fixtures (CPython Lib/test — located on disk, not
# embedded: the pluck clips are 13-28 KB each and CPython ships them
# wherever this library's test environment runs; skip cleanly if the
# stdlib test package has no audio data) ------------------------------

def _cpython_test_file(relpath: str) -> bytes:
    import os

    import pytest
    try:
        import test as _stdlib_test
        path = os.path.join(os.path.dirname(_stdlib_test.__file__),
                            relpath)
        with open(path, "rb") as fh:
            return fh.read()
    except (ImportError, OSError):
        pytest.skip(f"CPython test fixture {relpath} not available")


def test_au_real_files_exact_across_containers():
    """CPython's pluck clip is shipped as the SAME samples through
    three real containers at 24 and 32 bits: our AU, WAV and AIFF
    decoders must agree sample-for-sample on files none of this
    repo's encoders produced. (The 8/16-bit variants were dithered
    independently per container by their encoder — WAV and AIFF
    differ from each other too — so those pin BOUNDED instead.)"""
    from aresdb_spark.operators.audio import (decode_aiff, decode_au,
                                              decode_wav)

    for depth in (24, 32):
        au, r_au = decode_au(
            _cpython_test_file(f"audiodata/pluck-pcm{depth}.au"))
        wv, r_wv = decode_wav(
            _cpython_test_file(f"audiodata/pluck-pcm{depth}.wav"))
        af, r_af = decode_aiff(
            _cpython_test_file(f"audiodata/pluck-pcm{depth}.aiff"))
        assert r_au == r_wv == r_af == 11025
        assert au.shape == wv.shape == af.shape == (3307, 2)
        assert np.array_equal(au, wv) and np.array_equal(au, af), depth

    for depth, bound in ((8, 2), (16, 16)):
        au, _ = decode_au(
            _cpython_test_file(f"audiodata/pluck-pcm{depth}.au"))
        wv, _ = decode_wav(
            _cpython_test_file(f"audiodata/pluck-pcm{depth}.wav"))
        assert au.shape == wv.shape == (3307, 2)
        assert np.abs(au.astype(np.int64)
                      - wv.astype(np.int64)).max() <= bound, depth


def test_au_real_mulaw_with_annotation():
    """audiotest.au and sndhdr.au are the same REAL µ-law recording
    (8012 Hz mono, data offset 34 — a 10-byte annotation the header
    walk must skip); both decode identically through the G.711
    expander, with full-scale-plausible amplitudes."""
    from aresdb_spark.operators.audio import decode_au

    a, rate = decode_au(_cpython_test_file("audiotest.au"))
    b, rate2 = decode_au(
        _cpython_test_file("test_email/data/sndhdr.au"))
    assert rate == rate2 == 8012
    assert a.shape == b.shape == (28110, 1)
    assert np.array_equal(a, b)
    assert a.min() < -30000 and a.max() > 30000


def test_g711_real_aifc_bounded_vs_pcm_master():
    """pluck-ulaw/alaw.aifc are REAL G.711-companded encodings of the
    same clip: decoding them through the AIFF-C path must land within
    G.711 quantization error of the 16-bit PCM master (max step near
    full scale: µ-law 1008, A-law 1024 — measured max 644/512 here),
    and must NOT be bit-equal to it (they really are companded)."""
    from aresdb_spark.operators.audio import decode_aiff, decode_wav

    pcm16, _ = decode_wav(
        _cpython_test_file("audiodata/pluck-pcm16.wav"))
    for law in ("ulaw", "alaw"):
        g, rate = decode_aiff(
            _cpython_test_file(f"audiodata/pluck-{law}.aifc"))
        assert rate == 11025 and g.shape == pcm16.shape
        d = np.abs(g.astype(np.int64) - pcm16.astype(np.int64))
        assert 0 < d.max() <= 1024, law


def test_sndhdr_real_headers_decode():
    """The tiny sndhdr.{wav,aiff,aifc} fixtures (64-108 bytes, real
    encoder headers): all three decode to the same 5 stereo frames at
    44100 Hz through three different container walks."""
    from aresdb_spark.operators.audio import decode_aiff, decode_wav

    w, rw = decode_wav(_cpython_test_file("test_email/data/sndhdr.wav"))
    a, ra = decode_aiff(
        _cpython_test_file("test_email/data/sndhdr.aiff"))
    c, rc = decode_aiff(
        _cpython_test_file("test_email/data/sndhdr.aifc"))
    assert rw == ra == rc == 44100
    assert w.shape == a.shape == c.shape == (5, 2)
    assert np.array_equal(w, a) and np.array_equal(w, c)


def test_audio_fingerprint_invariant_on_real_files():
    """The r13 audio fingerprint's cross-container claim, proven on
    REAL external files: the same pluck samples through AU, WAV and
    AIFF yield the IDENTICAL 64-bit energy-delta fingerprint."""
    from aresdb_spark.operators.audio import (audio_fingerprint,
                                              decode_aiff, decode_au,
                                              decode_wav)

    fps = set()
    for rel, dec in (("audiodata/pluck-pcm24.au", decode_au),
                     ("audiodata/pluck-pcm24.wav", decode_wav),
                     ("audiodata/pluck-pcm24.aiff", decode_aiff)):
        s, _ = dec(_cpython_test_file(rel))
        fps.add(audio_fingerprint(s))
    assert len(fps) == 1

# test_email/data/python.sgi (1967 bytes, md5 11e019f5073be9f31a95f34929fec4e2)
_SGI_B64 = """\
AdoBAQADABAAEAAEAAAAAAAAAP8AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAQAAAAEGAAABE4AAASD
AAAEtAAABPMAAAUzAAAFdQAABbsAAAYCAAAGSAAABpAAAAbZAAAHFwAAB0gAAAd5
AAAEAwAABCUAAARZAAAEigAABMEAAAT/AAAFQAAABYQAAAXMAAAGFAAABlwAAAak
AAAG6AAAByQAAAdVAAAHhgAABAYAAAQyAAAEZgAABJcAAATRAAAFEwAABVQAAAWY
AAAF3wAABigAAAZwAAAGuAAABvcAAAcxAAAHYgAAB5MAAAQJAAAEPwAABHMAAASk
AAAE4QAABScAAAVoAAAFrAAABfIAAAY8AAAGhAAABswAAAcGAAAHPgAAB28AAAeg
AAAAAwAAAA0AAAALAAAABwAAAA0AAAAMAAAADQAAAA8AAAARAAAAEgAAABQAAAAU
AAAADwAAAA0AAAANAAAADQAAAAMAAAANAAAADQAAAA0AAAAQAAAAFAAAABQAAAAU
AAAAEwAAABQAAAAUAAAAFAAAAA8AAAANAAAADQAAAA0AAAADAAAADQAAAA0AAAAN
AAAAEAAAABQAAAAUAAAAFAAAABMAAAAUAAAAFAAAABQAAAAPAAAADQAAAA0AAAAN
AAAADwAAAA8AAAAQAAAAEAAAABIAAAAMAAAADQAAAA8AAAAQAAAADAAAAAwAAAAN
AAAAEQAAAAoAAAAKAAAADxAAABAAABAAAAQAiQgdNUJHRTgfCAMAAAQAh/H6/f//
+sAFAAAEAIfQ09LQzMeXBQAABACHPzkvJhwZEgUAAAQAiUzM9///2Hs7EgMAAAQA
gf0F/4H9BQAABACH3tvY1ND/ywUAAAQAh05EOjAm/xsFAAAEAIH3Bf+E90AcCQEF
AQEABAAH/wUAAAQAh+Pf29fT0MwFAAAEAIdYTkQ6MCUcBQAAhAIJExIH/4NBNSwB
HgELAAQAA/+B6AXrgcYCAAAEAIrn49/HxcK+u7ubAgAABACKYlhOPTQqIRgYEgIA
AIQIITw1A/+BqgWpgXkBQQEgAIRAPToACv8BwgEAAI51c3AA6+fj39vX08/MzAGa
AQAAjqOinABsYlhOQzkvJBwcARIBAACEb/f/Swr/AXoBNACFQ0E9HPUJ/wHzAQAA
jn15dDLj6+fj39vX08/MAcEBAACOrqihS29sYVdNQzkuJBwBGgEAAIXX//9bswn/
AcIBQQCHRkRANgDy/Qf/Af0BAACOgX14ZwDh6ebj39vX088BywEAAI6yraaRAG5q
YVdNQjguJAEbAQAAh/f//6pOpvcH/wH3AUcAhkpHQz82GwQAguL9A/8BAACGh4F8
dmkxBACEw9nX0wHPAQAAhrmyq6WTRQQAhEVBOC0BIwEAAAT/iLZcTEhHQWv3A/8B
RgCMTUlGQj47NzY1MgDsA/8BAACOi4WAe3VwamloYADO2tYB0wEAAI6+t7Cqo5yW
lJKHAEVCNwEtAQAACP+E97ZPiAP/AT0Ah1BMSEVBPToDNoQyAP//Af0BAACHj4mE
f3l0bwNphGAA3toB1QEAAIfDvLWvqKGbA5SEhwBLQQE2AQAACv+EtkP//wHtASQA
iFJPS0hEQD05AzaDAP/9AfkBAACIkY2Ig314c20DaYMA4t0B1QEAAIjGwbu0raag
mQOUgwBVSgE+AQAAgb0K/4NI//cBggEKAIsATkxIQz05Njg2NgUAAIsAj4qFfXRs
ZmxpaQUAAIsAxL+2raGWkJeUlAUAAIgAfqCho6eqqgP/gkgYAwAABACHSUZCPjs3
NgUAAAQAh4WAe3VwamkFAAAEAIe3saqjnZaUBQAABAAH/4JBFQMAAAQAh0z/RUE+
OjYFAAAEAIeK/395dG9pBQAABACHvP+vqKKblAUAAAQAB/+CKAsDAAAEAIdOSkhE
QDw3BQAABACHjYaDfnhxaAUAAAQAh8C6tK2nnpYFAAAEAIKv7QP/hPeSCwMDAAA="""

# test_email/data/python.xbm (282 bytes, md5 e06d14d23530d4dab478937be8bbb47e)
_XBM_B64 = """\
I2RlZmluZSBweXRob25fd2lkdGggMTYKI2RlZmluZSBweXRob25faGVpZ2h0IDE2
CnN0YXRpYyBjaGFyIHB5dGhvbl9iaXRzW10gPSB7CiAgMHhERiwgMHhGRSwgMHg4
RiwgMHhGRCwgMHg1RiwgMHhGQiwgMHhBQiwgMHhGRSwgMHhCNSwgMHg4RCwgMHhE
QSwgMHg4RiwgCiAgMHhBNSwgMHg4NiwgMHhGQSwgMHg4MywgMHgxQSwgMHg4MCwg
MHgwRCwgMHg4MCwgMHgwRCwgMHg4MCwgMHgwRiwgMHhFMCwgCiAgMHgwRiwgMHhG
OCwgMHgwRiwgMHhGOCwgMHgwRiwgMHhGQywgMHhGRiwgMHhGRiwgfTsK"""


def test_sgi_real_file_exact_vs_png_rgba():
    """python.sgi is a REAL RLE-stored 16x16x4 SGI RGB file: its RGBA
    must equal python.png's bit-for-bit (plane-separated bottom-up
    RLE scanlines vs libpng output — a third independent real encoder
    agreeing with the clean-room decoders on the same source)."""
    from aresdb_spark.operators.multimodal import decode_png
    from aresdb_spark.operators.pnm import decode_sgi

    sgi = decode_sgi(_fix(_SGI_B64, "11e019f5073be9f31a95f34929fec4e2"))
    png = decode_png(_fix(_PNG_B64, "91f80d44b0a786e5b0b3049ad61159fa"))
    assert sgi.shape == (16, 16, 4)
    assert np.array_equal(sgi, png)
    assert np.array_equal(sgi[:, :, :3], _truth_rgb())


def test_xbm_real_file_equals_pbm():
    """python.xbm (real X11 C-source text) must decode to the exact
    same bilevel image as python.pbm — LSB-first hex bytes vs
    MSB-first packed bits, one thresholded source."""
    from aresdb_spark.operators.pnm import decode_pnm, decode_xbm

    xbm = decode_xbm(_fix(_XBM_B64, "e06d14d23530d4dab478937be8bbb47e"))
    pbm = decode_pnm(_fix(_PBM_B64, "4128214992ffcd16a57fd47c73558b58"))
    assert xbm.shape == (16, 16)
    assert np.array_equal(xbm, pbm)


def test_sine_real_aiff_semantic():
    """Sine-1000Hz-300ms.aif (a real 48 kHz stereo AIFF): the decoded
    waveform must actually BE a ~1 kHz tone — 299-301 positive-going
    zero crossings over the 14400-frame (300 ms) clip, both channels
    identical, symmetric amplitude. A broken f80 rate parse, byte
    order or channel de-interleave breaks the frequency estimate or
    the channel equality, not just a checksum."""
    from aresdb_spark.operators.audio import decode_aiff

    s, rate = decode_aiff(_cpython_test_file("Sine-1000Hz-300ms.aif"))
    assert rate == 48000 and s.shape == (14400, 2)
    assert np.array_equal(s[:, 0], s[:, 1])
    x = s[:, 0].astype(np.float64)
    crossings = int(np.sum((x[:-1] < 0) & (x[1:] >= 0)))
    assert 299 <= crossings <= 301
    assert abs(int(x.max()) + int(x.min())) <= 2   # symmetric tone
