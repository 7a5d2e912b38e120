"""Baseline JPEG codec: bit-exact scalar twin + format-machinery tests.

The engine (``functions/jpeg.py``) is all fixed-point integer math, so
the twin here — independent scalar double-loops over the documented
contract (Q15 DCT basis, round-half-away divides, Q16 color constants,
(a+b+c+d+2)>>2 chroma averaging, edge-replication padding, replication
upsample) — must agree EXACTLY, not approximately. decode(encode(img))
is deterministic end to end, so the whole pipeline is pinned without a
reference binary.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from super_speedy_syslog_searcher_spark.functions.imaging import ImageFormatError
from super_speedy_syslog_searcher_spark.functions import jpeg as J


# ---------------------------------------------------------------------------
# the independent scalar twin
# ---------------------------------------------------------------------------


def _twin_cfix():
    m = [[0] * 8 for _ in range(8)]
    for u in range(8):
        a = math.sqrt(1.0 / 8.0) if u == 0 else 0.5
        for x in range(8):
            v = a * math.cos((2 * x + 1) * u * math.pi / 16.0) * 32768.0
            m[u][x] = int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)
    return m


_TC = _twin_cfix()


def _tdiv(num: int, den: int) -> int:
    s = 1 if num >= 0 else -1
    return s * ((abs(num) + den // 2) // den)


def _twin_fdct_quant(block, q):
    """block: 8x8 python ints (level-shifted); q: 8x8 ints."""
    out = [[0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            acc = 0
            for x in range(8):
                for y in range(8):
                    acc += _TC[u][x] * block[x][y] * _TC[v][y]
            out[u][v] = _tdiv(acc, q[u][v] << 30)
    return out


def _twin_dequant_idct(coef, q):
    out = [[0] * 8 for _ in range(8)]
    for x in range(8):
        for y in range(8):
            acc = 0
            for u in range(8):
                for v in range(8):
                    acc += _TC[u][x] * coef[u][v] * q[u][v] * _TC[v][y]
            s = _tdiv(acc, 1 << 30) + 128
            out[x][y] = min(255, max(0, s))
    return out


def _twin_rgb_to_ycbcr(r, g, b):
    y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    cb = ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16) + 128
    cr = ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128
    clip = lambda v: min(255, max(0, v))
    return clip(y), clip(cb), clip(cr)


def _twin_ycbcr_to_rgb(y, cb, cr):
    cb, cr = cb - 128, cr - 128
    r = y + ((91881 * cr + 32768) >> 16)
    g = y - ((22554 * cb + 46802 * cr + 32768) >> 16)
    b = y + ((116130 * cb + 32768) >> 16)
    clip = lambda v: min(255, max(0, v))
    return clip(r), clip(g), clip(b)


def _grow(plane, th, tw):
    h = len(plane)
    w = len(plane[0])
    rows = [list(row) + [row[-1]] * (tw - w) for row in plane]
    while len(rows) < th:
        rows.append(list(rows[-1]))
    return rows


def _twin_plane_roundtrip(plane, q, mcu_h, mcu_w):
    """Pad to the MCU grid, per-block fdct+quant then dequant+idct; the
    scalar expectation of what the codec does to one component plane."""
    h = len(plane)
    w = len(plane[0])
    th = ((h + mcu_h - 1) // mcu_h) * mcu_h
    tw = ((w + mcu_w - 1) // mcu_w) * mcu_w
    p = _grow(plane, th, tw)
    out = [[0] * tw for _ in range(th)]
    for by in range(th // 8):
        for bx in range(tw // 8):
            blk = [[p[by * 8 + i][bx * 8 + j] - 128 for j in range(8)] for i in range(8)]
            rec = _twin_dequant_idct(_twin_fdct_quant(blk, q), q)
            for i in range(8):
                for j in range(8):
                    out[by * 8 + i][bx * 8 + j] = rec[i][j]
    return out


def _twin_decode_of_encode(img: np.ndarray, quality: int, subsampling: str) -> np.ndarray:
    """Full scalar pipeline: exactly what decode(encode(img)) must yield."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    qy = [[int(v) for v in row] for row in J.quality_scale(J._QUANT_LUMA, quality)]
    qc = [[int(v) for v in row] for row in J.quality_scale(J._QUANT_CHROMA, quality)]
    if nch == 1:
        plane = [[int(img[i, j, 0]) for j in range(w)] for i in range(h)]
        rec = _twin_plane_roundtrip(plane, qy, 8, 8)
        return np.array([[rec[i][j] for j in range(w)] for i in range(h)], dtype=np.uint8)[
            :, :, None
        ]
    ys = [[0] * w for _ in range(h)]
    cbs = [[0] * w for _ in range(h)]
    crs = [[0] * w for _ in range(h)]
    for i in range(h):
        for j in range(w):
            y, cb, cr = _twin_rgb_to_ycbcr(*(int(v) for v in img[i, j]))
            ys[i][j], cbs[i][j], crs[i][j] = y, cb, cr
    if subsampling == "444":
        ry = _twin_plane_roundtrip(ys, qy, 8, 8)
        rcb = _twin_plane_roundtrip(cbs, qc, 8, 8)
        rcr = _twin_plane_roundtrip(crs, qc, 8, 8)
    else:  # 420
        # edge-padding composes: pad-to-2 then pad-to-16 ≡ pad-to-16, and
        # ceil(ceil(w/2)/8) == ceil(w/16), so twin padding to multiples
        # reproduces the engine's absolute MCU-grid targets exactly
        h2 = ((h + 1) // 2) * 2
        w2 = ((w + 1) // 2) * 2
        cbp = _grow(cbs, h2, w2)
        crp = _grow(crs, h2, w2)
        sub = lambda p: [
            [
                (p[2 * i][2 * j] + p[2 * i][2 * j + 1] + p[2 * i + 1][2 * j] + p[2 * i + 1][2 * j + 1] + 2)
                >> 2
                for j in range(w2 // 2)
            ]
            for i in range(h2 // 2)
        ]
        ry = _twin_plane_roundtrip(ys, qy, 16, 16)
        rcb = _twin_plane_roundtrip(sub(cbp), qc, 8, 8)
        rcr = _twin_plane_roundtrip(sub(crp), qc, 8, 8)
        # replication upsample 2x2 back to full resolution
        rcb = [[rcb[i // 2][j // 2] for j in range(w)] for i in range(h)]
        rcr = [[rcr[i // 2][j // 2] for j in range(w)] for i in range(h)]
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for i in range(h):
        for j in range(w):
            out[i, j] = _twin_ycbcr_to_rgb(ry[i][j], rcb[i][j], rcr[i][j])
    return out


# ---------------------------------------------------------------------------
# kernel-level twins
# ---------------------------------------------------------------------------


def test_fdct_quant_matches_scalar_twin():
    rng = np.random.default_rng(7)
    blocks = rng.integers(-128, 128, size=(5, 8, 8), dtype=np.int64)
    q = J.quality_scale(J._QUANT_LUMA, 85)
    got = J.fdct_quant(blocks, q)
    for n in range(5):
        want = _twin_fdct_quant(
            [[int(blocks[n, i, j]) for j in range(8)] for i in range(8)],
            [[int(v) for v in row] for row in q],
        )
        assert got[n].tolist() == want


def test_dequant_idct_matches_scalar_twin():
    rng = np.random.default_rng(8)
    coefs = rng.integers(-200, 200, size=(4, 8, 8), dtype=np.int64)
    coefs[:, 4:, 4:] = 0
    q = J.quality_scale(J._QUANT_CHROMA, 70)
    got = J.dequant_idct(coefs, q)
    for n in range(4):
        want = _twin_dequant_idct(
            [[int(coefs[n, i, j]) for j in range(8)] for i in range(8)],
            [[int(v) for v in row] for row in q],
        )
        assert got[n].tolist() == want


def test_color_transforms_match_scalar_twin():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    ycc = J.rgb_to_ycbcr(img)
    for i in range(6):
        for j in range(5):
            assert tuple(int(v) for v in ycc[i, j]) == _twin_rgb_to_ycbcr(
                *(int(v) for v in img[i, j])
            )
    y, cb, cr = (ycc[:, :, k].astype(np.int64) for k in range(3))
    rgb = J.ycbcr_to_rgb(y, cb, cr)
    for i in range(6):
        for j in range(5):
            assert tuple(int(v) for v in rgb[i, j]) == _twin_ycbcr_to_rgb(
                int(y[i, j]), int(cb[i, j]), int(cr[i, j])
            )


def test_zigzag_table_is_a_complete_antidiagonal_scan():
    cells = list(zip(J._ZZ_ROWS.tolist(), J._ZZ_COLS.tolist()))
    assert sorted(cells) == [(r, c) for r in range(8) for c in range(8)]
    sums = [r + c for r, c in cells]
    assert sums == sorted(sums)  # strictly antidiagonal-ordered scan


# ---------------------------------------------------------------------------
# end-to-end roundtrips vs the full scalar pipeline
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape,quality", [((16, 24), 85), ((8, 8), 95), ((17, 13), 60)])
def test_roundtrip_gray_exact(shape, quality):
    rng = np.random.default_rng(sum(shape) + quality)
    img = rng.integers(0, 256, size=(*shape, 1), dtype=np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(img, quality=quality))
    want = _twin_decode_of_encode(img, quality, "444")
    assert got.shape == want.shape
    assert np.array_equal(got, want)


@pytest.mark.parametrize("shape,quality", [((16, 16), 85), ((24, 18), 75), ((9, 21), 50)])
def test_roundtrip_rgb_444_exact(shape, quality):
    rng = np.random.default_rng(sum(shape) * quality)
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(img, quality=quality, subsampling="444"))
    want = _twin_decode_of_encode(img, quality, "444")
    assert np.array_equal(got, want)


@pytest.mark.parametrize("shape", [(32, 32), (16, 16), (18, 22), (15, 17)])
def test_roundtrip_rgb_420_exact(shape):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(img, quality=80, subsampling="420"))
    want = _twin_decode_of_encode(img, 80, "420")
    assert np.array_equal(got, want)


def test_smooth_image_survives_high_quality():
    """Sanity beyond twin-exactness: q=100 on a smooth ramp is near-lossless."""
    x = np.linspace(0, 255, 32)
    img = np.rint((x[None, :] + x[:, None]) / 2).astype(np.uint8)[:, :, None]
    rec = J.decode_jpeg(J.encode_jpeg(img, quality=100))
    assert int(np.max(np.abs(rec.astype(int) - img.astype(int)))) <= 3


def test_restart_markers_roundtrip_identically():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    plain = J.encode_jpeg(img, quality=80, subsampling="420")
    rst = J.encode_jpeg(img, quality=80, subsampling="420", restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
    assert np.array_equal(J.decode_jpeg(plain), J.decode_jpeg(rst))


def test_all_ones_code_never_emitted():
    """Annex C's reserved-code rule: no emitted code is all 1-bits."""
    table, payload = J._build_enc_table([0, 1, 2, 3, 4, 5, 6, 7])
    for sym, (code, length) in table.items():
        assert code != (1 << length) - 1
    bits = payload[:16]
    n = sum(bits)
    (length,) = [i + 1 for i, b in enumerate(bits) if b]
    assert n < (1 << length)


# ---------------------------------------------------------------------------
# format machinery / containment
# ---------------------------------------------------------------------------


def test_header_dims_parse_via_multimodal():
    from super_speedy_syslog_searcher_spark.operators.multimodal import parse_image_header

    img = np.zeros((13, 29, 3), dtype=np.uint8)
    payload = J.encode_jpeg(img, quality=70)
    assert parse_image_header(payload) == (29, 13, "jpeg")


def test_progressive_and_garbage_are_contained():
    with pytest.raises(ImageFormatError):
        J.decode_jpeg(b"\x00\x11\x22")
    img = np.zeros((8, 8, 1), dtype=np.uint8)
    payload = bytearray(J.encode_jpeg(img))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(ImageFormatError):
        J.decode_jpeg(bytes(payload))
    with pytest.raises(ImageFormatError):
        J.decode_jpeg(bytes(J.encode_jpeg(img))[:20])  # truncated


def test_byte_stuffing_region_decodes():
    """An image tuned to emit 0xFF entropy bytes still roundtrips (the
    FF00 stuffing path on both sides)."""
    rng = np.random.default_rng(1234)
    for seed in range(4):
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        enc = J.encode_jpeg(img, quality=90)
        assert np.array_equal(
            J.decode_jpeg(enc), _twin_decode_of_encode(img, 90, "444")
        )


def test_16bit_dqt_and_fill_bytes_decode():
    """Decoder generality beyond our encoder's output: the same stream
    with (a) the DQT rewritten in 16-bit (Pq=1) precision and (b) fill
    0xFF bytes padded before a marker decodes identically."""
    import struct as _struct

    img = np.arange(64, dtype=np.uint8).reshape(8, 8, 1) * 3
    base = J.encode_jpeg(img, quality=75)
    want = J.decode_jpeg(base)

    # locate the DQT segment (FF DB), rewrite its payload as Pq=1
    at = base.find(b"\xff\xdb")
    (seglen,) = _struct.unpack(">H", base[at + 2 : at + 4])
    seg = base[at + 4 : at + 2 + seglen]
    assert seg[0] == 0x00  # 8-bit table 0
    vals = seg[1:65]
    seg16 = bytes([0x10]) + b"".join(_struct.pack(">H", v) for v in vals)
    rebuilt = (
        base[:at]
        + b"\xff\xdb"
        + _struct.pack(">H", 2 + len(seg16))
        + seg16
        + base[at + 2 + seglen :]
    )
    assert np.array_equal(J.decode_jpeg(rebuilt), want)

    # fill bytes: pad 0xFF before the SOF marker
    sof = rebuilt.find(b"\xff\xc0")
    padded = rebuilt[:sof] + b"\xff\xff\xff" + rebuilt[sof:]
    assert np.array_equal(J.decode_jpeg(padded), want)
