"""GIF LZW codec: exactness twins + LZW machinery tests.

Everything integer: decode(encode(img)) must equal the scalar
cube-quantize twin exactly; cube-exact images roundtrip losslessly.
"""

from __future__ import annotations

import numpy as np
import pytest

from super_speedy_syslog_searcher_spark.functions.imaging import ImageFormatError
from super_speedy_syslog_searcher_spark.functions import gif as G


def _twin_quantized_rgb(img: np.ndarray) -> np.ndarray:
    """Scalar twin of cube_quantize∘palette: nearest 6-level per channel."""
    h, w, _ = img.shape
    out = np.zeros_like(img)
    for i in range(h):
        for j in range(w):
            for c in range(3):
                lv = min(5, (int(img[i, j, c]) + 25) // 51)
                out[i, j, c] = lv * 51
    return out


def test_lzw_roundtrip_random_and_runs():
    rng = np.random.default_rng(3)
    cases = [
        rng.integers(0, 216, size=500, dtype=np.uint8).tobytes(),
        bytes([7] * 1000),                      # KwKwK-heavy runs
        bytes(range(216)) * 30,                 # dictionary growth
        b"",
        b"\x00",
    ]
    for px in cases:
        enc = G.lzw_encode(px, 8)
        assert G.lzw_decode(enc, 8, len(px)) == px


def test_lzw_dict_reset_path():
    """> 4096 distinct strings forces a mid-stream CLEAR + reset."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 216, size=30000, dtype=np.uint8).tobytes()
    enc = G.lzw_encode(px, 8)
    assert G.lzw_decode(enc, 8, len(px)) == px


def test_lzw_width_growth_boundary():
    """A stream long enough to cross the 9→10→11-bit boundaries."""
    px = bytes((i * 7 + (i >> 3)) % 216 for i in range(8000))
    enc = G.lzw_encode(px, 8)
    assert G.lzw_decode(enc, 8, len(px)) == px


@pytest.mark.parametrize("shape", [(16, 16), (7, 31), (1, 1), (40, 3)])
def test_roundtrip_equals_cube_twin(shape):
    rng = np.random.default_rng(shape[0] * 13 + shape[1])
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    got = G.decode_gif(G.encode_gif(img))
    assert got.shape == (*shape, 3)
    assert np.array_equal(got, _twin_quantized_rgb(img))


def test_cube_exact_image_is_lossless():
    rng = np.random.default_rng(5)
    img = (rng.integers(0, 6, size=(12, 18, 3)) * 51).astype(np.uint8)
    assert np.array_equal(G.decode_gif(G.encode_gif(img)), img)


def test_interlaced_roundtrip():
    rng = np.random.default_rng(6)
    img = (rng.integers(0, 6, size=(13, 9, 3)) * 51).astype(np.uint8)
    enc = G.encode_gif(img, interlace=True)
    assert np.array_equal(G.decode_gif(enc), img)
    # interlaced and sequential encodes decode identically
    assert np.array_equal(G.decode_gif(enc), G.decode_gif(G.encode_gif(img)))


def test_interlace_row_order_is_a_permutation():
    for h in (1, 2, 7, 8, 13, 64):
        assert sorted(G._interlace_row_order(h)) == list(range(h))


def test_gray_and_rgba_inputs():
    g = np.linspace(0, 255, 64, dtype=np.uint8).reshape(8, 8)
    out = G.decode_gif(G.encode_gif(g))
    assert out.shape == (8, 8, 3)
    rgba = np.zeros((4, 4, 4), dtype=np.uint8)
    rgba[:, :, 0] = 255
    rgba[:, :, 3] = 7
    out = G.decode_gif(G.encode_gif(rgba))
    assert np.array_equal(out[:, :, 0], np.full((4, 4), 255))


def test_extension_blocks_are_skipped():
    img = (np.ones((3, 3, 3)) * 51).astype(np.uint8)
    enc = bytearray(G.encode_gif(img))
    # splice a Graphic Control Extension right before the image descriptor
    desc_at = enc.index(0x2C, 13 + 768)
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    spliced = bytes(enc[:desc_at]) + gce + bytes(enc[desc_at:])
    assert np.array_equal(G.decode_gif(spliced), img)


def test_containment():
    with pytest.raises(ImageFormatError):
        G.decode_gif(b"NOTAGIF")
    from super_speedy_syslog_searcher_spark.operators.multimodal import build_gif

    with pytest.raises(ImageFormatError):
        G.decode_gif(build_gif(8, 8))  # header-only stub: no image data
    img = (np.ones((4, 4, 3)) * 102).astype(np.uint8)
    with pytest.raises(ImageFormatError):
        G.decode_gif(G.encode_gif(img)[:40])  # truncated mid-palette


def test_header_dims_parse_via_multimodal():
    from super_speedy_syslog_searcher_spark.operators.multimodal import parse_image_header

    img = np.zeros((5, 11, 3), dtype=np.uint8)
    assert parse_image_header(G.encode_gif(img)) == (11, 5, "gif")
