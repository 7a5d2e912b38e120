"""Pure-Python PNG/BMP codecs + bilinear kernel (functions/imaging.py)
and the real-pixel resize operator (operators/multimodal.resize_images)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from super_speedy_syslog_searcher_spark.functions.imaging import (
    ImageFormatError,
    bilinear_resize,
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
)


def _rand(h, w, c, seed):
    return np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)


class TestPngRoundtrip:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_all_filters_all_colortypes(self, channels, filter_type):
        img = _rand(13, 9, channels, seed=channels * 10 + filter_type)
        blob = encode_png(img, filter_type=filter_type)
        got = decode_png(blob)
        assert got.shape == img.shape
        assert np.array_equal(got, img)

    def test_header_matches_parser(self):
        from super_speedy_syslog_searcher_spark.operators.multimodal import (
            parse_image_header,
        )

        blob = encode_png(_rand(5, 7, 3, seed=1))
        assert parse_image_header(blob) == (7, 5, "png")

    def test_header_only_stub_png_raises(self):
        from super_speedy_syslog_searcher_spark.operators.multimodal import build_png

        with pytest.raises(ImageFormatError):
            decode_png(build_png(32, 16))  # no IDAT

    def test_palette_rejected(self):
        img = _rand(4, 4, 3, seed=2)
        blob = bytearray(encode_png(img))
        blob[25] = 3  # color type byte inside IHDR → palette
        with pytest.raises(ImageFormatError):
            decode_png(bytes(blob))


class TestBmpRoundtrip:
    @pytest.mark.parametrize("w", [3, 4, 5, 6])  # exercise all paddings
    def test_24bit(self, w):
        img = _rand(7, w, 3, seed=w)
        got = decode_bmp(encode_bmp(img))
        assert np.array_equal(got, img)

    def test_32bit_and_topdown(self):
        img = _rand(3, 2, 4, seed=9)
        # hand-build a 32-bit top-down BMP (height negative, BGRA order)
        import struct

        h, w, _ = img.shape
        body = img[:, :, [2, 1, 0, 3]].tobytes()
        hdr = (
            b"BM"
            + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(body), 0, 0, 0, 0)
        )
        got = decode_bmp(hdr + body)
        assert np.array_equal(got, img)

    def test_header_only_stub_bmp_raises(self):
        from super_speedy_syslog_searcher_spark.operators.multimodal import build_bmp

        with pytest.raises(ImageFormatError):
            decode_bmp(build_bmp(1920, 1080))


def _scalar_bilinear(img, tw, th):
    """Independent scalar double-loop reference of the same convention
    (half-pixel centers, clamped edges)."""
    h, w, c = img.shape
    out = np.zeros((th, tw, c), dtype=np.uint8)
    for y in range(th):
        sy = (y + 0.5) * h / th - 0.5
        fy = sy - np.floor(sy)
        y0 = min(max(int(np.floor(sy)), 0), h - 1)
        y1 = min(max(int(np.floor(sy)) + 1, 0), h - 1)
        for x in range(tw):
            sx = (x + 0.5) * w / tw - 0.5
            fx = sx - np.floor(sx)
            x0 = min(max(int(np.floor(sx)), 0), w - 1)
            x1 = min(max(int(np.floor(sx)) + 1, 0), w - 1)
            for k in range(c):
                v = (
                    img[y0, x0, k] * (1 - fy) * (1 - fx)
                    + img[y0, x1, k] * (1 - fy) * fx
                    + img[y1, x0, k] * fy * (1 - fx)
                    + img[y1, x1, k] * fy * fx
                )
                out[y, x, k] = np.uint8(np.rint(v))
    return out


class TestBilinear:
    @pytest.mark.parametrize("shape", [(8, 6, 3), (5, 5, 1), (3, 7, 4)])
    @pytest.mark.parametrize("target", [(4, 3), (12, 10), (1, 1), (7, 7)])
    def test_matches_scalar_reference(self, shape, target):
        img = _rand(*shape, seed=sum(shape) + sum(target))
        tw, th = target
        assert np.array_equal(bilinear_resize(img, tw, th), _scalar_bilinear(img, tw, th))

    def test_hand_computed_fixture(self):
        # 1x2 [0, 255] → 1x4: centers at src x = -0.25, 0.25, 0.75, 1.25
        img = np.array([[[0], [255]]], dtype=np.uint8)
        got = bilinear_resize(img, 4, 1).reshape(-1)
        assert got.tolist() == [0, 64, 191, 255]

    def test_identity(self):
        img = _rand(6, 5, 3, seed=3)
        assert np.array_equal(bilinear_resize(img, 5, 6), img)


class TestResizeOperator:
    def test_real_kernel_on_png_and_bmp(self, spark):
        from super_speedy_syslog_searcher_spark.operators.multimodal import (
            resize_images,
        )

        img = _rand(8, 8, 3, seed=11)
        df = spark.createDataFrame(
            [
                ("png", bytearray(encode_png(img))),
                ("bmp", bytearray(encode_bmp(img))),
            ],
            "media_id string, payload binary",
        )
        got = {r["media_id"]: r for r in resize_images(df, 4, 4).collect()}
        want = bilinear_resize(img, 4, 4)
        for kind, dec in (("png", decode_png), ("bmp", decode_bmp)):
            r = got[kind]
            assert r["ok"] and r["kernel"] == "bilinear"
            assert (r["src_width"], r["src_height"]) == (8, 8)
            assert np.array_equal(dec(bytes(r["payload"])), want)

    def test_real_kernel_on_jpeg_and_gif(self, spark):
        """r5 closes the stub class: real JPEG and GIF payloads run the
        pixel kernel end to end through the Spark operator — decode →
        bilinear → re-encode in-format — and the output payload decodes
        to exactly what the local codec composition produces."""
        from super_speedy_syslog_searcher_spark.functions.gif import (
            decode_gif,
            encode_gif,
        )
        from super_speedy_syslog_searcher_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )
        from super_speedy_syslog_searcher_spark.operators.multimodal import (
            resize_images,
        )

        img = _rand(16, 16, 3, seed=12)
        payloads = {"jpeg": encode_jpeg(img, quality=85), "gif": encode_gif(img)}
        df = spark.createDataFrame(
            [(k, bytearray(v)) for k, v in payloads.items()],
            "media_id string, payload binary",
        )
        got = {r["media_id"]: r for r in resize_images(df, 8, 8).collect()}
        for kind, dec, enc in (
            ("jpeg", decode_jpeg, encode_jpeg),
            ("gif", decode_gif, encode_gif),
        ):
            r = got[kind]
            assert r["ok"] and r["kernel"] == "bilinear", kind
            assert (r["src_width"], r["src_height"]) == (16, 16)
            want = enc(bilinear_resize(dec(payloads[kind]), 8, 8))
            assert bytes(r["payload"]) == bytes(want)

    def test_header_only_jpeg_falls_back_to_stub(self, spark):
        from super_speedy_syslog_searcher_spark.operators.multimodal import (
            build_jpeg,
            build_png,
            parse_image_header,
            resize_images,
        )

        df = spark.createDataFrame(
            [
                ("jpeg", bytearray(build_jpeg(64, 32))),
                ("hdr_png", bytearray(build_png(64, 32))),
                ("junk", bytearray(b"??")),
            ],
            "media_id string, payload binary",
        )
        got = {r["media_id"]: r for r in resize_images(df, 16, 16).collect()}
        assert got["jpeg"]["kernel"] == "header-stub"
        assert got["hdr_png"]["kernel"] == "header-stub"
        assert parse_image_header(bytes(got["jpeg"]["payload"])) == (16, 16, "jpeg")
        assert not got["junk"]["ok"] and got["junk"]["payload"] is None


class TestPixelFeatures:
    def test_real_pixel_kernel_for_png_bmp(self, spark):
        """r5: embed_features computes from REAL pixels for png/bmp — a
        re-encode of the same picture in the other format lands at
        cosine ~1, an unrelated picture doesn't; byte-level features
        could not do that (different container bytes, same pixels)."""
        from super_speedy_syslog_searcher_spark.operators.multimodal import (
            embed_features,
        )

        rng = np.random.RandomState(5)
        a = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        b = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [
                ("a_png", bytearray(encode_png(a))),
                ("a_bmp", bytearray(encode_bmp(a))),
                ("b_png", bytearray(encode_png(b))),
            ],
            "media_id string, payload binary",
        )
        rows = {r["media_id"]: r for r in embed_features(df, dim=64).collect()}
        assert all(r["kernel"] == "pixels" for r in rows.values())

        def cos(x, y):
            x, y = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
            return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))

        same = cos(rows["a_png"]["vec"], rows["a_bmp"]["vec"])
        diff = cos(rows["a_png"]["vec"], rows["b_png"]["vec"])
        assert same > 0.999999  # identical pixels, different container
        assert diff < same - 0.001

    def test_pixel_kernel_for_jpeg_and_gif(self, spark):
        """Same picture as PNG / JPEG / GIF → all three run the pixels
        kernel and land close in cosine (JPEG is lossy and GIF is
        cube-quantized, so near-1 rather than exactly 1), and all are
        farther from an unrelated picture."""
        from super_speedy_syslog_searcher_spark.functions.gif import encode_gif
        from super_speedy_syslog_searcher_spark.functions.jpeg import encode_jpeg
        from super_speedy_syslog_searcher_spark.operators.multimodal import (
            embed_features,
        )

        x = np.linspace(0, 255, 32)
        a = np.rint(np.broadcast_to(x[None, :, None], (32, 32, 3))).astype(np.uint8)
        b = np.rint(np.broadcast_to(x[::-1][:, None, None], (32, 32, 3))).astype(
            np.uint8
        )
        df = spark.createDataFrame(
            [
                ("a_png", bytearray(encode_png(np.ascontiguousarray(a)))),
                ("a_jpg", bytearray(encode_jpeg(np.ascontiguousarray(a), quality=90))),
                ("a_gif", bytearray(encode_gif(np.ascontiguousarray(a)))),
                ("b_png", bytearray(encode_png(np.ascontiguousarray(b)))),
            ],
            "media_id string, payload binary",
        )
        rows = {r["media_id"]: r for r in embed_features(df, dim=64).collect()}
        assert all(r["kernel"] == "pixels" for r in rows.values())

        def cos(x_, y_):
            x_, y_ = np.asarray(x_, dtype=np.float64), np.asarray(y_, dtype=np.float64)
            return float(x_ @ y_ / (np.linalg.norm(x_) * np.linalg.norm(y_)))

        ref = rows["a_png"]["vec"]
        diff = cos(ref, rows["b_png"]["vec"])
        for alt in ("a_jpg", "a_gif"):
            same = cos(ref, rows[alt]["vec"])
            assert same > 0.99, (alt, same)
            assert same > diff + 0.005, (alt, same, diff)

    def test_fallback_kernel_labeled(self, spark):
        from super_speedy_syslog_searcher_spark.operators.multimodal import (
            build_jpeg,
            build_png,
            embed_features,
        )

        df = spark.createDataFrame(
            [("j", bytearray(build_jpeg(8, 8))), ("hdr", bytearray(build_png(8, 8)))],
            "media_id string, payload binary",
        )
        rows = {r["media_id"]: r for r in embed_features(df, dim=32).collect()}
        assert rows["j"]["kernel"] == "byte-bigram"
        assert rows["hdr"]["kernel"] == "byte-bigram"  # header-only: no pixels
