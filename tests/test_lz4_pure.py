"""Pure-Python LZ4 block/frame + zstd-subset codecs (functions/lz4_pure).

Reference behavior being matched: lz4/zstd codec layer of the block
reader (/root/reference/src/readers/blockreader.rs:213-284) and
lz4-compressed journal data objects (systemd OBJECT_COMPRESSED_LZ4).
"""

from __future__ import annotations

import struct

import pytest

from super_speedy_syslog_searcher_spark.functions.lz4_pure import (
    Lz4FormatError,
    UnsupportedCodec,
    ZstdFormatError,
    lz4_block_compress_stored,
    lz4_block_decompress,
    lz4_frame_compress_stored,
    lz4_frame_decompress,
    xxh32,
    zstd_frame_compress_raw,
    zstd_frame_decompress_subset,
)


class TestXxh32:
    def test_published_vectors(self):
        # public xxHash32 test vectors (seed 0)
        assert xxh32(b"") == 0x02CC5D05
        assert xxh32(b"a") == 0x550D7456
        assert xxh32(b"abc") == 0x32D153FF
        assert xxh32(b"Hello, world!") == 0x31B7405D

    def test_seed_and_long_input(self):
        # >16-byte path (lane accumulators) is exercised and deterministic
        data = bytes(range(256)) * 10
        assert xxh32(data) == xxh32(bytes(data))
        assert xxh32(data, seed=1) != xxh32(data, seed=2)


class TestLz4Block:
    def test_stored_roundtrip(self):
        for data in (b"", b"x", b"hello world", bytes(range(256)) * 300):
            comp = lz4_block_compress_stored(data)
            assert lz4_block_decompress(comp, uncompressed_size=len(data)) == data

    def test_hand_crafted_match_sequences(self):
        # token: 5 literals "abcde", then match offset 5 len 10 ->
        # "abcde" repeated via overlapping copy = "abcdeabcdeabcde"
        comp = bytes([0x50 | 0x06]) + b"abcde" + struct.pack("<H", 5)
        assert lz4_block_decompress(comp) == b"abcde" + b"abcde" * 2

    def test_rle_via_offset_one(self):
        # 1 literal 'z', match offset 1 length 19 -> 'z' * 20 (classic RLE)
        comp = bytes([0x1F]) + b"z" + struct.pack("<H", 1) + bytes([0])
        assert lz4_block_decompress(comp) == b"z" * 20

    def test_extended_lengths(self):
        data = b"A" * 300
        # literals: token 0xF0, ext 255, 30 (15+255+30=300)
        comp = bytes([0xF0, 255, 30]) + data
        assert lz4_block_decompress(comp) == data

    def test_corrupt_offset_rejected(self):
        comp = bytes([0x16]) + b"q" + struct.pack("<H", 9)  # offset 9 > window 1
        with pytest.raises(Lz4FormatError, match="offset"):
            lz4_block_decompress(comp)

    def test_size_mismatch_rejected(self):
        comp = lz4_block_compress_stored(b"abc")
        with pytest.raises(Lz4FormatError, match="expected"):
            lz4_block_decompress(comp, uncompressed_size=99)


class TestLz4Frame:
    def test_roundtrip(self):
        for data in (b"", b"tiny", bytes(range(256)) * 40000):  # multi-block
            assert lz4_frame_decompress(lz4_frame_compress_stored(data)) == data

    def test_bad_magic(self):
        with pytest.raises(Lz4FormatError, match="magic"):
            lz4_frame_decompress(b"\x00" * 16)

    def test_header_checksum_verified(self):
        buf = bytearray(lz4_frame_compress_stored(b"data"))
        buf[6] ^= 0xFF  # flip the HC byte
        with pytest.raises(Lz4FormatError, match="header checksum"):
            lz4_frame_decompress(bytes(buf))

    def test_content_checksum_verified(self):
        buf = bytearray(lz4_frame_compress_stored(b"payload"))
        buf[-1] ^= 0xFF
        with pytest.raises(Lz4FormatError, match="content checksum"):
            lz4_frame_decompress(bytes(buf))

    def test_compressed_block_inside_frame(self):
        # frame with a NON-stored block holding a hand-built lz4 block
        block = bytes([0x1F]) + b"z" + struct.pack("<H", 1) + bytes([100 - 19 - 15 + 14])
        flg, bd = (1 << 6), 0x70
        hdr = bytes([flg, bd])
        frame = (
            struct.pack("<I", 0x184D2204)
            + hdr
            + bytes([(xxh32(hdr) >> 8) & 0xFF])
            + struct.pack("<I", len(block))
            + block
            + struct.pack("<I", 0)
        )
        out = lz4_frame_decompress(frame)
        assert out == b"z" * (1 + 19 + (100 - 19 - 15 + 14))


class TestZstdSubset:
    def test_raw_roundtrip(self):
        for data in (b"", b"short", bytes(range(256)) * 2000):  # multi-block
            assert zstd_frame_decompress_subset(zstd_frame_compress_raw(data)) == data

    def test_rle_block(self):
        # single-segment, 1-byte FCS = 12, one RLE block: byte 'x' * 12
        frame = (
            struct.pack("<I", 0xFD2FB528)
            + bytes([0x20, 12])
            + (1 | (1 << 1) | (12 << 3)).to_bytes(3, "little")
            + b"x"
        )
        assert zstd_frame_decompress_subset(frame) == b"x" * 12

    def test_entropy_block_contained(self):
        frame = (
            struct.pack("<I", 0xFD2FB528)
            + bytes([0x20, 5])
            + (1 | (2 << 1) | (5 << 3)).to_bytes(3, "little")
            + b"\x00" * 5
        )
        with pytest.raises(UnsupportedCodec, match="entropy"):
            zstd_frame_decompress_subset(frame)

    def test_bad_magic(self):
        with pytest.raises(ZstdFormatError, match="magic"):
            zstd_frame_decompress_subset(b"\x00" * 16)
