"""Pure-Python LZ4 (and minimal zstd) codecs — the import-gated fallback.

The reference links the ``lz4_flex`` / ``zstd`` crates for ``.lz4`` /
``.zst`` inputs and lz4-compressed journal data objects
(/root/reference/src/readers/blockreader.rs:213-284,
src/readers/journalreader.rs — systemd OBJECT_COMPRESSED_LZ4).  This
sandbox has neither the ``lz4`` nor the ``zstandard`` wheel, so the
codec layer would otherwise be import-gated dead code.  This module
implements the PUBLIC formats in original Python:

* **LZ4 block** (decompress: full sequence decoder — literals + matches
  with overlap semantics; compress: a valid literals-only encoder used
  by tests/writers — every LZ4 decoder accepts it, it just doesn't
  shrink).
* **LZ4 frame** (magic ``0x184D2204``, FLG/BD descriptor with xxHash32
  header checksum, data blocks with the high-bit "stored" flag,
  optional block/content checksums — verified when present).
* **zstd frame subset**: raw and RLE blocks decode; entropy-coded
  blocks raise ``UnsupportedCodec`` so callers contain the row — the
  frame *plumbing* (magic, frame-header descriptor, window descriptor,
  content size field, block framing, checksum skip) is real and tested.

Throughput note: these are correctness fallbacks for the cold on-ramp
path (whole-file codec step, one file per task); when the native wheels
are present they are preferred (see the callers' try-imports).
"""

from __future__ import annotations

import struct
from typing import Optional


class Lz4FormatError(ValueError):
    pass


class UnsupportedCodec(ValueError):
    """Valid container, but the compression mode needs an unavailable
    native codec (e.g. zstd entropy-coded blocks)."""


# ---------------------------------------------------------------------------
# xxHash32 (public algorithm; used by the LZ4 frame header/content checksums)
# ---------------------------------------------------------------------------
_P1, _P2, _P3, _P4, _P5 = 2654435761, 2246822519, 3266489917, 668265263, 374761393
_M = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 16:
            for j, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<I", data, i + 4 * j)
                v = (v + lane * _P2) & _M
                v = (_rotl(v, 13) * _P1) & _M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 4:
        (lane,) = struct.unpack_from("<I", data, i)
        h = (h + lane * _P3) & _M
        h = (_rotl(h, 17) * _P4) & _M
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M
    h ^= h >> 13
    h = (h * _P3) & _M
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# LZ4 block
# ---------------------------------------------------------------------------
def lz4_block_decompress(src: bytes, uncompressed_size: Optional[int] = None) -> bytes:
    """Full LZ4 block sequence decoder: token (4b literal length / 4b
    match length), 255-extension bytes, 2-byte little-endian match
    offset, byte-at-a-time copy for overlapping matches (the RLE
    trick)."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        # literals
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise Lz4FormatError("truncated literal length")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise Lz4FormatError("literal run beyond input")
        out += src[i : i + lit]
        i += lit
        if i >= n:
            break  # last sequence is literals-only
        # match
        if i + 2 > n:
            raise Lz4FormatError("truncated match offset")
        (offset,) = struct.unpack_from("<H", src, i)
        i += 2
        if offset == 0 or offset > len(out):
            raise Lz4FormatError(f"match offset {offset} out of window")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if i >= n:
                    raise Lz4FormatError("truncated match length")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        for k in range(mlen):  # overlap-correct copy
            out.append(out[start + k])
    if uncompressed_size is not None and len(out) != uncompressed_size:
        raise Lz4FormatError(
            f"decompressed {len(out)} bytes, expected {uncompressed_size}"
        )
    return bytes(out)


def lz4_block_compress_stored(data: bytes) -> bytes:
    """Valid literals-only LZ4 block: ONE sequence holding all the data
    as literals (only the final sequence of a block may omit the match,
    so a stored block is necessarily single-sequence; extension bytes
    encode any length).  Used by test corpora/writers; real compression
    is the native wheel's job."""
    out = bytearray()
    lit = len(data)
    if lit >= 15:
        out.append(0xF0)
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    else:
        out.append(lit << 4)
    out += data
    return bytes(out)


# ---------------------------------------------------------------------------
# LZ4 frame
# ---------------------------------------------------------------------------
_LZ4F_MAGIC = 0x184D2204


def lz4_frame_decompress(buf: bytes) -> bytes:
    """LZ4 frame: magic, FLG/BD (+ optional content size, dict id) with
    xxh32 header checksum, data blocks (u32 size; high bit = stored
    uncompressed), optional per-block and content checksums — all
    verified when present."""
    if len(buf) < 7:
        raise Lz4FormatError("truncated frame")
    (magic,) = struct.unpack_from("<I", buf, 0)
    if magic != _LZ4F_MAGIC:
        raise Lz4FormatError(f"bad frame magic {magic:#x}")
    flg, bd = buf[4], buf[5]
    version = flg >> 6
    if version != 1:
        raise Lz4FormatError(f"unsupported frame version {version}")
    b_checksum = bool(flg & 0x10)
    c_size = bool(flg & 0x08)
    c_checksum = bool(flg & 0x04)
    dict_id = bool(flg & 0x01)
    pos = 6
    content_size = None
    if c_size:
        (content_size,) = struct.unpack_from("<Q", buf, pos)
        pos += 8
    if dict_id:
        pos += 4
    hc = buf[pos]
    pos += 1
    want_hc = (xxh32(buf[4 : pos - 1]) >> 8) & 0xFF
    if hc != want_hc:
        raise Lz4FormatError("frame header checksum mismatch")
    del bd  # block max-size descriptor: informational for the decoder
    out = bytearray()
    while True:
        if pos + 4 > len(buf):
            raise Lz4FormatError("missing EndMark")
        (bsize,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if bsize == 0:  # EndMark
            break
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if pos + bsize > len(buf):
            raise Lz4FormatError("truncated data block")
        block = buf[pos : pos + bsize]
        pos += bsize
        if b_checksum:
            (bsum,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if bsum != xxh32(block):
                raise Lz4FormatError("block checksum mismatch")
        out += block if stored else lz4_block_decompress(block)
    if c_checksum:
        if pos + 4 > len(buf):
            raise Lz4FormatError("truncated content checksum")
        (csum,) = struct.unpack_from("<I", buf, pos)
        if csum != xxh32(bytes(out)):
            raise Lz4FormatError("content checksum mismatch")
    if content_size is not None and len(out) != content_size:
        raise Lz4FormatError(f"content size {len(out)} != declared {content_size}")
    return bytes(out)


def lz4_frame_compress_stored(data: bytes, block_size: int = 4 << 20) -> bytes:
    """Valid LZ4 frame holding the data in stored (uncompressed) blocks,
    with correct header + content checksums — interoperable with any
    conformant LZ4 frame reader."""
    flg = (1 << 6) | 0x04  # version 1, content checksum
    bd = 0x70  # max block size 4 MiB
    header = bytes([flg, bd])
    out = bytearray(struct.pack("<I", _LZ4F_MAGIC))
    out += header
    out.append((xxh32(header) >> 8) & 0xFF)
    for i in range(0, len(data), block_size) if data else [0]:
        block = data[i : i + block_size]
        out += struct.pack("<I", 0x80000000 | len(block))
        out += block
        if not data:
            break
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(data))
    return bytes(out)


# ---------------------------------------------------------------------------
# zstd frame subset (raw + RLE blocks)
# ---------------------------------------------------------------------------
_ZSTD_MAGIC = 0xFD2FB528


class ZstdFormatError(ValueError):
    pass


def zstd_frame_decompress_subset(buf: bytes) -> bytes:
    """Decode a zstd frame whose blocks are raw or RLE.  Entropy-coded
    (``Compressed``) blocks raise :class:`UnsupportedCodec` — callers
    contain the row with a codec-unavailable error, exactly like the
    import-gated native path."""
    if len(buf) < 6:
        raise ZstdFormatError("truncated frame")
    (magic,) = struct.unpack_from("<I", buf, 0)
    if magic != _ZSTD_MAGIC:
        raise ZstdFormatError(f"bad frame magic {magic:#x}")
    fhd = buf[4]
    pos = 5
    single_segment = bool(fhd & 0x20)
    checksum = bool(fhd & 0x04)
    dict_flag = fhd & 0x03
    fcs_flag = fhd >> 6
    if not single_segment:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[dict_flag]
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    content_size = None
    if fcs_size:
        raw = buf[pos : pos + fcs_size]
        content_size = int.from_bytes(raw, "little")
        if fcs_size == 2:
            content_size += 256
        pos += fcs_size
    out = bytearray()
    while True:
        if pos + 3 > len(buf):
            raise ZstdFormatError("truncated block header")
        bh = int.from_bytes(buf[pos : pos + 3], "little")
        pos += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 0:  # raw
            if pos + bsize > len(buf):
                raise ZstdFormatError("truncated raw block")
            out += buf[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: one byte repeated bsize times
            if pos >= len(buf):
                raise ZstdFormatError("truncated rle block")
            out += bytes([buf[pos]]) * bsize
            pos += 1
        elif btype == 2:
            raise UnsupportedCodec(
                "zstd entropy-coded block; zstandard codec unavailable"
            )
        else:
            raise ZstdFormatError("reserved block type")
        if last:
            break
    if checksum:
        pos += 4  # xxh64 low half — not verified in the subset decoder
    if content_size is not None and len(out) != content_size:
        raise ZstdFormatError(f"content size {len(out)} != declared {content_size}")
    return bytes(out)


def zstd_frame_compress_raw(data: bytes, block_size: int = 1 << 17) -> bytes:
    """Valid zstd frame with raw blocks (format-legal 'stored' mode) —
    decodable by any zstd implementation; used by test corpora."""
    fhd = 0x20 | (0x01 << 6) if len(data) < 256 else 0x20  # single-segment
    out = bytearray(struct.pack("<I", _ZSTD_MAGIC))
    # single-segment: FCS present (size 1 if <256 else 8 via fcs_flag 3)
    if len(data) < 256:
        out.append(0x20)  # single_segment, fcs_flag 0 → 1-byte FCS
        out.append(len(data))
    else:
        out.append(0x20 | 0xC0)  # single_segment, fcs_flag 3 → 8-byte FCS
        out += struct.pack("<Q", len(data))
    del fhd
    blocks = [data[i : i + block_size] for i in range(0, len(data), block_size)] or [b""]
    for bi, block in enumerate(blocks):
        last = 1 if bi == len(blocks) - 1 else 0
        bh = last | (0 << 1) | (len(block) << 3)
        out += bh.to_bytes(3, "little")
        out += block
    return bytes(out)
