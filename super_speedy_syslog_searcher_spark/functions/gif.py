"""Pure-Python GIF codec (LZW, GIF87a/89a) — real pixels, no C library.

With ``functions/jpeg.py`` this closes the imaging stub class entirely:
every image format the multimodal stage recognizes (PNG, BMP, JPEG,
GIF) now decodes to real pixels in-sandbox. The LZW coder is ~60 lines
of dictionary algebra (GIF's variable-width LZW per the GIF89a spec,
Appendix F) and needs no compression library at all.

Scope:

* decode: GIF87a/89a, global and local color tables, interlaced and
  sequential images, full variable-width LZW (code growth to 12 bits,
  CLEAR, EOI, the KwKwK first-use case), extension blocks skipped.
  FIRST frame only (animation frames beyond the first are ignored —
  documented; the training-data stage treats a GIF as one picture).
  Transparency is ignored (output is always HxWx3 RGB).
* encode: GIF87a, one frame, real LZW compression (dict reset at 4096),
  optional interlace. Color is quantized to the fixed 216-entry 6x6x6
  cube (level = (v+25)//51, palette value = level*51) — a deterministic
  quantizer, NOT an adaptive median-cut: exactness contracts stay
  integer-only and the scalar twin in tests/test_gif.py is trivial.
  Images whose colors already sit on the cube roundtrip losslessly.

Same bit-exactness discipline as the sibling codecs: everything is
integer math, so decode(encode(img)) equals the scalar cube-quantize
twin exactly.
"""

from __future__ import annotations

import struct

import numpy as np

from .imaging import ImageFormatError, contained_decoder

_CUBE_PALETTE = np.array(
    [(r * 51, g * 51, b * 51) for r in range(6) for g in range(6) for b in range(6)]
    + [(0, 0, 0)] * 40,
    dtype=np.uint8,
)

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_row_order(height: int) -> list[int]:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, CLEAR/EOI, 12-bit cap)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB-first per the GIF spec
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ImageFormatError("LZW stream exhausted")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset_table() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset_table()
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            reset_table()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ImageFormatError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ImageFormatError("LZW code out of range")
        out += entry
        prev = entry
        # the decoder's table is one PENDING entry behind the encoder's
        # (the string started by the current code is completed by the
        # next one), so the width grows at 2**w - 1 — the famous GIF
        # early-change off-by-one
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out[:n_pixels])


def lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {}
    next_code = 0
    width = 0

    def reset_table() -> None:
        nonlocal table, next_code, width
        table = {bytes([i]): i for i in range(clear)}
        next_code = eoi + 1
        width = min_code_size + 1

    reset_table()
    emit(clear, width)
    run = b""
    for i in range(len(pixels)):
        nxt = run + pixels[i : i + 1]
        if nxt in table:
            run = nxt
            continue
        emit(table[run], width)
        table[nxt] = next_code
        next_code += 1
        # width grows when the next FREE slot reaches 2**width — the
        # decoder mirrors this as len(table) == 1<<width after append
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear, width)
            reset_table()
        run = pixels[i : i + 1]
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


@contained_decoder
def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → HxWx3 uint8 RGB (first frame)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageFormatError("not a GIF")
    if len(payload) < 13:
        raise ImageFormatError("truncated GIF header")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + 3 * n > len(payload):
            raise ImageFormatError("truncated GIF color table")
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ImageFormatError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            if pos + 3 * n > len(payload):
                raise ImageFormatError("truncated GIF color table")
            ct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(
                n, 3
            )
            pos += 3 * n
        if ct is None:
            raise ImageFormatError("GIF image without a color table")
        interlaced = bool(ipacked & 0x40)
        mcs = payload[pos]
        if not 2 <= mcs <= 11:  # spec: bits/pixel 2..8; 12-bit cap bounds it
            raise ImageFormatError(f"bad LZW min code size {mcs}")
        pos += 1
        chunks = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            n = payload[pos]
            chunks += payload[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = np.frombuffer(lzw_decode(bytes(chunks), mcs, w * h), dtype=np.uint8)
        if idx.size != w * h:
            raise ImageFormatError("GIF pixel count mismatch")
        grid = idx.reshape(h, w)
        if interlaced:
            out = np.empty_like(grid)
            out[_interlace_row_order(h)] = grid
            grid = out
        if int(grid.max(initial=0)) >= ct.shape[0]:
            raise ImageFormatError("GIF palette index out of range")
        return ct[grid]
    raise ImageFormatError("GIF has no image data")


def cube_quantize(img: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 → palette indices into the 216-entry 6x6x6 cube."""
    lv = np.minimum((img.astype(np.int64) + 25) // 51, 5)
    return (lv[:, :, 0] * 36 + lv[:, :, 1] * 6 + lv[:, :, 2]).astype(np.uint8)


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """HxWx{1,3,4} uint8 → GIF87a with the fixed 6x6x6 cube palette."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    if img.shape[2] == 4:
        img = img[:, :, :3]
    h, w, _ = img.shape
    idx = cube_quantize(img)
    if interlace:
        idx = idx[_interlace_row_order(h)]
    head = b"GIF87a" + struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)
    body = lzw_encode(idx.tobytes(), 8)
    blocks = bytearray()
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    return head + _CUBE_PALETTE.tobytes() + desc + bytes([8]) + bytes(blocks) + b"\x3b"
