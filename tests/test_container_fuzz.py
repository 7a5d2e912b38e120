"""Deterministic corruption fuzz for the binary container readers: any
byte-flipped file must either parse (flip landed in slack space), raise
the reader's own FormatError, or yield per-record containment rows —
NEVER another exception type, because the Spark wrappers catch only the
FormatError and anything else would kill the task at scale."""

from __future__ import annotations

import random

import pytest

from super_speedy_syslog_searcher_spark.operators import journal_native as J
from super_speedy_syslog_searcher_spark.operators.evtx_native import (
    EvtxFormatError,
    EvtxWriter,
    Sub,
    parse_evtx_bytes,
)

TRIALS = 120


def _evtx_file() -> bytes:
    w = EvtxWriter()
    tpl = {"Event": {"ID": Sub(0, 0x0A), "T": Sub(1, 0x01)}}
    for i in range(20):
        if i % 2:
            w.add_record(i + 1, 1_700_000_000_000_000 + i, {"Event": {"ID": str(i + 1), "T": "x"}})
        else:
            w.add_template_record(i + 1, 1_700_000_000_000_000 + i, 7, tpl,
                                  [(0x0A, i + 1), (0x01, "y")])
    return w.build()


def _journal_file(xz: bool) -> bytes:
    w = J.JournalWriter(xz_min_payload=8 if xz else None)
    for i in range(15):
        w.add_entry(
            1_700_000_000_000_000 + i * 1000, i * 500,
            [f"MESSAGE=longer message payload {i} {'x' * 40}".encode(),
             f"_PID={100 + i}".encode()],
        )
    return w.build()


def _flip(buf: bytes, rng: random.Random) -> bytes:
    b = bytearray(buf)
    for _ in range(rng.randrange(1, 10)):
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
    return bytes(b)


def test_evtx_reader_contains_any_corruption():
    base = _evtx_file()
    rng = random.Random(7)
    for _ in range(TRIALS):
        try:
            parse_evtx_bytes(_flip(base, rng))
        except EvtxFormatError:
            pass  # the one exception the Spark wrapper converts to a row


@pytest.mark.parametrize("xz", [False, True], ids=["plain", "xz"])
def test_journal_reader_contains_any_corruption(xz):
    base = _journal_file(xz)
    rng = random.Random(11)
    for _ in range(TRIALS):
        try:
            J.parse_journal_bytes(_flip(base, rng))
        except J.JournalFormatError:
            pass


class TestImageCodecFuzz:
    """Same contract for the image codecs (r5 session 2): a mutated
    payload must decode or raise ImageFormatError — never crash, hang,
    or throw a foreign exception type. This fuzz initially ESCAPED with
    struct.error (short PNG chunks), KeyError (corrupt JPEG SOS
    component ids) and ValueError (corrupt GIF LZW code size); the
    ``contained_decoder`` wrapper is the fix it bought."""

    def _fuzz(self, payload: bytes, decode, seed: int, n: int = 300):
        from super_speedy_syslog_searcher_spark.functions.imaging import (
            ImageFormatError,
        )

        rng = random.Random(seed)
        for _ in range(n):
            b = bytearray(payload)
            for _k in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                decode(bytes(b))
            except ImageFormatError:
                pass
            # flips in entropy data legitimately decode to other pixels

    def test_jpeg_decoder_contains_corruption(self):
        import numpy as np

        from super_speedy_syslog_searcher_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = (np.arange(16 * 16 * 3, dtype=np.int64) % 256).astype("uint8").reshape(
            16, 16, 3
        )
        self._fuzz(encode_jpeg(img, quality=80, subsampling="420"), decode_jpeg, seed=5)

    def test_gif_decoder_contains_corruption(self):
        import numpy as np

        from super_speedy_syslog_searcher_spark.functions.gif import (
            decode_gif,
            encode_gif,
        )

        img = (np.arange(12 * 12 * 3, dtype=np.int64) % 256).astype("uint8").reshape(
            12, 12, 3
        )
        self._fuzz(encode_gif(img), decode_gif, seed=6)

    def test_png_decoder_contains_corruption(self):
        import numpy as np

        from super_speedy_syslog_searcher_spark.functions.imaging import (
            decode_png,
            encode_png,
        )

        img = (np.arange(10 * 14 * 3, dtype=np.int64) % 256).astype("uint8").reshape(
            10, 14, 3
        )
        self._fuzz(encode_png(img, filter_type=4), decode_png, seed=7)
