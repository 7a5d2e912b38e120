"""Native .journal binary container parsing (operators/journal_native).

Reference behavior being matched: libsystemd-backed entry iteration and
seek (/root/reference/src/readers/journalreader.rs:1101-1276) and the
compiled-in realtime timestamp precedence
(/root/reference/src/data/journal.rs:123-173).
"""

from __future__ import annotations

import lzma
import struct

import pytest

from super_speedy_syslog_searcher_spark.operators.journal_native import (
    _HEADER_FIXED,
    HEADER_INCOMPATIBLE_COMPACT,
    JournalFormatError,
    JournalWriter,
    parse_journal_bytes,
    parse_journal_native,
)


def _write(n=7, compact=False, xz=None, first_cap=4):
    w = JournalWriter(compact=compact, xz_min_payload=xz, first_array_capacity=first_cap)
    for i in range(n):
        fields = [b"MESSAGE=hello world, a reasonably long line %d" % i, b"_PID=%d" % (100 + i)]
        if i % 2 == 0:
            fields.append(b"_SOURCE_REALTIME_TIMESTAMP=%d" % (1_000_000 * i + 500))
        w.add_entry(1_000_000 * i, 10 * i, fields)
    return w.build()


@pytest.mark.parametrize("compact", [False, True])
@pytest.mark.parametrize("xz", [None, 10])
def test_roundtrip_layouts(compact, xz):
    ents = parse_journal_bytes(_write(compact=compact, xz=xz))
    assert len(ents) == 7
    for i, e in enumerate(ents):
        assert e["seqnum"] == i + 1
        assert e["realtime_us"] == 1_000_000 * i
        assert e["monotonic_us"] == 10 * i
        assert e["fields"]["_PID"] == str(100 + i)
        assert e["fields"]["MESSAGE"].endswith(str(i))
        assert e["n_fields"] == (3 if i % 2 == 0 else 2)
        assert e["error"] is None
        # reference default: realtime wins even when _SOURCE_* present
        assert e["ts_us"] == 1_000_000 * i


def test_source_fallback_precedence():
    buf = _write()
    ents = parse_journal_bytes(buf, dt_uses_source="source_fallback")
    assert ents[0]["ts_us"] == 500          # even: source field wins
    assert ents[1]["ts_us"] == 1_000_000    # odd: falls back to realtime


def test_seek_pushdown_skips_prefix():
    ents = parse_journal_bytes(_write(), after_us=3_000_000)
    assert [e["realtime_us"] for e in ents] == [3_000_000, 4_000_000, 5_000_000, 6_000_000]
    # entry_no keeps the file position even across the skipped prefix
    assert [e["entry_no"] for e in ents] == [3, 4, 5, 6]


def test_entry_array_chain_is_walked():
    # first_cap=1 with doubling -> arrays of 1,2,4,... entries: the 7
    # entries span 3 chained arrays
    ents = parse_journal_bytes(_write(first_cap=1))
    assert [e["seqnum"] for e in ents] == list(range(1, 8))


def test_xz_payloads_actually_compressed():
    buf = _write(xz=10)
    # stored payloads are xz streams (lzma may embed short inputs
    # verbatim inside the container, so assert on the magic, not absence)
    assert b"\xfd7zXZ" in buf
    assert b"\xfd7zXZ" not in _write(xz=None)
    assert parse_journal_bytes(buf)[3]["fields"]["MESSAGE"].endswith("3")


def test_bad_signature_and_truncation():
    with pytest.raises(JournalFormatError):
        parse_journal_bytes(b"NOTAJRNL" + b"\x00" * 300)
    buf = _write()
    with pytest.raises(JournalFormatError):
        parse_journal_bytes(buf[: len(buf) // 2])
    with pytest.raises(JournalFormatError):
        parse_journal_bytes(buf[:100])


def test_unknown_incompatible_flag_rejected():
    buf = bytearray(_write())
    # set an unknown incompatible flag bit (bit 30) in the header
    (incompat,) = struct.unpack_from("<I", buf, 12)
    struct.pack_into("<I", buf, 12, incompat | (1 << 30))
    with pytest.raises(JournalFormatError, match="incompatible"):
        parse_journal_bytes(bytes(buf))


def test_empty_file_yields_no_entries():
    assert parse_journal_bytes(JournalWriter().build()) == []
    assert parse_journal_bytes(JournalWriter(compact=True).build()) == []


def test_header_size_matches_format():
    assert _HEADER_FIXED.size == 208


def test_compact_flag_is_set_on_disk():
    buf = _write(compact=True)
    (incompat,) = struct.unpack_from("<I", buf, 12)
    assert incompat & HEADER_INCOMPATIBLE_COMPACT


def test_spark_parse_and_corrupt_containment(spark):
    good = _write(n=3)
    docs = spark.createDataFrame(
        [
            ("d0", "s0", bytearray(good)),
            ("d1", "s1", bytearray(b"garbage-not-a-journal-file" * 4)),
            ("d2", "s0", bytearray(_write(n=2, compact=True, xz=10))),
        ],
        "doc_id string, source string, payload binary",
    )
    rows = parse_journal_native(docs).orderBy("doc_id", "entry_no").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.seqnum for r in by_doc["d0"]] == [1, 2, 3]
    assert all(r.error is None for r in by_doc["d0"])
    # corrupt file -> exactly one containment row, no thrown task
    assert len(by_doc["d1"]) == 1
    assert by_doc["d1"][0].entry_no == -1
    assert "signature" in by_doc["d1"][0].error
    assert [r.fields["_PID"] for r in by_doc["d2"]] == ["100", "101"]
    assert by_doc["d2"][0].ts is not None


class TestLz4ZstdObjects:
    """LZ4/zstd-compressed data objects decode through the pure-Python
    fallback (functions/lz4_pure) — the import-gated native path is
    absent in this container (VERDICT r3 next-round #9)."""

    def _write(self, codec, compact=False):
        kw = {"lz4_min_payload" if codec == "lz4" else "zstd_min_payload": 10}
        w = JournalWriter(compact=compact, **kw)
        for i in range(5):
            w.add_entry(
                1_000_000 * i,
                10 * i,
                [b"MESSAGE=hello compressed journal world %d" % i, b"_PID=%d" % i],
            )
        return w.build()

    @pytest.mark.parametrize("compact", [False, True])
    @pytest.mark.parametrize("codec", ["lz4", "zstd"])
    def test_roundtrip(self, codec, compact):
        ents = parse_journal_bytes(self._write(codec, compact))
        assert len(ents) == 5
        for i, e in enumerate(ents):
            assert e["error"] is None
            assert e["fields"]["MESSAGE"].endswith(str(i))
            assert e["ts_us"] == 1_000_000 * i

    def test_incompatible_flag_set(self):
        from super_speedy_syslog_searcher_spark.operators.journal_native import (
            HEADER_INCOMPATIBLE_COMPRESSED_LZ4,
        )

        buf = self._write("lz4")
        incompatible = _HEADER_FIXED.unpack_from(buf)[2]
        assert incompatible & HEADER_INCOMPATIBLE_COMPRESSED_LZ4

    def test_lz4_objects_use_systemd_layout(self):
        # stored form: le64 uncompressed size + LZ4 block whose first
        # token is a literals run (0xF0 + extension byte for 42 literals)
        buf = self._write("lz4")
        # the stored block is literals-only, so the payload appears
        # verbatim preceded by [token 0xF0, ext 25] and the le64 size
        idx = buf.find(b"MESSAGE=hello compressed journal world 0")
        assert idx > 0
        assert buf[idx - 2] == 0xF0 and buf[idx - 1] == 40 - 15
        assert struct.unpack_from("<Q", buf, idx - 10)[0] == 40
        assert parse_journal_bytes(buf)[0]["fields"]["MESSAGE"].startswith("hello")

    def test_corrupt_lz4_object_contained(self):
        buf = bytearray(self._write("lz4"))
        idx = buf.find(b"MESSAGE=hello compressed journal world 0")
        assert idx > 0
        buf[idx - 1] = 200  # literal run now claims 215 bytes > block size
        ents = parse_journal_bytes(bytes(buf))
        bad = [e for e in ents if e["error"] is not None]
        assert bad and "lz4" in bad[0]["error"]
