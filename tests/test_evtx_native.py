"""Native .evtx binary container parsing (operators/evtx_native).

Reference behavior being matched: EvtxParser-backed record iteration
(/root/reference/src/readers/evtxreader.rs:181-260) feeding the
(ts, record_id) ordering/dedup semantics (:433-524).
"""

from __future__ import annotations

import struct
import zlib

import pytest

from super_speedy_syslog_searcher_spark.operators.evtx_native import (
    CHUNK_DATA_START,
    EvtxFormatError,
    EvtxWriter,
    Sub,
    parse_evtx_bytes,
    parse_evtx_native,
)


def _write(n=10, nested=True):
    w = EvtxWriter()
    for i in range(n):
        tree = {"Event": {"ID": str(i), "Msg": f"hello {i}"}} if nested else {"Event": f"e{i}"}
        w.add_record(100 + i, 1_700_000_000_000_000 + i * 1_000_000, tree)
    return w.build()


def test_roundtrip_nested_elements():
    recs = parse_evtx_bytes(_write())
    assert len(recs) == 10
    for i, r in enumerate(recs):
        assert r["record_id"] == 100 + i
        assert r["ts_us"] == 1_700_000_000_000_000 + i * 1_000_000
        assert r["xml"] == f"<Event><ID>{i}</ID><Msg>hello {i}</Msg></Event>"
        assert r["arrival_no"] == i
        assert r["error"] is None


def test_roundtrip_flat_text_element():
    recs = parse_evtx_bytes(_write(nested=False))
    assert [r["xml"] for r in recs] == [f"<Event>e{i}</Event>" for i in range(10)]


def test_multi_chunk_rollover():
    w = EvtxWriter()
    for i in range(1200):
        w.add_record(i, i * 1000, {"Event": {"ID": str(i), "Data": "x" * 80}})
    recs = parse_evtx_bytes(w.build())
    assert len(recs) == 1200
    assert recs[-1]["chunk_no"] >= 1  # spilled into later 64 KiB chunks
    # name back-references reset per chunk; every record still decodes
    assert all(
        r["xml"] == f"<Event><ID>{r['record_id']}</ID><Data>{'x' * 80}</Data></Event>"
        for r in recs
    )
    # arrival_no is global file order across chunks
    assert [r["arrival_no"] for r in recs] == list(range(1200))


def test_bad_signature_and_checksums():
    with pytest.raises(EvtxFormatError):
        parse_evtx_bytes(b"NotEvtx!" + b"\x00" * 5000)
    buf = bytearray(_write())
    buf[5000] ^= 0xFF  # corrupt record data -> chunk record crc fails
    with pytest.raises(EvtxFormatError, match="checksum"):
        parse_evtx_bytes(bytes(buf))
    buf2 = bytearray(_write())
    buf2[16] ^= 0xFF  # corrupt file header field -> header crc fails
    with pytest.raises(EvtxFormatError, match="checksum"):
        parse_evtx_bytes(bytes(buf2))


def _refresh_chunk_crcs(buf: bytearray, chunk_off: int) -> None:
    chunk = buf[chunk_off : chunk_off + 65536]
    free_off = struct.unpack_from("<I", chunk, 48)[0]
    struct.pack_into("<I", buf, chunk_off + 52, zlib.crc32(bytes(chunk[CHUNK_DATA_START:free_off])))
    crc = zlib.crc32(
        bytes(buf[chunk_off : chunk_off + 120])
        + bytes(buf[chunk_off + 128 : chunk_off + CHUNK_DATA_START])
    )
    struct.pack_into("<I", buf, chunk_off + 124, crc)


def test_unsupported_binxml_contained_per_record():
    buf = bytearray(_write())
    # overwrite the first record's fragment-header token with an unknown
    # one (0x30 is not a binxml token; 0x0C is a template now)
    buf[4096 + CHUNK_DATA_START + 24] = 0x30
    _refresh_chunk_crcs(buf, 4096)
    recs = parse_evtx_bytes(bytes(buf))
    assert recs[0]["xml"] is None
    assert "subset" in recs[0]["error"]
    assert recs[0]["record_id"] == 100  # framing still yields id + ts
    assert recs[1]["error"] is None  # only the one record is affected


def test_empty_file():
    recs = parse_evtx_bytes(EvtxWriter().build())
    assert recs == []


def test_spark_parse_and_corrupt_containment(spark):
    docs = spark.createDataFrame(
        [
            ("d0", "s0", bytearray(_write(n=3))),
            ("d1", "s1", bytearray(b"garbage" * 1000)),
        ],
        "doc_id string, source string, payload binary",
    )
    rows = parse_evtx_native(docs).orderBy("doc_id", "arrival_no").collect()
    good = [r for r in rows if r.doc_id == "d0"]
    bad = [r for r in rows if r.doc_id == "d1"]
    assert [r.record_id for r in good] == [100, 101, 102]
    assert all(r.error is None for r in good)
    assert len(bad) == 1 and bad[0].record_id == -1 and "signature" in bad[0].error


class TestTemplates:
    TREE = {
        "Event": {
            "@attrs": {"Level": Sub(3, 0x08)},
            "ID": Sub(0, 0x0A),
            "Type": Sub(1, 0x01),
            "Time": Sub(2, 0x11),
            "Note": Sub(4, 0x00, optional=True),
        }
    }

    def _vals(self, rid, et, us, lvl):
        return [(0x0A, rid), (0x01, et), (0x11, us), (0x08, lvl), (0x00, None)]

    def test_inline_then_backreferenced_definition(self):
        w = EvtxWriter()
        w.add_template_record(1, 1_700_000_000_000_000, 7, self.TREE,
                              self._vals(1, "login", 1_700_000_000_111_222, 4))
        w.add_template_record(2, 1_700_000_001_000_000, 7, self.TREE,
                              self._vals(2, "logout", 1_700_000_001_333_444, 2))
        recs = parse_evtx_bytes(w.build())
        assert [r["error"] for r in recs] == [None, None]
        assert recs[0]["xml"] == (
            '<Event Level="4"><ID>1</ID><Type>login</Type>'
            "<Time>2023-11-14T22:13:20.111222Z</Time><Note></Note></Event>"
        )
        assert recs[1]["xml"] == (
            '<Event Level="2"><ID>2</ID><Type>logout</Type>'
            "<Time>2023-11-14T22:13:21.333444Z</Time><Note></Note></Event>"
        )

    def test_signed_and_unsigned_int_values(self):
        tree = {"E": {"A": Sub(0, 0x03), "B": Sub(1, 0x09), "C": Sub(2, 0x06)}}
        w = EvtxWriter()
        w.add_template_record(5, 1_700_000_000_000_000, 1, tree,
                              [(0x03, -5), (0x09, -(1 << 40)), (0x06, 65535)])
        (r,) = parse_evtx_bytes(w.build())
        assert r["xml"] == f"<E><A>-5</A><B>{-(1 << 40)}</B><C>65535</C></E>"

    def test_template_survives_chunk_rollover(self):
        # enough templated records to roll chunks: each chunk re-inlines
        # the definition once and back-references within itself
        w = EvtxWriter()
        n = 900
        for i in range(n):
            w.add_template_record(i + 1, 1_700_000_000_000_000 + i, 7, self.TREE,
                                  self._vals(i + 1, "x" * 50, 1_700_000_000_000_000 + i, i % 100))
        buf = w.build()
        assert len(buf) > 4096 + 65536  # really rolled over
        recs = parse_evtx_bytes(buf)
        assert len(recs) == n
        assert {r["error"] for r in recs} == {None}
        assert all(f"<ID>{r['record_id']}</ID>" in r["xml"] for r in recs)
        assert max(r["chunk_no"] for r in recs) >= 1

    def test_unsupported_value_type_is_contained(self):
        tree = {"E": {"A": Sub(0, 0x21)}}
        w = EvtxWriter()
        w.add_template_record(1, 1_700_000_000_000_000, 1, tree, [(0x01, "ok")])
        # hand-corrupt the declared descriptor type to an unsupported one
        buf = bytearray(w.build())
        # descriptor: u16 size, u8 type — find it by re-encoding with type 0x13
        w2 = EvtxWriter()
        w2.add_template_record(1, 1_700_000_000_000_000, 1, tree, [(0x13, b"")] if False else [(0x01, "ok")])
        # simpler: parse the clean build, then flip the descriptor byte
        import struct as _s
        # locate the substitution count (1) right before the descriptor
        idx = bytes(buf).find(_s.pack("<IHBB", 1, 4, 0x01, 0))
        assert idx > 0
        buf[idx + 6] = 0x13  # declared type → unsupported GUID type
        (r,) = parse_evtx_bytes(bytes(buf), verify_checksums=False)
        assert r["xml"] is None and "value type" in r["error"]
        assert r["record_id"] == 1  # framing survives
