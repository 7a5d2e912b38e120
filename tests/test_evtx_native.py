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
    # overwrite the first record's fragment-header token with an unknown one
    buf[4096 + CHUNK_DATA_START + 24] = 0x0C
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
