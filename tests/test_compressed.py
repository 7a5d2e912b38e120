"""Transparent input decompression (sources/compressed).

Reference behavior being matched: inline gz/bz2/xz block decompression
(/root/reference/src/readers/blockreader.rs:213-284) and whole-file
tempfile decompression (filedecompressor.rs:100), with rotation-suffix
merge semantics from the file-typing rules (filepreprocessor.rs:190-742).
"""

from __future__ import annotations

import bz2
import gzip
import lzma

import pytest

from super_speedy_syslog_searcher_spark.functions.codec import encode_text
from super_speedy_syslog_searcher_spark.sources.compressed import (
    _strip_source_name,
    decompress_payload,
    read_compressed_docs,
    sniff_codec,
)

TEXT = b"2023-06-01T10:00:00Z host app[1]: hello\n2023-06-01T10:00:01Z host app[2]: world\n"


def test_sniff_codecs():
    assert sniff_codec(gzip.compress(b"x")[:8]) == "gz"
    assert sniff_codec(bz2.compress(b"x")[:8]) == "bz2"
    assert sniff_codec(lzma.compress(b"x")[:8]) == "xz"
    assert sniff_codec(b"plain text") is None


@pytest.mark.parametrize(
    "codec,comp",
    [("gz", gzip.compress), ("bz2", bz2.compress), ("xz", lzma.compress), (None, bytes)],
)
def test_decompress_roundtrip(codec, comp):
    data, got_codec, err = decompress_payload(comp(TEXT))
    assert err is None
    assert got_codec == codec
    assert data == TEXT


def test_nested_compression_unwraps():
    data, codec, err = decompress_payload(gzip.compress(lzma.compress(TEXT)))
    assert err is None
    assert codec == "gz+xz"
    assert data == TEXT


def test_corrupt_stream_contained():
    blob = gzip.compress(TEXT)
    data, codec, err = decompress_payload(blob[:10] + b"\x00\x00\x00\x00")
    assert err is not None and "gz" in err


def test_source_name_stripping():
    assert _strip_source_name("/var/log/app.log.1.gz") == "app.log"
    assert _strip_source_name("s3://bucket/syslog.2.xz") == "syslog"
    assert _strip_source_name("messages.bz2") == "messages"
    assert _strip_source_name("plain.log") == "plain.log"
    assert _strip_source_name("app.log.old~") == "app.log"


def test_read_compressed_docs_end_to_end(spark, tmp_path):
    (tmp_path / "app.log.1.gz").write_bytes(gzip.compress(TEXT))
    (tmp_path / "app.log.2.bz2").write_bytes(bz2.compress(TEXT))
    (tmp_path / "other.log.xz").write_bytes(lzma.compress(TEXT))
    (tmp_path / "plain.log").write_bytes(TEXT)
    (tmp_path / "broken.gz").write_bytes(b"\x1f\x8b\x00bad")

    docs = read_compressed_docs(spark, str(tmp_path)).orderBy("doc_id").collect()
    by_id = {r.doc_id: r for r in docs}
    assert len(docs) == 5

    expected_tokens = encode_text(TEXT.decode().rstrip("\n"))
    for did, codec, src in [
        ("app.log.1.gz", "gz", "app.log"),
        ("app.log.2.bz2", "bz2", "app.log"),
        ("other.log.xz", "xz", "other.log"),
        ("plain.log", None, "plain.log"),
    ]:
        r = by_id[did]
        assert r.ok and r.error is None
        assert r.codec == codec
        assert r.source == src
        assert list(r.tokens) == expected_tokens
        assert r.n_tok == len(expected_tokens)

    bad = by_id["broken.gz"]
    assert not bad.ok and bad.tokens is None and "gz" in bad.error


def test_compressed_docs_feed_the_parser(spark, tmp_path):
    from super_speedy_syslog_searcher_spark.functions.parse import parse_messages_fused

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    (tmp_path / "app.log.gz").write_bytes(gzip.compress(TEXT))
    docs = read_compressed_docs(spark, str(tmp_path)).filter("ok").select(
        "doc_id", "tokens", "n_tok", "source"
    )
    msgs = parse_messages_fused(docs, lock_patterns=False).orderBy("msg_no").collect()
    assert len(msgs) == 2
    assert [str(m.ts) for m in msgs] == ["2023-06-01 10:00:00", "2023-06-01 10:00:01"]
