"""JVM fast-lane equivalence: parse_messages_hybrid must produce exactly
parse_messages_fused's output on a mixed corpus (fast-lane-eligible
sources, multi-line docs, no-datetime docs, unlocked sources)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hybrid_equals_fused(spark, corpus):
    from super_speedy_syslog_searcher_spark.functions.jvm_fast import parse_messages_hybrid
    from super_speedy_syslog_searcher_spark.functions.parse import parse_messages_fused

    docs_pdf, _, _ = corpus
    docs = spark.createDataFrame(docs_pdf, schema="doc_id string, tokens array<int>, n_tok int, source string")
    cols = ["doc_id", "msg_no", "ts", "ts_ns", "dt_beg", "dt_end", "pattern_id", "text", "n_lines", "n_chars"]
    fused = parse_messages_fused(docs, reference_year=2023).select(cols)
    hybrid = parse_messages_hybrid(docs, reference_year=2023).select(cols)
    assert fused.exceptAll(hybrid).count() == 0
    assert hybrid.exceptAll(fused).count() == 0


def test_hybrid_token_invariant(spark, corpus):
    from super_speedy_syslog_searcher_spark.functions.jvm_fast import parse_messages_hybrid

    docs_pdf, _, _ = corpus
    docs = spark.createDataFrame(docs_pdf, schema="doc_id string, tokens array<int>, n_tok int, source string")
    sample = parse_messages_hybrid(docs, reference_year=2023).select("tokens", "text").limit(50).collect()
    for r in sample:
        assert "".join(map(chr, r["tokens"])) == r["text"]

def test_hybrid_non_ascii_doc_falls_back_correctly(spark):
    """Non-ASCII codepoints (≥ 128) must NOT ride the transform+char fast
    lane (Spark char(n) = chr(n % 256) corrupts them); the hybrid output
    must still decode the text exactly and keep dt offsets right."""
    from super_speedy_syslog_searcher_spark.functions.jvm_fast import parse_messages_hybrid
    from super_speedy_syslog_searcher_spark.functions.parse import parse_messages_fused

    line_ascii = "2024-01-05T20:03:40+00:00 plain ascii line"
    line_cjk = "2024-01-05T20:03:41+00:00 中文 café line"
    rows = [
        ("a1", [ord(c) for c in line_ascii], len(line_ascii), "srcA"),
        ("a2", [ord(c) for c in line_cjk], len(line_cjk), "srcA"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int, source string")
    cols = ["doc_id", "msg_no", "ts", "ts_ns", "dt_beg", "dt_end", "pattern_id", "text", "n_lines", "n_chars"]
    fused = parse_messages_fused(docs, reference_year=2024).select(cols)
    hybrid = parse_messages_hybrid(docs, reference_year=2024).select(cols)
    assert fused.exceptAll(hybrid).count() == 0
    assert hybrid.exceptAll(fused).count() == 0
    got = {r["doc_id"]: r for r in hybrid.collect()}
    assert got["a2"]["text"] == line_cjk  # exact round-trip, no chr(n%256) damage
    assert got["a2"]["n_chars"] == len(line_cjk)
