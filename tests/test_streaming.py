"""Structured Streaming tests: the streaming pipeline must produce the
same routed rows as the batch pipeline on the same corpus."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def stream_dirs(tmp_path):
    return {
        "input": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _write_docs(spark, corpus, path):
    docs_pdf, enrich_pdf, _ = corpus
    df = spark.createDataFrame(docs_pdf).select(
        "doc_id",
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.col("n_tok").cast("int").alias("n_tok"),
        "source",
    )
    df.repartition(4).write.mode("overwrite").parquet(path)
    return spark.createDataFrame(enrich_pdf)


def test_stream_matches_batch(spark, corpus, stream_dirs):
    from super_speedy_syslog_searcher_spark.functions.parse import parse_messages_fused
    from super_speedy_syslog_searcher_spark.operators.enrich import enrich
    from super_speedy_syslog_searcher_spark.streaming.pipeline import stream_pipeline

    enrichment = _write_docs(spark, corpus, stream_dirs["input"])
    q = stream_pipeline(
        spark, stream_dirs["input"], stream_dirs["out"], stream_dirs["ckpt"], enrichment,
        reference_year=2023,
    )
    q.awaitTermination(300)

    routed = spark.read.parquet(stream_dirs["out"])
    batch_msgs = enrich(
        parse_messages_fused(spark.read.parquet(stream_dirs["input"]), reference_year=2023),
        enrichment,
    )
    got = {(r["doc_id"], r["msg_no"]) for r in routed.select("doc_id", "msg_no").collect()}
    want = {(r["doc_id"], r["msg_no"]) for r in batch_msgs.select("doc_id", "msg_no").collect()}
    assert got == want
    # token-array invariant carried through the streaming path
    sample = routed.select("doc_id", "msg_no", "tokens", "text").limit(20).collect()
    for r in sample:
        assert "".join(map(chr, r["tokens"])) == r["text"]


def test_stream_resume_is_idempotent(spark, corpus, stream_dirs):
    from super_speedy_syslog_searcher_spark.streaming.pipeline import stream_pipeline

    enrichment = _write_docs(spark, corpus, stream_dirs["input"])
    q = stream_pipeline(spark, stream_dirs["input"], stream_dirs["out"], stream_dirs["ckpt"], enrichment)
    q.awaitTermination(300)
    n1 = spark.read.parquet(stream_dirs["out"]).count()
    # restart with same checkpoint and no new input → no duplicate writes
    q2 = stream_pipeline(spark, stream_dirs["input"], stream_dirs["out"], stream_dirs["ckpt"], enrichment)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(stream_dirs["out"]).count()
    assert n1 == n2


def test_windowed_counts_and_late_metric(spark, corpus):
    from super_speedy_syslog_searcher_spark.functions.parse import parse_messages_fused
    from super_speedy_syslog_searcher_spark.streaming.pipeline import late_rows_metric, windowed_sink_counts

    docs_pdf, enrich_pdf, _ = corpus
    msgs = parse_messages_fused(spark.createDataFrame(docs_pdf), reference_year=2023)
    # batch-mode execution of the watermarked aggregation plan
    counts = windowed_sink_counts(msgs, spark.createDataFrame(enrich_pdf)).collect()
    assert sum(r["messages"] for r in counts) == msgs.count()
    late = late_rows_metric(msgs).collect()
    assert all(r["late_rows"] == 0 for r in late)  # generator is monotonic per doc
