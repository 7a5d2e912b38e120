"""Sink compaction (operators/route.compact_sinks): file counts drop to
the byte-target, content is checksum-stable, compact sinks untouched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _checksum(spark, path):
    df = spark.read.parquet(path)
    return (
        df.select(F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in sorted(df.columns)])).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("s"))
        .collect()[0]["s"],
        df.count(),
    )


def test_compact_sinks_reduces_files_and_preserves_rows(spark, tmp_path):
    from super_speedy_syslog_searcher_spark.operators.route import compact_sinks

    base = str(tmp_path / "routed")
    rows = spark.range(0, 2000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "a.err").otherwise("b.info").alias("sink_key"),
        F.concat(F.lit("msg"), F.col("id")).alias("text"),
    )
    # fragment: 16 files per sink
    rows.repartition(32, "sink_key", F.col("id")).write.partitionBy("sink_key").parquet(base)
    a_dir = os.path.join(base, "sink_key=a.err")
    n_before = len([f for f in os.listdir(a_dir) if f.endswith(".parquet")])
    assert n_before > 4
    before = _checksum(spark, base)

    rpt = {r["sink_key"]: r for r in compact_sinks(spark, base, target_bytes=1 << 30).collect()}
    assert rpt["a.err"]["n_files_before"] == n_before
    assert rpt["a.err"]["n_files_after"] == 1
    after = _checksum(spark, base)
    assert after == before

    # second run: already compact → untouched
    rpt2 = {r["sink_key"]: r for r in compact_sinks(spark, base, target_bytes=1 << 30).collect()}
    assert rpt2["a.err"]["n_files_before"] == rpt2["a.err"]["n_files_after"] == 1
