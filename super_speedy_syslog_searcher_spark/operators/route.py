"""Routing / fan-out: write messages to per-sink tables.

Reference analogue: each message goes to exactly one printer keyed by
``PathId`` (/root/reference/src/bin/s4.rs:3397-3418); the north_rule
generalizes to fan-out sinks keyed by ``sink_key = facility.severity_class``.

Spark realization: a single ``write.partitionBy("sink_key")`` — one job,
no per-sink re-scan; dynamic partition overwrite keeps re-runs idempotent
per sink. Output stays PARQUET (Iceberg jars are absent in the sandbox —
writes go through ``catalog.py``-style path tables; the layout is
Iceberg-compatible: partition column + snapshot-ish manifest in
plans/pipeline.py).

Per-sink aggregate counts ≙ ``SummaryPrinted``
(/root/reference/src/printer/summary.rs:151-171): messages, lines, bytes
(chars), dt_first, dt_last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_write(
    enriched: DataFrame,
    out_dir: str,
    mode: str = "overwrite",
    file_tasks: int | None = None,
) -> None:
    """Fan-out write, partitioned by the routing key.

    By default each task writes its local share of every sink (no extra
    shuffle — tasks × sinks files). Pass ``file_tasks`` to pre-shuffle on
    (sink_key, salt), bounding output to that many files when file-count
    pressure outweighs one more pass over the data; the salt lanes keep a
    hot sink spread over many tasks (explicit skew handling).
    """
    if file_tasks:
        salt = F.pmod(F.xxhash64("doc_id"), F.lit(max(file_tasks // 4, 1)))
        enriched = enriched.repartition(file_tasks, F.col("sink_key"), salt)
    # catalog-or-parquet: Iceberg writeTo when the session has a catalog
    # (the north_rule's sink tables), byte-identical dynamic-partition
    # parquet in this sandbox — sources/iceberg.py
    from ..sources.iceberg import write_table

    write_table(enriched, out_dir, partition_by=["sink_key"], mode=mode)


def sink_counts_from_path(spark, out_dir: str) -> DataFrame:
    """Per-sink aggregates computed from the COMMITTED sink files — the
    counts then describe exactly what readers will see (and the big
    upstream DAG is not re-executed just to count)."""
    from ..sources.iceberg import read_table

    return sink_counts(read_table(spark, out_dir))


def sink_counts(enriched: DataFrame) -> DataFrame:
    """Per-sink aggregates (the driver-checked counts; A6)."""
    return enriched.groupBy("sink_key").agg(
        F.count("*").alias("messages"),
        F.sum("n_lines").alias("lines"),
        F.sum("n_chars").alias("bytes"),
        F.min("ts").alias("dt_first"),
        F.max("ts").alias("dt_last"),
    )
