"""End-to-end pipeline: parse → enrich → route → aggregate.

The Spark lifecycle equivalent of ``s4 <PATHS> -a A -b B`` (SURVEY §3.3):

    read docs table → explode lines (narrow) → two-pass DTPD parse (narrow
    + one broadcast of pattern votes) → sessionize (shuffle #1: doc_id) →
    year-fix (reuses doc_id partitioning) → filter ts BETWEEN a, b
    (pushable) → broadcast-join enrichment → repartitionByRange(full sort
    key) + sortWithinPartitions (shuffle #2) → fan-out write partitioned by
    sink_key → summary aggregates.

Exactly two wide dependencies at scale (sessionize hash, merge range); the
enrichment join is broadcast; everything else is narrow Arrow-batched work.

Checkpoint/resume + lineage (north_rule): each run writes per-source
manifest rows after its sinks commit; a resume run anti-joins the input
against the manifest of completed sources, so already-routed work is never
recomputed. Lineage rows carry per-(source) message counts + ts bounds —
the per-partition metrics the north_star asks for.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import explode_lines
from ..functions.parse import parse_lines
from ..operators.enrich import enrich
from ..operators.filters import dt_between
from ..operators.merge import global_sort, with_source_order
from ..operators.route import route_write, sink_counts
from ..operators.sessionize import sessionize
from ..operators.summary import pattern_hit_miss, source_summary
from ..operators.yearfix import infer_years


@dataclass
class PipelineConfig:
    default_tz: str = "+00:00"
    reference_year: int | None = None  # seed year for no-year formats
    dt_a: datetime | None = None
    dt_b: datetime | None = None
    lock_patterns: bool = True
    num_partitions: int | None = None
    sources_in_order: list[str] | None = None
    extra: dict = field(default_factory=dict)


def parse_stage(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """docs → parsed lines (single fused Python stage, no shuffle)."""
    from ..functions.parse import parse_docs_fused

    return parse_docs_fused(
        docs,
        default_tz=cfg.default_tz,
        reference_year=cfg.reference_year,
        lock_patterns=cfg.lock_patterns,
    )


def messages_stage(parsed_lines: DataFrame, cfg: PipelineConfig) -> DataFrame:
    msgs = sessionize(parsed_lines, num_partitions=cfg.num_partitions)
    if cfg.reference_year is not None:
        msgs = infer_years(msgs, cfg.reference_year, num_partitions=cfg.num_partitions)
    return dt_between(msgs, cfg.dt_a, cfg.dt_b)


def run_pipeline(
    docs: DataFrame,
    enrichment: DataFrame,
    cfg: PipelineConfig | None = None,
    out_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Full run. Returns the named intermediate/​output DataFrames; if
    ``out_dir`` is given, routed messages are fanned out to
    ``out_dir/routed`` and summaries to ``out_dir/…``."""
    cfg = cfg or PipelineConfig()
    # parsed/messages feed several sinks (routed write, sink counts,
    # summary, pattern counts) — persist so the UDF stages run once
    parsed = parse_stage(docs, cfg).persist()
    messages = messages_stage(parsed, cfg).persist()
    enriched = enrich(messages, enrichment)
    enriched = with_source_order(enriched, cfg.sources_in_order)
    merged = global_sort(enriched, num_partitions=cfg.num_partitions, sources_in_order=cfg.sources_in_order)
    result = {
        "parsed_lines": parsed,
        "messages": messages,
        "enriched": enriched,
        "merged": merged,
        "sink_counts": sink_counts(enriched),
        "summary": source_summary(parsed, messages),
        "pattern_counts": pattern_hit_miss(parsed),
    }
    if out_dir:
        route_write(merged.drop("source_order"), os.path.join(out_dir, "routed"))
        result["sink_counts"].write.mode("overwrite").parquet(os.path.join(out_dir, "sink_counts"))
        result["summary"].write.mode("overwrite").parquet(os.path.join(out_dir, "summary"))
        result["pattern_counts"].write.mode("overwrite").parquet(os.path.join(out_dir, "pattern_counts"))
    return result


# --------------------------------------------------------------------------
# checkpoint / resume + lineage (M10)
# --------------------------------------------------------------------------
MANIFEST_SCHEMA = (
    "source string, n_messages long, dt_first timestamp, dt_last timestamp, "
    "n_docs long, n_input_files long, n_partitions long, "
    "patterns_used array<int>, pattern_hits map<int,bigint>, "
    "n_lines_missed long, completed_at double, run_id string"
)


def _manifest_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "manifest")


def read_manifest(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    path = _manifest_path(checkpoint_dir)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def run_pipeline_resumable(
    docs: DataFrame,
    enrichment: DataFrame,
    cfg: PipelineConfig,
    out_dir: str,
    checkpoint_dir: str,
    run_id: str | None = None,
) -> dict:
    """Checkpointed run: skip sources already in the manifest, process the
    remainder, then append their lineage rows. Unit of work = source
    (≙ the reference's unit of work = file): a source's sink partitions
    commit before its manifest row exists, so a crash between the two only
    re-does work, never loses or duplicates a completed source
    (dynamic-partition overwrite keeps the re-do idempotent)."""
    spark = docs.sparkSession
    run_id = run_id or f"run-{int(time.time() * 1000)}"
    manifest = read_manifest(spark, checkpoint_dir)
    done_sources = manifest.select("source").distinct()
    todo = docs.join(F.broadcast(done_sources), "source", "left_anti")
    if todo.isEmpty():
        return {"skipped": True, "run_id": run_id, "n_new_sources": 0}

    result = run_pipeline(todo, enrichment, cfg, out_dir=out_dir)
    # lineage keys off the INPUT sources: a source whose docs yield zero
    # messages (all lines datetime-less) is still "completed" — otherwise
    # it would be reprocessed on every resume
    msg_agg = result["enriched"].groupBy("source").agg(
        F.count("*").alias("n_messages"),
        F.min("ts").alias("dt_first"),
        F.max("ts").alias("dt_last"),
        F.array_distinct(F.collect_set("pattern_id")).alias("patterns_used"),
    )
    # per-DTPD hit/miss metrics (north_star: "parse hit/miss rates per
    # DTPD pattern"): line-grained counts per pattern, bounded by
    # |sources| × |DTPD table| rows — misses are the pattern_id = -1 lines
    pat = result["parsed_lines"].groupBy("source", "pattern_id").agg(
        F.count("*").alias("n")
    )
    pat_agg = pat.groupBy("source").agg(
        F.map_from_entries(
            F.filter(
                F.collect_list(F.struct("pattern_id", "n")),
                lambda s: s["pattern_id"] >= 0,
            )
        ).alias("pattern_hits"),
        F.sum(F.when(F.col("pattern_id") < 0, F.col("n")).otherwise(0)).alias(
            "n_lines_missed"
        ),
    )
    # per-partition/file provenance from the INPUT side (north_star:
    # "per-partition lineage and metrics — files/partitions processed");
    # non-deterministic exprs must be projected before aggregation
    doc_agg = (
        todo.withColumn("_file", F.input_file_name())
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("_file").alias("n_input_files"),
            F.countDistinct("_pid").alias("n_partitions"),
        )
    )
    lineage = (
        todo.select("source")
        .distinct()
        .join(msg_agg, "source", "left")
        .join(doc_agg, "source", "left")
        .join(pat_agg, "source", "left")
        .withColumn("n_messages", F.coalesce(F.col("n_messages"), F.lit(0)))
        .withColumn("patterns_used", F.coalesce(F.col("patterns_used"), F.array().cast("array<int>")))
        .withColumn(
            "pattern_hits",
            F.coalesce(F.col("pattern_hits"), F.expr("map()").cast("map<int,bigint>")),
        )
        .withColumn("n_lines_missed", F.coalesce(F.col("n_lines_missed"), F.lit(0)))
        .withColumn("completed_at", F.lit(time.time()))
        .withColumn("run_id", F.lit(run_id))
        .select(*[c.split(" ")[0] for c in MANIFEST_SCHEMA.replace("\n", "").split(", ")])
    )
    # materialize BEFORE appending: the lineage plan reads the manifest it
    # is about to extend (lazy re-scan would anti-join away its own rows)
    lineage_rows = lineage.collect()
    spark.createDataFrame(lineage_rows, lineage.schema).write.mode("append").parquet(
        _manifest_path(checkpoint_dir)
    )
    metrics = {
        "skipped": False,
        "run_id": run_id,
        "n_new_sources": len(lineage_rows),
    }
    with open(os.path.join(checkpoint_dir, f"metrics-{run_id}.json"), "w") as f:
        json.dump(metrics, f)
    return metrics
