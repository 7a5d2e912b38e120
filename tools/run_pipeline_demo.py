"""Demo/verify driver: the `s4 <paths> -a A -b B` equivalent as a spark-submit job.

Usage: spark-submit tools/run_pipeline_demo.py [-a DT] [-b DT] [--out DIR]
                                                [--checkpoint DIR]
Prints the first merged messages (ts + sink_key + text), per-sink counts,
and the summary rollup — the reference's stdout + --summary analogue.
With --checkpoint (requires --out) the run is RESUMABLE: completed
sources are recorded in a per-source lineage manifest; re-running skips
them (prints the manifest + skip metrics) — the north_rule's
checkpoint/lineage face at the CLI surface.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from super_speedy_syslog_searcher_spark.operators.filters import resolve_filters
from super_speedy_syslog_searcher_spark.plans.pipeline import (
    PipelineConfig,
    read_manifest,
    run_pipeline,
    run_pipeline_resumable,
)
from super_speedy_syslog_searcher_spark.session import get_spark
from super_speedy_syslog_searcher_spark.sources.tokenized import REFERENCE_YEAR, gen_corpus

DOCS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-a", default=None, help="datetime filter after (inclusive)")
    ap.add_argument("-b", default=None, help="datetime filter before (inclusive)")
    ap.add_argument("--tz-offset", default="+00:00")
    ap.add_argument("--out", default=None, help="fan-out sink directory")
    ap.add_argument("--checkpoint", default=None, help="manifest/lineage dir (resumable runs)")
    ap.add_argument("--docs", type=int, default=200)
    ap.add_argument(
        "--optimize",
        action="store_true",
        help="after routing, OPTIMIZE-ZORDER each sink on (day, source) "
        "(requires --out)",
    )
    ap.add_argument(
        "--purge-source",
        default=None,
        help="after routing, purge every committed row of this source "
        "across all sinks (delete-propagation demo; requires --out)",
    )
    ap.add_argument(
        "--compact",
        action="store_true",
        help="after routing, compact each sink's small files (requires --out)",
    )
    args = ap.parse_args()

    spark = get_spark("s4spark-demo", cores=8)
    dt_a, dt_b = resolve_filters(args.a, args.b, tz_offset=args.tz_offset)
    print(f"resolved filters: -a {dt_a}  -b {dt_b}")

    docs_pd, enrich_pd, _ = gen_corpus(n_docs=args.docs, lines_per_doc=10, n_sources=12, seed=42)
    docs = spark.createDataFrame(docs_pd, schema=DOCS_SCHEMA)
    lookup = spark.createDataFrame(enrich_pd)

    cfg = PipelineConfig(reference_year=REFERENCE_YEAR, dt_a=dt_a, dt_b=dt_b)
    if args.checkpoint:
        if not args.out:
            ap.error("--checkpoint requires --out")
        metrics = run_pipeline_resumable(docs, lookup, cfg, args.out, args.checkpoint)
        print(f"== resume metrics == {metrics}")
        print(
            "== lineage manifest (per-source: messages, docs, files, "
            "partitions, per-DTPD hits, line misses) =="
        )
        read_manifest(spark, args.checkpoint).orderBy("source").show(30, truncate=False)
        # display from the COMMITTED sinks (no second pipeline run)
        print("== sink counts (from committed parquet) ==")
        spark.read.parquet(f"{args.out}/sink_counts").orderBy("sink_key").show(20, truncate=False)
        print("== summary (rollup; NULL source = grand total) ==")
        spark.read.parquet(f"{args.out}/summary").orderBy("source").show(30, truncate=False)
        return
    res = run_pipeline(docs, lookup, cfg, out_dir=args.out)

    print("== merged head (ts | sink_key | source | text) ==")
    for r in res["merged"].select("ts", "ts_ns", "sink_key", "source", "text").take(12):
        print(f"{r['ts']}.{r['ts_ns']:03d}ns [{r['sink_key']:12s}] {r['source']:16s} {r['text'][:60]}")

    print("== sink counts ==")
    res["sink_counts"].orderBy("sink_key").show(20, truncate=False)
    print("== summary (rollup; NULL source = grand total) ==")
    res["summary"].orderBy("source").show(30, truncate=False)

    # log analytics over the merged window (r4.5): message-shape
    # histogram + per-source volume bursts
    from pyspark.sql import functions as F

    from super_speedy_syslog_searcher_spark.operators.summary import rate_anomalies
    from super_speedy_syslog_searcher_spark.operators.templates import mine_templates

    print("== top message templates (Drain-style, per source) ==")
    mine_templates(res["merged"], group_cols=("source",), text_col="text").orderBy(
        F.desc("n"), "source", "template"
    ).show(10, truncate=80)
    print("== volume bursts (hourly z-score > 2) ==")
    bursts = rate_anomalies(res["merged"], bucket="hour", z_threshold=2.0)
    bursts.filter("is_burst").orderBy("source", "bucket_ts").show(10, truncate=False)

    if args.compact:
        if not args.out:
            ap.error("--compact requires --out")
        from super_speedy_syslog_searcher_spark.operators.route import compact_sinks

        print("== sink compaction report ==")
        compact_sinks(spark, args.out, target_bytes=64 << 20).orderBy("sink_key").show(
            20, truncate=False
        )

    if args.optimize:
        if not args.out:
            ap.error("--optimize requires --out")
        from super_speedy_syslog_searcher_spark.operators.route import optimize_sinks
        from super_speedy_syslog_searcher_spark.operators.zorder import day_code, hash_bucket

        print("== sink OPTIMIZE-ZORDER report (day x source) ==")
        optimize_sinks(
            spark, args.out,
            codes=lambda d: [day_code("ts", "2023-01-01", 10), hash_bucket("source", 6)],
            min_files=1,
        ).orderBy("sink_key").show(20, truncate=False)

    if args.purge_source:
        if not args.out:
            ap.error("--purge-source requires --out")
        from pyspark.sql import functions as F

        from super_speedy_syslog_searcher_spark.operators.route import propagate_deletes

        print(f"== purge report (source = {args.purge_source}) ==")
        propagate_deletes(
            spark, args.out, F.col("source") == args.purge_source
        ).orderBy("sink_key").show(20, truncate=False)


if __name__ == "__main__":
    main()
