"""Windows EventLog (evtx) record stream handling — P12.

Reference: ``EvtxReader`` reads all records, stores them in
``Events: BTreeMap<(ts, RecordId), Evtx>`` (sorted, deduped by key) and
counts records that arrived out of chronological order
(/root/reference/src/readers/evtxreader.rs:93,433-524; out_of_order
:260,466). We take records as pre-extracted struct rows
(record_id, ts, xml) — the evtx binary container belongs to the storage
layer at this engine's scale.

Spark realization (round 3 — VERDICT r2 #4): the reference's per-file
BTreeMap serializes one file per thread, and the round-2 port inherited
that bound by windowing on ``source`` alone — one multi-GB source = one
task. Both per-source sequences are now two-level: work happens inside
bounded buckets (arrival-number buckets for the out-of-order lag,
time buckets for the emit rank) and only the per-bucket summaries — a
few rows per million records — flow through a per-source window. No
stage ever sorts or buffers a whole source in one task.

Assumptions (the evtx container guarantees both): ``ts`` is non-null and
``arrival_no`` is unique per source (it is the reader's record sequence).
Skew note: a single hot time bucket (e.g. an event storm within one
``emit_bucket_seconds`` span) bounds the emit-rank window at that
bucket's row count — shrink the bucket seconds to split it further.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def evtx_ordered(
    records: DataFrame,
    arrival_col: str = "arrival_no",
    arrival_bucket: int = 1 << 20,
    emit_bucket_seconds: int = 86400,
) -> DataFrame:
    """(source, record_id, ts, arrival_no, …) → deduped rows ranked by the
    reference's BTreeMap key (ts, record_id), plus is_out_of_order
    computed against arrival order.

    * dedup: row_number over the fine-grained (source, ts, record_id) key
      — no coarse partition anywhere.
    * is_out_of_order (``ts < previous arrival's ts``): lag within
      arrival-number buckets of ``arrival_bucket`` records; a bucket's
      first row takes its predecessor from a per-bucket "last ts by
      arrival" summary chained with a lag over bucket order (rows/bucket
      per source ≈ n/2^20 — the only per-source window, and it is tiny).
    * emit_rank (row_number by (ts, record_id) within source): ranked
      within ``emit_bucket_seconds`` time buckets, then shifted by the
      running sum of earlier buckets' counts — the standard two-level
      rank; the per-source window again sees only bucket summaries.
    """
    key = Window.partitionBy("source", "ts", "record_id").orderBy(arrival_col)
    deduped = (
        records.withColumn("_dup", F.row_number().over(key)).filter(F.col("_dup") == 1).drop("_dup")
    )

    # --- out-of-order vs arrival order, bucketed ---
    d = deduped.withColumn("_ab", F.floor(F.col(arrival_col) / arrival_bucket))
    wa = Window.partitionBy("source", "_ab").orderBy(arrival_col)
    d = d.withColumn("_lag_ts", F.lag("ts").over(wa))
    lasts = d.groupBy("source", "_ab").agg(F.max_by("ts", F.col(arrival_col)).alias("_last_ts"))
    wb = Window.partitionBy("source").orderBy("_ab")
    prev_last = lasts.withColumn("_prev_last_ts", F.lag("_last_ts").over(wb)).select(
        "source", "_ab", "_prev_last_ts"
    )
    d = d.join(prev_last, ["source", "_ab"], "left")
    ooo = (F.col("ts") < F.coalesce(F.col("_lag_ts"), F.col("_prev_last_ts"))).cast("int")
    d = d.withColumn("is_out_of_order", F.coalesce(ooo, F.lit(0))).drop(
        "_ab", "_lag_ts", "_prev_last_ts"
    )

    # --- emit rank by (ts, record_id), bucketed ---
    d = d.withColumn("_tb", F.floor(F.unix_timestamp("ts") / emit_bucket_seconds))
    we = Window.partitionBy("source", "_tb").orderBy("ts", "record_id")
    d = d.withColumn("_r1", F.row_number().over(we))
    wo = Window.partitionBy("source").orderBy("_tb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("source", "_tb")
        .count()
        .withColumn("_off", F.coalesce(F.sum("count").over(wo), F.lit(0)))
        .select("source", "_tb", "_off")
    )
    return (
        d.join(offsets, ["source", "_tb"], "left")
        .withColumn("emit_rank", (F.col("_off") + F.col("_r1")).cast("int"))
        .drop("_tb", "_r1", "_off")
    )


def evtx_summary(ordered: DataFrame) -> DataFrame:
    """Per-source counters (≙ SummaryEvtxReader: events processed /
    accepted, out_of_order, dt first/last — evtxreader.rs:307,536-599)."""
    return ordered.groupBy("source").agg(
        F.count("*").alias("events_accepted"),
        F.sum("is_out_of_order").alias("out_of_order"),
        F.min("ts").alias("dt_first"),
        F.max("ts").alias("dt_last"),
    )
