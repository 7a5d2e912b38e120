"""Windows EventLog (evtx) record stream handling — P12.

Reference: ``EvtxReader`` reads all records, stores them in
``Events: BTreeMap<(ts, RecordId), Evtx>`` (sorted, deduped by key) and
counts records that arrived out of chronological order
(/root/reference/src/readers/evtxreader.rs:93,433-524; out_of_order
:260,466). We take records as pre-extracted struct rows
(record_id, ts, xml) — the evtx binary container belongs to the storage
layer at this engine's scale.

Spark realization: per-source dedup + rank via window (bounded per
source); out_of_order = count(ts < lag(ts)) over the ARRIVAL order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def evtx_ordered(records: DataFrame, arrival_col: str = "arrival_no") -> DataFrame:
    """(source, record_id, ts, arrival_no, …) → deduped rows ranked by the
    reference's BTreeMap key (ts, record_id), plus is_out_of_order
    computed against arrival order."""
    key = Window.partitionBy("source", "ts", "record_id").orderBy(arrival_col)
    deduped = records.withColumn("_dup", F.row_number().over(key)).filter(F.col("_dup") == 1).drop("_dup")
    arrive = Window.partitionBy("source").orderBy(arrival_col)
    ooo = (F.col("ts") < F.lag("ts").over(arrive)).cast("int")
    emit = Window.partitionBy("source").orderBy("ts", "record_id")
    return (
        deduped.withColumn("is_out_of_order", F.coalesce(ooo, F.lit(0)))
        .withColumn("emit_rank", F.row_number().over(emit))
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
