"""Enrichment: broadcast-join the source → (facility, severity) lookup.

The reference keys per-file output state (printer, color) by ``PathId``
(map_pathid_printer, /root/reference/src/bin/s4.rs:3397-3418); the
north_star generalizes this to a source-keyed enrichment map feeding the
routing key. The lookup is tiny → ALWAYS broadcast (no shuffle of the fact
side); unmatched sources default to ``facility='unknown', severity='info'``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEVERITY_CLASS = {
    "debug": "dbg",
    "info": "info",
    "notice": "info",
    "warning": "warn",
    "err": "err",
    "crit": "err",
    "alert": "err",
    "emerg": "err",
}


def severity_class_col(sev_col) -> F.Column:
    expr = None
    for sev, cls in SEVERITY_CLASS.items():
        expr = F.when(sev_col == sev, cls) if expr is None else expr.when(sev_col == sev, cls)
    return expr.otherwise("info")


def enrich(messages: DataFrame, lookup: DataFrame) -> DataFrame:
    """messages ⟕ lookup on ``source`` (broadcast), fill defaults, compute
    ``sink_key = facility + '.' + severity_class``."""
    look = lookup.select(
        "source",
        F.col("facility").alias("_facility"),
        F.col("severity").alias("_severity"),
    )
    out = messages.join(F.broadcast(look), "source", "left")
    facility = F.coalesce(F.col("_facility"), F.lit("unknown"))
    severity = F.coalesce(F.col("_severity"), F.lit("info"))
    return (
        out.withColumn("facility", facility)
        .withColumn("severity", severity)
        .withColumn("sink_key", F.concat_ws(".", F.col("facility"), severity_class_col(F.col("severity"))))
        .drop("_facility", "_severity")
    )


def asof_enrich(
    messages: DataFrame,
    dim_history: DataFrame,
    key_col: str = "source",
    ts_col: str = "ts",
    valid_from_col: str = "valid_from",
) -> DataFrame:
    """Temporal (AS-OF) enrichment: each message joins the dimension
    VERSION in effect at its own timestamp — the most recent
    ``dim_history`` row per key with ``valid_from <= ts`` (an SCD-2
    slowly-changing-dimension join; kdb asof / Flink temporal-table
    semantics). Messages older than every version get NULL attributes
    (no version was in effect yet).

    Spark has no native as-of join; the usual emulations either shuffle
    both sides into a union-window (a per-key window over the FACT
    stream — unbounded partitions at 100 TB) or range-join and
    aggregate. This implementation exploits what makes dimension
    history a dimension: versions-per-key is BOUNDED (config changes
    are rare next to events). The history collapses to one sorted
    array of versions per key (a |dim|-row table), broadcasts, and each
    fact row picks ``element_at(filter(versions, v.valid_from <= ts),
    -1)`` — map-only, zero fact shuffle, O(versions-per-key) per row in
    whole-stage codegen. Ties on ``valid_from`` resolve to the
    later-sorted struct (deterministic: structs sort by every field).

    Returns the fact columns plus every non-key dimension attribute.
    """
    attrs = [c for c in dim_history.columns if c not in (key_col, valid_from_col)]
    hist = dim_history.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(valid_from_col).alias("_vf"), *attrs))
        ).alias("_hist")
    )
    joined = messages.join(F.broadcast(hist), key_col, "left")
    # try_element_at: ANSI mode makes element_at(-1) THROW on the empty
    # array a too-early message produces — NULL is the contract here
    picked = F.try_element_at(
        F.filter("_hist", lambda v: v["_vf"] <= F.col(ts_col)), F.lit(-1)
    )
    out = joined
    for a in attrs:
        out = out.withColumn(a, picked[a])
    return out.drop("_hist")
