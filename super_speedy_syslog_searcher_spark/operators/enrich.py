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
