"""systemd-journal export-format parsing — P13.

Reference: ``JournalReader`` reads entries via libsystemd FFI
(/root/reference/src/readers/journalreader.rs); entry timestamp comes
from ``_SOURCE_REALTIME_TIMESTAMP`` when present, else
``__REALTIME_TIMESTAMP`` (µs epoch) —
/root/reference/src/data/journal.rs:86-123,148. We do not link
libsystemd: input is the documented journal *export format* (KEY=VALUE
lines, blank-line entry separator), which ``journalctl -o export``
emits.

Spark realization: pure JVM expressions — split doc on blank lines →
explode entries → split lines → map_from_entries. No UDF, whole-stage
codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REALTIME = "__REALTIME_TIMESTAMP"
SOURCE_REALTIME = "_SOURCE_REALTIME_TIMESTAMP"


def parse_journal_export(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, source, text) → one row per journal entry:
    (doc_id, source, entry_no, fields map<string,string>, ts).

    ts = _SOURCE_REALTIME_TIMESTAMP if present else __REALTIME_TIMESTAMP
    (both µs epoch), exactly the reference's precedence
    (journal.rs:112-123).
    """
    entries = docs.select(
        "doc_id", "source",
        F.posexplode(F.split(F.col(text_col), "\n\n")).alias("entry_no", "raw"),
    ).filter(F.length(F.trim("raw")) > 0)
    kv_lines = F.filter(F.split(F.col("raw"), "\n"), lambda l: l.contains("="))
    entries = entries.withColumn(
        "fields",
        F.map_from_entries(
            F.transform(
                kv_lines,
                lambda l: F.struct(
                    F.substring_index(l, "=", 1).alias("key"),
                    F.regexp_replace(l, "^[^=]*=", "").alias("value"),
                ),
            )
        ),
    ).drop("raw")
    usec = F.coalesce(
        F.element_at("fields", SOURCE_REALTIME).cast("long"),
        F.element_at("fields", REALTIME).cast("long"),
    )
    return entries.withColumn("ts", F.timestamp_micros(usec)).withColumn(
        "n_fields", F.size("fields")
    )


def render_journal_entry(ts_usec, source_ts_usec=None, extra: dict[str, object] | None = None) -> F.Column:
    """Column builder for one export-format entry (corpus construction)."""
    parts = [F.concat(F.lit(f"{REALTIME}="), ts_usec.cast("string"))]
    if source_ts_usec is not None:
        parts.append(
            F.when(source_ts_usec.isNotNull(), F.concat(F.lit(f"{SOURCE_REALTIME}="), source_ts_usec.cast("string"))).otherwise(F.lit(None))
        )
    for k, v in (extra or {}).items():
        parts.append(F.concat(F.lit(f"{k}="), v.cast("string")))
    return F.concat_ws("\n", *parts)
