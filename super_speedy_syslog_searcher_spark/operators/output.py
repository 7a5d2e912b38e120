"""Output projection — the "SELECT list" of the engine (SURVEY §2.5).

Reference: ``PrinterLogMessage`` emits message bytes with optional
prepended normalized datetime (``-u/-l/-z/-d``, default strftime
``%Y%m%dT%H%M%S%.3f%z`` — /root/reference/src/bin/s4.rs:454) and
prepended file name/path with unicode-width column alignment
(``-n/-p/-w``, s4.rs:3325-3393), a configurable separator
(``--separator``), and journalctl-compatible output modes for journal
entries (``--journal-output``: short, short-iso, verbose, export, cat —
/root/reference/src/readers/journalreader.rs:535-585).

Spark realization: pure Column expressions building an output string
column — sinks usually keep the structured columns, the projection exists
for stdout-style sinks and parity tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# default prepend format ≙ CLI_OPT_PREPEND_FMT (s4.rs:454)
DEFAULT_PREPEND_FMT = "yyyyMMdd'T'HHmmss.SSSxx"
DEFAULT_SEPARATOR = ":"


def prepend_datetime_col(ts_col, fmt: str = DEFAULT_PREPEND_FMT, tz: str | None = None) -> Column:
    """O2: normalized datetime string of the message ts in the chosen tz
    (``-u`` utc / ``-z offset`` — we store UTC, so tz shifts for display)."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    if tz and tz not in ("UTC", "+00:00", "Z"):
        ts = F.from_utc_timestamp(ts, tz)
    return F.date_format(ts, fmt)


def aligned_name_col(name_col, width: int | None = None, mode: str = "basename") -> Column:
    """O3: file/source name, optionally basename-stripped and right-padded
    to a fixed column width (unicode-width alignment ≙ s4.rs:3355)."""
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    if mode == "basename":
        c = F.element_at(F.split(c, "/"), -1)
    if width:
        c = F.rpad(c, width, " ")
    return c


def output_line(
    df: DataFrame,
    prepend_dt: bool = True,
    prepend_name: str | None = "source",
    name_width: int | None = None,
    separator: str = DEFAULT_SEPARATOR,
    fmt: str = DEFAULT_PREPEND_FMT,
    tz: str | None = None,
    out_col: str = "out_line",
) -> DataFrame:
    """O1/O4: assemble the printed line: [dt][sep][name][sep]text.

    Multi-line messages get the prepends on EVERY line (the reference
    prepends per Line, printers.rs:143)."""
    parts = []
    if prepend_dt:
        parts.append(prepend_datetime_col("ts", fmt=fmt, tz=tz))
    if prepend_name:
        parts.append(aligned_name_col(prepend_name, width=name_width, mode="plain"))
    if not parts:
        return df.withColumn(out_col, F.col("text"))
    prefix = F.concat_ws(separator, *parts)
    # apply the prefix to every line of the message text
    lines = F.split(F.col("text"), "\n")
    prefixed = F.transform(lines, lambda l: F.concat(prefix, F.lit(separator), l))
    return df.withColumn(out_col, F.concat_ws("\n", prefixed))


# ---------------------------------------------------------------------------
# journal output formats (O5) — journalctl-compatible projections
# ---------------------------------------------------------------------------
def journal_output(entries: DataFrame, mode: str = "short", out_col: str = "out_line") -> DataFrame:
    """entries: (doc_id, source, entry_no, fields map, ts) from
    operators/journal.parse_journal_export."""
    f = F.col("fields")
    host = F.coalesce(f["_HOSTNAME"], F.lit("localhost"))
    ident = F.coalesce(f["SYSLOG_IDENTIFIER"], f["_COMM"], F.lit("unknown"))
    pid = f["_PID"]
    msg = F.coalesce(f["MESSAGE"], F.lit(""))
    tag = F.when(pid.isNotNull(), F.concat(ident, F.lit("["), pid, F.lit("]"))).otherwise(ident)
    if mode == "cat":
        line = msg
    elif mode == "short":
        # 'Jan 05 20:03:40 host ident[pid]: MESSAGE'
        line = F.concat_ws(" ", F.date_format("ts", "MMM dd HH:mm:ss"), host, F.concat(tag, F.lit(":")), msg)
    elif mode == "short-iso":
        line = F.concat_ws(" ", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ssxxx"), host, F.concat(tag, F.lit(":")), msg)
    elif mode == "export":
        kv = F.transform(F.map_entries(f), lambda e: F.concat(e["key"], F.lit("="), e["value"]))
        line = F.concat_ws("\n", kv)
    elif mode == "verbose":
        kv = F.transform(F.map_entries(f), lambda e: F.concat(F.lit("    "), e["key"], F.lit("="), e["value"]))
        head = F.concat(F.date_format("ts", "EEE yyyy-MM-dd HH:mm:ss.SSSSSS 'UTC'"))
        line = F.concat_ws("\n", F.array(head), kv)
    else:
        raise ValueError(f"unknown journal output mode: {mode}")
    return entries.withColumn(out_col, line)
