"""JVM fast lane for the datetime parse — zero Python for the hot shape.

After P9 lock-in, most sources parse with ONE pattern. For patterns whose
extraction is expressible as Catalyst expressions, rows take a whole-stage
-codegen'd lane: token decode via ``transform+char`` (JVM), anchored
``regexp_extract``, normalization by string ops, ``to_timestamp``. Rows
the lane cannot prove correct FALL BACK to the vectorized Python kernel:

* docs with embedded newlines (multi-line sessions),
* sources locked to a non-fast pattern (or unlocked),
* rows whose extraction fails or carries >6 fractional digits (the lane
  cannot keep the ns remainder — the Python lane owns ts_ns > 0).

Lane selection is a per-row PREDICATE, not a join — both lanes are narrow
scans, so the pipeline stays shuffle-free before routing. The union of
both lanes is exactly ``parse_messages_fused`` output — the fast lane is
a physical optimization, never a semantic one (verified by the same
DuckDB oracle queries either way).

Reference analogue: one-pattern lock-in exists to cheapen dispatch
(/root/reference/src/readers/syslinereader.rs:450,1528); this carries the
idea further by moving the locked pattern's dispatch out of Python.

Measured (round 2, 6M docs, local[16]): the hybrid lane is ~15% SLOWER
than the fused Python kernel (20.6 s vs 17.4 s) — the per-codepoint
transform+char token decode and the ascii_only forall scan outweigh the
regexp win, while the Python kernel's batched Arrow decode amortizes
better. The hybrid therefore stays a correctness-verified ALTERNATIVE
(output ≡ fused, tests/test_jvm_fast.py), not the default path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_tz(dt: Column) -> Column:
    dt = F.regexp_replace(dt, r"([+-]\d{2})(\d{2})$", "$1:$2")  # +0100 → +01:00
    return F.regexp_replace(dt, r"([+-]\d{2})$", "$1:00")  # +01 → +01:00


def _iso(dt: Column) -> Column:
    """'2024-01-05[T ]20:03:40(.ffffff)(tz)' → timestamp (session tz UTC)."""
    dt = F.regexp_replace(dt, r" (?=[+-]\d|Z$)", "")  # drop space before tz
    return F.to_timestamp(F.regexp_replace(_norm_tz(dt), r"^(\S{10}) ", "$1T"))


def _ymd_slash(dt: Column) -> Column:
    return _iso(F.regexp_replace(dt, r"^(\d{4})/(\d{1,2})/(\d{1,2})", "$1-$2-$3"))


# pattern name → (java_extract_regex with group1 = dt, converter). The
# extract regex must reject anything the converter cannot normalize
# exactly (e.g. it only admits ≤6 fractional digits).
JVM_FAST: dict = {
    "rfc3339_num_tz": (
        r"^(?:<\d{1,3}> ?)?((?:1969|19[7-9]\d|20\d\d)-\d{1,2}-\d{1,2}[T ]\d{1,2}:\d{2}:\d{2}(?:[\.,]\d{1,6})? ?(?:[+-]\d{2}:?(?:\d{2})?|Z))(?:[^\d]|$)",
        lambda dt: _iso(F.regexp_replace(dt, ",", ".")),
    ),
    "rfc3339": (
        r"^(?:<\d{1,3}> ?)?((?:1969|19[7-9]\d|20\d\d)-\d{1,2}-\d{1,2}[T ]\d{1,2}:\d{2}:\d{2}(?:[\.,]\d{1,6})?)(?:[^\d,\.]|[\.,]\D|$)",
        lambda dt: _iso(F.regexp_replace(dt, ",", ".")),
    ),
    "bracketed_ymd": (
        r"^[\[\(\{<]((?:1969|19[7-9]\d|20\d\d)/\d{1,2}/\d{1,2}[ T]\d{1,2}:\d{2}:\d{2}(?:[\.,]\d{1,6})?)(?:[,\.\| \t][^\]\)\}>]{0,20})?[\]\)\}>]",
        lambda dt: _ymd_slash(F.regexp_replace(dt, ",", ".")),
    ),
    "word_tab_ymd": (
        r"^[\w\-\.]{1,16}\t((?:1969|19[7-9]\d|20\d\d)/\d{1,2}/\d{1,2}[ T]\d{1,2}:\d{2}:\d{2}(?:[\.,]\d{1,6})?)",
        lambda dt: _ymd_slash(F.regexp_replace(dt, ",", ".")),
    ),
}

FAST_NAMES = set(JVM_FAST)


def decode_tokens_col(tokens_col) -> Column:
    """array<int32> codepoints → string, pure JVM (transform + char).

    CORRECT ONLY FOR ASCII (codepoints 1..127): Spark defines char(n) as
    chr(n % 256), so any codepoint ≥ 256 would silently decode to the
    wrong character (and shift locate()-based dt offsets). Callers must
    gate on :func:`ascii_only_col` before trusting this decode."""
    return F.concat_ws("", F.transform(tokens_col, lambda c: F.char(c)))


def ascii_only_col(tokens_col) -> Column:
    """True iff every token is a plain ASCII codepoint (1..127) — the
    range where transform+char decode provably round-trips. Non-ASCII
    docs take the Python lane (correct UTF-32 decode there)."""
    return F.forall(tokens_col, lambda t: (t >= 1) & (t <= 127))


def parse_messages_hybrid(
    docs: DataFrame,
    default_tz: str = "+00:00",
    reference_year: int | None = None,
    sample_lines_per_doc: int = 8,
    vote_doc_sample_mod: int = 20,
) -> DataFrame:
    """JVM fast lane + Python kernel fallback; output ≡ parse_messages_fused.

    Only engages when the default tz is UTC (the fast lane parses in the
    UTC session zone); other defaults use the Python path entirely.
    """
    from .parse import parse_messages_fused, vote_lines_from_docs, vote_patterns
    from .patterns import PATTERN_BY_NAME

    if default_tz not in ("+00:00", "UTC", "Z"):
        return parse_messages_fused(
            docs, default_tz=default_tz, reference_year=reference_year,
            sample_lines_per_doc=sample_lines_per_doc, vote_doc_sample_mod=vote_doc_sample_mod,
        )

    locked_map = vote_patterns(
        vote_lines_from_docs(docs, doc_sample_mod=vote_doc_sample_mod),
        sample_lines_per_doc=sample_lines_per_doc, doc_sample_mod=1,
    )
    id_to_name = {p.pattern_id: p.name for p in PATTERN_BY_NAME.values()}
    fast_sources = {
        s: id_to_name[pid] for s, pid in locked_map.items() if id_to_name.get(pid) in FAST_NAMES
    }
    if not fast_sources:
        return parse_messages_fused(
            docs, reference_year=reference_year,
            sample_lines_per_doc=sample_lines_per_doc, vote_doc_sample_mod=vote_doc_sample_mod,
            locked_map=locked_map,
        )

    fast_names = sorted(set(fast_sources.values()))
    name_expr = None
    for s, name in sorted(fast_sources.items()):
        name_expr = (F.when(F.col("source") == s, name) if name_expr is None
                     else name_expr.when(F.col("source") == s, name))
    eligible = (
        name_expr.isNotNull()
        & ~F.array_contains("tokens", F.lit(10))
        & ascii_only_col(F.col("tokens"))
    )

    text = decode_tokens_col(F.col("tokens"))
    with_cols = (
        docs.withColumn("_fastpat", name_expr)
        .withColumn("_text", F.when(eligible, text))
    )
    dt_expr, ts_expr, pid_expr = None, None, None
    for name in fast_names:
        rx, conv = JVM_FAST[name]
        this_dt = F.regexp_extract("_text", rx, 1)
        cond = F.col("_fastpat") == name
        dt_expr = F.when(cond, this_dt) if dt_expr is None else dt_expr.when(cond, this_dt)
        ts_expr = F.when(cond, conv(this_dt)) if ts_expr is None else ts_expr.when(cond, conv(this_dt))
        pid = PATTERN_BY_NAME[name].pattern_id
        pid_expr = F.when(cond, pid) if pid_expr is None else pid_expr.when(cond, pid)

    staged = (
        with_cols.withColumn("_dt", F.when(eligible, dt_expr))
        .withColumn("_ts", F.when(eligible, ts_expr))
    )
    ok = eligible & (F.length("_dt") > 0) & F.col("_ts").isNotNull()

    fast_msgs = staged.filter(ok).select(
        "doc_id",
        "source",
        F.lit(1).alias("msg_no"),
        F.col("_ts").alias("ts"),
        F.lit(0).alias("ts_ns"),
        (F.expr("locate(_dt, _text)") - 1).cast("int").alias("dt_beg"),
        (F.expr("locate(_dt, _text)") - 1 + F.length("_dt")).cast("int").alias("dt_end"),
        pid_expr.cast("int").alias("pattern_id"),
        F.col("_text").alias("text"),
        F.col("tokens"),
        F.lit(1).alias("n_lines"),
        F.length("_text").cast("long").alias("n_chars"),
    )
    leftover = staged.filter(~F.coalesce(ok, F.lit(False))).select(*docs.columns)
    slow_msgs = parse_messages_fused(
        leftover, reference_year=reference_year,
        sample_lines_per_doc=sample_lines_per_doc, vote_doc_sample_mod=vote_doc_sample_mod,
        locked_map=locked_map,
    )
    return fast_msgs.unionByName(slow_msgs)
