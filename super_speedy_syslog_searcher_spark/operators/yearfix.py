"""Year inference for no-year datetime formats (RFC 3164 etc.).

Reference: ``process_missing_year``
(/root/reference/src/readers/syslogprocessor.rs:604-712). The reference
seeds the year from the file's mtime and re-scans the file BACKWARDS; a
backwards time jump greater than 25 hours
(``BACKWARDS_TIME_JUMP_MEANS_NEW_YEAR``, syslogprocessor.rs:189) means a
year rollover, so the year is decremented for all earlier messages.

Our engine has no mtimes (not reproducible — the reference's own CI resets
them, SURVEY §5); the seed year is an explicit job parameter
(``reference_year``) or a per-source column. The 25-hour constant is kept.

Vectorization: instead of a sequential backwards walk we compute, per doc,
the month-day ordering at a UNIFORM year and take a reversed cumulative sum
of ">25h forward jump" flags — equivalent to the sequential rule whenever
each rollover is itself a >25h month-day jump (always true for Dec→Jan).
Runs as one mapInPandas pass over doc-sorted partitions (same
shuffle-free-after-sessionize layout; messages arrive sorted by msg_no).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parse import NOYEAR_PATTERN_IDS

BACKWARDS_TIME_JUMP_MEANS_NEW_YEAR_HOURS = 25


def fix_years_pdf(pdf: pd.DataFrame, reference_year: int) -> pd.DataFrame:
    """Apply the rollover rule to ONE doc's messages (sorted by msg_no).
    Only rows whose pattern lacks a year are rewritten."""
    mask = pdf["pattern_id"].isin(NOYEAR_PATTERN_IDS).to_numpy()
    if not mask.any():
        return pdf
    ts = pdf["ts"]
    if ts.dt.tz is None:  # Arrow batches arrive UTC-naive (session tz UTC)
        ts = ts.dt.tz_localize("UTC")
    sub = ts[mask]
    # rebuild at the uniform reference year
    comp = pd.DataFrame(
        {
            "year": reference_year,
            "month": sub.dt.month,
            "day": sub.dt.day,
            "hour": sub.dt.hour,
            "minute": sub.dt.minute,
            "second": sub.dt.second,
        }
    )
    uni = pd.to_datetime(comp, errors="coerce", utc=True)
    us = sub.dt.microsecond
    # forward jump > 25h between consecutive messages (file order) ⇒ the
    # earlier message belongs to the previous year
    jump_ns = np.int64(BACKWARDS_TIME_JUMP_MEANS_NEW_YEAR_HOURS) * 3_600_000_000_000
    v64 = uni.astype("int64").to_numpy()
    jumps = (v64[:-1] - v64[1:]) > jump_ns
    dec = np.concatenate((np.cumsum(jumps[::-1])[::-1], [0]))
    year = reference_year - dec
    comp["year"] = year
    fixed = pd.to_datetime(comp, errors="coerce", utc=True) + pd.to_timedelta(us, unit="us")
    # leap-day at a non-leap target year → keep the uniform-year value
    fixed = fixed.fillna(uni)
    out_ts = ts.copy()
    out_ts[mask] = fixed
    pdf = pdf.copy()
    pdf["ts"] = out_ts
    return pdf


def infer_years(messages: DataFrame, reference_year: int, num_partitions: int | None = None) -> DataFrame:
    """messages DF → messages DF with no-year timestamps year-corrected.

    One shuffle on doc_id (skipped rows pass through untouched). Cheap
    pre-split: docs with no no-year rows bypass the Python stage entirely
    via an anti/semi split, so the UDF only sees affected docs.
    """
    n = num_partitions or int(messages.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    affected = messages.filter(F.col("pattern_id").isin(NOYEAR_PATTERN_IDS)).select("doc_id").distinct()
    todo = messages.join(F.broadcast(affected), "doc_id", "left_semi")
    passthrough = messages.join(F.broadcast(affected), "doc_id", "left_anti")

    cols = messages.columns
    schema = messages.schema

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_doc = pdf["doc_id"].iloc[-1]
            tail = (pdf["doc_id"] == last_doc).to_numpy()
            cut = len(pdf) - int(tail[::-1].argmin() if not tail.all() else len(pdf))
            pending = pdf.iloc[cut:].copy()
            complete = pdf.iloc[:cut]
            if len(complete):
                yield _fix_block(complete)
        if pending is not None and len(pending):
            yield _fix_block(pending)

    def _fix_block(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [fix_years_pdf(g.reset_index(drop=True), reference_year) for _, g in pdf.groupby("doc_id", sort=False)]
        return pd.concat(parts, ignore_index=True)[cols]

    fixed = (
        todo.repartition(n, "doc_id")
        .sortWithinPartitions("doc_id", "msg_no")
        .mapInPandas(_gen, schema=schema)
    )
    return fixed.unionByName(passthrough)
