"""Output projection tests (SURVEY §2.5 O1-O6)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def msg_df(spark):
    rows = [
        ("d1", "apache.005", datetime(2023, 6, 1, 12, 0, 1, 123456), "line one\nline two"),
        ("d2", "rfc3164.003", datetime(2023, 6, 1, 12, 0, 2, 500000), "single"),
    ]
    return spark.createDataFrame(rows, "doc_id string, source string, ts timestamp, text string")


def test_output_line_prepends_every_line(spark, msg_df):
    from super_speedy_syslog_searcher_spark.operators.output import output_line

    out = {r["doc_id"]: r["out_line"] for r in output_line(msg_df, separator=":").collect()}
    lines = out["d1"].split("\n")
    assert len(lines) == 2
    assert lines[0].startswith("20230601T120001.123+0000:apache.005:line one")
    assert lines[1].startswith("20230601T120001.123+0000:apache.005:line two")


def test_output_line_tz_shift(spark, msg_df):
    from super_speedy_syslog_searcher_spark.operators.output import output_line

    out = output_line(msg_df, tz="-08:00", prepend_name=None).collect()[0]["out_line"]
    assert out.startswith("20230601T040001.123")  # shifted for display


def test_aligned_basename(spark):
    from super_speedy_syslog_searcher_spark.operators.output import aligned_name_col

    df = spark.createDataFrame([("var/log/syslog.2",)], "p string")
    got = df.select(aligned_name_col("p", width=12).alias("n")).collect()[0]["n"]
    assert got == "syslog.2    "


def test_journal_output_modes(spark):
    from super_speedy_syslog_searcher_spark.operators.journal import parse_journal_export
    from super_speedy_syslog_searcher_spark.operators.output import journal_output

    text = (
        "__REALTIME_TIMESTAMP=1704485020000000\n_HOSTNAME=h1\nSYSLOG_IDENTIFIER=sshd\n"
        "_PID=42\nMESSAGE=accepted"
    )
    entries = parse_journal_export(
        spark.createDataFrame([("d", "s", text)], "doc_id string, source string, text string")
    )
    short = journal_output(entries, "short").collect()[0]["out_line"]
    assert short == "Jan 05 20:03:40 h1 sshd[42]: accepted"
    iso = journal_output(entries, "short-iso").collect()[0]["out_line"]
    assert iso.startswith("2024-01-05T20:03:40") and iso.endswith("sshd[42]: accepted")
    cat = journal_output(entries, "cat").collect()[0]["out_line"]
    assert cat == "accepted"
    export = journal_output(entries, "export").collect()[0]["out_line"]
    assert "_PID=42" in export and "MESSAGE=accepted" in export
    with pytest.raises(ValueError):
        journal_output(entries, "nope")
