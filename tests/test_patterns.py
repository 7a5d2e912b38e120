"""Parametrized sweep over every DTPD embedded test case — the analogue of
the reference's test_DATETIME_PARSE_DATAS matrix
(/root/reference/src/tests/datetime_tests.rs:261,297). Pure pandas, no
Spark session."""

from __future__ import annotations

import pandas as pd
import pytest

from super_speedy_syslog_searcher_spark.functions.parse import parse_series
from super_speedy_syslog_searcher_spark.functions.patterns import DATETIME_PARSE_DATAS
from super_speedy_syslog_searcher_spark.functions.tzmap import offset_str_to_minutes, resolve_tz_abbrev

CASES = [
    pytest.param(p.pattern_id, case, id=f"{p.name}-{i}")
    for p in DATETIME_PARSE_DATAS
    for i, case in enumerate(p.test_cases)
]


@pytest.mark.parametrize("pattern_id,case", CASES)
def test_dtpd_case(pattern_id, case):
    line, dt_beg, dt_end, iso_utc, ns_rem = case
    res = parse_series(pd.Series([line]))
    row = res.iloc[0]
    assert row["pattern_id"] == pattern_id, f"matched {row['pattern_id']}, want {pattern_id}"
    got = row["ts"]
    assert pd.notna(got), "no timestamp parsed"
    expect = pd.Timestamp(iso_utc, tz="UTC")
    assert got == expect, f"ts {got} != {expect}"
    assert row["ts_ns"] == ns_rem
    assert (row["dt_beg"], row["dt_end"]) == (dt_beg, dt_end)


def test_table_internal_consistency():
    """≙ test_DATETIME_PARSE_DATAS_builtin: ids dense, dt group present,
    every entry has test cases."""
    for i, p in enumerate(DATETIME_PARSE_DATAS):
        assert p.pattern_id == i
        assert "(?P<dt>" in p.regex, p.name
        assert p.test_cases, f"{p.name} has no embedded test cases"
        assert p.slice_lo < p.slice_hi


def test_no_datetime_lines():
    res = parse_series(pd.Series(["no digits here", "", "   indented continuation"]))
    assert res["ts"].isna().all()
    assert (res["pattern_id"] == -1).all()


def test_ambiguous_tz_falls_back_to_default():
    # IST is ambiguous → in-line parse uses the default offset
    # (reference datetime.rs:6165-6177)
    res = parse_series(pd.Series(["2023-01-06 14:35:00 IST host"]), default_tz_minutes=330)
    assert res.iloc[0]["ts"] == pd.Timestamp("2023-01-06 09:05:00", tz="UTC")


def test_unknown_tz_name_rejected_falls_through():
    # unknown named tz → conversion fails → later pattern (rfc3339 bare) matches
    res = parse_series(pd.Series(["2023-01-06 14:35:00 XQZT host"]))
    row = res.iloc[0]
    assert pd.notna(row["ts"])
    assert DATETIME_PARSE_DATAS[row["pattern_id"]].name == "rfc3339"


def test_resolve_tz_api():
    assert resolve_tz_abbrev("PST") == "-08:00"
    assert resolve_tz_abbrev("pst") == "-08:00"
    assert resolve_tz_abbrev("IST") is None  # ambiguous, no fallback → CLI reject
    assert resolve_tz_abbrev("IST", "+05:30") == "+05:30"
    assert offset_str_to_minutes("-08:00") == -480
    assert offset_str_to_minutes("+0530") == 330
    assert offset_str_to_minutes("Z") == 0
    assert offset_str_to_minutes("-11") == -660


def test_locked_pattern_fast_path():
    # with a lock on rfc3339, an apache line still parses via fallback pass
    lines = pd.Series(
        [
            "2020-01-01 00:20:00 locked fast path",
            '192.168.0.115 - - [08/Oct/2022:22:26:35 +0000] "GET / HTTP/1.1" 404 0',
        ]
    )
    locked = pd.Series([7, 7])  # rfc3339 id
    res = parse_series(lines, locked=locked)
    assert pd.notna(res.iloc[0]["ts"]) and pd.notna(res.iloc[1]["ts"])
    assert res.iloc[1]["ts"] == pd.Timestamp("2022-10-08 22:26:35", tz="UTC")
