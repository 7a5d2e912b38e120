"""Property-based render→parse roundtrip over the DTPD table (pure
pandas, no Spark session): random instants rendered in random reference
format families must parse back to the same UTC instant.

The analogue of the reference's per-entry sweep loops
(src/tests/datetime_tests.rs:297) but with generated instants instead of
fixed strings — catches range bugs (month/day/hour edges, tz sign flips,
fractional padding) that fixed cases miss.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from super_speedy_syslog_searcher_spark.functions.parse import parse_series

# instants within the reference's CGP_YEAR range (1969, 197x-20xx)
INSTANTS = st.integers(
    min_value=int(datetime(1970, 1, 1, tzinfo=timezone.utc).timestamp()),
    max_value=int(datetime(2099, 12, 31, tzinfo=timezone.utc).timestamp()),
)
# whole-hour/half-hour offsets like real zones
OFFSETS = st.sampled_from([-11 * 60, -8 * 60, -270, 0, 60, 330, 12 * 60])
FRACS = st.sampled_from([None, "123", "123456", "123456789"])

MON = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
WD = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]


def render(family: int, wall: datetime, off_min: int, frac: str | None) -> str:
    """Render `wall` (the local wall-clock) in one of the format families."""
    z = f"{'+' if off_min >= 0 else '-'}{abs(off_min) // 60:02d}:{abs(off_min) % 60:02d}"
    zc = z.replace(":", "")
    f = f".{frac}" if frac else ""
    mon = MON[wall.month - 1]
    wd = WD[wall.weekday()]
    iso = wall.strftime("%Y-%m-%dT%H:%M:%S")
    ymd_sp = wall.strftime("%Y/%m/%d %H:%M:%S")
    hms = wall.strftime("%H:%M:%S")
    if family == 0:
        return f"{iso}{f}{z} host app[1]: msg"
    if family == 1:
        return f"[{ymd_sp}{f}] oplock.c:1340 msg"
    if family == 2:
        return f"<14>{mon} {wall.day:2d} {hms} {wall.year} {z} HOST proc[1]: msg"
    if family == 3:
        return f"{wd}, {wall.day:02d} {mon} {wall.year} {hms} {zc} body"
    if family == 4:
        return f"TRACE:\t{wd} {mon} {wall.day:02d} {wall.year} {hms} {zc} t:"
    if family == 5:
        return f"{wd} {mon} {wall.day:2d} {hms} {zc} {wall.year} try umount"
    if family == 6:
        return f"INFO {mon}-{wall.day:02d} {hms} {wall.year} {z} === msg ==="
    if family == 7:
        return f'{{"timestamp": "{iso}{f}{z}"}}'
    if family == 8:
        return f"prefix text {wall.strftime('%Y-%m-%d %H:%M:%S')}{f} {z} done"
    raise AssertionError(family)


# families with fractional support in the rendered shape
FRAC_OK = {0, 1, 7, 8}


# families whose rendered shape carries NO tz → wall clock must be UTC
NO_TZ = {1}


@settings(max_examples=120, deadline=None)
@given(epoch=INSTANTS, off_min=OFFSETS, family=st.integers(0, 8), frac=FRACS)
def test_render_parse_roundtrip(epoch, off_min, family, frac):
    if family not in FRAC_OK:
        frac = None
    if family in NO_TZ:
        off_min = 0
    instant = datetime.fromtimestamp(epoch, tz=timezone.utc)
    wall = (instant + timedelta(minutes=off_min)).replace(tzinfo=None)
    line = render(family, wall, off_min, frac)
    out = parse_series(pd.Series([line])).iloc[0]
    assert pd.notna(out["ts"]), line
    frac_us = int((frac or "0").ljust(9, "0")[:6])
    frac_ns = int((frac or "0").ljust(9, "0")) % 1000
    expect = pd.Timestamp(instant).tz_convert("UTC") + pd.Timedelta(microseconds=frac_us)
    assert out["ts"] == expect, f"{line!r}: {out['ts']} != {expect}"
    assert out["ts_ns"] == frac_ns, line
    # span sanity: the datetime substring is inside the line and non-empty
    assert 0 <= out["dt_beg"] < out["dt_end"] <= len(line), line
