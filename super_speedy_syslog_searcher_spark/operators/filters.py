"""Datetime-range filters — the ``-a`` / ``-b`` semantics.

Reference:
* ``dt_after_or_before`` (F1) and ``dt_pass_filters`` (F2) —
  /root/reference/src/data/datetime.rs:6418-6435, :6463-6510 — the range
  check is INCLUSIVE at both ends (same as Spark ``between``);
* CLI filter-string parsing (F6) — /root/reference/src/bin/s4.rs:279-448 —
  76 strftime forms, epoch ``+%s``, and a relative-offset grammar
  ``[@][+-]DwDdDhDmDs`` resolved against "now" or against the OTHER bound
  when prefixed with ``@``; date-only strings get ``" T000000"`` appended
  (s4.rs:444-448);
* bare datetimes get the job's default tz offset (``--tz-offset``,
  s4.rs:860); ambiguous NAMED timezones are REJECTED here (README.md:424)
  — unlike the in-line parse fallback (tzmap.py).

At scale the ``WHERE ts BETWEEN`` lands on the scan as parquet/Iceberg
min-max + partition pruning — the declarative analogue of the reference's
binary search to the first in-range offset (syslinereader.rs:2567) and its
early stop past ``-b`` (syslogprocessor.rs:114-129).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tzmap import offset_str_to_minutes, resolve_tz_abbrev

# ternary result of dt_pass_filters (reference datetime.rs:6365-6410)
BEFORE_RANGE = "BeforeRange"
IN_RANGE = "InRange"
AFTER_RANGE = "AfterRange"


def dt_after_or_before(ts_col: Column, a=None, b=None) -> Column:
    """F1/F2 lifted to a Column predicate; inclusive both ends."""
    cond = F.lit(True)
    if a is not None:
        cond = cond & (ts_col >= F.lit(a))
    if b is not None:
        cond = cond & (ts_col <= F.lit(b))
    return cond


def dt_between(
    df: DataFrame,
    a=None,
    b=None,
    ts_col: str = "ts",
    date_partition_col: str | None = None,
) -> DataFrame:
    """The ``-a``/``-b`` window filter (F1-F3, inclusive both ends).

    The ``ts`` predicate alone already reaches the parquet scan as a
    pushed filter (row-group min/max pruning — the F4/F5 "seek" analogue
    on an unpartitioned table). When the table is date-partitioned — the
    standard layout for a petabyte log store — pass
    ``date_partition_col`` and the equivalent DATE bounds are emitted as
    a second predicate on that column, which Catalyst turns into
    PartitionFilters: whole day-directories are skipped at planning time
    instead of being opened for their footers. The date bounds are the
    closed interval [date(a), date(b)] — a superset of the ts window, so
    the row-level ts predicate still decides membership exactly.
    """
    if a is None and b is None:
        return df
    out = df.filter(dt_after_or_before(F.col(ts_col), a, b))
    if date_partition_col is not None:
        cond = F.lit(True)
        if a is not None:
            cond = cond & (F.col(date_partition_col) >= F.lit(a.date()))
        if b is not None:
            cond = cond & (F.col(date_partition_col) <= F.lit(b.date()))
        out = out.filter(cond)
    return out


def dt_pass_filters(ts: datetime, a: datetime | None, b: datetime | None) -> str:
    """Scalar ternary check, for tests and driver-side logic."""
    if a is not None and ts < a:
        return BEFORE_RANGE
    if b is not None and ts > b:
        return AFTER_RANGE
    return IN_RANGE


# --------------------------------------------------------------------------
# CLI filter-string grammar (F6)
# --------------------------------------------------------------------------
_REL_RE = re.compile(r"^(?P<at>@?)(?P<sign>[+-])(?P<body>(?:\d+[wdhms])+)$")
_REL_PART = re.compile(r"(\d+)([wdhms])")
_SECONDS = {"w": 7 * 86400, "d": 86400, "h": 3600, "m": 60, "s": 1}

# accepted absolute forms — the reference's CLI_FILTER_PATTERNS
# (s4.rs:286-389) factorized: its 76 entries are exactly
#   {4 time-ful base shapes} × {no frac | .%3f | .%6f}
#     × {none | %z | %:z | %#z | %Z, attached or space-separated}
#   + {3 date-only shapes} + epoch "+%s"
# which this grammar reproduces with the fractional/tz handled as
# post-processing steps gated on the SAME rules the table encodes:
# fractional is EXACTLY 3 or 6 digits and only on time-ful forms; tz only
# on time-ful forms; date-only forms take neither (has_tz=false rows).
# (fmt, date_only, exact_len) — exact_len disambiguates the compact
# separator-less forms (strptime would let %M/%S swallow short digits)
_ABS_FORMS = [
    ("%Y%m%dT%H%M%S", False, 15),
    ("%Y-%m-%d %H:%M:%S", False, None),
    ("%Y-%m-%dT%H:%M:%S", False, None),
    ("%Y/%m/%d %H:%M:%S", False, None),
    # engine extensions beyond the reference table: minute precision
    ("%Y%m%dT%H%M", False, 13),
    ("%Y-%m-%d %H:%M", False, None),
    ("%Y-%m-%dT%H:%M", False, None),
    ("%Y/%m/%d %H:%M", False, None),
    # date-only (midnight; no tz, no fractional — reference rows 73-75)
    ("%Y-%m-%d", True, None),
    ("%Y/%m/%d", True, None),
    ("%Y%m%d", True, 8),
]


def string_wdhms_to_duration(body: str) -> timedelta:
    """'1w2d3h4m5s' → timedelta (reference string_wdhms_to_duration,
    s4.rs:950)."""
    total = 0
    for num, unit in _REL_PART.findall(body):
        total += int(num) * _SECONDS[unit]
    return timedelta(seconds=total)


def parse_dt_filter(
    s: str,
    tz_offset: str = "+00:00",
    now: datetime | None = None,
    other: datetime | None = None,
) -> datetime:
    """One ``-a``/``-b`` value → tz-aware UTC datetime.

    Accepts: epoch ``+%s`` (e.g. ``+1609459200``), relative offsets
    ``[@][+-]1w2d3h4m5s`` (``@`` = relative to the other bound), and the
    absolute forms above with optional fractional seconds and optional
    trailing tz (numeric or unambiguous named).
    """
    s = s.strip()
    default_min = offset_str_to_minutes(tz_offset)

    m = _REL_RE.match(s)
    if m:
        base = other if m.group("at") else (now or datetime.now(timezone.utc))
        if base is None:
            raise ValueError(f"relative filter {s!r} needs the other bound")
        delta = string_wdhms_to_duration(m.group("body"))
        return base + delta if m.group("sign") == "+" else base - delta

    if re.match(r"^\+\d{9,11}(\.\d+)?$", s):  # epoch +%s
        return datetime.fromtimestamp(float(s[1:]), tz=timezone.utc)

    def _try_abs(body: str) -> tuple[datetime, int, bool] | None:
        frac_us = 0
        # fractional is EXACTLY .%3f or .%6f in the reference table — and
        # only on time-ful forms (checked below via date_only)
        mfrac = re.search(r"\.(\d{3}|\d{6})$", body)
        had_frac = False
        if mfrac:
            frac_us = int(mfrac.group(1).ljust(6, "0"))
            body = body[: mfrac.start()]
            had_frac = True
        for fmt, date_only, exact_len in _ABS_FORMS:
            if exact_len is not None and len(body) != exact_len:
                continue
            if date_only and had_frac:
                continue  # reference date-only rows carry no fractional
            try:
                # date-only forms get midnight implicitly (s4.rs:444-448)
                return datetime.strptime(body, fmt), frac_us, date_only
            except ValueError:
                continue
        return None

    # 1) whole string as a bare datetime (default tz applies)
    hit = _try_abs(s)
    tz_min = None
    if hit is None:
        # 2) split off a trailing tz: numeric ±HH[:MM] / ±HHMM / ±HH / Z,
        #    attached or space-separated (%z/%:z/%#z rows) ...
        mnum = re.search(r"\s*([+-]\d{2}:?\d{2}|[+-]\d{2}|Z)$", s)
        if mnum:
            hit = _try_abs(s[: mnum.start()].strip())
            if hit is not None:
                tz_min = offset_str_to_minutes(mnum.group(1))
        if hit is None:
            # ... or a named abbreviation, space-separated or attached
            # after digits (%Z rows; ambiguous → REJECT, README.md:424)
            mname = re.search(r"(?:\s|(?<=\d))([A-Za-z]{2,5})$", s)
            if mname:
                hit = _try_abs(s[: mname.start()].strip())
                if hit is not None:
                    off = resolve_tz_abbrev(mname.group(1))
                    if off is None:
                        if resolve_tz_abbrev(mname.group(1), "X") == "X":
                            raise ValueError(f"ambiguous timezone name in filter: {mname.group(1)!r}")
                        raise ValueError(f"unknown timezone name in filter: {mname.group(1)!r}")
                    tz_min = offset_str_to_minutes(off)
        if hit is not None and hit[2]:
            # reference date-only rows have has_tz=false: '2022-01-01 PST'
            # is not an accepted form
            raise ValueError(f"date-only filter cannot carry a timezone: {s!r}")
    if hit is None:
        raise ValueError(f"unrecognized datetime filter: {s!r}")
    dt, frac_us, _date_only = hit
    offset = tz_min if tz_min is not None else default_min
    dt = dt.replace(microsecond=frac_us, tzinfo=timezone(timedelta(minutes=offset)))
    return dt.astimezone(timezone.utc)


def resolve_filters(
    a: str | None,
    b: str | None,
    tz_offset: str = "+00:00",
    now: datetime | None = None,
) -> tuple[datetime | None, datetime | None]:
    """Resolve the pair, allowing one bound to be @-relative to the other
    (reference string_to_rel_offset_datetime, s4.rs:1111)."""
    dt_a = dt_b = None
    a_rel = a is not None and a.startswith("@")
    b_rel = b is not None and b.startswith("@")
    if a_rel and b_rel:
        raise ValueError("both bounds cannot be @-relative")
    if not a_rel and a is not None:
        dt_a = parse_dt_filter(a, tz_offset, now=now)
    if not b_rel and b is not None:
        dt_b = parse_dt_filter(b, tz_offset, now=now)
    if a_rel:
        dt_a = parse_dt_filter(a, tz_offset, now=now, other=dt_b)
    if b_rel:
        dt_b = parse_dt_filter(b, tz_offset, now=now, other=dt_a)
    return dt_a, dt_b
