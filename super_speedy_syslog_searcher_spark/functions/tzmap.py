"""Named-timezone abbreviation → numeric offset map.

A working subset of the reference's ~446-entry ``MAP_TZZ_TO_TZz``
(/root/reference/src/data/datetime.rs:1984-2503). Semantics preserved:

* unambiguous abbreviation → fixed numeric offset string ``±HH:MM``;
* AMBIGUOUS abbreviation (used by several zones, e.g. ``IST``) → empty
  string sentinel → the parse falls back to the job's default offset
  (reference: datetime.rs:6165-6177);
* abbreviations match case-insensitively (reference accepts ``pst``).

CLI-style filter parsing REJECTS ambiguous names outright
(reference README.md:424) — see operators/filters.py, which treats the
sentinel as an error, unlike the in-line parse fallback. Both behaviors
are tested.
"""

from __future__ import annotations

AMBIGUOUS = ""

# offset strings are ±HH:MM
TZ_ABBREV_TO_OFFSET: dict[str, str] = {
    "UTC": "+00:00",
    "UT": "+00:00",
    "GMT": "+00:00",
    "Z": "+00:00",
    "ZULU": "+00:00",
    "WET": "+00:00",
    "BST": AMBIGUOUS,  # British Summer / Bougainville
    "CET": "+01:00",
    "WAT": "+01:00",
    "WEST": "+01:00",
    "CEST": "+02:00",
    "EET": "+02:00",
    "CAT": "+02:00",
    "SAST": "+02:00",
    "EEST": "+03:00",
    "MSK": "+03:00",
    "EAT": "+03:00",
    "IDT": "+03:00",
    "IRST": "+03:30",
    "GST": AMBIGUOUS,  # Gulf / South Georgia
    "MSD": "+04:00",
    "PKT": "+05:00",
    "IST": AMBIGUOUS,  # India / Ireland / Israel
    "NPT": "+05:45",
    "BTT": "+06:00",
    "ICT": "+07:00",
    "WIB": "+07:00",
    "CST": AMBIGUOUS,  # US Central / China / Cuba
    "HKT": "+08:00",
    "SGT": "+08:00",
    "AWST": "+08:00",
    "JST": "+09:00",
    "KST": "+09:00",
    "ACST": "+09:30",
    "AEST": "+10:00",
    "VLAT": "+10:00",
    "ChST": "+10:00",
    "ACDT": "+10:30",
    "AEDT": "+11:00",
    "NZST": "+12:00",
    "NZDT": "+13:00",
    "AZOT": "-01:00",
    "GST-SG": "-02:00",
    "NDT": "-02:30",
    "ADT": AMBIGUOUS,  # Atlantic / Arabia Daylight
    "NST": AMBIGUOUS,  # Newfoundland / others
    "AST": AMBIGUOUS,  # Atlantic / Arabia
    "EDT": "-04:00",
    "EST": "-05:00",
    "CDT": AMBIGUOUS,  # US Central Daylight / Cuba Daylight
    "MDT": "-06:00",
    "MST": "-07:00",
    "PDT": "-07:00",
    "PST": "-08:00",
    "AKDT": "-08:00",
    "AKST": "-09:00",
    "HDT": "-09:00",
    "HST": "-10:00",
    "SST": "-11:00",
}

# uppercase lookup table (abbreviations match case-insensitively)
_TZ_UPPER = {k.upper(): v for k, v in TZ_ABBREV_TO_OFFSET.items()}


def resolve_tz_abbrev(abbrev: str, fallback_offset: str | None = None) -> str | None:
    """Resolve an abbreviation. Ambiguous → ``fallback_offset``
    (in-line parse behavior) or ``None`` (CLI filter behavior when
    fallback is None)."""
    off = _TZ_UPPER.get(abbrev.upper())
    if off is None:
        return None
    if off == AMBIGUOUS:
        return fallback_offset
    return off


def offset_str_to_minutes(off: str) -> int:
    """'±HH:MM' | '±HHMM' | '±HH' | 'Z' → signed minutes."""
    off = off.strip()
    if off in ("Z", "z", ""):
        return 0
    sign = -1 if off[0] == "-" else 1
    body = off.lstrip("+-").replace(":", "")
    if len(body) == 2:
        body += "00"
    return sign * (int(body[:2]) * 60 + int(body[2:4]))
