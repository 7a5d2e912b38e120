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
    # -- Europe / Africa
    "IRDT": "+04:30",
    "WAST": "+02:00",
    "CVT": "-01:00",
    "MET": "+01:00",
    "MEST": "+02:00",
    "TRT": "+03:00",
    "FET": "+03:00",
    "SYOT": "+03:00",
    "AZT": "+04:00",
    "GET": "+04:00",
    "SAMT": "+04:00",
    "MUT": "+04:00",
    "RET": "+04:00",
    "SCT": "+04:00",
    "AFT": "+04:30",
    # -- Asia
    "YEKT": "+05:00",
    "TJT": "+05:00",
    "TMT": "+05:00",
    "UZT": "+05:00",
    "MVT": "+05:00",
    "SLST": "+05:30",
    "OMST": "+06:00",
    "BST-BD": "+06:00",
    "KGT": "+06:00",
    "ALMT": "+06:00",
    "MMT": "+06:30",
    "CCT": "+06:30",
    "KRAT": "+07:00",
    "NOVT": "+07:00",
    "HOVT": "+07:00",
    "WITA": "+08:00",
    "MYT": "+08:00",
    "PHT": "+08:00",
    "PHST": "+08:00",
    "BNT": "+08:00",
    "IRKT": "+08:00",
    "ULAT": "+08:00",
    "CHOT": "+08:00",
    "TWT": "+08:00",
    "WIT": "+09:00",
    "YAKT": "+09:00",
    "TLT": "+09:00",
    "PWT": "+09:00",
    "JDT": "+10:00",
    "PGT": "+10:00",
    "CHUT": "+10:00",
    "DDUT": "+10:00",
    "LHST": AMBIGUOUS,  # Lord Howe standard/daylight
    "MAGT": "+11:00",
    "SAKT": "+11:00",
    "SBT": "+11:00",
    "VUT": "+11:00",
    "NCT": "+11:00",
    "PONT": "+11:00",
    "KOST": "+11:00",
    "NFT": "+11:00",
    "PETT": "+12:00",
    "ANAT": "+12:00",
    "FJT": "+12:00",
    "TVT": "+12:00",
    "MHT": "+12:00",
    "NRT": "+12:00",
    "GILT": "+12:00",
    "WAKT": "+12:00",
    "CHAST": "+12:45",
    "CHADT": "+13:45",
    "PHOT": "+13:00",
    "TKT": "+13:00",
    "TOT": "+13:00",
    "WST": AMBIGUOUS,  # Samoa / West Africa Summer (historic)
    "LINT": "+14:00",
    # -- Americas / Atlantic / Pacific
    "AZOST": "+00:00",
    "EGT": "-01:00",
    "EGST": "+00:00",
    "GST-2": "-02:00",
    "BRST": "-02:00",
    "FNT": "-02:00",
    "PMDT": "-02:00",
    "UYST": "-02:00",
    "WGST": "-02:00",
    "ART": "-03:00",
    "BRT": "-03:00",
    "CLST": "-03:00",
    "FKST": "-03:00",
    "GFT": "-03:00",
    "PMST": "-03:00",
    "PYST": "-03:00",
    "ROTT": "-03:00",
    "SRT": "-03:00",
    "UYT": "-03:00",
    "WGT": "-03:00",
    "AMST": AMBIGUOUS,  # Amazon Summer / Armenia Summer
    "BOT": "-04:00",
    "CLT": "-04:00",
    "COST": "-04:00",
    "FKT": "-04:00",
    "GYT": "-04:00",
    "PYT": "-04:00",
    "VET": "-04:00",
    "AMT": AMBIGUOUS,  # Amazon / Armenia
    "ACT": AMBIGUOUS,  # Acre / ACST alias
    "COT": "-05:00",
    "ECT": "-05:00",
    "PET": "-05:00",
    "EASST": "-05:00",
    "CIST": "-05:00",
    "EAST": "-06:00",
    "GALT": "-06:00",
    "CCST": "-06:00",
    "PMT": AMBIGUOUS,
    "TAHT": "-10:00",
    "CKT": "-10:00",
    "MART": "-09:30",
    "GAMT": "-09:00",
    "PIT": "-08:00",
    "NUT": "-11:00",
    "MIT": "-09:30",
    "BIT": "-12:00",
    "IDLW": "-12:00",
    # -- military single letters (RFC 822 / zulu family)
    "A": "+01:00",
    "B": "+02:00",
    "C": "+03:00",
    "D": "+04:00",
    "E": "+05:00",
    "F": "+06:00",
    "G": "+07:00",
    "H": "+08:00",
    "I": "+09:00",
    "K": "+10:00",
    "L": "+11:00",
    "M": "+12:00",
    "N": "-01:00",
    "O": "-02:00",
    "P": "-03:00",
    "Q": "-04:00",
    "R": "-05:00",
    "S": "-06:00",
    "T": "-07:00",
    "U": "-08:00",
    "V": "-09:00",
    "W": "-10:00",
    "X": "-11:00",
    "Y": "-12:00",
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
