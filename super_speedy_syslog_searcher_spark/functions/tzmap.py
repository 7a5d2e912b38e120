"""Named-timezone abbreviation → numeric offset map.

The FULL reference map ``MAP_TZZ_TO_TZz``
(/root/reference/src/data/datetime.rs:1984-2503; 196 distinct
abbreviations × upper/lower case = 392 entries, scraped by the reference
from Wikipedia's List_of_time_zone_abbreviations), regenerated as data
by tools/extract_tzmap.py. Semantics preserved:

* unambiguous abbreviation → fixed numeric offset string ``±HH:MM``;
* AMBIGUOUS abbreviation (used by several zones, e.g. ``IST``, ``MST``,
  ``CST``) → empty-string sentinel → the in-line parse falls back to the
  job's default offset (reference: datetime.rs:6165-6177);
* abbreviations match case-insensitively (reference lists both cases;
  here one uppercase table + case-folded lookup).

CLI-style filter parsing REJECTS ambiguous names outright
(reference README.md:424) — see operators/filters.py, which treats the
sentinel as an error, unlike the in-line parse fallback. Both behaviors
are tested.
"""

from __future__ import annotations

AMBIGUOUS = ""

# offset strings are ±HH:MM; generated from the reference map — edit
# tools/extract_tzmap.py, not this table
TZ_ABBREV_TO_OFFSET: dict[str, str] = {
    "ACDT": '+10:30',
    "ACST": '+09:30',
    "ACT": AMBIGUOUS,
    "ACWST": '+08:45',
    "ADT": '-03:00',
    "AEDT": '+11:00',
    "AEST": '+10:00',
    "AET": '+11:00',
    "AFT": '+04:30',
    "AKDT": '-08:00',
    "AKST": '-09:00',
    "ALMT": '+06:00',
    "AMST": '-03:00',
    "AMT": AMBIGUOUS,
    "ANAT": '+12:00',
    "AQTT": '+05:00',
    "ART": '-03:00',
    "AST": AMBIGUOUS,
    "AWST": '+08:00',
    "AZOST": '+00:00',
    "AZOT": '-01:00',
    "AZT": '+04:00',
    "BIOT": '+06:00',
    "BIT": '-12:00',
    "BNT": '+08:00',
    "BOT": '-04:00',
    "BRST": '-02:00',
    "BRT": '-03:00',
    "BST": AMBIGUOUS,
    "BTT": '+06:00',
    "CAT": '+02:00',
    "CCT": '+06:30',
    "CDT": AMBIGUOUS,
    "CEST": '+02:00',
    "CET": '+01:00',
    "CHADT": '+13:45',
    "CHAST": '+12:45',
    "CHOST": '+09:00',
    "CHOT": '+08:00',
    "CHST": '+10:00',
    "CHUT": '+10:00',
    "CIST": '-08:00',
    "CKT": '-10:00',
    "CLST": '-03:00',
    "CLT": '-04:00',
    "COST": '-04:00',
    "COT": '-05:00',
    "CST": AMBIGUOUS,
    "CT": '-05:00',
    "CVT": '-01:00',
    "CWST": '+08:45',
    "CXT": '+07:00',
    "DAVT": '+07:00',
    "DDUT": '+10:00',
    "DFT": '+01:00',
    "EASST": '-05:00',
    "EAST": '-06:00',
    "EAT": '+03:00',
    "ECT": AMBIGUOUS,
    "EDT": '-04:00',
    "EEST": '+03:00',
    "EET": '+02:00',
    "EGST": '-00:00',
    "EGT": '-01:00',
    "EST": '-05:00',
    "ET": '-04:00',
    "FET": '+03:00',
    "FJT": '+12:00',
    "FKST": '-03:00',
    "FKT": '-04:00',
    "FNT": '-02:00',
    "GALT": '-06:00',
    "GAMT": '-09:00',
    "GET": '+04:00',
    "GFT": '-03:00',
    "GILT": '+12:00',
    "GIT": '-09:00',
    "GMT": '-00:00',
    "GST": AMBIGUOUS,
    "GYT": '-04:00',
    "HAEC": '+02:00',
    "HDT": '-09:00',
    "HKT": '+08:00',
    "HMT": '+05:00',
    "HOVST": '+08:00',
    "HOVT": '+07:00',
    "HST": '-10:00',
    "ICT": '+07:00',
    "IDLW": '-12:00',
    "IDT": '+03:00',
    "IOT": '+03:00',
    "IRDT": '+04:30',
    "IRKT": '+08:00',
    "IRST": '+03:30',
    "IST": AMBIGUOUS,
    "JST": '+09:00',
    "KALT": '+02:00',
    "KGT": '+06:00',
    "KOST": '+11:00',
    "KRAT": '+07:00',
    "KST": '+09:00',
    "LHST": AMBIGUOUS,
    "LINT": '+14:00',
    "MAGT": '+12:00',
    "MART": '-09:30',
    "MAWT": '+05:00',
    "MDT": '-06:00',
    "MEST": '+02:00',
    "MET": '+01:00',
    "MHT": '+12:00',
    "MIST": '+11:00',
    "MIT": '-09:30',
    "MMT": '+06:30',
    "MSK": '+03:00',
    "MST": AMBIGUOUS,
    "MUT": '+04:00',
    "MVT": '+05:00',
    "MYT": '+08:00',
    "NCT": '+11:00',
    "NDT": '-02:30',
    "NFT": '+11:00',
    "NOVT": '+07:00',
    "NPT": '+05:45',
    "NST": '-03:30',
    "NT": '-03:30',
    "NUT": '-11:00',
    "NZDT": '+13:00',
    "NZST": '+12:00',
    "OMST": '+06:00',
    "ORAT": '+05:00',
    "PDT": '-07:00',
    "PET": '-05:00',
    "PETT": '+12:00',
    "PGT": '+10:00',
    "PHOT": '+13:00',
    "PHST": '+08:00',
    "PHT": '+08:00',
    "PKT": '+05:00',
    "PMDT": '-02:00',
    "PMST": '-03:00',
    "PONT": '+11:00',
    "PST": '-08:00',
    "PWT": '+09:00',
    "PYST": '-03:00',
    "PYT": '-04:00',
    "RET": '+04:00',
    "ROTT": '-03:00',
    "SAKT": '+11:00',
    "SAMT": '+04:00',
    "SAST": '+02:00',
    "SBT": '+11:00',
    "SCT": '+04:00',
    "SDT": '-10:00',
    "SGT": '+08:00',
    "SLST": '+05:30',
    "SRET": '+11:00',
    "SRT": '-03:00',
    "SST": AMBIGUOUS,
    "SYOT": '+03:00',
    "TAHT": '-10:00',
    "TFT": '+05:00',
    "THA": '+07:00',
    "TJT": '+05:00',
    "TKT": '+13:00',
    "TLT": '+09:00',
    "TMT": '+05:00',
    "TOT": '+13:00',
    "TRT": '+03:00',
    "TVT": '+12:00',
    "ULAST": '+09:00',
    "ULAT": '+08:00',
    "UT": '-00:00',
    "UTC": '-00:00',
    "UYST": '-02:00',
    "UYT": '-03:00',
    "UZT": '+05:00',
    "VET": '-04:00',
    "VLAT": '+10:00',
    "VOLT": '+03:00',
    "VOST": '+06:00',
    "VUT": '+11:00',
    "WAKT": '+12:00',
    "WAST": '+02:00',
    "WAT": '+01:00',
    "WEST": '+01:00',
    "WET": '-00:00',
    "WGST": '-02:00',
    "WGT": '-03:00',
    "WIB": '+07:00',
    "WIT": '+09:00',
    "WITA": '+08:00',
    "WST": '+08:00',
    "YAKT": '+09:00',
    "YEKT": '+05:00',
    "Z": '+00:00',
    "ZULU": '+00:00',
}

# RFC 822 / military single-letter zones — NOT in the reference sysline
# map (CGP_TZZ matches no single letters besides Z); kept for the CLI
# filter grammar only (operators/filters.py accepts e.g. '-a "... M"').
MILITARY_TZ: dict[str, str] = {
    "A": "+01:00", "B": "+02:00", "C": "+03:00", "D": "+04:00",
    "E": "+05:00", "F": "+06:00", "G": "+07:00", "H": "+08:00",
    "I": "+09:00", "K": "+10:00", "L": "+11:00", "M": "+12:00",
    "N": "-01:00", "O": "-02:00", "P": "-03:00", "Q": "-04:00",
    "R": "-05:00", "S": "-06:00", "T": "-07:00", "U": "-08:00",
    "V": "-09:00", "W": "-10:00", "X": "-11:00", "Y": "-12:00",
}

# uppercase lookup table (abbreviations match case-insensitively)
_TZ_UPPER = {**MILITARY_TZ, **{k.upper(): v for k, v in TZ_ABBREV_TO_OFFSET.items()}}


def resolve_tz_abbrev(abbrev: str, fallback_offset: str | None = None) -> str | None:
    """Resolve an abbreviation. Ambiguous → ``fallback_offset``
    (in-line parse behavior) or ``None`` (CLI filter behavior when
    fallback is None). Unknown → None (conversion failure → the parse
    falls through to the next DTPD entry)."""
    off = _TZ_UPPER.get(abbrev.upper())
    if off is None:
        return None
    if off == AMBIGUOUS:
        return fallback_offset
    return off


def offset_str_to_minutes(off: str) -> int:
    """'±HH:MM' | '±HHMM' | '±HH' | 'Z' → signed minutes. The sign may be
    U+2212 MINUS (reference CGP_TZz accepts it, datetime.rs:1880)."""
    off = off.strip().replace("−", "-")
    if off in ("Z", "z", ""):
        return 0
    sign = -1 if off[0] == "-" else 1
    body = off.lstrip("+-").replace(":", "")
    if len(body) == 2:
        body += "00"
    return sign * (int(body[:2]) * 60 + int(body[2:4]))
