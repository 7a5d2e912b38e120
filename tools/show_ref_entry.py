"""Dump reference DTPD entries by index: the concatcp!() component list,
DTFSS type, slice range, and first test lines. Diagnostic companion to
extract_ref_cases.py."""

from __future__ import annotations

import re
import sys
from pathlib import Path

src = Path("/root/reference/src/data/datetime.rs").read_text()
table_start = src.index("pub const DATETIME_PARSE_DATAS:")
bounds = [m.start() for m in re.finditer(r"DTPD!\(", src) if m.start() > table_start]
bounds.append(len(src))

for arg in sys.argv[1:]:
    if "-" in arg:
        lo, hi = map(int, arg.split("-"))
        idxs = range(lo, hi + 1)
    else:
        idxs = [int(arg)]
    for i in idxs:
        block = src[bounds[i] : bounds[i + 1]]
        lines = block.splitlines()
        print(f"=== entry {i} ===")
        for ln in lines[1:4]:
            print("   ", ln.strip()[:200])
        cases = re.findall(r'"(.*?)"\),', block)
        for c in cases[:3]:
            print("    case:", c[:140])
        print()
