"""Regenerate the TZ_ABBREV_TO_OFFSET table in functions/tzmap.py from the
reference's MAP_TZZ_TO_TZz (/root/reference/src/data/datetime.rs:1984-2503).

The map is configuration data (the reference itself scraped it from
Wikipedia's List_of_time_zone_abbreviations); regenerating keeps the
engine's named-tz semantics — including which abbreviations are
AMBIGUOUS and therefore fall back to the job default — byte-identical to
the reference. Prints the table body to stdout; splice it between the
dict braces in tzmap.py.
"""

from __future__ import annotations

import re
from pathlib import Path

src = Path("/root/reference/src/data/datetime.rs").read_text()
start = src.index("pub static MAP_TZZ_TO_TZz")
body = src[start : src.index("};", start)]
entries = re.findall(r'^\s*"([^"]+)" => "([^"]*)",', body, re.M)

d: dict[str, str] = {}
for k, v in entries:
    d.setdefault(k.upper(), v)  # uppercase rows come first in the map
d["AZOST"] = "+00:00"  # lowercase row says "-00:00"; normalize

for k in sorted(d):
    v = d[k]
    print(f'    "{k}": {"AMBIGUOUS" if v == "" else repr(v)},')
print(f"# {len(d)} distinct abbreviations")
