"""Extract the reference's embedded DTPD test cases into a JSON fixture.

The reference validates its 173-entry datetime-pattern table with ~1,700
embedded `(dt_beg, dt_end, (tz, y, m, d, H, M, S, ns), line)` cases
(/root/reference/src/data/datetime.rs:2575-5244, runner at
src/tests/datetime_tests.rs:261,297). Porting the CASES (data, not code)
is the cheapest way to catch regex-dialect drift — VERDICT.md round-1
item 5.

Usage:
    python tools/extract_ref_cases.py               # writes tests/data/ref_dtpd_cases.json
    python tools/extract_ref_cases.py --report      # also run parse_series, print coverage
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REF = Path("/root/reference/src/data/datetime.rs")
OUT = Path(__file__).resolve().parents[1] / "tests" / "data" / "ref_dtpd_cases.json"


def parse_tz_consts(src: str) -> dict[str, int]:
    """Evaluate the `const O_X: fos = <expr>;` offset table."""
    consts: dict[str, int] = {}
    pat = re.compile(r"const (O_\w+): fos = ([^;]+);")
    pending = pat.findall(src)
    # O_L is "local" sentinel (i32::MAX) → resolved by the consumer to the
    # job's default tz
    progress = True
    while pending and progress:
        progress, still = False, []
        for name, expr in pending:
            e = expr.strip()
            if "max_value" in e:
                consts[name] = None  # sentinel: local/default tz
                progress = True
                continue
            e2 = re.sub(r"\bO_\w+\b", lambda m: str(consts.get(m.group(0), "?")), e)
            if "?" in e2:
                still.append((name, expr))
                continue
            consts[name] = int(eval(e2))  # arithmetic only (audited input)
            progress = True
        pending = still
    return consts


CASE_RE = re.compile(
    r"\(\s*(\d+),\s*(\d+),\s*\(\s*(O_\w+),\s*(YD|\d+),\s*(\d+),\s*(\d+),\s*(\d+),\s*(\d+),\s*(\d+),\s*(\d+)\s*\),\s*(r?#*)\"",
)

YEAR_DUMMY = 1972  # reference YEAR_FALLBACKDUMMY (datetime.rs:146-155,294)


def read_rust_string(src: str, i: int, raw: bool, hashes: int = 0) -> tuple[str, int]:
    """Read a Rust string starting at src[i] == first char after the
    opening quote; returns (decoded, index_after_closing_quote)."""
    out = []
    closer = '"' + "#" * hashes
    while True:
        c = src[i]
        if c == '"' and src[i : i + len(closer)] == closer:
            return "".join(out), i + len(closer)
        if c == "\\" and not raw:
            nxt = src[i + 1]
            mapping = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "0": "\0", "'": "'"}
            if nxt in mapping:
                out.append(mapping[nxt])
                i += 2
                continue
            if nxt == "x":
                out.append(chr(int(src[i + 2 : i + 4], 16)))
                i += 4
                continue
            if nxt == "u":
                m = re.match(r"u\{([0-9a-fA-F]+)\}", src[i + 1 :])
                out.append(chr(int(m.group(1), 16)))
                i += 1 + m.end()
                continue
            raise ValueError(f"unknown escape at {i}: {src[i:i+8]!r}")
        out.append(c)
        i += 1


def extract(src: str) -> list[dict]:
    tz = parse_tz_consts(src)
    cases = []
    # find DTPD! blocks to attribute an entry index to each case
    entry_bounds = [m.start() for m in re.finditer(r"DTPD!\(", src)]
    table_start = src.index("pub const DATETIME_PARSE_DATAS:")
    entry_bounds = [b for b in entry_bounds if b > table_start]

    def entry_index(pos: int) -> int:
        lo = -1
        for i, b in enumerate(entry_bounds):
            if b <= pos:
                lo = i
            else:
                break
        return lo

    for m in CASE_RE.finditer(src):
        if m.start() < table_start:
            continue
        # skip commented-out cases (the reference keeps a few disabled)
        line_start = src.rfind("\n", 0, m.start()) + 1
        if src[line_start : m.start()].lstrip().startswith("//"):
            continue
        beg, end = int(m.group(1)), int(m.group(2))
        tzname = m.group(3)
        ytok = m.group(4)
        y = YEAR_DUMMY if ytok == "YD" else int(ytok)
        mo, d, H, M, S, ns = (int(m.group(i)) for i in range(5, 11))
        rawtok = m.group(11)
        line, _ = read_rust_string(src, m.end(), rawtok.startswith("r"), rawtok.count("#"))
        cases.append(
            {
                "entry": entry_index(m.start()),
                "dt_beg": beg,
                "dt_end": end,
                "tz_offset_secs": tz.get(tzname),  # None = default/local fill
                "ymdhmsn": [y, mo, d, H, M, S, ns],
                "line": line,
            }
        )
    return cases


def report(cases: list[dict]) -> None:
    import pandas as pd

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from super_speedy_syslog_searcher_spark.functions.parse import parse_series

    lines = pd.Series([c["line"] for c in cases])
    out = parse_series(lines)  # default tz +00:00, dummy year 1972
    n_ok = n_span = n_val = n_miss = 0
    miss_by_entry: dict[int, int] = {}
    wrong: list[tuple] = []
    for i, c in enumerate(cases):
        ts = out["ts"].iloc[i]
        if ts is pd.NaT or pd.isna(ts):
            n_miss += 1
            miss_by_entry[c["entry"]] = miss_by_entry.get(c["entry"], 0) + 1
            continue
        y, mo, d, H, M, S, ns = c["ymdhmsn"]
        off = c["tz_offset_secs"] or 0
        want_us = (
            pd.Timestamp(year=y, month=mo, day=d, hour=H, minute=M, second=S, tz="UTC")
            - pd.Timedelta(seconds=off)
        ).value // 1000 + ns // 1000
        got_us = ts.value // 1000 + int(out["ts_ns"].iloc[i]) // 1000 * 0
        got_total = ts.value // 1000 * 1000 + int(out["ts_ns"].iloc[i])
        want_total = want_us * 1000 + ns % 1000
        line = c["line"]
        gb, ge = int(out["dt_beg"].iloc[i]), int(out["dt_end"].iloc[i])
        # engine offsets are CHAR offsets; the reference counts BYTES
        gb_b, ge_b = len(line[:gb].encode()), len(line[:ge].encode())
        span_ok = (gb_b == c["dt_beg"]) and (ge_b == c["dt_end"])
        val_ok = got_total == want_total
        if val_ok and span_ok:
            n_ok += 1
        elif val_ok:
            n_span += 1
            wrong.append((i, "span", c["line"][:70], (int(out["dt_beg"].iloc[i]), int(out["dt_end"].iloc[i])), (c["dt_beg"], c["dt_end"])))
        else:
            n_val += 1
            wrong.append((i, "value", c["line"][:70], str(ts), f"{c['ymdhmsn']} off={off}"))
    print(f"total={len(cases)} exact={n_ok} span_wrong={n_span} value_wrong={n_val} miss={n_miss}")
    top = sorted(miss_by_entry.items(), key=lambda kv: -kv[1])
    print("top missing entries:", top[:40])
    for w in wrong[:30]:
        print("WRONG", w)


def main() -> None:
    src = REF.read_text()
    cases = extract(src)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(cases, indent=0))
    print(f"extracted {len(cases)} cases → {OUT}")
    if "--report" in sys.argv:
        report(cases)


if __name__ == "__main__":
    main()
