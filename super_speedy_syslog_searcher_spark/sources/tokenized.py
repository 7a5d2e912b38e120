"""Deterministic synthetic tokenized-log corpus generator (FIXTURES.md).

Produces the engine's primary input table
``(doc_id string, tokens array<int32>, n_tok int32, source string)``
(BASELINE.json input_hint) plus the ``source_enrichment`` lookup and a
GOLDEN messages table with expected parse results — the analogue of the
reference's committed corpus + expected outputs
(/root/reference/tools/compare-current-and-expected/, logs/ 1218 files).

Token codec: codepoint == token (functions/codec.py). Everything is seeded
(seed=42 convention) and scale-parametric; line timestamps are synthesized
first as datetimes, formatted per family, and the expected UTC instants are
recorded at generation time so tests never re-derive them through the code
under test.

Format families exercise the DTPD table families (FIXTURES.md §3); sources
are named ``<family>.<k>`` and the skew knob concentrates 50% of docs on
two hot sources (the salting test from FIXTURES.md §8).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from ..functions.codec import encode_text

REFERENCE_YEAR = 2023  # generator-wide seed year for no-year families

TZ_PST = timezone(timedelta(hours=-8))
TZ_P2 = timezone(timedelta(hours=2))


@dataclass
class Fam:
    name: str
    fmt: "callable"  # (ts_utc µs datetime, rng) -> list[(line, expected_ts_or_None)]
    noyear: bool = False


def _payload(rng: np.random.RandomState) -> str:
    words = ["connect", "disconnect", "retry", "timeout", "accepted", "refused", "up", "down"]
    return f"{words[rng.randint(len(words))]} id={rng.randint(100000)}"


def _f_bracketed(ts, rng):
    local = ts.astimezone(timezone.utc)
    frac = f"{local.microsecond:06d}"
    return [(f"[{local:%Y/%m/%d %H:%M:%S}.{frac}] smbd/oplock.c:1340 {_payload(rng)}", ts)]


def _f_rfc3339_tz(ts, rng):
    local = ts.astimezone(TZ_PST)
    return [(f"<{rng.randint(192)}>{local:%Y-%m-%dT%H:%M:%S.%f%z} host app[{rng.randint(9999)}]: {_payload(rng)}", ts)]


def _f_rfc3339(ts, rng):
    utc = ts.astimezone(timezone.utc)
    return [(f"{utc:%Y-%m-%d %H:%M:%S} srv daemon: {_payload(rng)}", ts.replace(microsecond=0))]


def _f_rfc3164(ts, rng):
    utc = ts.astimezone(timezone.utc)
    day = f"{utc.day:2d}"
    return [
        (
            f"<14>{utc:%b} {day} {utc:%H:%M:%S} HOST dropbear[{rng.randint(30000)}]: {_payload(rng)}",
            ts.replace(microsecond=0),
        )
    ]


def _f_multiline(ts, rng):
    utc = ts.astimezone(timezone.utc)
    frac = f"{utc.microsecond:06d}"
    head = (f"[{utc:%Y/%m/%d %H:%M:%S}.{frac}] ../source3/smbd/oplock.c:1340(init_oplocks)", ts)
    conts = [(f"   continuation line {i} {_payload(rng)}", None) for i in range(rng.randint(1, 4))]
    return [head, *conts]


def _f_apache(ts, rng):
    utc = ts.astimezone(timezone.utc)
    ip = f"192.168.{rng.randint(256)}.{rng.randint(256)}"
    return [(f'{ip} - - [{utc:%d/%b/%Y:%H:%M:%S} +0000] "GET /p{rng.randint(100)} HTTP/1.1" {rng.choice([200, 404, 500])} {rng.randint(5000)}', ts.replace(microsecond=0))]


def _f_strace(ts, rng):
    # exact integer-second + µs digits (float formatting would round)
    secs = int(ts.timestamp())
    return [(f"{secs}.{ts.microsecond:06d} read({rng.randint(10)}, ..., 1024) = {rng.randint(1024)}", ts)]


def _f_rfc2822(ts, rng):
    local = ts.astimezone(TZ_P2)
    wd = local.strftime("%a")
    return [(f"{wd}, {local.day} {local:%b %Y %H:%M:%S} +0200 {_payload(rng)}", ts.replace(microsecond=0))]


def _f_windows(ts, rng):
    utc = ts.astimezone(timezone.utc)
    return [(f"{utc:%m/%d/%y %H:%M:%S}: infinst: {_payload(rng)}", ts.replace(microsecond=0))]


def _f_synology(ts, rng):
    utc = ts.astimezone(timezone.utc)
    return [(f"info\t{utc:%Y/%m/%d %H:%M:%S}\tSYSTEM:\t{_payload(rng)}", ts.replace(microsecond=0))]


def _f_audit(ts, rng):
    utc = ts.astimezone(timezone.utc)
    ms = utc.microsecond // 1000
    expect = utc.replace(microsecond=ms * 1000)
    return [(f"type=USER_LOGIN msg=audit({int(utc.timestamp())}.{ms:03d}:{rng.randint(9999)}): pid={rng.randint(30000)}", expect)]


def _f_nodt(ts, rng):
    return [(f"plain line without any date {_payload(rng)}", None)]


FAMILIES: list[Fam] = [
    Fam("bracketed", _f_bracketed),
    Fam("rfc3339tz", _f_rfc3339_tz),
    Fam("rfc3339", _f_rfc3339),
    Fam("rfc3164", _f_rfc3164, noyear=True),
    Fam("multiline", _f_multiline),
    Fam("apache", _f_apache),
    Fam("strace", _f_strace),
    Fam("rfc2822", _f_rfc2822),
    Fam("windows", _f_windows),
    Fam("synology", _f_synology),
    Fam("audit", _f_audit),
    Fam("nodt", _f_nodt),
]
FAMILY_BY_NAME = {f.name: f for f in FAMILIES}

FACILITIES = ["auth", "daemon", "kern", "mail", "cron", "local0"]
SEVERITIES = ["debug", "info", "notice", "warning", "err", "crit"]


def gen_corpus(
    n_docs: int = 100,
    lines_per_doc: int = 20,
    n_sources: int = 8,
    seed: int = 42,
    families: list[str] | None = None,
    skew: bool = False,
    base: datetime | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Returns (docs, enrichment, golden_messages) pandas frames.

    golden_messages: (doc_id, source, msg_no, ts_expect utc, text, n_lines)
    — what sessionize(parse(explode(docs))) must produce.
    """
    rng = np.random.RandomState(seed)
    fams = [FAMILY_BY_NAME[f] for f in families] if families else FAMILIES
    base = base or datetime(REFERENCE_YEAR, 6, 1, tzinfo=timezone.utc)

    sources = []
    for i in range(n_sources):
        fam = fams[i % len(fams)]
        sources.append((f"{fam.name}.{i:03d}", fam))

    # skew: two hot sources hold 50% of docs
    probs = None
    if skew and n_sources >= 4:
        probs = np.full(n_sources, 0.5 / (n_sources - 2))
        probs[0] = probs[1] = 0.25

    doc_rows, golden_rows = [], []
    for d in range(n_docs):
        si = rng.choice(n_sources, p=probs)
        source, fam = sources[si]
        doc_id = f"{source}/{d:06d}"
        t = base + timedelta(seconds=int(rng.randint(0, 86400)), microseconds=int(rng.randint(0, 1000000)))
        lines, msg_no = [], 0
        n_msgs = max(1, lines_per_doc // (2 if fam.name == "multiline" else 1))
        for _ in range(n_msgs):
            t = t + timedelta(seconds=int(rng.randint(1, 30)), microseconds=int(rng.randint(0, 1000000)))
            emitted = fam.fmt(t, rng)
            msg_text = "\n".join(line for line, _ in emitted)
            expect = emitted[0][1]
            lines.extend(line for line, _ in emitted)
            if expect is not None:
                msg_no += 1
                golden_rows.append(
                    {
                        "doc_id": doc_id,
                        "source": source,
                        "msg_no": msg_no,
                        "ts_expect": expect.astimezone(timezone.utc),
                        "text": msg_text,
                        "n_lines": len(emitted),
                    }
                )
        text = "\n".join(lines)
        tokens = encode_text(text)
        doc_rows.append({"doc_id": doc_id, "tokens": tokens, "n_tok": len(tokens), "source": source})

    docs = pd.DataFrame(doc_rows)
    enrich_rows = []
    for i, (source, fam) in enumerate(sources):
        fac = FACILITIES[i % len(FACILITIES)]
        sev = SEVERITIES[i % len(SEVERITIES)]
        from ..operators.enrich import SEVERITY_CLASS

        enrich_rows.append(
            {"source": source, "facility": fac, "severity": sev, "sink_key": f"{fac}.{SEVERITY_CLASS[sev]}"}
        )
    enrichment = pd.DataFrame(enrich_rows)
    golden = pd.DataFrame(golden_rows)
    return docs, enrichment, golden


def gen_year_rollover_doc(seed: int = 7) -> tuple[pd.DataFrame, pd.DataFrame]:
    """One rfc3164 doc spanning Dec 31 → Jan 1 (FIXTURES.md year_rollover):
    with reference_year = REFERENCE_YEAR the Dec lines must resolve to
    REFERENCE_YEAR−1 (reference rule syslogprocessor.rs:659-677)."""
    rng = np.random.RandomState(seed)
    rows = []
    times = [
        datetime(REFERENCE_YEAR - 1, 12, 31, 23, 50, 1, tzinfo=timezone.utc),
        datetime(REFERENCE_YEAR - 1, 12, 31, 23, 59, 59, tzinfo=timezone.utc),
        datetime(REFERENCE_YEAR, 1, 1, 0, 0, 30, tzinfo=timezone.utc),
        datetime(REFERENCE_YEAR, 1, 1, 0, 10, 0, tzinfo=timezone.utc),
    ]
    lines, golden = [], []
    for i, t in enumerate(times):
        day = f"{t.day:2d}"
        line = f"<6>{t:%b} {day} {t:%H:%M:%S} host kernel: {_payload(rng)}"
        lines.append(line)
        golden.append({"doc_id": "rollover.000/000000", "msg_no": i + 1, "ts_expect": t, "text": line})
    text = "\n".join(lines)
    docs = pd.DataFrame(
        [{"doc_id": "rollover.000/000000", "tokens": encode_text(text), "n_tok": len(text), "source": "rollover.000"}]
    )
    return docs, pd.DataFrame(golden)
