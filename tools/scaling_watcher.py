#!/usr/bin/env python3
"""Probe-gated launcher for the pinned scaling run (round-5 policy).

The host shows sporadic multi-10x throttle windows lasting minutes to
hours (BENCH.md "Host-contention caveat"); an efficiency number read in
one is host arithmetic, not engine scaling.  This watcher polls the
pure-python CPU probe and fires ``bench_scaling.py --pin`` only after
TWO consecutive probes (60 s apart) read >= --gate effective cores at
16-way.  The corpus is pre-materialized by the caller so the clean
window is spent on timed legs only.  After --max-wait seconds it fires
anyway and tags the output file so the record is honest about the
window it ran in.

The scaling run itself takes the host flock (hostlock.py), so it still
cannot overlap pytest or bench.py (the r4 self-pollution lesson).
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def probe() -> float:
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "cpu_probe.py")],
        capture_output=True, text=True, timeout=120,
    ).stdout.strip().splitlines()
    return float(json.loads(out[-1])["effective_cores"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=14.0)
    ap.add_argument("--poll", type=float, default=60.0)
    ap.add_argument("--max-wait", type=float, default=7200.0)
    ap.add_argument("--factor", type=int, default=240)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=str(REPO / "tools" / "scaling_r5_final.json"))
    args = ap.parse_args()

    t0 = time.time()
    prev = None
    gated = False
    while time.time() - t0 < args.max_wait:
        ec = probe()
        print(f"[watcher] t+{time.time()-t0:6.0f}s probe={ec:.1f}", flush=True)
        if prev is not None and prev >= args.gate and ec >= args.gate:
            gated = True
            break
        prev = ec
        time.sleep(args.poll)

    entry_ec = probe()
    print(f"[watcher] firing (gated={gated}, entry probe={entry_ec:.1f})", flush=True)
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_scaling.py"),
         "--factor", str(args.factor), "--runs", str(args.runs), "--pin"],
        capture_output=True, text=True, timeout=5400,
    )
    exit_ec = probe()
    print(r.stdout, flush=True)
    print(f"[watcher] done rc={r.returncode}, exit probe={exit_ec:.1f}", flush=True)
    # bench_scaling prints the summary as its last JSON stdout line;
    # annotate it with the bracketing probes so the window is
    # adjudicable after the fact, and pin the SHA it ran on
    summary = None
    for ln in reversed(r.stdout.splitlines()):
        if ln.startswith("{"):
            summary = json.loads(ln)
            break
    if summary is not None:
        summary["probe_gated"] = gated
        summary["probe_entry_effective_cores"] = entry_ec
        summary["probe_exit_effective_cores"] = exit_ec
        sha = subprocess.run(["git", "-C", str(REPO), "rev-parse", "HEAD"],
                             capture_output=True, text=True).stdout.strip()
        summary["git_sha"] = sha
        Path(args.out).write_text(json.dumps(summary, indent=1))
    else:
        print(r.stderr[-3000:], flush=True)


if __name__ == "__main__":
    main()
