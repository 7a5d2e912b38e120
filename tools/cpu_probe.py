"""Pure-python effective-cores probe (the BENCH.md gating instrument).

Measures fixed CPU-bound work single-core, then the same work in N
concurrent processes; effective cores at N-way = N * t1 / tN. The host
shows sporadic multi-10x throttling windows — efficiency numbers are
only recorded when this probe reads ~>=14.3 effective cores at 16-way
immediately before AND after the timed run (output-equality checks are
valid in any window).

Usage: python tools/cpu_probe.py [N]   (default 16; prints one JSON line)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _work(_=None) -> int:
    s = 0
    for i in range(4_000_000):
        s += i * i % 1_000_003
    return s


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    _work()  # warm the interpreter
    t0 = time.time()
    _work()
    t1 = time.time() - t0
    with mp.Pool(n) as p:
        t0 = time.time()
        p.map(_work, range(n))
        tn = time.time() - t0
    print(json.dumps({"n": n, "t1_s": round(t1, 3), "tn_s": round(tn, 3),
                      "effective_cores": round(n * t1 / tn, 1)}))


if __name__ == "__main__":
    main()
