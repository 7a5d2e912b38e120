"""Scaling-efficiency evidence (north_rule: throughput efficiency ≥ 0.8
from N to 4N executors, sandboxed as local[8] vs local[32] on identical
input).

Materializes a deterministic tokenized corpus (events table replicated
--factor times with distinct doc ids — same parse work per replica), then
runs the full parse→sessionize→enrich→route→aggregate job in a fresh
subprocess per parallelism level and reports wall time, sequences/sec and
efficiency  eff(N→4N) = (T_N / T_4N) / 4.

Usage: python tools/bench_scaling.py [--factor 10] [--runs 2] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.environ.get("S4SPARK_BENCH_DIR", "/tmp/s4spark_bench")

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from super_speedy_syslog_searcher_spark import entry_queries as EQ
from super_speedy_syslog_searcher_spark.operators.enrich import enrich
from super_speedy_syslog_searcher_spark.operators.route import route_write, sink_counts_from_path
from super_speedy_syslog_searcher_spark.functions.parse import parse_messages_fused
from super_speedy_syslog_searcher_spark.session import get_spark, warm_python_workers

corpus, cores, runs, out_dir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
spark = get_spark(app_name=f"s4spark-scale-{cores}", cores=cores,
                  extra_conf={"spark.local.dir": "/dev/shm/s4spark_local"})
# size tasks to the parallelism level: 4 waves of tasks per core, which
# also bounds the fan-out write to tasks × sinks files (the 256-file
# corpus layout would otherwise fix 256 tasks at EVERY level, leaving
# 16-core runs commit-bound instead of compute-bound)
docs = spark.read.parquet(corpus).coalesce(4 * cores)
n = docs.count()
warm_python_workers(spark)
# one UNTIMED warm-up pass: the first full-pipeline run pays JVM JIT +
# codegen compilation of the whole write path (measured ~2x steady
# state); we report steady-state throughput, the same methodology as
# the reference's hyperfine --warmup benchmarks (README.md:754-787)
best = None
for r in range(runs + 1):
    t0 = time.time()
    msgs = parse_messages_fused(docs, reference_year=EQ.REFERENCE_YEAR)
    enriched = enrich(msgs, EQ.enrichment_df(spark))
    # bounded-file fan-out (see bench.py q_e2e): caps commit work at
    # ~2 files/core instead of 4 tasks/core × sinks
    route_write(enriched, out_dir, file_tasks=2 * cores)
    sink_counts_from_path(spark, out_dir).collect()
    dt = time.time() - t0
    if r == 0:
        continue  # warm-up
    best = dt if best is None else min(best, dt)
# UNTIMED: order-insensitive checksum of the COMMITTED routed output —
# every column of every row (incl. the token payload) hashed and summed,
# so the harness can assert both parallelism levels produced identical
# routed rows + per-sink counts (north_rule: output equality at N and 4N)
routed = spark.read.parquet(out_dir)
row_hash = F.xxhash64(*[F.col(c).cast("string") for c in sorted(routed.columns)])
chk = routed.agg(
    F.count("*").alias("rows"),
    F.sum(row_hash.cast("decimal(38,0)")).alias("content"),
).collect()[0]
checksum = f"{chk['rows']}:{chk['content']}"
print("RESULT " + json.dumps({"cores": cores, "wall_s": round(best, 2), "n_seq": n,
                              "seq_per_sec": round(n / best, 1),
                              "checksum": checksum}))
"""


_GEN = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from super_speedy_syslog_searcher_spark import entry_queries as EQ
from super_speedy_syslog_searcher_spark.session import get_spark

sf_dir, factor, path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark(app_name="s4spark-scale-gen")
docs = EQ.rendered_docs(spark, sf_dir)
reps = spark.range(factor).select(F.col("id").alias("rep"))
big = docs.crossJoin(reps).select(
    F.concat(F.col("rep").cast("string"), F.lit("/"), F.col("doc_id")).alias("doc_id"),
    "tokens", "n_tok", "source",
)
big.repartition(256).write.mode("overwrite").parquet(path)
"""


def materialize(factor: int, sf_dir: str) -> str:
    # runs in a SUBPROCESS so the generator JVM is provably gone before
    # any timed leg starts (a stopped-but-lingering py4j JVM was measured
    # burning a full core for the whole run, polluting the 4-core legs)
    tag = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(WORK, f"scale_corpus_{tag}_x{factor}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        subprocess.run(
            [sys.executable, "-c", _GEN % {"repo": REPO}, sf_dir, str(factor), path],
            check=True, timeout=3000,
        )
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cores", default="4,16")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--pin", action="store_true",
                    help="taskset each leg to exactly N CPUs (cluster-container semantics)")
    args = ap.parse_args()

    # hold the host lock for the WHOLE run (generator + every leg):
    # pytest sessions take the same flock, so a scaling run can no
    # longer fire while the suite drains (the r4 self-polluted third
    # attempt — VERDICT r4 #10). Blocks until the host frees up.
    from super_speedy_syslog_searcher_spark.hostlock import HostLock

    with HostLock("bench_scaling"):
        _run_locked(args)


def _run_locked(args) -> None:
    corpus = materialize(args.factor, args.sf)
    levels = [int(c) for c in args.cores.split(",")]

    def run_level(cores: int) -> dict:
        # routed sink on tmpfs: on a real cluster the fan-out write scales
        # with executors (distributed FS); the sandbox's single disk would
        # serialize it and mask compute scaling. The write path (dynamic
        # partitionBy parquet) is identical.
        out_dir = os.path.join("/dev/shm/s4spark_scale", f"out_{cores}")
        env = dict(os.environ, OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1", MKL_NUM_THREADS="1")
        cmd = [sys.executable, "-c", WORKER % {"repo": REPO}, corpus, str(cores), "1", out_dir]
        if args.pin:
            # pin the whole process tree (JVM + Python workers) to exactly
            # N CPUs: local[N] only bounds TASK slots — GC, netty IO and
            # parquet-flush threads otherwise bleed past N cores, which
            # flatters the low-parallelism leg and understates efficiency.
            # With the pin, "N cores" means what it means on a cluster
            # where the container cpuset is the executor's core budget.
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3000, env=env)
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(proc.stdout[-3000:], file=sys.stderr)
            print(proc.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"worker cores={cores} failed")
        return json.loads(line[-1][7:])

    # interleave the parallelism levels across repetitions so sporadic
    # host throttling windows cannot bias one level; keep min per level
    best: dict[int, dict] = {}
    for rep in range(args.runs):
        for cores in levels:
            r = run_level(cores)
            print(f"rep{rep}", r)
            if cores not in best or r["wall_s"] < best[cores]["wall_s"]:
                best[cores] = r
    results = [best[c] for c in levels]

    lo, hi = results[0], results[-1]
    ratio = hi["cores"] / lo["cores"]
    eff = (lo["wall_s"] / hi["wall_s"]) / ratio
    checksums = {r["cores"]: r.get("checksum") for r in results}
    outputs_equal = len(set(checksums.values())) == 1
    summary = {
        "corpus": corpus, "factor": args.factor, "runs_per_level": args.runs,
        "levels": results, "efficiency": round(eff, 3),
        "criterion": f"eff(N→{int(ratio)}N) ≥ 0.8",
        "passed": eff >= 0.8,
        # north_rule: routed-row + per-sink-count equality across levels
        # (order-insensitive full-row checksum of the committed output)
        "outputs_equal_across_levels": outputs_equal,
    }
    if not outputs_equal:
        print(f"OUTPUT MISMATCH across levels: {checksums}", file=sys.stderr)
    print(json.dumps(summary))
    if args.out:
        lines = [
            "## Scaling efficiency (two parallelism levels, identical input)",
            "",
            f"Corpus: `{corpus}` — {lo['n_seq']:,} sequences "
            f"(events×{args.factor} replicas), best of {args.runs} runs per level.",
            "",
            "| cores | wall (s) | sequences/s |",
            "|---|---|---|",
        ]
        for r in results:
            lines.append(f"| local[{r['cores']}] | {r['wall_s']} | {r['seq_per_sec']:,} |")
        lines += [
            "",
            f"**Efficiency {lo['cores']}→{hi['cores']} cores: {eff:.3f}** "
            f"(criterion ≥ 0.8 → {'PASS' if eff >= 0.8 else 'FAIL'}; "
            "eff = speedup / core-ratio).",
            "",
            f"Routed output identical across levels (full-row checksum): "
            f"{'YES' if outputs_equal else 'NO — ' + str(checksums)}.",
            "",
        ]
        with open(args.out, "a") as f:
            f.write("\n" + "\n".join(lines))


if __name__ == "__main__":
    main()
