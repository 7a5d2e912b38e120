"""Count-Sketch / AMS F2 estimator (sketch.countsketch_f2): python-twin
cell exactness, layout-independent bit reproducibility, estimate
quality against the true self-join size, linearity/mergeability, and
the degenerate single-key case."""

from __future__ import annotations

import hashlib
import random
from collections import Counter

import pytest

from super_speedy_syslog_searcher_spark.operators.sketch import countsketch_f2


def _h(seed: str, tag: str, r: int, k: str, mod: int) -> int:
    return int(hashlib.md5(f"{seed}:{tag}:{r}:{k}".encode()).hexdigest()[:8], 16) % mod


def _twin(rows, depth=5, width=256, seed="cs"):
    """Exact python replay of the sketch for one group."""
    counts = Counter(rows)
    ests = []
    for r in range(depth):
        cells = Counter()
        for k, c in counts.items():
            sgn = _h(seed, "s", r, k, 2) * 2 - 1
            cells[_h(seed, "c", r, k, width)] += sgn * c
        ests.append(sum(v * v for v in cells.values()))
    ests.sort()
    d = len(ests)
    med = ests[d // 2] if d % 2 else (ests[d // 2 - 1] + ests[d // 2]) / 2
    return float(med), min(ests), max(ests)


class TestCountSketchF2:
    def test_matches_python_twin_exactly(self, spark):
        rng = random.Random(5)
        rows = [("a", f"k{rng.randrange(50)}") for _ in range(2000)]
        df = spark.createDataFrame(rows, "source string, key string")
        got = countsketch_f2(df, "key").collect()[0]
        med, lo, hi = _twin([k for _, k in rows])
        assert (got["f2_est"], got["f2_min"], got["f2_max"]) == (med, lo, hi)

    def test_layout_independent_bit_reproducible(self, spark):
        rng = random.Random(7)
        rows = [("a", f"k{rng.randrange(80)}") for _ in range(3000)]
        df = spark.createDataFrame(rows, "source string, key string")
        a = countsketch_f2(df.coalesce(1), "key").collect()[0]
        b = countsketch_f2(df.repartition(17), "key").collect()[0]
        assert a == b

    def test_estimate_tracks_true_self_join_size(self, spark):
        """With width >> distinct keys the estimate is near-exact; the
        true F2 always sits inside reasonable relative error."""
        rng = random.Random(11)
        rows = [("a", f"k{min(int(rng.paretovariate(1.1)), 60)}") for _ in range(5000)]
        true = sum(c * c for c in Counter(k for _, k in rows).values())
        df = spark.createDataFrame(rows, "source string, key string")
        got = countsketch_f2(df, "key", depth=5, width=1024).collect()[0]
        assert abs(got["f2_est"] - true) / true < 0.15, (got["f2_est"], true)

    def test_single_hot_key_exact(self, spark):
        """One key: every sketch row holds +-n in one cell → every row
        estimate is exactly n²."""
        df = spark.createDataFrame([("a", "x")] * 100, "source string, key string")
        got = countsketch_f2(df, "key").collect()[0]
        assert got["f2_min"] == got["f2_max"] == 10000
        assert got["f2_est"] == 10000.0

    def test_mergeability_linearity(self, spark):
        """Sketch(A ∪ B) estimates == sketch built from the unioned
        rows — linearity means shard sketches sum cell-wise; here we
        pin the equivalent bag-level identity."""
        rng = random.Random(13)
        a = [("g", f"k{rng.randrange(30)}") for _ in range(1000)]
        b = [("g", f"k{rng.randrange(30)}") for _ in range(700)]
        df_u = spark.createDataFrame(a + b, "source string, key string")
        got = countsketch_f2(df_u, "key").collect()[0]
        med, lo, hi = _twin([k for _, k in a + b])
        assert (got["f2_est"], got["f2_min"], got["f2_max"]) == (med, lo, hi)

    def test_per_group_isolation(self, spark):
        rows = [("g1", "x")] * 10 + [("g2", "y")] * 20
        df = spark.createDataFrame(rows, "source string, key string")
        got = {r["source"]: r["f2_est"] for r in countsketch_f2(df, "key").collect()}
        assert got == {"g1": 100.0, "g2": 400.0}
