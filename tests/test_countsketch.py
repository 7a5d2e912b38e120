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


class TestCountSketchJoinSize:
    def _twin_join(self, a_keys, b_keys, depth=5, width=256, seed="cs"):
        ca, cb = Counter(a_keys), Counter(b_keys)
        ests = []
        for r in range(depth):
            sa, sb = Counter(), Counter()
            for k, c in ca.items():
                sa[_h(seed, "c", r, k, width)] += (_h(seed, "s", r, k, 2) * 2 - 1) * c
            for k, c in cb.items():
                sb[_h(seed, "c", r, k, width)] += (_h(seed, "s", r, k, 2) * 2 - 1) * c
            ests.append(sum(sa[c] * sb.get(c, 0) for c in sa))
        ests.sort()
        d = len(ests)
        med = ests[d // 2] if d % 2 else (ests[d // 2 - 1] + ests[d // 2]) / 2
        return float(med), min(ests), max(ests)

    def test_matches_python_twin_exactly(self, spark):
        from super_speedy_syslog_searcher_spark.operators.sketch import countsketch_join_size

        rng = random.Random(19)
        a = [(f"k{rng.randrange(40)}",) for _ in range(1500)]
        b = [(f"k{rng.randrange(60)}",) for _ in range(900)]
        la = spark.createDataFrame(a, "key string")
        lb = spark.createDataFrame(b, "key string")
        got = countsketch_join_size(la, lb, "key").collect()[0]
        med, lo, hi = self._twin_join([k for k, in a], [k for k, in b])
        assert (got["join_size_est"], got["join_size_min"], got["join_size_max"]) == (med, lo, hi)

    def test_estimate_tracks_true_join_size(self, spark):
        from super_speedy_syslog_searcher_spark.operators.sketch import countsketch_join_size

        rng = random.Random(23)
        a = [(f"k{min(int(rng.paretovariate(1.2)), 50)}",) for _ in range(4000)]
        b = [(f"k{min(int(rng.paretovariate(1.2)), 50)}",) for _ in range(3000)]
        ca, cb = Counter(k for k, in a), Counter(k for k, in b)
        true = sum(c * cb.get(k, 0) for k, c in ca.items())
        la = spark.createDataFrame(a, "key string")
        lb = spark.createDataFrame(b, "key string")
        got = countsketch_join_size(la, lb, "key", width=1024).collect()[0]
        assert abs(got["join_size_est"] - true) / true < 0.2, (got["join_size_est"], true)

    def test_disjoint_keys_estimate_near_zero(self, spark):
        from super_speedy_syslog_searcher_spark.operators.sketch import countsketch_join_size

        la = spark.createDataFrame([(f"a{i}",) for i in range(50)], "key string")
        lb = spark.createDataFrame([(f"b{i}",) for i in range(50)], "key string")
        got = countsketch_join_size(la, lb, "key", width=1024).collect()[0]
        assert abs(got["join_size_est"]) <= 5  # collision noise only
