"""Delta-vs-base exact dedup (operators/dedup.delta_dedup_new_docs):
bloom and broadcast-set modes must both equal the exact set difference,
and the base side must be pruned map-side (no base shuffle)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark.operators.dedup import (
    _bloom_params,
    delta_dedup_new_docs,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDeltaDedup:
    def test_modes_equal_exact_set_difference_randomized(self, spark):
        rng = random.Random(9)
        base_texts = [f"base doc {i} {rng.randint(0, 9)}" for i in range(300)]
        # delta: half overlapping base content, half new, plus an
        # intra-delta duplicate pair (both survive: dedup is vs BASE)
        delta_rows = [(1000 + i, base_texts[rng.randrange(300)]) for i in range(40)]
        delta_rows += [(2000 + i, f"new doc {i}") for i in range(40)]
        delta_rows += [(3000, "twin payload"), (3001, "twin payload")]
        base = _mk(spark, list(enumerate(base_texts)))
        delta = _mk(spark, delta_rows)

        base_set = set(base_texts)
        want = sorted(d for d, t in delta_rows if t not in base_set)
        for mode in ("bloom", "set"):
            got = sorted(
                r["doc_id"] for r in delta_dedup_new_docs(delta, base, mode=mode).collect()
            )
            assert got == want, mode
        # a deliberately saturated bloom (every probe a false positive)
        # must still be exact — the final join is the authority
        got = sorted(
            r["doc_id"]
            for r in delta_dedup_new_docs(delta, base, mode="bloom", bloom_bits=64).collect()
        )
        assert got == want

    def test_empty_delta_and_empty_base(self, spark):
        base = _mk(spark, [(1, "a")])
        empty = _mk(spark, []).limit(0)
        assert delta_dedup_new_docs(empty, base).count() == 0
        delta = _mk(spark, [(5, "x"), (6, "y")])
        got = sorted(r["doc_id"] for r in delta_dedup_new_docs(delta, empty).collect())
        assert got == [5, 6]

    def test_bloom_params_sane(self):
        m, k = _bloom_params(1_000_000, 0.01)
        assert m % 64 == 0 and 9_000_000 < m < 11_000_000 and 6 <= k <= 8
        m, k = _bloom_params(0, 0.01)
        assert m >= 64 and k >= 1

    def test_base_pruned_before_any_exchange(self, spark):
        """The base scan must meet the bloom filter (getbit probes via a
        broadcast 1-row cross join) BEFORE any shuffle: no SortMergeJoin
        or ShuffledHashJoin anywhere, and the plan carries the getbit
        probe chain."""
        base = _mk(spark, [(i, f"t{i}") for i in range(100)])
        delta = _mk(spark, [(1000 + i, f"t{i + 50}") for i in range(100)])
        plan = (
            delta_dedup_new_docs(delta, base, mode="bloom")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "getbit" in plan
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
