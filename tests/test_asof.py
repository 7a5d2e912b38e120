"""AS-OF (temporal/SCD-2) enrichment (operators/enrich.asof_enrich) vs a
sequential python reference, plus the broadcast/map-only plan shape."""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from super_speedy_syslog_searcher_spark.operators.enrich import asof_enrich

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _ref(facts, dims):
    by_key: dict = {}
    for k, vf, val in dims:
        by_key.setdefault(k, []).append((vf, val))
    for vs in by_key.values():
        vs.sort()
    out = {}
    for i, (k, ts) in enumerate(facts):
        val = None
        for vf, v in by_key.get(k, []):
            if vf <= ts:
                val = v
        out[i] = val
    return out


class TestAsofEnrich:
    def test_randomized_vs_reference(self, spark):
        rng = random.Random(7)
        keys = [f"s{i}" for i in range(6)]
        dims = [
            (k, T0 + timedelta(hours=rng.randrange(0, 200)), f"{k}-v{j}")
            for k in keys[:5]  # s5 has NO history → NULL attrs
            for j in range(rng.randint(1, 4))
        ]
        facts = [
            (rng.choice(keys), T0 + timedelta(hours=rng.randrange(-5, 210)))
            for _ in range(300)
        ]
        fdf = spark.createDataFrame(
            [(i, k, ts) for i, (k, ts) in enumerate(facts)],
            "fid long, source string, ts timestamp",
        )
        ddf = spark.createDataFrame(dims, "source string, valid_from timestamp, val string")
        got = {r["fid"]: r["val"] for r in asof_enrich(fdf, ddf).collect()}
        assert got == _ref(facts, dims)

    def test_boundary_is_inclusive_and_ties_take_last(self, spark):
        fdf = spark.createDataFrame([(1, "a", T0)], "fid long, source string, ts timestamp")
        ddf = spark.createDataFrame(
            [("a", T0, "x"), ("a", T0, "y")], "source string, valid_from timestamp, val string"
        )
        r = asof_enrich(fdf, ddf).collect()[0]
        assert r["val"] == "y"  # valid_from == ts matches; tie → later-sorted

    def test_fact_side_never_shuffles(self, spark):
        fdf = spark.createDataFrame(
            [(i, "a", T0) for i in range(100)], "fid long, source string, ts timestamp"
        )
        ddf = spark.createDataFrame(
            [("a", T0, "x")], "source string, valid_from timestamp, val string"
        )
        plan = asof_enrich(fdf, ddf)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
