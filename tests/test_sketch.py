"""Count-Min sketch heavy hitters (operators/sketch.py)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from super_speedy_syslog_searcher_spark.operators.sketch import (
    cms_build,
    cms_estimate_col,
    cms_heavy_hitters,
)


def _skewed(spark, n_keys=60, hot=("k0", 500), seed_rows=2000):
    base = spark.range(seed_rows).select(
        F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")).alias("key")
    )
    extra = spark.range(hot[1]).select(F.lit(hot[0]).alias("key"))
    return base.unionByName(extra)


class TestCms:
    def test_estimate_is_one_sided_and_tight_for_hot_keys(self, spark):
        df = _skewed(spark)
        exact = {r["key"]: r["n"] for r in df.groupBy("key").agg(F.count("*").alias("n")).collect()}
        sketch = cms_build(df, "key", depth=4, width=512)
        got = df.select("key").distinct().withColumn(
            "est", cms_estimate_col(sketch, F.col("key"), depth=4, width=512)
        ).collect()
        for r in got:
            assert r["est"] >= exact[r["key"]], r  # CMS never underestimates
        # total overestimate is bounded in practice at this load factor
        hot = [r for r in got if r["key"] == "k0"][0]
        assert hot["est"] <= exact["k0"] + 60

    def test_heavy_hitters_superset_of_exact_and_deterministic(self, spark):
        df = _skewed(spark)
        hh = {r["key"]: r for r in cms_heavy_hitters(df, "key", threshold=200, width=512).collect()}
        assert "k0" in hh and hh["k0"]["cms_est"] >= hh["k0"]["exact"]
        exact_heavy = {
            r["key"]
            for r in df.groupBy("key").agg(F.count("*").alias("n")).filter("n >= 200").collect()
        }
        assert exact_heavy <= set(hh)  # one-sided error → never misses a hot key
        again = {r["key"]: r["cms_est"] for r in cms_heavy_hitters(df, "key", threshold=200, width=512).collect()}
        assert again == {k: v["cms_est"] for k, v in hh.items()}
        repart = {
            r["key"]: r["cms_est"]
            for r in cms_heavy_hitters(df.repartition(7), "key", threshold=200, width=512).collect()
        }
        assert repart == again  # layout-invariant

    def test_sketches_merge_cellwise(self, spark):
        """The 100-TB property: sketch(shard A) + sketch(shard B) =
        sketch(A ∪ B) cell-for-cell — partial aggregation and cross-day
        accumulation are the same operation."""
        df = _skewed(spark)
        a = df.filter(F.crc32(F.col("key")) % 2 == 0)
        b = df.filter(F.crc32(F.col("key")) % 2 == 1)
        sa = cms_build(a, "key", depth=3, width=128)
        sb = cms_build(b, "key", depth=3, width=128)
        merged = dict(sa)
        for cell, n in sb.items():
            merged[cell] = merged.get(cell, 0) + n
        assert merged == cms_build(df, "key", depth=3, width=128)
