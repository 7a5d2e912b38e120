"""Per-source volume burst detection (operators/summary.rate_anomalies)
vs a sequential python reference."""

from __future__ import annotations

import math
from datetime import datetime, timezone

from super_speedy_syslog_searcher_spark.operators.summary import rate_anomalies


def _rows():
    # source A: steady 5/hour for 10 hours, then a 50-message burst hour
    # source B: constant 3/hour (zero variance → never flags)
    # source C: a single bucket (zero variance)
    rows = []
    for h in range(10):
        rows += [("A", datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)) for m in range(5)]
    rows += [("A", datetime(2024, 1, 1, 10, m, tzinfo=timezone.utc)) for m in range(50)]
    for h in range(6):
        rows += [("B", datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)) for m in range(3)]
    rows += [("C", datetime(2024, 1, 2, 0, 0, tzinfo=timezone.utc))]
    return rows


def _ref(rows, z_threshold=2.0):
    hist: dict = {}
    for s, ts in rows:
        hist[(s, ts.replace(minute=0, second=0, microsecond=0))] = (
            hist.get((s, ts.replace(minute=0, second=0, microsecond=0)), 0) + 1
        )
    by_src: dict = {}
    for (s, b), n in hist.items():
        by_src.setdefault(s, []).append(n)
    out = {}
    for (s, b), n in hist.items():
        ns = by_src[s]
        mean = sum(ns) / len(ns)
        var = sum(x * x for x in ns) / len(ns) - mean * mean
        sd = math.sqrt(max(var, 0.0))
        z = round((n - mean) / sd, 4) if sd > 0 else None
        burst = abs(n - mean) > z_threshold * sd if sd > 0 else False
        out[(s, b)] = (n, round(mean, 4), z, burst)
    return out


class TestRateAnomalies:
    def test_vs_reference(self, spark):
        rows = _rows()
        df = spark.createDataFrame(rows, "source string, ts timestamp")
        got = {
            (r["source"], r["bucket_ts"].replace(tzinfo=timezone.utc)): (
                r["n"],
                r["mean_n"],
                r["z"],
                r["is_burst"],
            )
            for r in rate_anomalies(df).collect()
        }
        want = _ref(rows)
        assert got == want
        # the seeded burst is the only flagged bucket
        flagged = [k for k, v in got.items() if v[3]]
        assert flagged == [("A", datetime(2024, 1, 1, 10, tzinfo=timezone.utc))]
        # zero-variance sources never flag and carry NULL z
        assert all(v[2] is None and not v[3] for k, v in got.items() if k[0] in "BC")

    def test_layout_invariant(self, spark):
        rows = _rows()
        df = spark.createDataFrame(rows, "source string, ts timestamp")
        a = sorted(map(tuple, rate_anomalies(df).collect()))
        b = sorted(map(tuple, rate_anomalies(df.repartition(13)).collect()))
        assert a == b
