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


class TestRollingRates:
    def test_vs_reference_with_gap(self, spark):
        from super_speedy_syslog_searcher_spark.operators.summary import rolling_rates

        # source A: hours 0..3 have 2,4,6,8 messages, then SILENT until
        # hour 10 (one message): the gap must NARROW the frame (count(n)
        # counts present buckets only), never contribute zeros
        rows = []
        for h, n in ((0, 2), (1, 4), (2, 6), (3, 8), (10, 1)):
            rows += [("A", datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)) for m in range(n)]
        df = spark.createDataFrame(rows, "source string, ts timestamp")
        got = {
            r["bucket_ts"].hour: (r["n"], r["roll_sum"], r["roll_buckets"], r["roll_mean"])
            for r in rolling_rates(df, bucket="hour", window_buckets=3).collect()
        }
        # trailing 3-bucket frame = this hour and the 2 preceding hours
        assert got[0] == (2, 2, 1, 2.0)
        assert got[1] == (4, 6, 2, 3.0)
        assert got[2] == (6, 12, 3, 4.0)
        assert got[3] == (8, 18, 3, 6.0)
        # hour 10 is disconnected from the burst: frame holds only itself
        assert got[10] == (1, 1, 1, 1.0)

    def test_python_twin_random(self, spark):
        import random

        from super_speedy_syslog_searcher_spark.operators.summary import rolling_rates

        rng = random.Random(5)
        rows = [
            (f"s{rng.randrange(3)}", datetime(2024, 1, 1, tzinfo=timezone.utc)
             + __import__("datetime").timedelta(seconds=rng.randrange(0, 48 * 3600)))
            for _ in range(600)
        ]
        hist: dict = {}
        for s, ts in rows:
            b = ts.replace(minute=0, second=0, microsecond=0)
            hist[(s, b)] = hist.get((s, b), 0) + 1
        expect = {}
        for (s, b), n in hist.items():
            in_frame = [
                m for (s2, b2), m in hist.items()
                if s2 == s and 0 <= (b - b2).total_seconds() <= 5 * 3600
            ]
            expect[(s, b.hour + 24 * (b.day - 1))] = (n, sum(in_frame), len(in_frame))
        df = spark.createDataFrame(rows, "source string, ts timestamp")
        for parts in (1, 16):
            got = {
                (r["source"], r["bucket_ts"].hour + 24 * (r["bucket_ts"].day - 1)):
                    (r["n"], r["roll_sum"], r["roll_buckets"])
                for r in rolling_rates(df.repartition(parts), bucket="hour",
                                       window_buckets=6).collect()
            }
            assert got == expect
