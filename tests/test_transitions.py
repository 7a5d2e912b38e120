"""Event-type transition matrix (operators/sessionize.event_transitions)
vs a sequential python reference."""

from __future__ import annotations

import random
from collections import Counter
from datetime import datetime, timedelta, timezone

from super_speedy_syslog_searcher_spark.operators.sessionize import event_transitions


def _mk_rows(rng):
    types = ["login", "click", "buy", "error", "logout"]
    rows = []
    eid = 0
    for u in range(25):
        t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
        for i in range(rng.randint(1, 30)):
            rows.append((u, eid, t0 + timedelta(seconds=i * 7), rng.choice(types)))
            eid += 1
    # same-ts tie within one user: order must fall back to event_id
    rows.append((99, 10_000, datetime(2024, 2, 1, tzinfo=timezone.utc), "a"))
    rows.append((99, 10_001, datetime(2024, 2, 1, tzinfo=timezone.utc), "b"))
    return rows


def _ref(rows):
    by_user: dict = {}
    for u, eid, ts, ty in rows:
        by_user.setdefault(u, []).append((ts, eid, ty))
    cnt: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        prev = "<START>"
        for _, _, ty in seq:
            cnt[(prev, ty)] += 1
            prev = ty
    tot: Counter = Counter()
    for (p, _), n in cnt.items():
        tot[p] += n
    return {k: (n, round(n / tot[k[0]], 4)) for k, n in cnt.items()}


class TestEventTransitions:
    def test_vs_reference(self, spark):
        rows = _mk_rows(random.Random(3))
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )
        got = {
            (r["prev_type"], r["next_type"]): (r["n"], r["share"])
            for r in event_transitions(df).collect()
        }
        assert got == _ref(rows)
        # user 99's same-ts pair broke the tie on event_id: a precedes b,
        # and "a" transitions to "b" with certainty
        assert got[("a", "b")] == (1, 1.0)

    def test_share_rows_sum_to_one(self, spark):
        rows = _mk_rows(random.Random(11))
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )
        from collections import defaultdict

        by_prev = defaultdict(float)
        for r in event_transitions(df).collect():
            by_prev[r["prev_type"]] += r["share"]
        assert all(abs(v - 1.0) < 0.01 for v in by_prev.values())
