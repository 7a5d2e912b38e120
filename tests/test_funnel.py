"""Funnel conversion + cohort retention (operators/funnel.py).

Exactness is pinned against a brute-force sequential python twin over a
seeded random event stream, plus hand cases for the strictly-after rule,
tie-breaking, and partition invariance.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from super_speedy_syslog_searcher_spark.operators.funnel import (
    cohort_retention,
    funnel_conversion,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(eid, T0 + dt.timedelta(seconds=s), u, t) for eid, s, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def _py_funnel(rows, steps):
    """Brute-force twin: per user, earliest step-k event strictly after
    the picked step-(k-1) event, order = (ts, event_id)."""
    users = {}
    for eid, s, u, t in rows:
        users.setdefault(u, []).append((s, eid, t))
    counts = [0] * len(steps)
    for evs in users.values():
        evs.sort()
        pick = None
        for i, step in enumerate(steps):
            nxt = None
            for s, eid, t in evs:
                if t == step and (pick is None or (s, eid) > pick):
                    nxt = (s, eid)
                    break
            if nxt is None:
                break
            pick = nxt
            counts[i] += 1
    return counts


STEPS = ["view", "click", "purchase"]


def test_funnel_strictly_after(spark):
    rows = [
        # u1 completes the full funnel in order
        (1, 10, 1, "view"), (2, 20, 1, "click"), (3, 30, 1, "purchase"),
        # u2's click precedes its first view → stops at view
        (4, 20, 2, "click"), (5, 30, 2, "view"), (6, 5, 2, "purchase"),
        # u3 never views → enters nothing
        (7, 10, 3, "click"), (8, 20, 3, "purchase"),
    ]
    out = {r["step"]: r for r in funnel_conversion(_ev(spark, rows), STEPS).collect()}
    assert [out[s]["users"] for s in STEPS] == [2, 1, 1]
    assert out["view"]["share"] == round(2 / 3, 4)  # 3 distinct users
    assert out["click"]["share"] == 0.5
    assert out["purchase"]["share"] == 1.0


def test_funnel_tie_breaks_on_event_id(spark):
    # view and click share a timestamp: click counts only if its
    # (ts, event_id) is strictly greater — eid 2 > eid 1 counts,
    # the reversed ids do not
    yes = [(1, 10, 1, "view"), (2, 10, 1, "click")]
    no = [(2, 10, 1, "view"), (1, 10, 1, "click")]
    for rows, expect in ((yes, 1), (no, 0)):
        out = {r["step"]: r["users"] for r in funnel_conversion(_ev(spark, rows), STEPS).collect()}
        assert out["click"] == expect, rows


def test_funnel_matches_python_twin_random(spark):
    rng = random.Random(7)
    types = STEPS + ["error", "signup"]
    rows = [
        (eid, rng.randrange(0, 5000), rng.randrange(0, 40), rng.choice(types))
        for eid in range(1500)
    ]
    expect = _py_funnel(rows, STEPS)
    df = _ev(spark, rows)
    for parts in (1, 16):
        out = {
            r["idx"]: r["users"]
            for r in funnel_conversion(df.repartition(parts), STEPS).collect()
        }
        assert [out[i + 1] for i in range(3)] == expect


def test_funnel_zero_prev_share_is_null(spark):
    rows = [(1, 10, 1, "view")]
    out = {r["step"]: r for r in funnel_conversion(_ev(spark, rows), STEPS).collect()}
    assert out["click"]["users"] == 0
    # click had 0 users → purchase's from-prev share is NULL, not 0/0
    assert out["purchase"]["share"] is None
    assert out["click"]["share"] == 0.0


def test_funnel_rejects_empty_steps(spark):
    with pytest.raises(ValueError):
        funnel_conversion(_ev(spark, [(1, 1, 1, "view")]), [])


def _py_retention(rows):
    first, days = {}, {}
    for _eid, s, u, _t in rows:
        d = (T0 + dt.timedelta(seconds=s)).date()
        days.setdefault(u, set()).add(d)
        first[u] = min(first.get(u, d), d)
    out = {}
    for u, ds in days.items():
        for d in ds:
            key = (first[u], (d - first[u]).days)
            out[key] = out.get(key, 0) + 1
    return out


def test_retention_matches_python_twin(spark):
    rng = random.Random(11)
    rows = [
        (eid, rng.randrange(0, 12 * 86400), rng.randrange(0, 25), "view")
        for eid in range(800)
    ]
    expect = _py_retention(rows)
    got = {}
    for r in cohort_retention(_ev(spark, rows)).collect():
        got[(dt.date.fromisoformat(r["cohort_day"]), r["offset_days"])] = r["active_users"]
        # share is exact active/size
        size = expect[(dt.date.fromisoformat(r["cohort_day"]), 0)]
        assert r["share"] == round(r["active_users"] / size, 4)
    assert got == expect


def test_retention_offset_zero_is_cohort_size(spark):
    rows = [(1, 0, 1, "view"), (2, 86400, 1, "view"), (3, 10, 2, "view")]
    out = cohort_retention(_ev(spark, rows)).collect()
    zero = {r["cohort_day"]: r for r in out if r["offset_days"] == 0}
    assert zero["2024-01-01"]["active_users"] == 2
    assert all(r["share"] == 1.0 for r in zero.values())
    one = [r for r in out if r["offset_days"] == 1]
    assert len(one) == 1 and one[0]["active_users"] == 1 and one[0]["share"] == 0.5


def _py_funnel_windowed(rows, steps, h):
    """Windowed twin: entity reaches step k iff SOME step-1 entry's
    greedy inner chain (all steps within h seconds of the entry)
    reaches k."""
    users = {}
    for eid, s, u, t in rows:
        users.setdefault(u, []).append((s, eid, t))
    counts = [0] * len(steps)
    for evs in users.values():
        evs.sort()
        entries = [(s, eid) for s, eid, t in evs if t == steps[0]]
        best = 1 if entries else 0
        for entry in entries:
            pick, depth = entry, 1
            for step in steps[1:]:
                nxt = None
                for s, eid, t in evs:
                    if t == step and (s, eid) > pick and s <= entry[0] + h:
                        nxt = (s, eid)
                        break
                if nxt is None:
                    break
                pick = nxt
                depth += 1
            best = max(best, depth)
        for i in range(best):
            counts[i] += 1
    return counts


def test_funnel_windowed_later_entry_can_convert(spark):
    # entry A@0's 3 s window misses B@7; entry A@5's window catches it —
    # exists-over-entries must convert where a greedy-earliest-entry
    # window walk would not
    rows = [(1, 0, 1, "view"), (2, 5, 1, "view"), (3, 7, 1, "click")]
    out = {r["step"]: r["users"] for r in
           funnel_conversion(_ev(spark, rows), ["view", "click"], horizon_s=3).collect()}
    assert out == {"view": 1, "click": 1}
    # and with every window too small, the chain must NOT complete
    out2 = {r["step"]: r["users"] for r in
            funnel_conversion(_ev(spark, rows), ["view", "click"], horizon_s=1).collect()}
    assert out2 == {"view": 1, "click": 0}


def test_funnel_windowed_boundary_is_inclusive(spark):
    rows = [(1, 0, 1, "view"), (2, 3, 1, "click")]
    out = {r["step"]: r["users"] for r in
           funnel_conversion(_ev(spark, rows), ["view", "click"], horizon_s=3).collect()}
    assert out["click"] == 1


def test_funnel_windowed_matches_python_twin_random(spark):
    rng = random.Random(13)
    types = STEPS + ["error"]
    rows = [
        (eid, rng.randrange(0, 2000), rng.randrange(0, 30), rng.choice(types))
        for eid in range(1000)
    ]
    h = 120
    expect = _py_funnel_windowed(rows, STEPS, h)
    df = _ev(spark, rows)
    for parts in (1, 16):
        out = {
            r["idx"]: r["users"]
            for r in funnel_conversion(df.repartition(parts), STEPS,
                                       horizon_s=h).collect()
        }
        assert [out[i + 1] for i in range(3)] == expect
