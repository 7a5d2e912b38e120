"""Point-in-interval enrichment (operators/enrich.interval_enrich):
broadcast and bucketed strategies against a python twin and each other."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from super_speedy_syslog_searcher_spark.operators.enrich import interval_enrich

T0 = dt.datetime(2024, 1, 1)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


def _facts(spark, rows):
    return spark.createDataFrame(
        [(d, m, s, _t(sec)) for d, m, s, sec in rows],
        "doc_id string, msg_no int, source string, ts timestamp",
    )


def _iv(spark, rows):
    return spark.createDataFrame(
        [(s, _t(a), _t(b), lbl) for s, a, b, lbl in rows],
        "source string, valid_from timestamp, valid_to timestamp, label string",
    )


def _py_pick(facts, ivs):
    out = {}
    for d, m, s, sec in facts:
        best = None
        for s2, a, b, lbl in ivs:
            if s2 == s and a <= sec <= b:
                k = (a, b, lbl)
                best = k if best is None or k > best else best
        out[(d, m)] = best[2] if best else None
    return out


def test_containment_overlap_and_miss(spark):
    ivs = [
        ("A", 100, 200, "w1"),
        ("A", 150, 300, "w2"),  # overlaps w1: later start wins inside [150,200]
        ("B", 0, 50, "w3"),
    ]
    facts = [
        ("d1", 1, "A", 120),  # only w1
        ("d1", 2, "A", 160),  # overlap -> w2 (greater start)
        ("d1", 3, "A", 250),  # only w2
        ("d1", 4, "A", 301),  # outside everything
        ("d2", 1, "B", 50),   # inclusive end
        ("d2", 2, "C", 10),   # key with no windows at all
    ]
    expect = {
        ("d1", 1): "w1", ("d1", 2): "w2", ("d1", 3): "w2",
        ("d1", 4): None, ("d2", 1): "w3", ("d2", 2): None,
    }
    for how in ("broadcast", "bucketed"):
        got = {
            (r["doc_id"], r["msg_no"]): r["label"]
            for r in interval_enrich(
                _facts(spark, facts), _iv(spark, ivs), how=how, bucket_s=60
            ).collect()
        }
        assert got == expect, how


def test_strategies_agree_with_python_twin_random(spark):
    rng = random.Random(21)
    srcs = [f"s{i}" for i in range(5)]
    ivs = []
    for i in range(40):
        a = rng.randrange(0, 5000)
        ivs.append((rng.choice(srcs), a, a + rng.randrange(10, 800), f"w{i}"))
    facts = [
        (f"d{i}", 0, rng.choice(srcs), rng.randrange(0, 6000)) for i in range(400)
    ]
    expect = _py_pick(facts, ivs)
    fdf, idf = _facts(spark, facts), _iv(spark, ivs)
    for how, parts in (("broadcast", 1), ("broadcast", 16), ("bucketed", 16)):
        got = {
            (r["doc_id"], r["msg_no"]): r["label"]
            for r in interval_enrich(
                fdf.repartition(parts), idf, how=how, bucket_s=300
            ).collect()
        }
        assert got == expect, how


def test_window_bounds_columns(spark):
    ivs = [("A", 100, 200, "w1")]
    out = interval_enrich(_facts(spark, [("d", 1, "A", 150)]), _iv(spark, ivs)).head()
    assert out["window_start"] == _t(100) and out["window_end"] == _t(200)
    miss = interval_enrich(_facts(spark, [("d", 1, "A", 50)]), _iv(spark, ivs)).head()
    assert miss["window_start"] is None and miss["label"] is None


def test_rejects_unknown_strategy(spark):
    with pytest.raises(ValueError):
        interval_enrich(
            _facts(spark, [("d", 1, "A", 1)]), _iv(spark, [("A", 0, 2, "w")]),
            how="theta",
        ).collect()
