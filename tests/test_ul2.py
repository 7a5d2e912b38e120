"""UL2/T5 span corruption (operators/tokens.ul2_span_corruption) vs a
sequential python reference recomputing the md5-derived spans."""

from __future__ import annotations

import hashlib
import random

from super_speedy_syslog_searcher_spark.operators.tokens import ul2_span_corruption

RATE_PPM, MU, BASE, SEED = 150_000, 3, -101, "ul2"


def _h32(doc_id, i):
    return int(hashlib.md5(f"{SEED}:{doc_id}:{i}".encode()).hexdigest()[:8], 16)


def _ref(doc_id, toks):
    n = len(toks)
    if n < MU:
        return toks, [], 0
    k = max(min(int(n * RATE_PPM / 1_000_000 / MU), n // MU), 1)
    inputs, targets = [], []
    for i in range(k):
        s0, s1 = i * n // k, (i + 1) * n // k
        start = s0 + _h32(doc_id, i) % (s1 - s0 - MU + 1)
        sent = BASE - i
        inputs += toks[s0:start] + [sent] + toks[start + MU : s1]
        targets += [sent] + toks[start : start + MU]
    targets.append(BASE - k)
    return inputs, targets, k


class TestUL2SpanCorruption:
    def test_randomized_vs_reference(self, spark):
        rng = random.Random(21)
        rows = [
            (d, [rng.randint(0, 999) for _ in range(rng.randint(0, 120))])
            for d in range(80)
        ]
        df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
        got = {
            r["doc_id"]: (list(r["inputs"]), list(r["targets"]), r["n_spans"], r["corrupted"])
            for r in ul2_span_corruption(df).collect()
        }
        for d, toks in rows:
            wi, wt, wk = _ref(d, toks)
            assert got[d] == (wi, wt, wk, wk > 0), d
            # corrupted docs: inputs+targets reconstruct the exact token
            # multiset plus k+1 sentinels... verify token conservation
            if wk:
                sentinels = {BASE - i for i in range(wk + 1)}
                recovered = [x for x in wi + wt if x not in sentinels]
                assert sorted(recovered) == sorted(toks)

    def test_token_count_invariant(self, spark):
        # corrupted docs: len(inputs) = n - k*MU + k; len(targets) = k*MU + k + 1
        rows = [(1, list(range(60)))]
        df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
        r = ul2_span_corruption(df).collect()[0]
        k = r["n_spans"]
        assert k == 3  # 60 * 0.15 / 3
        assert len(r["inputs"]) == 60 - k * MU + k
        assert len(r["targets"]) == k * MU + k + 1
