"""BM25 keyword retrieval (operators/textstats.bm25_topk) vs a
sequential python reference, plus degenerate inputs and plan shape."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark.operators.textstats import bm25_topk

K1, B = 1.2, 0.75


def _bm25_ref(docs: dict, queries: dict, k: int = 5):
    toks = {d: [w for w in t.split(" ") if w] for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid, q in queries.items():
        qts = sorted({w for w in q.split(" ") if w})
        scores = {}
        for d, ws in toks.items():
            s, hit = 0.0, 0
            for t in qts:
                tf = ws.count(t)
                if tf == 0:
                    continue
                df = sum(1 for other in toks.values() if t in other)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * len(ws) / avgdl))
                hit += 1
            if hit:
                scores[d] = (s, hit)
        ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1][0], 4), kv[0]))[:k]
        out[qid] = [(i + 1, d, sh[1], round(sh[0], 4)) for i, (d, sh) in enumerate(ranked)]
    return out


def _spark_docs(spark, docs: dict):
    return spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id bigint, text string"
    )


def _spark_queries(spark, queries: dict):
    return spark.createDataFrame(
        [(q, t) for q, t in queries.items()], "query_id string, query string"
    )


class TestBM25:
    def test_matches_sequential_reference_randomized(self, spark):
        rng = random.Random(1234)
        vocab = [f"w{i}" for i in range(30)]
        docs = {
            d: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))
            for d in range(200)
        }
        queries = {
            "q1": "w0 w1 w2",
            "q2": "w5 w5 w29",  # duplicate query term counts once
            "q3": "w7",
            "q4": "zz w3",  # one term absent from the corpus
        }
        got = {
            qid: sorted(rows, key=lambda r: r[0])
            for qid, rows in _collect(bm25_topk(_spark_docs(spark, docs), _spark_queries(spark, queries), k=7)).items()
        }
        want = _bm25_ref(docs, queries, k=7)
        assert set(got) == set(want)
        for qid in want:
            got_rows, want_rows = got[qid], want[qid]
            assert [r[:3] for r in got_rows] == [r[:3] for r in want_rows], qid
            for g, w in zip(got_rows, want_rows):
                assert g[3] == pytest.approx(w[3], abs=2e-4)

    def test_layout_invariant(self, spark):
        docs = {d: f"alpha beta w{d % 5} gamma" for d in range(40)}
        qdf = _spark_queries(spark, {"q": "alpha w3"})
        a = bm25_topk(_spark_docs(spark, docs), qdf, k=5).collect()
        b = bm25_topk(_spark_docs(spark, docs).repartition(7), qdf, k=5).collect()
        key = lambda r: (r["query_id"], r["rank"])
        assert sorted(map(tuple, a), key=lambda t: (t[0], t[1])) == sorted(
            map(tuple, b), key=lambda t: (t[0], t[1])
        )

    def test_unmatched_query_absent_empty_corpus_empty(self, spark):
        docs = {1: "alpha beta", 2: "beta gamma"}
        qdf = _spark_queries(spark, {"q1": "alpha", "q2": "nosuchterm"})
        rows = bm25_topk(_spark_docs(spark, docs), qdf, k=3).collect()
        assert {r["query_id"] for r in rows} == {"q1"}

        empty = _spark_docs(spark, {}).limit(0)
        out = bm25_topk(empty, qdf, k=3)
        assert out.count() == 0
        assert "doc_id" in out.columns and "score" in out.columns

    def test_plan_prunes_before_shuffle(self, spark):
        """The corpus term stream must join the BROADCAST query-term set
        (pruning) — no sort-merge/shuffled-hash join against the corpus."""
        docs = {d: "alpha beta gamma" for d in range(50)}
        qdf = _spark_queries(spark, {"q": "alpha"})
        plan = bm25_topk(_spark_docs(spark, docs), qdf, k=5)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def _collect(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["n_terms"], r["score"])
        )
    return out
