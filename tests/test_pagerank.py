"""PageRank (curation.pagerank): twin, conservation, structure, layout."""

from __future__ import annotations

import numpy as np
import pytest

from super_speedy_syslog_searcher_spark.operators.curation import pagerank


def _twin_pagerank(edges, damping, iters):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {i: [] for i in range(n)}
    for s, d in edges:
        out[idx[s]].append(idx[d])
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = sum(r[i] for i in range(n) if not out[i])
        nxt = np.full(n, (1.0 - damping) / n)
        nxt += damping * dangling / n
        for i in range(n):
            for j in out[i]:
                nxt[j] += damping * r[i] / len(out[i])
        r = nxt
    return {nodes[i]: float(r[i]) for i in range(n)}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("e", "c"), ("f", "a"), ("f", "b"),
    # g is dangling (no out-edges), reached from c
    ("c", "g"),
]


def test_matches_python_twin(spark):
    got = _run(spark, EDGES, damping=0.85, iters=12)
    want = _twin_pagerank(EDGES, 0.85, 12)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_mass_conserved_with_dangling_nodes(spark):
    got = _run(spark, EDGES, iters=7)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_cycle_is_uniform_and_authority_ranks_highest(spark):
    cyc = [("x", "y"), ("y", "z"), ("z", "x")]
    got = _run(spark, cyc, iters=20)
    assert got["x"] == pytest.approx(1 / 3, abs=1e-9)
    assert got["y"] == pytest.approx(got["z"], abs=1e-12)
    # star: hub pointed at by all spokes outranks every spoke (s0 also
    # gets hub's full outflow, so strict > is the right claim, not 2x)
    star = [(f"s{i}", "hub") for i in range(6)] + [("hub", "s0")]
    got = _run(spark, star, iters=15)
    assert got["hub"] > max(v for k, v in got.items() if k != "hub")
    assert min(got.values()) > 0


def test_layout_invariance(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = {r["node"]: r["rank"] for r in pagerank(df.coalesce(1), iters=6).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(df.repartition(9), iters=6).collect()}
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df).count() == 0


class TestLinkGraph:
    def test_extract_and_compose_with_pagerank(self, spark):
        from super_speedy_syslog_searcher_spark.operators.curation import (
            extract_link_graph,
        )

        docs = spark.createDataFrame(
            [
                (1, "see https://a.com/x and http://b.org/y", "en", "siteA"),
                (2, "again https://a.com/z https://a.com/w", "en", "siteA"),
                (3, "only http://b.org", "en", "siteB"),
                (4, "no links here", "en", "siteB"),
            ],
            "doc_id long, text string, lang string, source string",
        )
        edges = extract_link_graph(docs)
        got = sorted((r["src"], r["dst"]) for r in edges.collect())
        # doc 2's duplicate a.com mentions collapse (per-doc distinct);
        # docs 1 and 2 both yield siteA->a.com = parallel edges
        assert got == [
            ("siteA", "a.com"),
            ("siteA", "a.com"),
            ("siteA", "b.org"),
            ("siteB", "b.org"),
        ]
        ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=8).collect()}
        assert set(ranks) == {"siteA", "siteB", "a.com", "b.org"}
        assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
        # cited domains outrank the citing sources (sources get no in-links)
        assert min(ranks["a.com"], ranks["b.org"]) > max(
            ranks["siteA"], ranks["siteB"]
        )

    def test_runs_on_the_documents_table(self, spark):
        from super_speedy_syslog_searcher_spark.operators.curation import (
            extract_link_graph,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        edges = extract_link_graph(docs)
        ranks = pagerank(edges, iters=5)
        total = ranks.agg({"rank": "sum"}).first()[0]
        if edges.count() > 0:
            assert total == pytest.approx(1.0, abs=1e-9)
