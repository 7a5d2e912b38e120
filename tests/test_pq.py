"""Product quantization (train / encode / ADC top-k, IVF-PQ): twins.

Test embeddings are dyadic rationals (k/1024) so every distributed sum
in training round 1 is EXACT in float64 — partition-order independent —
and later rounds stay deterministic (one correctly-rounded division per
mean). The sequential twin reimplements Lloyd/encode/ADC from the
documented contract (lowest-id init, lowest-code tie-break, empty cell
keeps codeword, ADC = m LUT lookups).
"""

from __future__ import annotations

import numpy as np
import pytest

from super_speedy_syslog_searcher_spark.operators import similarity as S

D, M, KSUB = 16, 4, 8
DSUB = D // M


def _dyadic_vecs(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-512, 512, size=(n, D)).astype(np.float64) / 1024.0


def _twin_train(V: np.ndarray, m: int, ksub: int, iters: int) -> np.ndarray:
    """Sequential Lloyd per subspace; ids are 0..n-1 in row order."""
    n, d = V.shape
    dsub = d // m
    sub = V.reshape(n, m, dsub)
    books = sub[: min(ksub, n)].transpose(1, 0, 2).copy()  # lowest-id init
    for _ in range(iters):
        kk = books.shape[1]
        new = books.copy()
        for j in range(m):
            # assign with lowest-code tie-break
            codes = np.empty(n, dtype=int)
            for i in range(n):
                dists = [
                    float(((sub[i, j] - books[j, c]) ** 2).sum()) for c in range(kk)
                ]
                # argmin with exact lowest-code tie-break, via the same
                # |c|^2 - 2<x,c> expression the engine uses
                expr = [
                    float((books[j, c] ** 2).sum() - 2.0 * (sub[i, j] @ books[j, c]))
                    for c in range(kk)
                ]
                codes[i] = int(np.argmin(expr))
                del dists
            for c in range(kk):
                sel = sub[codes == c, j, :]
                if len(sel):
                    new[j, c] = sel.sum(axis=0) / len(sel)
        books = new
    return books


def _twin_encode(V: np.ndarray, books: np.ndarray) -> np.ndarray:
    n = V.shape[0]
    m, kk, dsub = books.shape
    sub = V.reshape(n, m, dsub)
    out = np.empty((n, m), dtype=int)
    for i in range(n):
        for j in range(m):
            expr = [
                float((books[j, c] ** 2).sum() - 2.0 * (sub[i, j] @ books[j, c]))
                for c in range(kk)
            ]
            out[i, j] = int(np.argmin(expr))
    return out


def _twin_adc_topk(
    codes: np.ndarray,
    ids: np.ndarray,
    Q: np.ndarray,
    qids: np.ndarray,
    books: np.ndarray,
    k: int,
    allowed=None,
    lists=None,
):
    m, kk, dsub = books.shape
    res = {}
    for qi, qid in enumerate(qids):
        q = Q[qi].reshape(m, dsub)
        lut = np.array(
            [[float(((q[j] - books[j, c]) ** 2).sum()) for c in range(kk)] for j in range(m)]
        )
        rows = []
        for r in range(len(ids)):
            if ids[r] == qid:
                continue
            if allowed is not None and int(lists[r]) not in allowed.get(int(qid), set()):
                continue
            dist = 0.0
            for j in range(m):
                dist += lut[j, codes[r, j]]
            rows.append((dist, int(ids[r])))
        rows.sort()
        res[int(qid)] = [nid for _, nid in rows[:k]]
    return res


@pytest.fixture(scope="module")
def pq_data(spark):
    V = _dyadic_vecs(60, seed=21)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, embedding array<float>",
    ).repartition(7)
    return V, df


def test_train_matches_sequential_twin(spark, pq_data):
    V, df = pq_data
    books = S.pq_train(df, m=M, ksub=KSUB, iters=3)
    want = _twin_train(V, M, KSUB, iters=3)
    assert books.shape == (M, KSUB, DSUB)
    np.testing.assert_allclose(books, want, rtol=0, atol=1e-12)


def test_train_partition_layout_invariance(spark, pq_data):
    V, df = pq_data
    a = S.pq_train(df.coalesce(1), m=M, ksub=KSUB, iters=2)
    b = S.pq_train(df.repartition(13), m=M, ksub=KSUB, iters=2)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)  # dyadic round-1 + det. rounds


def test_encode_matches_twin(spark, pq_data):
    V, df = pq_data
    books = S.pq_train(df, m=M, ksub=KSUB, iters=2)
    got = {r["vec_id"]: list(r["codes"]) for r in S.pq_encode(df, books).collect()}
    want = _twin_encode(V, books)
    assert got == {i: list(map(int, want[i])) for i in range(len(V))}
    # compression: m ints per vector, all codes in range
    assert all(0 <= c < KSUB for cs in got.values() for c in cs)


def test_adc_topk_matches_twin(spark, pq_data):
    V, df = pq_data
    books = S.pq_train(df, m=M, ksub=KSUB, iters=2)
    codes_df = S.pq_encode(df, books)
    queries = df.filter("vec_id < 4")
    got = {}
    for r in S.pq_topk_adc(codes_df, queries, books, k=5).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    codes = _twin_encode(V, books)
    want = _twin_adc_topk(
        codes, np.arange(len(V)), V[:4], np.arange(4), books, k=5
    )
    for qid in range(4):
        ranked = [n for _, n in sorted(got[qid])]
        assert ranked == want[qid], qid


def test_ivfpq_probe_masking(spark, pq_data):
    """IVF-PQ: rows outside a query's probed coarse lists never score."""
    V, df = pq_data
    books = S.pq_train(df, m=M, ksub=KSUB, iters=2)
    from pyspark.sql import functions as F

    codes_df = S.pq_encode(df, books).withColumn(
        "list_id", (F.col("vec_id") % 3).cast("int")
    )
    queries = df.filter("vec_id < 3")
    probe = {0: [0, 1], 1: [2], 2: [0, 1, 2]}
    got = {}
    for r in S.pq_topk_adc(
        codes_df, queries, books, k=4, list_col="list_id", probe_lists=probe
    ).collect():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    codes = _twin_encode(V, books)
    lists = np.arange(len(V)) % 3
    want = _twin_adc_topk(
        codes,
        np.arange(len(V)),
        V[:3],
        np.arange(3),
        books,
        k=4,
        allowed={q: set(ls) for q, ls in probe.items()},
        lists=lists,
    )
    for qid in range(3):
        assert sorted(got[qid]) == sorted(want[qid])
        assert all(int(n) % 3 in probe[qid] for n in got[qid])


def test_adc_recall_on_separated_clusters(spark):
    """Sanity beyond twins: with well-separated clusters, ADC top-k finds
    the query's own cluster-mates (recall@k = 1 vs exact cosine)."""
    rng = np.random.default_rng(9)
    centers = rng.integers(-4, 5, size=(4, D)).astype(np.float64) * 8.0
    V = np.concatenate(
        [c + rng.integers(-16, 17, size=(10, D)) / 1024.0 for c in centers]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, embedding array<float>",
    )
    books = S.pq_train(df, m=M, ksub=KSUB, iters=3)
    codes_df = S.pq_encode(df, books)
    queries = df.filter("vec_id in (0, 10, 20, 30)")
    rows = S.pq_topk_adc(codes_df, queries, books, k=5).collect()
    for r in rows:
        assert r["neighbor_id"] // 10 == r["query_id"] // 10  # same cluster


def _twin_ivfpq(V, ids, coarse, books, qV, qids, k, nprobe):
    m, kk, dsub = books.shape
    # encode: nearest cell (L2, lowest id), residual codes
    lists = np.empty(len(V), dtype=int)
    codes = np.empty((len(V), m), dtype=int)
    for i in range(len(V)):
        dc = [float(((V[i] - coarse[l]) ** 2).sum()) for l in range(len(coarse))]
        # engine expression: |c|^2 - 2<x,c>
        expr = [
            float((coarse[l] ** 2).sum() - 2.0 * (V[i] @ coarse[l]))
            for l in range(len(coarse))
        ]
        lists[i] = int(np.argmin(expr))
        r = (V[i] - coarse[lists[i]]).reshape(m, dsub)
        for j in range(m):
            e = [
                float((books[j, c] ** 2).sum() - 2.0 * (r[j] @ books[j, c]))
                for c in range(kk)
            ]
            codes[i, j] = int(np.argmin(e))
    res = {}
    for qi, qid in enumerate(qids):
        expr = [
            float((coarse[l] ** 2).sum() - 2.0 * (qV[qi] @ coarse[l]))
            for l in range(len(coarse))
        ]
        probed = list(np.argsort(expr, kind="stable")[:nprobe])
        rows = []
        for i in range(len(V)):
            if ids[i] == qid or lists[i] not in probed:
                continue
            r = (qV[qi] - coarse[lists[i]]).reshape(m, dsub)
            dist = 0.0
            for j in range(m):
                dist += float(((r[j] - books[j, codes[i, j]]) ** 2).sum())
            rows.append((dist, int(ids[i])))
        rows.sort()
        res[int(qid)] = [n for _, n in rows[:k]]
    return res, lists, codes


class TestResidualIvfPq:
    def test_encode_and_topk_match_twin(self, spark, pq_data):
        from super_speedy_syslog_searcher_spark.operators.similarity import (
            ivfpq_encode,
            ivfpq_topk,
        )

        V, df = pq_data
        rng = np.random.default_rng(31)
        coarse = rng.integers(-512, 512, size=(5, D)).astype(np.float64) / 1024.0
        books = rng.integers(-256, 256, size=(M, KSUB, DSUB)).astype(np.float64) / 1024.0
        enc = ivfpq_encode(df, books, coarse)
        got_enc = {r["vec_id"]: (r["list_id"], list(r["codes"])) for r in enc.collect()}
        want, lists, codes = _twin_ivfpq(
            V, np.arange(len(V)), coarse, books, V[:4], np.arange(4), k=5, nprobe=2
        )
        for i in range(len(V)):
            assert got_enc[i] == (int(lists[i]), list(map(int, codes[i]))), i
        got = {}
        for r in ivfpq_topk(enc, df.filter("vec_id < 4"), books, coarse, k=5, nprobe=2).collect():
            got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
        for qid in range(4):
            assert [n for _, n in sorted(got.get(qid, []))] == want[qid], qid

    def test_residual_beats_plain_pq_on_clustered_data(self, spark):
        """The point of residual encoding: with well-separated cells the
        codebooks only describe within-cell structure, so residual
        IVFADC's top-k agrees with exact L2 at least as often as plain
        PQ using the same codebooks."""
        from super_speedy_syslog_searcher_spark.operators.similarity import (
            ivfpq_encode,
            ivfpq_topk,
            pq_encode,
            pq_topk_adc,
        )

        rng = np.random.default_rng(17)
        centers = rng.integers(-3, 4, size=(4, D)).astype(np.float64) * 16.0
        V = np.concatenate(
            [c + rng.integers(-256, 257, size=(12, D)) / 1024.0 for c in centers]
        )
        df = spark.createDataFrame(
            [(i, [float(x) for x in V[i]]) for i in range(len(V))],
            "vec_id long, embedding array<float>",
        )
        # train the codebooks on the RESIDUAL distribution (the paper's
        # recipe) — random codebooks can't describe residuals and both
        # variants degrade to noise
        R = V - centers[np.arange(len(V)) // 12]
        rdf = spark.createDataFrame(
            [(i, [float(x) for x in R[i]]) for i in range(len(R))],
            "vec_id long, embedding array<float>",
        )
        books = S.pq_train(rdf, m=M, ksub=KSUB, iters=3)
        # exact L2 top-3 per query
        def exact_top(qi):
            d = ((V - V[qi]) ** 2).sum(axis=1)
            order = sorted((float(d[i]), i) for i in range(len(V)) if i != qi)
            return [n for _, n in order[:3]]

        queries = df.filter("vec_id in (0, 12, 24, 36)")
        enc = ivfpq_encode(df, books, centers)
        res = {}
        for r in ivfpq_topk(enc, queries, books, centers, k=3, nprobe=1).collect():
            res.setdefault(r["query_id"], []).append(r["neighbor_id"])
        plain = {}
        for r in pq_topk_adc(pq_encode(df, books), queries, books, k=3).collect():
            plain.setdefault(r["query_id"], []).append(r["neighbor_id"])
        res_hits = sum(len(set(res.get(q, [])) & set(exact_top(q))) for q in (0, 12, 24, 36))
        plain_hits = sum(
            len(set(plain.get(q, [])) & set(exact_top(q))) for q in (0, 12, 24, 36)
        )
        assert res_hits > plain_hits
        assert res_hits >= 6  # trained residual coding recovers true neighbors
        # residual top-k stays within the query's own cluster cell
        for q, ns in res.items():
            assert all(n // 12 == q // 12 for n in ns)
