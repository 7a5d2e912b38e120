"""BPE-dropout (tokens.apply_bpe_dropout, Provilkov et al. 2020):
sequential-twin exactness of the seeded drop decisions, the p=0 / p=1
identities, layout/run determinism, decode roundtrip, and drop-rate
statistics."""

from __future__ import annotations

import hashlib
import random

import pytest

from super_speedy_syslog_searcher_spark.operators.tokens import (
    apply_bpe,
    apply_bpe_dropout,
    decode_bpe,
)

MASK = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return (z ^ (z >> 31)) & MASK


P1, P2 = 0xA24BAED4963EE407, 0x9FB21C651E98DF25


def _ref_dropout(doc_id: str, d: list[int], merges, p: float, seed: str) -> list[int]:
    """Sequential reference: per merge, enumerate candidates in order,
    drop each by the seeded mix, then apply survivors greedily
    left-to-right (run-parity overlap rule)."""
    key = int.from_bytes(hashlib.md5(f"{seed}:{doc_id}".encode()).digest()[:8], "big")
    thr = min(int(p * (1 << 64)), MASK) if p < 1.0 else None
    cur = list(d)
    for mno, (_r, left, right, new, _n) in enumerate(merges):
        cands = [i for i in range(len(cur) - 1) if cur[i] == left and cur[i + 1] == right]
        if thr is None:
            continue
        kept_c = [
            c
            for occ, c in enumerate(cands)
            if _splitmix64((key + (mno + 1) * P1 + occ * P2) & MASK) >= thr
        ]
        out, i, ks = [], 0, set(kept_c)
        while i < len(cur):
            if i in ks and i + 1 < len(cur) and cur[i] == left and cur[i + 1] == right:
                out.append(new)
                i += 2
            else:
                out.append(cur[i])
                i += 1
        cur = out
    return cur


def _mk(spark, docs):
    return spark.createDataFrame(
        [(f"d{i}", d) for i, d in enumerate(docs)], "doc_id string, tokens array<int>"
    )


def _collect(df):
    return {r["doc_id"]: list(r["tokens"]) for r in df.collect()}


def _train_merges(docs):
    """Deterministic toy merge table over a small alphabet."""
    return [(0, 0, 1, 10, 9), (1, 10, 2, 11, 7), (2, 3, 3, 12, 5), (3, 1, 0, 13, 4)]


class TestBpeDropout:
    def test_p0_equals_apply_bpe(self, spark):
        rng = random.Random(3)
        docs = [[rng.randrange(5) for _ in range(rng.randrange(0, 40))] for _ in range(30)]
        df = _mk(spark, docs)
        merges = _train_merges(docs)
        assert _collect(apply_bpe_dropout(df, merges, p_drop=0.0)) == _collect(
            apply_bpe(df, merges)
        )

    def test_p1_returns_base_ids(self, spark):
        docs = [[0, 1, 2, 3, 3], [0, 1]]
        df = _mk(spark, docs)
        got = _collect(apply_bpe_dropout(df, _train_merges(docs), p_drop=1.0))
        assert got == {"d0": [0, 1, 2, 3, 3], "d1": [0, 1]}

    @pytest.mark.parametrize("p", [0.2, 0.5])
    def test_matches_sequential_twin(self, spark, p):
        rng = random.Random(17)
        docs = [[rng.randrange(5) for _ in range(rng.randrange(0, 40))] for _ in range(40)]
        merges = _train_merges(docs)
        got = _collect(apply_bpe_dropout(_mk(spark, docs), merges, p_drop=p, seed="s"))
        for i, d in enumerate(docs):
            assert got[f"d{i}"] == _ref_dropout(f"d{i}", d, merges, p, "s"), i

    def test_run_overlap_with_dropout(self, spark):
        """'aaaa' under merge (a,a): if candidate 0 is dropped the walk
        must still fire at position 1 — twin agreement on runs."""
        docs = [[3] * 6 for _ in range(20)]
        merges = [(0, 3, 3, 12, 5)]
        for seed in ("r0", "r1", "r2"):
            got = _collect(apply_bpe_dropout(_mk(spark, docs), merges, p_drop=0.5, seed=seed))
            for i, d in enumerate(docs):
                assert got[f"d{i}"] == _ref_dropout(f"d{i}", d, merges, 0.5, seed), (seed, i)

    def test_layout_invariant_and_rerun_stable(self, spark):
        rng = random.Random(29)
        docs = [[rng.randrange(5) for _ in range(rng.randrange(1, 30))] for _ in range(40)]
        merges = _train_merges(docs)
        df = _mk(spark, docs)
        a = _collect(apply_bpe_dropout(df, merges, p_drop=0.3))
        b = _collect(apply_bpe_dropout(df.repartition(11), merges, p_drop=0.3))
        c = _collect(apply_bpe_dropout(df, merges, p_drop=0.3))
        assert a == b == c

    def test_decode_roundtrip(self, spark):
        rng = random.Random(31)
        docs = [[rng.randrange(5) for _ in range(rng.randrange(0, 30))] for _ in range(30)]
        merges = _train_merges(docs)
        df = _mk(spark, docs)
        out = apply_bpe_dropout(df, merges, p_drop=0.4)
        back = _collect(decode_bpe(out, merges))
        assert back == {f"d{i}": d for i, d in enumerate(docs)}

    def test_drop_rate_tracks_p(self, spark):
        """Over many docs the segmentation at p=0.5 sits strictly
        between p=0 (all merges) and p=1 (none): total token count
        ordering n(p=0) < n(p=0.5) < n(p=1)."""
        rng = random.Random(37)
        docs = [[rng.randrange(4) for _ in range(60)] for _ in range(60)]
        merges = _train_merges(docs)
        df = _mk(spark, docs)
        n0 = sum(len(v) for v in _collect(apply_bpe_dropout(df, merges, 0.0)).values())
        nh = sum(len(v) for v in _collect(apply_bpe_dropout(df, merges, 0.5)).values())
        n1 = sum(len(v) for v in _collect(apply_bpe_dropout(df, merges, 1.0)).values())
        assert n0 < nh < n1

    def test_bad_p_raises(self, spark):
        with pytest.raises(ValueError, match="p_drop"):
            apply_bpe_dropout(_mk(spark, [[1]]), [], p_drop=1.5)
