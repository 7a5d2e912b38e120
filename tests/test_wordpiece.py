"""WordPiece tokenizer family (operators/tokens.py:
train_wordpiece / apply_wordpiece): likelihood-scored merge training
(Schuster & Nakajima 2012) pinned to an exact sequential twin, the
maximum-munch encoder pinned to a greedy python reference, the
train-time BPE/WordPiece objective divergence, the inference-time
munch-vs-merge-replay asymmetry, and decode roundtrips."""

from __future__ import annotations

import random
from collections import Counter
from fractions import Fraction

import pytest

from super_speedy_syslog_searcher_spark.operators.tokens import (
    apply_bpe,
    apply_wordpiece,
    decode_bpe,
    train_bpe,
    train_wordpiece,
)


def _ref_rewrite(d: list[int], left: int, right: int, new: int) -> list[int]:
    out, i = [], 0
    while i < len(d):
        if i + 1 < len(d) and d[i] == left and d[i + 1] == right:
            out.append(new)
            i += 2
        else:
            out.append(d[i])
            i += 1
    return out


def _ref_train_wordpiece(docs: list[list[int]], num_merges: int, min_freq: int = 2):
    """Textbook sequential WordPiece trainer: argmax of the exact
    fraction n_pair/(n_left*n_right), ties to smallest (left, right)."""
    toks = [t for d in docs for t in d]
    next_id = (max(toks) + 1) if toks else 0
    cur = [list(d) for d in docs]
    merges = []
    for rno in range(num_merges):
        pc: Counter = Counter()
        uc: Counter = Counter()
        for d in cur:
            uc.update(d)
            pc.update(zip(d, d[1:]))
        cands = [(p, n) for p, n in pc.items() if n >= min_freq]
        if not cands:
            break
        (left, right), n = max(
            cands,
            key=lambda x: (
                Fraction(x[1], uc[x[0][0]] * uc[x[0][1]]),
                (-x[0][0], -x[0][1]),
            ),
        )
        merges.append((rno, left, right, next_id, n))
        cur = [_ref_rewrite(d, left, right, next_id) for d in cur]
        next_id += 1
    return merges, cur


def _ref_munch(d: list[int], merges) -> list[int]:
    """Greedy longest-match reference encoder over the piece vocab."""
    expansion: dict[int, tuple[int, ...]] = {}
    for _rno, left, right, new, _n in merges:
        expansion[new] = expansion.get(left, (left,)) + expansion.get(right, (right,))
    by_spelling: dict[tuple[int, ...], int] = {}
    for _rno, left, right, new, _n in merges:
        by_spelling.setdefault(expansion[new], new)
    max_len = max((len(s) for s in by_spelling), default=1)
    out, p = [], 0
    while p < len(d):
        for ln in range(min(max_len, len(d) - p), 0, -1):
            key = tuple(d[p : p + ln])
            if ln == 1:
                out.append(d[p])
                p += 1
                break
            if key in by_spelling:
                out.append(by_spelling[key])
                p += ln
                break
    return out


def _mk(spark, docs: list[list[int]]):
    return spark.createDataFrame(
        [(f"d{i}", d) for i, d in enumerate(docs)],
        "doc_id string, tokens array<int>",
    )


def _collect_tokens(df) -> dict[str, list[int]]:
    return {r["doc_id"]: list(r["tokens"]) for r in df.collect()}


class TestTrainWordpiece:
    def test_exact_vs_sequential_twin_random_corpus(self, spark):
        rng = random.Random(17)
        docs = [[rng.randrange(6) for _ in range(rng.randrange(0, 30))] for _ in range(40)]
        merges, merged = train_wordpiece(_mk(spark, docs), num_merges=6)
        ref_merges, ref_corpus = _ref_train_wordpiece(docs, num_merges=6)
        assert merges == ref_merges
        got = _collect_tokens(merged)
        assert got == {f"d{i}": d for i, d in enumerate(ref_corpus)}

    def test_objective_diverges_from_bpe(self, spark):
        """(x, y): 4 cohesive occurrences of rare units (score 4/16);
        (a, b): 10 occurrences of frequent units (score 10/2500) — BPE
        must pick (a, b), WordPiece must pick (x, y)."""
        docs = []
        for _ in range(10):
            docs.append([0, 1])  # (a=0, b=1) pair
        for _ in range(20):
            docs.append([0])
            docs.append([1])
        for _ in range(4):
            docs.append([7, 8])  # (x=7, y=8): only ever together
        df = _mk(spark, docs)
        wp, _ = train_wordpiece(df, num_merges=1)
        bp, _ = train_bpe(df, num_merges=1)
        assert (wp[0][1], wp[0][2]) == (7, 8)
        assert (bp[0][1], bp[0][2]) == (0, 1)

    def test_tie_breaks_to_smallest_pair(self, spark):
        """Identical scores on (2,3) and (0,1): winner is (0, 1)."""
        docs = [[0, 1], [0, 1], [2, 3], [2, 3]]
        merges, _ = train_wordpiece(_mk(spark, docs), num_merges=1)
        assert (merges[0][1], merges[0][2]) == (0, 1)

    def test_left_eq_right_run_parity(self, spark):
        """'aaa' under winning pair (a, a) merges greedily: AA a."""
        docs = [[5, 5, 5], [5, 5]]
        merges, merged = train_wordpiece(_mk(spark, docs), num_merges=1)
        assert (merges[0][1], merges[0][2]) == (5, 5)
        new = merges[0][3]
        got = _collect_tokens(merged)
        assert got["d0"] == [new, 5] and got["d1"] == [new]

    def test_shortlist_saturation_raises(self, spark):
        docs = [[0, 1], [0, 1], [2, 3], [2, 3], [4, 6], [4, 6]]
        with pytest.raises(ValueError, match="shortlist saturated"):
            train_wordpiece(_mk(spark, docs), num_merges=1, top_k=2)

    def test_layout_invariance(self, spark):
        rng = random.Random(5)
        docs = [[rng.randrange(5) for _ in range(rng.randrange(1, 20))] for _ in range(30)]
        m1, _ = train_wordpiece(_mk(spark, docs), num_merges=4)
        m2, _ = train_wordpiece(_mk(spark, docs).repartition(7), num_merges=4)
        assert m1 == m2


class TestApplyWordpiece:
    def test_matches_greedy_reference(self, spark):
        rng = random.Random(23)
        train_docs = [[rng.randrange(5) for _ in range(rng.randrange(1, 25))] for _ in range(40)]
        merges, _ = train_wordpiece(_mk(spark, train_docs), num_merges=6)
        test_docs = [[rng.randrange(7) for _ in range(rng.randrange(0, 25))] for _ in range(25)]
        got = _collect_tokens(apply_wordpiece(_mk(spark, test_docs), merges))
        for i, d in enumerate(test_docs):
            assert got[f"d{i}"] == _ref_munch(d, merges), (i, d)

    def test_munch_differs_from_bpe_replay(self, spark):
        """Merges learned as (b,c) THEN (a,b): BPE replay on [a,b,c]
        fires (b,c) first → [a, BC]; maximum munch prefers the longest
        leading piece 'ab' → [AB, c]. The classic asymmetry."""
        a, b, c = 0, 1, 2
        merges = [(0, b, c, 10, 5), (1, a, b, 11, 4)]
        df = _mk(spark, [[a, b, c]])
        via_bpe = _collect_tokens(apply_bpe(df, merges))["d0"]
        via_wp = _collect_tokens(apply_wordpiece(df, merges))["d0"]
        assert via_bpe == [a, 10]
        assert via_wp == [11, c]

    def test_duplicate_spelling_earliest_piece_wins(self, spark):
        """(a,bc) and (ab,c) both spell 'abc': the earlier-trained id
        is emitted for the 3-token match."""
        a, b, c = 0, 1, 2
        merges = [
            (0, b, c, 10, 9),   # bc
            (1, a, b, 11, 8),   # ab
            (2, a, 10, 12, 7),  # a+bc = abc  (earliest 'abc')
            (3, 11, c, 13, 6),  # ab+c = abc  (duplicate spelling)
        ]
        got = _collect_tokens(apply_wordpiece(_mk(spark, [[a, b, c]]), merges))["d0"]
        assert got == [12]

    def test_unknown_ids_pass_through(self, spark):
        merges = [(0, 0, 1, 10, 3)]
        got = _collect_tokens(apply_wordpiece(_mk(spark, [[99, 0, 1, 98]]), merges))["d0"]
        assert got == [99, 10, 98]

    def test_roundtrip_decodes_exactly(self, spark):
        rng = random.Random(31)
        docs = [[rng.randrange(5) for _ in range(rng.randrange(0, 30))] for _ in range(30)]
        df = _mk(spark, docs)
        merges, _ = train_wordpiece(df, num_merges=5)
        back = _collect_tokens(decode_bpe(apply_wordpiece(df, merges), merges))
        assert back == {f"d{i}": d for i, d in enumerate(docs)}

    def test_empty_docs_and_empty_merges(self, spark):
        got = _collect_tokens(apply_wordpiece(_mk(spark, [[], [3]]), []))
        assert got == {"d0": [], "d1": [3]}
