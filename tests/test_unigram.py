"""Unigram-LM (SentencePiece-style) tokenizer training/encoding tests:
exact equality against a sequential python reference (the hard-EM /
frequency-pruning algorithm run straight-line over the collected
corpus), partitioning-layout invariance, the lossless-segmentation
invariant, and the map-only plan shape of the encode stage.

The reference shares ``_viterbi_segment`` with the operator by design
(tokens.py docstring): per-doc lattice float math is identical on both
sides, so equality here verifies the DISTRIBUTED machinery — seed
substring counting, the per-round piece-count aggregation (integers,
exact under any layout), and the deterministic top-k/prune tie-breaks.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from super_speedy_syslog_searcher_spark.operators.tokens import (
    UNIGRAM_UNK_PENALTY,
    _viterbi_segment,
    apply_unigram,
    train_unigram,
)

TEXTS = [
    "the cat sat on the mat",
    "the bat and the rat sat",
    "a cat and a bat",
    "rats eat oats and cats nap",
    "the the the mat mat",
    "on and on and on",
    "",
    "sat",
]

PARAMS = dict(vocab_size=40, max_piece_len=5, seed_size=60, n_rounds=2, prune_frac=0.3, min_freq=2)


def _ref_train(texts, vocab_size, max_piece_len, seed_size, n_rounds, prune_frac, min_freq):
    cnt = Counter()
    for t in texts:
        for ln in range(1, max_piece_len + 1):
            for i in range(len(t) - ln + 1):
                cnt[t[i : i + ln]] += 1
    counts = {p: c for p, c in cnt.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1 and c >= min_freq),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    counts.update(dict(multis))

    def logp_tables(cnts):
        total = sum(cnts.values())
        return (
            {p: math.log(c / total) for p, c in cnts.items()},
            math.log(1.0 / total) - UNIGRAM_UNK_PENALTY,
        )

    def prune(cnts, target):
        if len(cnts) <= target:
            return cnts
        kept = {p: c for p, c in cnts.items() if len(p) == 1}
        km = max(target - len(kept), 0)
        ms = sorted(
            ((p, c) for p, c in cnts.items() if len(p) > 1), key=lambda pc: (-pc[1], pc[0])
        )
        kept.update(dict(ms[:km]))
        return kept

    for _ in range(max(n_rounds, 1)):
        lp, unk = logp_tables(counts)
        used = Counter()
        for t in texts:
            for p in _viterbi_segment(t, lp, max_piece_len, unk):
                used[p] += 1
        nc = {}
        for p in counts:
            c = used.get(p, 0)
            if len(p) == 1:
                nc[p] = max(c, 1)
            elif c > 0:
                nc[p] = c
        counts = prune(nc, max(vocab_size, int(len(nc) * (1.0 - prune_frac))))
    counts = prune(counts, vocab_size)
    lp, unk = logp_tables(counts)
    segs = [_viterbi_segment(t, lp, max_piece_len, unk) for t in texts]
    vocab = sorted(((p, c, lp[p]) for p, c in counts.items()), key=lambda t: (-t[1], t[0]))
    return vocab, segs


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    ).repartition(7)


class TestTrainUnigram:
    def test_exact_twin(self, spark, docs):
        vocab, segmented = train_unigram(docs, **PARAMS)
        ref_vocab, ref_segs = _ref_train(TEXTS, **PARAMS)
        assert vocab == ref_vocab  # (piece, count, logp) triples, exact
        got = {r["doc_id"]: list(r["pieces"]) for r in segmented.collect()}
        for i, t in enumerate(TEXTS):
            assert got[i] == ref_segs[i], (i, got[i], ref_segs[i])

    def test_layout_invariance(self, spark, docs):
        v1, _ = train_unigram(docs.repartition(1), **PARAMS)
        v7, _ = train_unigram(docs.repartition(7), **PARAMS)
        assert v1 == v7

    def test_lossless_segmentation(self, spark, docs):
        _, segmented = train_unigram(docs, **PARAMS)
        got = {r["doc_id"]: "".join(r["pieces"]) for r in segmented.collect()}
        for i, t in enumerate(TEXTS):
            assert got[i] == t

    def test_single_char_coverage(self, spark, docs):
        vocab, _ = train_unigram(docs, **PARAMS)
        pieces = {p for p, _c, _lp in vocab}
        chars = set("".join(TEXTS))
        assert chars <= pieces  # every seen char survives pruning

    def test_vocab_size_bound(self, spark, docs):
        vocab, _ = train_unigram(docs, **PARAMS)
        n_singles = len(set("".join(TEXTS)))
        assert len(vocab) <= max(PARAMS["vocab_size"], n_singles)

    def test_multichar_pieces_learned(self, spark, docs):
        vocab, _ = train_unigram(docs, **PARAMS)
        assert any(len(p) > 1 for p, _c, _lp in vocab)
        # the corpus's dominant word must be a piece (with its space)
        assert any("the" in p for p, _c, _lp in vocab)


class TestApplyUnigram:
    def test_roundtrip_and_unk(self, spark, docs):
        vocab, _ = train_unigram(docs, **PARAMS)
        new = spark.createDataFrame(
            [(100, "the cat sat"), (101, "zebra! quiz")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in apply_unigram(new, vocab, max_piece_len=5).collect()}
        assert "".join(rows[100]["pieces"]) == "the cat sat"
        assert rows[100]["n_unk"] == 0
        # z, b, !, q, ? are absent from the training corpus
        assert rows[101]["n_unk"] > 0
        assert "".join(rows[101]["pieces"]) == "zebra! quiz"
        assert rows[101]["n_pieces"] == len(rows[101]["pieces"])

    def test_train_inference_invariant(self, spark, docs):
        # encoding the training corpus with the trained vocab reproduces
        # the training run's own final segmentation
        vocab, segmented = train_unigram(docs, **PARAMS)
        enc = apply_unigram(docs, vocab, max_piece_len=PARAMS["max_piece_len"])
        a = {r["doc_id"]: list(r["pieces"]) for r in segmented.collect()}
        b = {r["doc_id"]: list(r["pieces"]) for r in enc.collect()}
        assert a == b

    def test_encode_plan_map_only(self, spark, docs):
        vocab, _ = train_unigram(docs, **PARAMS)
        flat = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id long, text string")
        plan = (
            apply_unigram(flat, vocab)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_empty_and_dict_vocab(self, spark):
        df = spark.createDataFrame([(1, "")], "doc_id long, text string")
        rows = apply_unigram(df, {"a": -1.0}).collect()
        assert rows[0]["pieces"] == [] and rows[0]["n_unk"] == 0


class TestTokenizerFertility:
    def test_exact_values_and_grouping(self, spark):
        from super_speedy_syslog_searcher_spark.operators.tokens import (
            apply_unigram,
            tokenizer_fertility,
            train_unigram,
        )

        rows = [
            (0, "en", "the cat sat"),
            (1, "en", "the mat sat"),
            (2, "de", "zz yy"),
        ]
        d = spark.createDataFrame(rows, "doc_id long, source string, text string")
        vocab, _ = train_unigram(
            d, vocab_size=30, max_piece_len=4, seed_size=40, n_rounds=1, min_freq=2
        )
        seg = apply_unigram(d, vocab, max_piece_len=4)
        got = {r["source"]: r for r in tokenizer_fertility(d, seg).collect()}
        seg_rows = {r["doc_id"]: r for r in seg.collect()}
        for src, ids in (("en", [0, 1]), ("de", [2])):
            n_pieces = sum(seg_rows[i]["n_pieces"] for i in ids)
            n_words = sum(len([w for w in rows[i][2].split() if w]) for i in ids)
            n_chars = sum(len(rows[i][2]) for i in ids)
            n_unk = sum(seg_rows[i]["n_unk"] for i in ids)
            r = got[src]
            assert r["n_docs"] == len(ids)
            assert r["n_pieces"] == n_pieces
            assert r["n_words"] == n_words and r["n_chars"] == n_chars
            assert r["fertility"] == round(n_pieces / n_words, 4)
            assert r["chars_per_piece"] == round(n_chars / n_pieces, 4)
            assert r["unk_rate"] == round(n_unk / n_pieces, 4)

    def test_missing_unk_column_defaults_zero(self, spark):
        from super_speedy_syslog_searcher_spark.operators.tokens import tokenizer_fertility

        d = spark.createDataFrame([(0, "s", "a b")], "doc_id long, source string, text string")
        seg = spark.createDataFrame([(0, ["a", " b"])], "doc_id long, pieces array<string>")
        r = tokenizer_fertility(d, seg).collect()[0]
        assert r["unk_rate"] == 0.0 and r["fertility"] == 1.0


class TestBatchViterbiKernel:
    def test_batch_equals_sequential_randomized(self):
        # no Spark needed: the numpy batch kernel must be bit-identical
        # to the sequential reference on random inputs — unicode mixed
        # in so both the packed-uint64 and rank-compression paths run
        import math
        import random

        from super_speedy_syslog_searcher_spark.operators.tokens import (
            _prep_unigram_vocab,
            _viterbi_segment,
            _viterbi_segment_batch,
        )

        rng = random.Random(99)
        alphabet = "ab cdeé中"
        pieces = ["a", "b", "c", "d", "e", " ", "é", "中",
                  "ab", "cd", "e ", "é中", "ab c", "deé",
                  "abcde", "zq"]
        vocab = {p: math.log((len(p) + rng.random()) / 50.0) for p in pieces}
        unk = math.log(1 / 777.0) - 10.0
        texts = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
            for _ in range(300)
        ] + ["", "zzzz", "ab" * 40, "中" * 7]
        prep = _prep_unigram_vocab(vocab, 5)
        got = _viterbi_segment_batch(texts, prep, 5, unk, chunk_cells=1500)
        for t, g in zip(texts, got):
            assert g == _viterbi_segment(t, vocab, 5, unk), repr(t)

    def test_tiny_chunk_budget_matches(self):
        # chunking must not change results (chunk boundaries per doc)
        import math

        from super_speedy_syslog_searcher_spark.operators.tokens import (
            _prep_unigram_vocab,
            _viterbi_segment_batch,
        )

        vocab = {"a": math.log(0.4), "b": math.log(0.3), "ab": math.log(0.3)}
        prep = _prep_unigram_vocab(vocab, 2)
        texts = ["abab", "b", "", "aaa", "ba"]
        a = _viterbi_segment_batch(texts, prep, 2, -9.0, chunk_cells=1)
        b = _viterbi_segment_batch(texts, prep, 2, -9.0, chunk_cells=10**6)
        assert a == b


class TestSeedSampling:
    def test_sampled_seed_deterministic_and_total(self, spark, docs):
        from super_speedy_syslog_searcher_spark.operators.tokens import train_unigram

        kw = dict(PARAMS)
        v1, seg1 = train_unigram(docs, seed_sample_ppm=500_000, **kw)
        v2, seg2 = train_unigram(docs.repartition(3), seed_sample_ppm=500_000, **kw)
        assert v1 == v2  # md5 doc-sample is layout-independent
        # segmentation stays total even for chars outside the seed
        # sample (unk single-char fallback)
        got = {r["doc_id"]: "".join(r["pieces"]) for r in seg1.collect()}
        for i, t in enumerate(TEXTS):
            assert got[i] == t
        # the sample genuinely dropped docs: the sampled seed vocab
        # differs from the full-corpus seed's
        full_v, _ = train_unigram(docs, **kw)
        assert {p for p, _, _ in v1} != {p for p, _, _ in full_v}


class TestPackedGuardOverflow:
    def test_large_alphabet_falls_back_exactly(self):
        # review r4.4 #2: numpy uint64 power wraps (1650**6 mod 2**64 <
        # 2**62), which would falsely enable the packed-key path past
        # the injectivity bound. With >=1650 distinct codepoints at
        # L=6 the guard must fall back to the void path and still match
        # the sequential kernel exactly.
        import math
        import random

        from super_speedy_syslog_searcher_spark.operators.tokens import (
            _prep_unigram_vocab,
            _viterbi_segment,
            _viterbi_segment_batch,
        )

        assert int(np_uint64_pow(1650, 6)) < (1 << 62)  # the wrap itself
        rng = random.Random(3)
        alphabet = [chr(0x4E00 + i) for i in range(1700)]
        vocab = {c: math.log(1 / 2000.0) for c in alphabet[:100]}
        vocab["".join(alphabet[:2])] = math.log(0.3)
        texts = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 50)))
            for _ in range(60)
        ]
        prep = _prep_unigram_vocab(vocab, 6)
        got = _viterbi_segment_batch(texts, prep, 6, -15.0)
        for t, g in zip(texts, got):
            assert g == _viterbi_segment(t, vocab, 6, -15.0)

    def test_seed_sample_error_names_the_knob(self, spark):
        import pytest as _pytest

        from super_speedy_syslog_searcher_spark.operators.tokens import train_unigram

        d = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="seed_sample_ppm"):
            train_unigram(d, seed_sample_ppm=0, vocab_size=10)


def np_uint64_pow(b: int, e: int) -> int:
    import numpy as np

    return int(np.uint64(b) ** np.uint64(e))


class TestApplyUnigramIds:
    def test_ids_roundtrip_and_unk_id(self, spark, docs):
        from super_speedy_syslog_searcher_spark.operators.tokens import (
            apply_unigram,
            train_unigram,
        )

        vocab, _ = train_unigram(docs, **PARAMS)
        id_of = {p: i for i, (p, _c, _lp) in enumerate(vocab)}
        new = spark.createDataFrame(
            [(1, "the cat sat"), (2, "zq!")], "doc_id long, text string"
        )
        rows = {
            r["doc_id"]: r
            for r in apply_unigram(new, vocab, max_piece_len=5, emit_ids=True).collect()
        }
        r1 = rows[1]
        assert list(r1["tokens"]) == [id_of[p] for p in r1["pieces"]]
        assert len(r1["tokens"]) == r1["n_pieces"]
        # unknown chars -> the reserved id len(vocab)
        r2 = rows[2]
        assert any(t == len(vocab) for t in r2["tokens"])
        assert r2["n_unk"] == sum(1 for t in r2["tokens"] if t == len(vocab))

    def test_ids_feed_token_operators(self, spark, docs):
        from super_speedy_syslog_searcher_spark.operators.tokens import (
            apply_unigram,
            train_unigram,
            vocab_stats,
        )
        from pyspark.sql import functions as F

        vocab, _ = train_unigram(docs, **PARAMS)
        enc = apply_unigram(docs, vocab, max_piece_len=5, emit_ids=True).select(
            F.col("doc_id").cast("string").alias("doc_id"),
            "tokens",
            F.col("n_pieces").alias("n_tok"),
        )
        vs = vocab_stats(enc)
        assert vs.count() > 0  # composes with the token-domain surface
