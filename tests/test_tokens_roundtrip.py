"""Tokenizer round-trips: decode_bpe / decode_unigram invert the encoders."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark.operators.tokens import (
    apply_bpe,
    apply_unigram,
    decode_bpe,
    decode_unigram,
    train_bpe,
    train_unigram,
)


def _token_docs(spark, n=30, seed=4, vmax=12):
    rng = np.random.default_rng(seed)
    rows = [
        (f"d{i:03d}", [int(x) for x in rng.integers(0, vmax, size=rng.integers(2, 40))])
        for i in range(n)
    ]
    rows.append(("d_empty", []))
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>"), dict(rows)


def _twin_expand(ids, tab):
    out = []
    for t in ids:
        if t in tab:
            left, right = tab[t]
            out.extend(_twin_expand([left, right], tab))
        else:
            out.append(t)
    return out


class TestBpeRoundtrip:
    def test_decode_inverts_apply(self, spark):
        docs, originals = _token_docs(spark, seed=4)
        merges, rewritten = train_bpe(docs, num_merges=8, min_freq=2)
        assert merges, "fixture must learn at least one merge"
        fresh, fresh_orig = _token_docs(spark, seed=99)
        enc = apply_bpe(fresh, merges)
        # encoding actually changed something (else the test is vacuous)
        changed = enc.join(
            fresh.withColumnRenamed("tokens", "orig"), "doc_id"
        ).filter(F.col("tokens") != F.col("orig"))
        assert changed.count() > 0
        dec = {r["doc_id"]: list(r["tokens"]) for r in decode_bpe(enc, merges).collect()}
        assert dec == {k: list(v) for k, v in fresh_orig.items()}

    def test_decode_inverts_trainings_own_corpus(self, spark):
        docs, originals = _token_docs(spark, seed=7)
        merges, rewritten = train_bpe(docs, num_merges=6, min_freq=2)
        dec = {
            r["doc_id"]: list(r["tokens"]) for r in decode_bpe(rewritten, merges).collect()
        }
        assert dec == {k: list(v) for k, v in originals.items()}

    def test_matches_scalar_expansion_twin(self, spark):
        docs, _ = _token_docs(spark, seed=11)
        merges, rewritten = train_bpe(docs, num_merges=8, min_freq=2)
        tab = {int(m[3]): (int(m[1]), int(m[2])) for m in merges}
        enc_rows = rewritten.collect()
        got = {r["doc_id"]: list(r["tokens"]) for r in decode_bpe(rewritten, merges).collect()}
        for r in enc_rows:
            assert got[r["doc_id"]] == _twin_expand(list(r["tokens"]), tab), r["doc_id"]

    def test_nested_merges_expand_fully(self, spark):
        """Merges whose outputs feed later merges (depth > 1)."""
        df = spark.createDataFrame(
            [("a", [1, 2, 1, 2, 1, 2, 3])], "doc_id string, tokens array<int>"
        )
        merges = [(1, 2, 10), (10, 10, 11)]  # 11 -> 10,10 -> 1,2,1,2
        enc = apply_bpe(df, merges)
        assert list(enc.first()["tokens"]) == [11, 10, 3]
        dec = decode_bpe(enc, merges)
        assert list(dec.first()["tokens"]) == [1, 2, 1, 2, 1, 2, 3]

    def test_empty_merge_table_is_identity(self, spark):
        docs, originals = _token_docs(spark, seed=13)
        dec = {r["doc_id"]: list(r["tokens"]) for r in decode_bpe(docs, []).collect()}
        assert dec == {k: list(v) for k, v in originals.items()}


class TestUnigramRoundtrip:
    def test_decode_inverts_encode_when_unk_free(self, spark):
        texts = [
            ("a", "abcabcababc"),
            ("b", "cabcab"),
            ("c", "aabbcc"),
            ("d", "abc"),
        ]
        df = spark.createDataFrame(texts, "doc_id string, text string")
        vocab, _ = train_unigram(df, vocab_size=8, max_piece_len=3)
        enc = apply_unigram(df, vocab, max_piece_len=3, emit_ids=True)
        dec = {
            r["doc_id"]: (r["text"], r["n_unk"])
            for r in decode_unigram(enc, vocab).collect()
        }
        for doc_id, text in texts:
            assert dec[doc_id] == (text, 0), doc_id

    def test_unk_documents_decode_null_and_counted(self, spark):
        train = spark.createDataFrame(
            [("a", "ababab"), ("b", "babab")], "doc_id string, text string"
        )
        vocab, _ = train_unigram(train, vocab_size=6, max_piece_len=2)
        probe = spark.createDataFrame(
            [("x", "abZab"), ("y", "abab")], "doc_id string, text string"
        )
        enc = apply_unigram(probe, vocab, max_piece_len=2, emit_ids=True)
        dec = {r["doc_id"]: r for r in decode_unigram(enc, vocab).collect()}
        assert dec["x"]["text"] is None and dec["x"]["n_unk"] >= 1
        assert dec["y"]["text"] == "abab" and dec["y"]["n_unk"] == 0

    def test_decoder_mirrors_encoder_id_rule_on_reordered_vocab(self, spark):
        """The id is the vocab LIST's own position (the encoder's rule) —
        a caller-reordered vocab must still roundtrip."""
        df = spark.createDataFrame(
            [("a", "abcabcab"), ("b", "cbacba")], "doc_id string, text string"
        )
        vocab, _ = train_unigram(df, vocab_size=6, max_piece_len=2)
        reordered = list(reversed(vocab))
        enc = apply_unigram(df, reordered, max_piece_len=2, emit_ids=True)
        dec = {r["doc_id"]: r["text"] for r in decode_unigram(enc, reordered).collect()}
        assert dec == {"a": "abcabcab", "b": "cbacba"}
