"""Property-based equivalence for the vectorized Viterbi kernel (no
Spark session — pure numpy vs the sequential python reference).

Hypothesis drives text shape, vocabulary composition, piece lengths,
and the chunk budget; the batch kernel must reproduce the sequential
kernel's segmentation EXACTLY (same float64 scores, same longest-piece
tie-break), across both the packed-uint64 and void-record lookup paths.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from super_speedy_syslog_searcher_spark.operators.tokens import (
    _prep_unigram_vocab,
    _viterbi_segment,
    _viterbi_segment_batch,
)

# small alphabet (packed path) + astral/CJK (rank table still packed,
# exercises multi-byte codepoints)
ALPHA = st.sampled_from(list("ab c") + ["é", "中", "\U0001f600"])
TEXT = st.lists(ALPHA, min_size=0, max_size=40).map("".join)


@st.composite
def vocab_and_texts(draw):
    pieces = draw(
        st.lists(
            st.lists(ALPHA, min_size=1, max_size=4).map("".join),
            min_size=1,
            max_size=12,
            unique=True,
        )
    )
    # deterministic scores derived from the piece content, not RNG
    vocab = {
        p: math.log((sum(ord(c) for c in p) % 97 + 1) / 1000.0) for p in pieces
    }
    texts = draw(st.lists(TEXT, min_size=1, max_size=12))
    chunk = draw(st.sampled_from([1, 7, 10**6]))
    return vocab, texts, chunk


@settings(max_examples=120, deadline=None)
@given(vocab_and_texts())
def test_batch_kernel_equals_sequential(case):
    vocab, texts, chunk = case
    L = max(len(p) for p in vocab)
    unk = math.log(1 / 333.0) - 10.0
    prep = _prep_unigram_vocab(vocab, L)
    got = _viterbi_segment_batch(texts, prep, L, unk, chunk_cells=chunk)
    for t, g in zip(texts, got):
        ref = _viterbi_segment(t, vocab, L, unk)
        assert g == ref, (t, g, ref)
        assert "".join(g) == t  # lossless under any vocab
