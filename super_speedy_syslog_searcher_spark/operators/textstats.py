"""Text analysis for training-data curation — all JVM-side Column
expressions (whole-stage codegen, no Python in the hot path).

* quality scoring: length / word / punctuation / stopword ratios
* language-ID: stopword-marker heuristic (deterministic, SQL-mirrorable)
* token counting: whitespace tokens + a BPE-ish regex segmentation
* document fingerprinting: normalized-content hash (md5) and a winnowing
  rolling-hash variant (pandas UDF — the one non-SQL-expressible op here)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# BPE-ish segmentation: letter runs | digit runs | any other non-space char
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def words_col(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def n_words_col(text_col: str) -> Column:
    return F.size(words_col(text_col))


def stop_ratio_col(text_col: str) -> Column:
    w = words_col(text_col)
    stops = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    return F.round(stops / F.size(w), 4)


def punct_ratio_col(text_col: str) -> Column:
    total = F.length(F.col(text_col))
    no_punct = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9 ]", ""))
    return F.round((total - no_punct) / total, 4)


def avg_word_len_col(text_col: str) -> Column:
    w = words_col(text_col)
    return F.round(F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x)) / F.size(w), 4)


def quality_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc curation metrics + a simple keep/drop flag."""
    out = df.select(
        F.col(id_col),
        F.length(text_col).cast("bigint").alias("n_chars"),
        n_words_col(text_col).cast("bigint").alias("n_words"),
        avg_word_len_col(text_col).alias("avg_word_len"),
        stop_ratio_col(text_col).alias("stop_ratio"),
        punct_ratio_col(text_col).alias("punct_ratio"),
    )
    keep = (F.col("n_words") >= 10) & (F.col("avg_word_len") >= 2.0) & (F.col("punct_ratio") <= 0.2)
    return out.withColumn("keep", keep.cast("int"))


def langid(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-marker language heuristic: en_score = en-stopword share of
    words; predicted 'en' above threshold else 'unk'. (A production
    pipeline would use per-language n-gram profiles — the *shape* is the
    same: one narrow pass, scores per language, argmax.)"""
    w = words_col(text_col)
    en = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    score = F.round(en / F.size(w), 4)
    return df.select(
        F.col(id_col),
        score.alias("en_score"),
        F.when(score > F.lit(0.02), "en").otherwise("unk").alias("predicted_lang"),
    )


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    ws = F.size(F.split(F.trim(F.col(text_col)), "\\s+")).cast("bigint")
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)).cast("bigint")
    return df.select(F.col(id_col), ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def content_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Canonical content hash: lowercase, collapse whitespace, md5."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    return df.select(F.col(id_col), F.md5(norm.cast("binary")).alias("fp"), F.length(norm).cast("bigint").alias("norm_len"))


def make_winnow_udf(k: int = 5, window: int = 8):
    """Winnowing fingerprints (Schleimer et al.): k-gram rolling hashes,
    min per window → sorted distinct fingerprint array. Not expressible in
    ANSI SQL — covered by unit tests instead of the DuckDB oracle."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _winnow(text: pd.Series) -> pd.Series:
        out = []
        B = np.uint64(0x100000001B3)  # odd multiplier; arithmetic mod 2^64
        err = np.seterr(over="ignore")  # uint64 wraparound IS the modulus
        try:
            for t in text:
                s = (t or "").lower().encode()
                if len(s) < k:
                    out.append([])
                    continue
                vals = np.frombuffer(s, dtype=np.uint8).astype(np.uint64)
                win = np.lib.stride_tricks.sliding_window_view(vals, k)
                h = np.zeros(len(win), dtype=np.uint64)
                for j in range(k):  # k vector ops, no per-position loop
                    h = h * B + win[:, j]
                if len(h) <= window:
                    picks = {int(np.int64(h.min()))}
                else:
                    roll = np.lib.stride_tricks.sliding_window_view(h, window)
                    picks = set(roll.min(axis=1).astype(np.int64).tolist())
                out.append(sorted(picks))
        finally:
            np.seterr(**err)
        return pd.Series(out)

    return _winnow
