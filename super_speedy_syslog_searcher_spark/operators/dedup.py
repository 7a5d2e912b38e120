"""Deduplication operators for large-scale training-data pipelines.

Four escalating strategies over a ``(id, text)`` document table:

* **exact** — hash-groupBy on a content fingerprint; one shuffle keyed by
  the fingerprint, so identical docs co-locate regardless of corpus size.
* **n-gram Jaccard** — word-shingle set similarity via an inverted-index
  self-join (explode distinct shingles → join on shingle → per-pair
  intersection counts). Hot shingles are capped (``max_df``) exactly like
  production near-dup pipelines cap stop-shingles, keeping the join skew
  bounded at 100 TB.
* **MinHash + LSH** — vectorized signature UDF (numpy, k permutations),
  banded into LSH buckets; candidate pairs from bucket joins are verified
  with exact Jaccard so output quality equals the exact method at ~1/N²
  of its cost. Scale path: only bucket-mates are ever paired.
* **SimHash** — 64-bit weighted-bit fingerprint; near-dup = Hamming ≤ k,
  banded (4×16 bit) for candidate generation without a full cross join.

The reference has no dedup (it is a log merger), but the engine's target
workload (BASELINE.json: tokenized training sequences) makes dedup a
first-class operator; the shuffle/skew design follows the same doctrine as
the merge operator (explicit keys, bounded hot keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------
def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical texts: (keeper, n_copies, fp). keeper = min(id).

    One shuffle on the md5 fingerprint; at scale the fingerprint groupBy
    beats groupBy(text) because shuffle keys stay 16 bytes.
    """
    fp = F.md5(F.col(text_col).cast("binary")).alias("fp")
    return (
        df.select(F.col(id_col), fp)
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_copies"))
        .select("keeper", "n_copies", "fp")
    )


# ---------------------------------------------------------------------------
# word shingles (JVM-side, no UDF)
# ---------------------------------------------------------------------------
def word_ngrams_col(text_col: str, n: int = 3) -> Column:
    """array of word n-grams, built with JVM transform/sequence."""
    w = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(w) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + k + 1) for k in range(n)]))
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))


def shingle_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, gram) — distinct word n-grams per doc (the inverted index)."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(word_ngrams_col(text_col, n))).alias("gram"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int = 50,
) -> DataFrame:
    """All pairs (a < b) with word-n-gram Jaccard ≥ threshold.

    Inverted-index join; shingles present in more than ``max_df`` docs are
    dropped from candidate generation (skew cap — a stop-shingle shared by
    10⁶ docs would otherwise create 10¹² candidate rows).
    Output: (a, b, j) with j rounded to 4 decimals.
    """
    grams = shingle_table(df, id_col, text_col, n)
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    rare = grams.join(
        grams.groupBy("gram").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df).select("gram"),
        "gram",
    )
    a = rare.select(F.col("id").alias("a"), "gram")
    b = rare.select(F.col("id").alias("b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "na"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "nb"), "b")
        .withColumn("j", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("j") >= threshold)
    )
    return j.select("a", "b", "j")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
_MERSENNE = (1 << 61) - 1


def _perm_params(k: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64)
    return a, b


def _gram_hashes(text: str, n: int) -> np.ndarray:
    words = text.split(" ")
    if len(words) < n:
        return np.array([], dtype=np.uint64)
    grams = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
    # deterministic 64-bit FNV-1a per gram (no PYTHONHASHSEED dependence)
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h = np.uint64(0xCBF29CE484222325)
        for ch in g.encode():
            h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def make_minhash_udf(k: int = 256, n: int = 3, seed: int = 42):
    """Arrow-batched UDF: text → array<long> of k min-hashes."""
    a, b = _perm_params(k, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _minhash(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            gh = _gram_hashes(t or "", n)
            if len(gh) == 0:
                out.append([0] * k)
                continue
            # (a*h + b) mod p, min over grams, vectorized over k × grams
            hv = (gh % np.uint64(_MERSENNE)).astype(np.int64)
            m = (a[:, None] * hv[None, :] + b[:, None]) % _MERSENNE
            out.append(m.min(axis=1).tolist())
        return pd.Series(out)

    return _minhash


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 256,
    bands: int = 64,
    n: int = 3,
) -> DataFrame:
    """Candidate pairs (a < b) sharing ≥1 LSH band bucket.

    bands × rows-per-band = k; P(candidate | jaccard=j) = 1-(1-j^r)^b.
    Bucket join only — never a cross join.
    """
    r = k // bands
    sig = df.select(F.col(id_col).alias("id"), make_minhash_udf(k=k, n=n)(F.col(text_col)).alias("sig"))
    banded = (
        sig.select("id", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"), "sig")
        .withColumn("bucket", F.xxhash64(F.col("band"), F.slice("sig", F.col("band") * r + 1, r).cast("string")))
        .select("id", "bucket")
    )
    a = banded.select(F.col("id").alias("a"), "bucket")
    b = banded.select(F.col("id").alias("b"), "bucket")
    return a.join(b, "bucket").filter(F.col("a") < F.col("b")).select("a", "b").distinct()


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 256,
    bands: int = 64,
    n: int = 3,
) -> DataFrame:
    """LSH candidates verified with exact word-n-gram Jaccard → (a, b, j).

    Same output contract as ``ngram_jaccard_pairs`` (the LSH pass only
    prunes the pair space; with k=256/bands=64 recall at j≥0.6 is
    1-(1-0.6⁴)^64 ≈ 0.9999).
    """
    cand = lsh_candidate_pairs(df, id_col, text_col, k=k, bands=bands, n=n)
    grams = shingle_table(df, id_col, text_col, n)
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    ga = grams.select(F.col("id").alias("a"), "gram")
    gb = grams.select(F.col("id").alias("b"), "gram")
    inter = (
        cand.join(ga, "a")
        .join(gb, ["b", "gram"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "na"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "nb"), "b")
        .withColumn("j", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("j") >= threshold)
        .select("a", "b", "j")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def make_simhash_udf(seed: int = 42):
    """text → 64-bit simhash (long) over FNV-hashed words."""

    @F.pandas_udf(T.LongType())
    def _simhash(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            words = (t or "").split(" ")
            if not words:
                continue
            hs = np.empty(len(words), dtype=np.uint64)
            for wi, w in enumerate(words):
                h = np.uint64(0xCBF29CE484222325)
                for ch in w.encode():
                    h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
                hs[wi] = h
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int32)
            vote = (2 * bits - 1).sum(axis=0)
            sh = np.uint64(0)
            for bpos in np.flatnonzero(vote > 0):
                sh |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(sh.astype(np.int64))
        return pd.Series(out)

    return _simhash


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs (a < b) with simhash Hamming distance ≤ max_hamming.

    Candidate generation by 4×16-bit band equality (any pair within
    Hamming ≤ 3 of a 64-bit key shares ≥1 exact 16-bit quarter — pigeonhole),
    then exact popcount verify. No cross join.
    """
    sh = df.select(F.col(id_col).alias("id"), make_simhash_udf()(F.col(text_col)).alias("sh"))
    bands = sh.select(
        "id", "sh", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band")
    ).withColumn("key", F.concat_ws(":", "band", F.expr("shiftrightunsigned(sh, band * 16) & 65535")))
    a = bands.select(F.col("id").alias("a"), F.col("sh").alias("sha"), "key")
    b = bands.select(F.col("id").alias("b"), F.col("sh").alias("shb"), "key")
    cand = a.join(b, "key").filter(F.col("a") < F.col("b")).select("a", "b", "sha", "shb").distinct()
    ham = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select("a", "b", "hamming")
