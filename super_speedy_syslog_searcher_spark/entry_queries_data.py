"""Driver-contract queries for the training-data operators (dedup,
similarity search, text analysis, multimodal) over the ``documents`` and
``embeddings`` tables, each with a DuckDB oracle.

The synthetic corpus has no near-duplicates, so the dedup queries
self-seed them: both the Spark side and the SQL oracle extend the corpus
with (a) exact copies of docs 0-24 and (b) tail-mutated copies of docs
25-49 — identical string operations on both sides, so expected pairs are
derivable in pure SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .operators.multimodal import extract_media_meta
from .operators.similarity import cosine_dup_pairs, cosine_topk, cosine_topk_lsh
from .operators.textstats import (
    content_fingerprint,
    langid,
    make_winnow_udf,
    quality_stats,
    token_counts,
)

MUT_TAIL = " zz extra tail tokens appended"

SQL_DOCS2 = f"""
docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 25
  UNION ALL SELECT doc_id + 200000 AS doc_id, text || '{MUT_TAIL}' AS text
    FROM documents WHERE doc_id >= 25 AND doc_id < 50
)
"""


def _docs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    exact = d.filter(F.col("doc_id") < 25).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    near = d.filter((F.col("doc_id") >= 25) & (F.col("doc_id") < 50)).select(
        (F.col("doc_id") + 200000).alias("doc_id"), F.concat(F.col("text"), F.lit(MUT_TAIL)).alias("text")
    )
    return d.unionByName(exact).unionByName(near)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    dup = e.filter(F.col("vec_id") < 10).select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    return e.unionByName(dup)


SQL_EMBS2 = """
embs2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 10
)
"""


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(_docs2(spark, sf_dir))


SQL_DEDUP_EXACT = f"""
WITH {SQL_DOCS2}
SELECT min(doc_id) AS keeper, count(*) AS n_copies, md5(text) AS fp
FROM docs2 GROUP BY text
"""


_SQL_JACCARD_BODY = f"""
WITH {SQL_DOCS2},
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM docs2),
grams AS (
  SELECT DISTINCT doc_id, ws[x] || ' ' || ws[x+1] || ' ' || ws[x+2] AS g
  FROM w, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS t(x)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
rare AS (SELECT g FROM grams GROUP BY g HAVING count(*) <= 50),
gr AS (SELECT doc_id, g FROM grams WHERE g IN (SELECT g FROM rare)),
inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
  FROM gr l JOIN gr r ON l.g = r.g AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b, round(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 4) AS j
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE round(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 4) >= 0.6
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs2(spark, sf_dir), threshold=0.6, max_df=50)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-pruned near-dup pairs, verified with exact Jaccard — output
    contract equals the exhaustive query, cost does not."""
    return minhash_lsh_dedup_pairs(_docs2(spark, sf_dir), threshold=0.6)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming ≤ 3 pairs (no SQL oracle — hash not expressible;
    property: every exact-copy pair (d, d+100000), d<25, must appear with
    hamming 0. Checked by tests/test_dedup.py)."""
    return simhash_pairs(_docs2(spark, sf_dir), max_hamming=3)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_stats(_docs(spark, sf_dir))


SQL_TEXT_QUALITY = """
WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
  length(text) AS n_chars,
  len(ws) AS n_words,
  round(list_sum(list_transform(ws, x -> length(x))) * 1.0 / len(ws), 4) AS avg_word_len,
  round(len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(ws), 4) AS stop_ratio,
  round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))) * 1.0 / length(text), 4) AS punct_ratio,
  CASE WHEN len(ws) >= 10
        AND round(list_sum(list_transform(ws, x -> length(x))) * 1.0 / len(ws), 4) >= 2.0
        AND round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))) * 1.0 / length(text), 4) <= 0.2
       THEN 1 ELSE 0 END AS keep
FROM w
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return langid(_docs(spark, sf_dir))


SQL_TEXT_LANGID = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
  round(len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(ws), 4) AS en_score,
  CASE WHEN round(len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(ws), 4) > 0.02
       THEN 'en' ELSE 'unk' END AS predicted_lang
FROM w
"""


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(_docs(spark, sf_dir))


SQL_TEXT_TOKEN_COUNT = """
SELECT doc_id,
  len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return content_fingerprint(_docs(spark, sf_dir))


SQL_DOC_FINGERPRINT = """
SELECT doc_id,
  md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp,
  length(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_len
FROM documents
"""


def q_doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (rows-only check — rolling
    hash is not ANSI-SQL-expressible; covered by unit tests)."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", make_winnow_udf()(F.col("text")).alias("fps"), F.size(make_winnow_udf()(F.col("text"))).alias("n_fp"))


# ---------------------------------------------------------------------------
# similarity / ANN
# ---------------------------------------------------------------------------
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    return cosine_topk(e, q, k=5).withColumn("rank", F.col("rank").cast("bigint"))


SQL_ANN_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
  FROM q CROSS JOIN c WHERE neighbor_id != query_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""


def q_ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN (rows-only: approximate recall by design;
    tests assert recall ≥ 0.6 vs the exact query)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    return cosine_topk_lsh(e, q, k=5)


def q_embed_cosine_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_dup_pairs(_embs2(spark, sf_dir), threshold=0.99)


SQL_EMBED_COSINE_DUP = f"""
WITH {SQL_EMBS2},
d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embs2)
SELECT l.vec_id AS a, r.vec_id AS b
FROM d l CROSS JOIN d r
WHERE l.vec_id < r.vec_id AND list_cosine_similarity(l.v, r.v) >= 0.99
"""


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------
def q_multimodal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.col("text").cast("binary").alias("payload"),
    )
    return extract_media_meta(media).select("media_id", "kind", "n_bytes", "header_byte", "width", "height", "duration_ms")


SQL_MULTIMODAL_EXTRACT = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  strlen(text) AS n_bytes,
  CAST(CASE WHEN strlen(text) > 0 THEN ascii(substr(text, 1, 1)) END AS INT) AS header_byte,
  CAST(CASE WHEN doc_id % 3 = 0 AND strlen(text) > 0 THEN ascii(substr(text, 1, 1)) * 4 + 32 END AS INT) AS width,
  CAST(CASE WHEN doc_id % 3 = 0 AND strlen(text) > 0 THEN ascii(substr(text, 2, 1)) * 2 + 16 END AS INT) AS height,
  CAST(CASE WHEN doc_id % 3 != 0 AND strlen(text) > 0 THEN strlen(text) * 10 END AS BIGINT) AS duration_ms
FROM documents
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_token_count": q_text_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_winnow": q_doc_winnow,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_cosine_topk_lsh": q_ann_cosine_topk_lsh,
    "embed_cosine_dup": q_embed_cosine_dup,
    "multimodal_extract": q_multimodal_extract,
}

ORACLES = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_ngram_jaccard": _SQL_JACCARD_BODY,
    "dedup_minhash_lsh": _SQL_JACCARD_BODY,
    "text_quality": SQL_TEXT_QUALITY,
    "text_langid": SQL_TEXT_LANGID,
    "text_token_count": SQL_TEXT_TOKEN_COUNT,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "embed_cosine_dup": SQL_EMBED_COSINE_DUP,
    "multimodal_extract": SQL_MULTIMODAL_EXTRACT,
}
