"""Embedding similarity search (ANN) over an ``array<float>`` column.

* brute-force cosine top-k — the correctness baseline: JVM-side dot
  product (``zip_with`` + ``aggregate``), broadcast of the (small) query
  set, rank window per query. No Python in the loop.
* LSH-bucketed variant (random hyperplane signs) — the scale path: each
  vector lands in 2^p sign-buckets; only bucket-mates are compared, so
  cost is ~corpus/2^p per query instead of corpus. Recall is tunable with
  multiple tables (OR-amplification).
* cosine near-dup pairs — all pairs ≥ τ via the same bucket trick.

All arithmetic in DOUBLE with a fixed left-to-right fold so results are
bitwise-reproducible (and comparable against the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_col(a, b) -> Column:
    """Σ aᵢ·bᵢ in double, sequential fold (deterministic)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm_col(a) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a, b) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k corpus neighbors per query vector (self excluded).

    Output: (query_id, rank, neighbor_id). The query side is broadcast —
    at 100 TB the corpus never shuffles; each partition scores its share
    and the final top-k reduces per query.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_col(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def cosine_dup_pairs(
    vecs: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold → (a, b).

    For the near-exact threshold regime the candidate space is pruned with
    sign-LSH buckets (16 hyperplanes ⇒ near-identical vectors share the
    full sign pattern); each bucket is tiny so the within-bucket pair join
    is bounded. Deterministic hyperplanes (seeded, broadcast as literals).
    """
    import numpy as np

    dim_row = vecs.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        return vecs.sparkSession.createDataFrame([], "a long, b long")
    dim = dim_row["d"]
    rng = np.random.RandomState(42)
    planes = rng.randn(16, dim)

    def sign_bits(vc) -> Column:
        bits = None
        for i in range(planes.shape[0]):
            arr = F.array(*[F.lit(float(x)) for x in planes[i]])
            s = F.when(dot_col(vc, arr) >= 0, F.lit(1)).otherwise(F.lit(0))
            bits = s if bits is None else bits * 2 + s
        return bits

    b = vecs.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "bucket", sign_bits(F.col("v"))
    )
    l = b.select(F.col("id").alias("a"), F.col("v").alias("va"), "bucket")
    r = b.select(F.col("id").alias("b"), F.col("v").alias("vb"), "bucket")
    return (
        l.join(r, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("sim", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("a", "b")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing a sign-LSH
    bucket with the query in ≥1 of ``n_tables`` hash tables.

    Scale path for ANN: per query ~corpus·n_tables/2^n_planes candidates.
    Output schema matches ``cosine_topk`` (ranks may differ where recall
    misses — that is the accuracy/cost dial).
    """
    import numpy as np

    dim_row = corpus.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        return corpus.sparkSession.createDataFrame([], "query_id long, rank int, neighbor_id long")
    dim = dim_row["d"]
    rng = np.random.RandomState(7)

    def table_bucket(vc, planes) -> Column:
        bits = None
        for i in range(planes.shape[0]):
            arr = F.array(*[F.lit(float(x)) for x in planes[i]])
            s = F.when(dot_col(vc, arr) >= 0, F.lit(1)).otherwise(F.lit(0))
            bits = s if bits is None else bits * 2 + s
        return bits

    tables = [rng.randn(n_planes, dim) for _ in range(n_tables)]
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cb = c.select(
        "neighbor_id", "cv",
        F.explode(F.array(*[F.struct(F.lit(t).alias("t"), table_bucket(F.col("cv"), tables[t]).alias("bk")) for t in range(n_tables)])).alias("tb"),
    ).select("neighbor_id", "cv", F.col("tb.t").alias("t"), F.col("tb.bk").alias("bk"))
    qb = q.select(
        "query_id", "qv",
        F.explode(F.array(*[F.struct(F.lit(t).alias("t"), table_bucket(F.col("qv"), tables[t]).alias("bk")) for t in range(n_tables)])).alias("tb"),
    ).select("query_id", "qv", F.col("tb.t").alias("t"), F.col("tb.bk").alias("bk"))
    cand = cb.join(F.broadcast(qb), ["t", "bk"]).filter(F.col("neighbor_id") != F.col("query_id"))
    cand = cand.select("query_id", "qv", "neighbor_id", "cv").distinct()
    scored = cand.withColumn("sim", cosine_col(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
