"""Enrichment: broadcast-join the source → (facility, severity) lookup.

The reference keys per-file output state (printer, color) by ``PathId``
(map_pathid_printer, /root/reference/src/bin/s4.rs:3397-3418); the
north_star generalizes this to a source-keyed enrichment map feeding the
routing key. The lookup is tiny → ALWAYS broadcast (no shuffle of the fact
side); unmatched sources default to ``facility='unknown', severity='info'``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEVERITY_CLASS = {
    "debug": "dbg",
    "info": "info",
    "notice": "info",
    "warning": "warn",
    "err": "err",
    "crit": "err",
    "alert": "err",
    "emerg": "err",
}


def severity_class_col(sev_col) -> F.Column:
    expr = None
    for sev, cls in SEVERITY_CLASS.items():
        expr = F.when(sev_col == sev, cls) if expr is None else expr.when(sev_col == sev, cls)
    return expr.otherwise("info")


def enrich(messages: DataFrame, lookup: DataFrame) -> DataFrame:
    """messages ⟕ lookup on ``source`` (broadcast), fill defaults, compute
    ``sink_key = facility + '.' + severity_class``."""
    look = lookup.select(
        "source",
        F.col("facility").alias("_facility"),
        F.col("severity").alias("_severity"),
    )
    out = messages.join(F.broadcast(look), "source", "left")
    facility = F.coalesce(F.col("_facility"), F.lit("unknown"))
    severity = F.coalesce(F.col("_severity"), F.lit("info"))
    return (
        out.withColumn("facility", facility)
        .withColumn("severity", severity)
        .withColumn("sink_key", F.concat_ws(".", F.col("facility"), severity_class_col(F.col("severity"))))
        .drop("_facility", "_severity")
    )


def asof_enrich(
    messages: DataFrame,
    dim_history: DataFrame,
    key_col: str = "source",
    ts_col: str = "ts",
    valid_from_col: str = "valid_from",
) -> DataFrame:
    """Temporal (AS-OF) enrichment: each message joins the dimension
    VERSION in effect at its own timestamp — the most recent
    ``dim_history`` row per key with ``valid_from <= ts`` (an SCD-2
    slowly-changing-dimension join; kdb asof / Flink temporal-table
    semantics). Messages older than every version get NULL attributes
    (no version was in effect yet).

    Spark has no native as-of join; the usual emulations either shuffle
    both sides into a union-window (a per-key window over the FACT
    stream — unbounded partitions at 100 TB) or range-join and
    aggregate. This implementation exploits what makes dimension
    history a dimension: versions-per-key is BOUNDED (config changes
    are rare next to events). The history collapses to one sorted
    array of versions per key (a |dim|-row table), broadcasts, and each
    fact row picks ``element_at(filter(versions, v.valid_from <= ts),
    -1)`` — map-only, zero fact shuffle, O(versions-per-key) per row in
    whole-stage codegen. Ties on ``valid_from`` resolve to the
    later-sorted struct (deterministic: structs sort by every field).

    Returns the fact columns plus every non-key dimension attribute.
    """
    attrs = [c for c in dim_history.columns if c not in (key_col, valid_from_col)]
    hist = dim_history.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(valid_from_col).alias("_vf"), *attrs))
        ).alias("_hist")
    )
    joined = messages.join(F.broadcast(hist), key_col, "left")
    # try_element_at: ANSI mode makes element_at(-1) THROW on the empty
    # array a too-early message produces — NULL is the contract here
    picked = F.try_element_at(
        F.filter("_hist", lambda v: v["_vf"] <= F.col(ts_col)), F.lit(-1)
    )
    out = joined
    for a in attrs:
        out = out.withColumn(a, picked[a])
    return out.drop("_hist")


def cidr_enrich(
    facts: DataFrame,
    cidr_table: DataFrame,
    ip_col: str = "ip",
    cidr_col: str = "cidr",
) -> DataFrame:
    """Longest-prefix-match CIDR enrichment — the range-join shape of
    log pipelines (IP → network/geo/tenant): each fact row joins the
    most specific ``cidr_table`` block containing its IPv4 address.

    A naive range join (ip BETWEEN net_lo AND net_hi) is a theta join —
    quadratic without an interval index. This implementation exploits
    CIDR structure instead: the table holds only a handful of DISTINCT
    prefix lengths (collected once, ≤32), and for each one the fact's
    candidate network is computable in place
    (``ip_int - ip_int mod 2^(32-plen)``). The operator emits one
    broadcast left join PER DISTINCT PREFIX LENGTH, descending, and
    coalesces the first match — longest prefix wins, the fact stream
    never shuffles, and every join is an equi-join on the network key
    (codegen'd BroadcastHashJoin). Unmatched rows carry NULL attributes.

    Returns the fact columns plus the dimension attributes and the
    matched ``cidr``/``prefix_len``.
    """
    attrs = [c for c in cidr_table.columns if c != cidr_col]
    dim = cidr_table.select(
        F.col(cidr_col),
        F.split(F.col(cidr_col), "/").getItem(1).cast("int").alias("_plen"),
        F.split(F.split(F.col(cidr_col), "/").getItem(0), "\\.").alias("_oct"),
        *attrs,
    ).select(
        cidr_col,
        "_plen",
        (
            F.col("_oct").getItem(0).cast("long") * 16777216
            + F.col("_oct").getItem(1).cast("long") * 65536
            + F.col("_oct").getItem(2).cast("long") * 256
            + F.col("_oct").getItem(3).cast("long")
        ).alias("_net_raw"),
        *attrs,
    )
    # canonicalize the network (a sloppy "10.1.2.3/16" means 10.1.0.0/16)
    dim = dim.withColumn(
        "_net", F.col("_net_raw") - F.pmod(F.col("_net_raw"), F.pow(F.lit(2.0), 32 - F.col("_plen")).cast("long"))
    ).drop("_net_raw")
    plens = sorted(
        {r["_plen"] for r in dim.select("_plen").distinct().collect()}, reverse=True
    )

    o = F.split(F.col(ip_col), "\\.")
    ip_int = (
        o.getItem(0).cast("long") * 16777216
        + o.getItem(1).cast("long") * 65536
        + o.getItem(2).cast("long") * 256
        + o.getItem(3).cast("long")
    )
    out = facts
    for plen in plens:
        block = 2 ** (32 - plen)
        cand = ip_int - F.pmod(ip_int, F.lit(block))
        # one row per (network, plen): duplicate blocks must not fan the
        # fact stream out. The keeper is ELECTED deterministically —
        # min(struct(cidr, attrs)) per network — not dropDuplicates,
        # whose arbitrary survivor would enrich conflicting duplicate
        # blocks differently across runs/partitionings (ADVICE r4 low).
        d = (
            dim.filter(F.col("_plen") == plen)
            .groupBy("_net")
            .agg(F.min(F.struct(F.col(cidr_col).alias("_c"), *[F.col(a).alias(a) for a in attrs])).alias("_k"))
            .select(
                F.col("_net").alias(f"_n{plen}"),
                F.col("_k._c").alias(f"_c{plen}"),
                *[F.col(f"_k.{a}").alias(f"_{a}{plen}") for a in attrs],
            )
        )
        out = out.join(F.broadcast(d), cand == F.col(f"_n{plen}"), "left")
    # the matched plen decides every attribute — a plain coalesce chain
    # would fall through past a matched block whose attribute is NULL
    out = out.withColumn(
        "prefix_len",
        F.coalesce(*[F.when(F.col(f"_c{p}").isNotNull(), F.lit(p)) for p in plens])
        if plens
        else F.lit(None).cast("int"),
    )

    def by_plen(col_of):
        expr = None
        for p in plens:
            c = col_of(p)
            expr = (
                F.when(F.col("prefix_len") == p, c)
                if expr is None
                else expr.when(F.col("prefix_len") == p, c)
            )
        return expr if expr is not None else F.lit(None)

    out = out.withColumn(cidr_col, by_plen(lambda p: F.col(f"_c{p}")))
    for a in attrs:
        out = out.withColumn(a, by_plen(lambda p, a=a: F.col(f"_{a}{p}")))
    drop = [c for p in plens for c in ([f"_n{p}", f"_c{p}"] + [f"_{a}{p}" for a in attrs])]
    return out.drop(*drop)


def interval_enrich(
    facts: DataFrame,
    intervals: DataFrame,
    key_col: str = "source",
    ts_col: str = "ts",
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    how: str = "broadcast",
    bucket_s: int = 3600,
    fact_id_cols: tuple[str, ...] = ("doc_id", "msg_no"),
) -> DataFrame:
    """Point-in-interval enrichment — the fourth non-equi-join shape a
    log pipeline needs after equi (:func:`enrich`), AS-OF
    (:func:`asof_enrich`, start-only versions) and CIDR
    (:func:`cidr_enrich`): each fact joins the ``intervals`` row whose
    CLOSED span ``[start, end]`` contains its own timestamp — "was this
    message inside a deploy / incident / maintenance window?".

    Overlapping windows resolve deterministically to the one with the
    greatest ``(start, end, attrs)`` struct — the latest-opened
    (innermost for properly nested spans) window wins, identical across
    runs, partitionings, and both execution strategies. Facts inside no
    window carry NULL attributes.

    Two strategies, one election:

    - ``how='broadcast'`` (dimension-sized interval tables): spans
      collapse to ONE sorted array per key and broadcast; each fact
      picks ``element_at(filter(spans, s <= ts <= e), -1)`` — map-only,
      zero fact shuffle, the :func:`asof_enrich` shape with an end
      bound.
    - ``how='bucketed'`` (interval tables too big to broadcast): spans
      explode to the time buckets they cover (bounded by span/bucket_s
      — choose ``bucket_s`` near the typical span so the blow-up stays
      O(1) per interval), facts key on their single bucket, and the
      containment join is a co-partitioned EQUI-join on (key, bucket) —
      never a theta join. Multiple containing spans collapse back to
      the same max-struct keeper with one partial-aggregable groupBy on
      ``fact_id_cols``.
    """
    attrs = [c for c in intervals.columns if c not in (key_col, start_col, end_col)]
    span = F.struct(
        F.col(start_col).alias("_s"), F.col(end_col).alias("_e"), *attrs
    )
    if how == "broadcast":
        hist = intervals.groupBy(key_col).agg(
            F.sort_array(F.collect_list(span)).alias("_iv")
        )
        joined = facts.join(F.broadcast(hist), key_col, "left")
        ts = F.col(ts_col)
        picked = F.try_element_at(
            F.filter("_iv", lambda v: (v["_s"] <= ts) & (ts <= v["_e"])), F.lit(-1)
        )
        out = joined
        for a in attrs:
            out = out.withColumn(a, picked[a])
        return (
            out.withColumn("window_start", picked["_s"])
            .withColumn("window_end", picked["_e"])
            .drop("_iv")
        )
    if how != "bucketed":
        raise ValueError(f"how must be 'broadcast' or 'bucketed', got {how!r}")
    bucket_us = bucket_s * 1_000_000

    def _bk(c):
        return F.floor(F.unix_micros(c) / bucket_us).cast("bigint")

    exploded = intervals.select(
        F.col(key_col),
        span.alias("_sp"),
        F.explode(
            F.sequence(_bk(F.col(start_col)), _bk(F.col(end_col)))
        ).alias("_bk"),
    )
    keyed = facts.withColumn("_bk", _bk(F.col(ts_col)))
    ts = F.col(ts_col)
    hits = (
        keyed.join(exploded, [key_col, "_bk"], "inner")
        .filter((F.col("_sp._s") <= ts) & (ts <= F.col("_sp._e")))
        .groupBy(*fact_id_cols)
        .agg(F.max("_sp").alias("_sp"))
    )
    # hits is fact-sized: the keeper attach is a co-partitioned
    # shuffle join on the fact id, never a broadcast
    out = keyed.drop("_bk").join(hits, list(fact_id_cols), "left")
    for a in attrs:
        out = out.withColumn(a, F.col(f"_sp.{a}"))
    return (
        out.withColumn("window_start", F.col("_sp._s"))
        .withColumn("window_end", F.col("_sp._e"))
        .drop("_sp")
    )
