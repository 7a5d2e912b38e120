"""Funnel conversion + cohort retention over event streams.

Two classic telemetry-store analytics the reference's consumers run
downstream of its parse→merge output (the reference itself stops at
`--summary` counters, src/libruntime/summary.rs — these are the next
queries a log-analytics user asks):

- ``funnel_conversion``: ordered-step funnel (ClickHouse
  ``windowFunnel`` / Amplitude funnel semantics): for each entity, step
  k counts only if it occurs STRICTLY AFTER the entity's earliest
  completion of step k-1 (ties on ``ts`` break on ``order_cols`` so the
  "after" relation is a total order and results are partition-invariant).
- ``cohort_retention``: entities grouped by first-activity day (their
  cohort); for each (cohort, day-offset) the count of cohort members
  active at that offset, plus the retention share vs the cohort size.

Scale shape (100 TB):

- The funnel pre-filters the stream to funnel-relevant event types
  BEFORE its single hash shuffle on the entity key, then holds per
  entity one sorted (ts, order) array PER STEP — bounded by one
  entity's own funnel-relevant activity, the same bounded-partition
  rule as gap sessionization. The step walk
  (``t_k = first(filter(a_k, x > t_{k-1}))``) is pure whole-stage
  codegen array algebra — no second shuffle, no window over the raw
  stream, and the final per-step counts are one map-side-combinable
  aggregate producing |steps| rows.
- Retention's only full shuffle is the same entity-key groupBy; the
  per-entity state is the set of DISTINCT ACTIVE DAYS — bounded by the
  corpus' calendar span, not by the entity's event count. Exploding
  (cohort, day) pairs yields at most |entities|·|days| already-distinct
  rows, so the (cohort, offset) count is a plain partial-aggregable
  ``count(*)``; cohort sizes (offset 0) broadcast back for the share.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    ev: DataFrame,
    steps: Sequence[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    horizon_s: int | None = None,
) -> DataFrame:
    """Ordered-step funnel counts: one row per step with the number of
    entities whose stream contains the step AFTER their earliest
    completion of the previous step.

    With ``horizon_s`` set, a chain only counts if every step lands
    within ``horizon_s`` seconds of ITS OWN entry event (ClickHouse
    ``windowFunnel`` semantics). This changes the search: the greedy
    earliest-entry walk is no longer optimal (a later entry can open a
    window an earlier one misses), so reach is decided per step as
    EXISTS over the entity's step-1 events — within one entry the
    earliest-valid-next walk IS optimal (the window depends only on the
    entry), so the inner chain stays greedy. Still pure array algebra
    on the same per-step sorted arrays: O(|entries| x funnel events)
    per entity, zero extra shuffles.

    Returns ``(idx, step, users, share)`` where ``share`` is the
    conversion from the previous step (step 1: share of ALL entities in
    the stream that enter the funnel); NULL when the previous step had
    zero entities.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    evt = F.struct(F.col(ts_col), *[F.col(c) for c in order_cols])
    rel = ev.filter(F.col(type_col).isin(list(steps))).select(
        F.col(key_col).alias("_k"), F.col(type_col).alias("_t"), evt.alias("_e")
    )
    # one shuffle: per entity, one sorted event array per step
    per_user = rel.groupBy("_k").agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("_t") == s, F.col("_e")))
            ).alias(f"_a{i}")
            for i, s in enumerate(steps)
        ]
    )
    # step walk in pure array algebra: t0 = first event of step 0,
    # t_k = first step-k event strictly after t_{k-1} (struct order =
    # (ts, *order_cols) lexicographic, so ties cannot double-count).
    # NB pivots bind via closure, not a lambda default: a 2-param
    # lambda makes F.filter pass (element, index) instead.
    def _first_after(arr: F.Column, pivot: F.Column, entry=None) -> F.Column:
        def pred(x):
            ok = x > pivot
            if entry is not None:
                ok = ok & (
                    x[ts_col]
                    <= entry[ts_col] + F.expr(f"INTERVAL {int(horizon_s)} SECOND")
                )
            return ok

        return F.try_element_at(F.filter(arr, pred), F.lit(1))

    if horizon_s is None:
        t = F.try_element_at(F.col("_a0"), F.lit(1))
        reached = [t.isNotNull()]
        for i in range(1, len(steps)):
            t = _first_after(F.col(f"_a{i}"), t)
            reached.append(t.isNotNull())
    else:
        # windowed: entity reaches step k iff SOME entry event opens a
        # window whose greedy inner chain gets to k
        def _chain_reaches(entry: F.Column, upto: int) -> F.Column:
            t = entry
            for i in range(1, upto + 1):
                t = _first_after(F.col(f"_a{i}"), t, entry=entry)
            return t.isNotNull()

        def _exists_chain(k: int) -> F.Column:
            return F.exists(F.col("_a0"), lambda e: _chain_reaches(e, k))

        reached = [F.size(F.col("_a0")) > 0]
        for k in range(1, len(steps)):
            reached.append(_exists_chain(k))
    counts = per_user.agg(
        *[F.sum(r.cast("long")).alias(f"_n{i}") for i, r in enumerate(reached)]
    )
    total = ev.select(F.countDistinct(key_col).alias("_tot"))
    one = counts.crossJoin(F.broadcast(total))
    legs = []
    for i, s in enumerate(steps):
        prev = F.col("_tot") if i == 0 else F.col(f"_n{i - 1}")
        legs.append(
            F.struct(
                F.lit(i + 1).cast("bigint").alias("idx"),
                F.lit(s).alias("step"),
                F.coalesce(F.col(f"_n{i}"), F.lit(0)).alias("users"),
                F.when(
                    prev > 0, F.round(F.coalesce(F.col(f"_n{i}"), F.lit(0)) / prev, 4)
                ).alias("share"),
            )
        )
    return one.select(F.explode(F.array(*legs)).alias("_s")).select("_s.*")


def cohort_retention(
    ev: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-grain cohort retention: ``(cohort_day, offset_days,
    active_users, share)`` where ``share`` is active/cohort-size
    (offset 0 is the cohort size itself, share 1.0)."""
    day = F.to_date(F.col(ts_col))
    per_user = ev.groupBy(F.col(key_col).alias("_k")).agg(
        F.min(day).alias("_cohort"), F.collect_set(day).alias("_days")
    )
    # (entity, day) pairs are distinct by construction → count(*) below
    # IS the distinct-entity count, with map-side partial agg
    active = per_user.select(
        "_cohort", F.explode("_days").alias("_day")
    ).groupBy(
        F.col("_cohort"),
        F.datediff(F.col("_day"), F.col("_cohort")).cast("bigint").alias("offset_days"),
    ).agg(F.count("*").alias("active_users"))
    sizes = active.filter(F.col("offset_days") == 0).select(
        F.col("_cohort"), F.col("active_users").alias("_size")
    )
    return active.join(F.broadcast(sizes), "_cohort").select(
        F.date_format(F.col("_cohort"), "yyyy-MM-dd").alias("cohort_day"),
        "offset_days",
        "active_users",
        F.round(F.col("active_users") / F.col("_size"), 4).alias("share"),
    )
