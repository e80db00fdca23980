"""Ordered-sequence funnel analysis over an event stream.

"Of the users who did A, how many later did B, and later still C?" —
the standard product-analytics conversion funnel, which SQL cannot
express as a plain aggregate (each step's timestamp depends on the
previous step's). The distributed shape here is ONE shuffle:

  groupBy(user) -> sort_array(collect_list(struct(t, eid, type)))
  -> F.aggregate fold advancing a (depth, last_ts) state

The fold is a Catalyst higher-order function — it runs JVM-side per
row, never in Python, and the per-user array is bounded by that user's
event count (the same bound any funnel engine carries). At 100 TB the
plan is: map-side projection of 3 narrow columns, one hash shuffle on
user, linear fold per user — no window, no self-join per step, no
driver involvement.

Semantics (mirrored exactly by the correlated-min SQL oracle, which is
an INDEPENDENT algorithm — per-step min-after joins): events are
scanned in (event_time_us, event_id) order; step k+1 matches the first
event of its type with t STRICTLY greater than step k's timestamp.
Greedy-first-match == per-step earliest-qualifying-min (proof sketch in
the oracle docinline: first qualifying event in sorted order is the
qualifying min; ties in t cannot re-qualify under strict >).

The reference (MITLibraries/geo-harvester) has no funnel operator; this
extends the events-analytics family (daily rollup, sessionization).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_depths(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user funnel depth: how many steps of `steps` were completed
    in order (strictly increasing event time). Returns (user, depth)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    # microsecond epoch — NTZ wall-clock equals UTC instant (session TZ
    # is pinned UTC), matching the oracle's epoch_us
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user"),
        F.struct(
            t.alias("t"),
            F.col(id_col).alias("eid"),
            F.col(type_col).alias("et"),
        ).alias("e"),
    )
    per_user = ev.groupBy("user").agg(
        F.sort_array(F.collect_list("e")).alias("evs")
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).alias("depth"), F.lit(-1).cast("long").alias("last")
    )

    def _advance(acc: Column, e: Column) -> Column:
        # least() keeps element_at in range at depth == k (ANSI mode
        # errors on out-of-bounds even under a false conjunct)
        nxt = F.element_at(step_arr, F.least(acc["depth"] + 1, F.lit(k)))
        can = (
            (acc["depth"] < k)
            & (e["et"] == nxt)
            & ((acc["depth"] == 0) | (e["t"] > acc["last"]))
        )
        return F.when(
            can,
            F.struct(
                (acc["depth"] + 1).alias("depth"), e["t"].alias("last")
            ),
        ).otherwise(acc)

    depth = F.aggregate("evs", init, _advance)["depth"]
    return per_user.select("user", depth.alias("depth"))


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Funnel conversion table: (step, step_name, n_users) where
    n_users = users whose ordered depth reached at least that step."""
    k = len(steps)
    depths = funnel_depths(df, steps, user_col, ts_col, type_col, id_col)
    step_arr = F.array(*[F.lit(s) for s in steps])
    return (
        depths.select(
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("step"), "depth"
        )
        .where(F.col("depth") >= F.col("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "step",
            F.element_at(step_arr, F.col("step")).alias("step_name"),
            "n_users",
        )
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-/last-touch attribution: for every user's FIRST conversion
    event, credit the channel (event_type) of the earliest and the
    latest event strictly before it; users whose conversion has no
    prior events attribute to 'direct'. Returns the rollup
    (first_touch, last_touch, n_users), which is what marketing
    attribution reports aggregate at any scale.

    Plan: everything is keyed on user — ONE hash exchange; the three
    per-user reductions (first conversion, earliest prior, latest
    prior) are min/max aggregates over a packed (ts, event_id, type)
    ordering key, not windows, so map-side partial aggregation applies.
    Ties break on event_id (unique), keeping the result deterministic.
    """
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("timestamp").alias("t"),
        F.col(type_col).alias("et"),
        F.col(id_col).cast("long").alias("eid"),
    )
    # first conversion per user: min over (t, eid) — struct min is fine
    # here (one row per user after the aggregate, tiny vs the stream)
    conv = (
        e.where(F.col("et") == conversion_type)
        .groupBy("u")
        .agg(F.min(F.struct("t", "eid")).alias("c"))
        .select("u", F.col("c.t").alias("ct"), F.col("c.eid").alias("ceid"))
    )
    prior = (
        e.join(conv, "u")
        .where(
            (F.col("t") < F.col("ct"))
            | ((F.col("t") == F.col("ct")) & (F.col("eid") < F.col("ceid")))
        )
        .groupBy("u")
        .agg(
            F.min(F.struct("t", "eid", "et")).alias("f"),
            F.max(F.struct("t", "eid", "et")).alias("l"),
        )
        .select(
            "u",
            F.col("f.et").alias("first_touch"),
            F.col("l.et").alias("last_touch"),
        )
    )
    attributed = conv.join(prior, "u", "left").select(
        "u",
        F.coalesce("first_touch", F.lit("direct")).alias("first_touch"),
        F.coalesce("last_touch", F.lit("direct")).alias("last_touch"),
    )
    return (
        attributed.groupBy("first_touch", "last_touch")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("first_touch", "last_touch")
    )
