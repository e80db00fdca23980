"""Ordered-event analytics: rolling range-frame aggregates, SCD2
validity intervals (gaps-and-islands), and sweep-line interval
concurrency.

These are the event-table primitives of a warehouse/session pipeline:
"revenue in the trailing 7 days per customer", "when did this user's
state attribute change and how long did each value hold" (slowly
changing dimension type 2), and "how many intervals were open at once"
(capacity / concurrency planning). All three are expressed on the
DataFrame API so Catalyst plans them as single window/aggregate stages —
one shuffle on the partition key each, no Python in the hot path.

Determinism notes (oracle-parity discipline, see __spark_entry__ header):
- rolling sums accumulate DECIMAL and cast to double once at the end;
- RANGE frames are keyed on epoch-second BIGINTs (Spark's rangeBetween
  needs a numeric ordering key; the DuckDB oracle uses the same integer
  key, so both engines see identical frames including equal-key peers);
- island boundaries tie-break on an id column so equal timestamps
  segment identically everywhere.

Reference: the reference harvester has no windowed analytics; this
extends the engine's event-processing family (SURVEY §2 A4/W* analogs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_range_sum(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    out_col: str = "rolling_sum",
) -> DataFrame:
    """Trailing-window sum per key: for every row, the sum of
    ``value_col`` over rows of the same key whose timestamp lies in
    ``(ts - window_seconds, ts]`` — a RANGE frame, so rows sharing a
    timestamp are peers and all contribute to each other's total
    (order-free and engine-independent, unlike a ROWS frame).

    Plan: one shuffle on ``key_col``, one sort within partitions, one
    running-frame aggregate — WindowExec keeps only the frame's rows
    buffered. The value accumulates as DECIMAL(18,2) and is cast to
    double once at the end (exact, replayable in SQL).

    Adds ``ts_sec`` (epoch seconds BIGINT, the frame key) and
    ``out_col`` (double).
    """
    sec = F.col(ts_col).cast("timestamp").cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("ts_sec"))
        .rangeBetween(-int(window_seconds), 0)
    )
    return (
        df.withColumn("ts_sec", sec)
        .withColumn(
            out_col,
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .over(w)
            .cast("double"),
        )
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an ordered event stream into SCD2 validity intervals:
    per key, consecutive runs of the same ``attr_col`` value become one
    row (key, attr, valid_from, valid_to, n_events), where ``valid_to``
    is the next run's start (NULL for the key's current value) — the
    half-open [from, to) convention warehouse dimension tables use.

    Gaps-and-islands: a lag-compare flags run starts, a running count of
    flags numbers the islands, one aggregate per island, then a lead
    window chains valid_to. Three window passes but ONE shuffle — every
    window and the aggregate share the ``key_col`` partitioning, so
    Catalyst plans a single Exchange and sorts within it.

    Equal timestamps order by ``tiebreak_col`` so island boundaries are
    identical across partitionings and engines. Timestamps are emitted
    as epoch-second BIGINTs (TIMESTAMP_NTZ-safe for oracle hashing).
    """
    sec = F.col(ts_col).cast("timestamp").cast("long")
    order = [F.col("ts_sec"), F.col(tiebreak_col)]
    w = Window.partitionBy(key_col).orderBy(*order)
    ev = df.withColumn("ts_sec", sec)
    flagged = ev.withColumn(
        "_chg",
        F.when(
            F.lag(attr_col).over(w).isNull()
            | (F.lag(attr_col).over(w) != F.col(attr_col)),
            1,
        ).otherwise(0),
    ).withColumn(
        "_grp",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = flagged.groupBy(key_col, "_grp").agg(
        F.min(attr_col).alias(attr_col),  # constant within a run
        F.min("ts_sec").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wk = Window.partitionBy(key_col).orderBy("valid_from", "_grp")
    return runs.select(
        F.col(key_col),
        F.col(attr_col),
        F.col("valid_from"),
        F.lead("valid_from").over(wk).alias("valid_to"),
        F.col("n_events"),
    )


def max_concurrent(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Maximum number of simultaneously-open half-open intervals
    [start, end) per key — the sweep-line concurrency query (peak
    sessions, peak open orders, room occupancy).

    Order-free formulation: at every boundary time t the concurrency is
    ``(#starts <= t) - (#ends <= t)`` (half-open: an interval ending at
    t and one starting at t never overlap). Boundaries are aggregated
    per (key, t) FIRST, so the running sum ranges over distinct
    timestamps and its value at each step does not depend on row order
    within a timestamp — the per-row +1/-1 formulation would.

    Plan: one hash aggregate (boundary net-delta), one window cumsum on
    the key partitioning, one final aggregate — two shuffles total, both
    on ``key_col``.

    Returns (key, max_concurrent, n_intervals).
    """
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    bounds = df.select(
        F.col(key_col),
        F.explode(
            F.array(
                F.struct(s.alias("t"), F.lit(1).alias("d")),
                F.struct(e.alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("b"),
    ).select(key_col, F.col("b.t").alias("t"), F.col("b.d").alias("d"))
    net = bounds.groupBy(key_col, "t").agg(F.sum("d").alias("net"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = net.withColumn("conc", F.sum("net").over(w))
    n = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_intervals"))
    return (
        running.groupBy(key_col)
        .agg(F.max("conc").alias("max_concurrent"))
        .join(n, key_col)
        .select(key_col, "max_concurrent", "n_intervals")
    )
