"""Time-bucketed OHLC bars over an event/metric stream.

The standard downsampling aggregate for metric and market data: per
(series, time bucket) emit the first (open), max (high), min (low) and
last (close) observation plus the event count. One hash aggregate with
map-side combine — min_by/max_by are decomposable, so the shuffle sees
per-(series, bar) partials only, never raw events.

Determinism: open/close SELECT existing values (no float arithmetic),
ordered by a zero-padded (t_us, event_id) string key — scalar, totally
ordered, and usable verbatim by DuckDB's arg_min/arg_max (which cannot
order by structs), so the oracle replays the exact tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _order_key(t: Column, eid: Column) -> Column:
    return F.concat(
        F.lpad(t.cast("string"), 20, "0"), F.lpad(eid.cast("string"), 10, "0")
    )


def ohlc_bars(
    df: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bar_us: int = 3_600_000_000,
) -> DataFrame:
    """(series, bar, open, high, low, close, n_events); bar = floor
    division of the event's epoch-microseconds by bar_us."""
    if bar_us <= 0:
        raise ValueError(f"bar_us must be positive, got {bar_us}")
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    key = _order_key(t, F.col(id_col))
    rows = df.select(
        F.col(series_col).alias("series"),
        t.alias("t_us"),
        F.col(value_col).alias("v"),
        key.alias("k"),
    ).select(
        "series",
        # integer div — float division + cast can round up at exact
        # bucket boundaries (within half-ulp of the next integer)
        F.expr(f"t_us div {int(bar_us)}").alias("bar"),
        "v",
        "k",
    )
    return rows.groupBy("series", "bar").agg(
        F.min_by("v", "k").alias("open"),
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        F.max_by("v", "k").alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )
