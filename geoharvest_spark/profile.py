"""Dataset profiling and Pareto-frontier (skyline) analytics.

``profile_columns`` is the deequ/great-expectations-style one-pass
profile a pipeline runs before training on a new table drop: per column
null count, distinct count, and min/max — the cheapest corpus health
check at 100 TB because it is a single aggregate over the scan.

``skyline2d`` is the classic two-dimensional skyline (maximal-vector)
query: the set of rows no other row dominates on both axes. Used for
"best tradeoff" selection (quality vs length, freshness vs authority).

Reference: no profiling/skyline exists in the reference harvester;
these extend the engine's quality/analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profile: (column, n_rows, n_null, n_distinct,
    min_num, max_num, min_str, max_str).

    Numeric/timestamp columns report min/max as doubles (timestamps as
    epoch seconds — exact integers, so the doubles are bit-stable);
    string columns report min/max lexicographically; each family leaves
    the other's slots NULL. Distinct counts are exact.

    Plan: ONE aggregate job. count/min/max fold map-side; the exact
    count(distinct) per column rewrites to a single Expand + two-stage
    aggregate (one shuffle carrying (column-id, value) pairs — the
    standard multi-distinct plan, linear in rows x profiled columns).
    At 100 TB swap n_distinct for approx_count_distinct to drop the
    Expand; the exact form is kept here because the oracle replays it.
    """
    if cols is None:
        cols = df.columns
    aggs = []
    kinds: dict[str, str] = {}
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, (T.StringType,)):
            kinds[c] = "str"
            lo = F.min(c).alias(f"_lo_{c}")
            hi = F.max(c).alias(f"_hi_{c}")
        else:
            kinds[c] = "num"
            v = F.col(c)
            if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                v = v.cast("timestamp").cast("long")
            lo = F.min(v.cast("double")).alias(f"_lo_{c}")
            hi = F.max(v.cast("double")).alias(f"_hi_{c}")
        aggs += [
            F.count(F.lit(1)).alias(f"_n_{c}") if c == cols[0] else None,
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.count_distinct(F.col(c)).alias(f"_dist_{c}"),
            lo,
            hi,
        ]
    one = df.agg(*[a for a in aggs if a is not None])
    n0 = cols[0]
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_n_{n0}").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                (
                    F.col(f"_lo_{c}")
                    if kinds[c] == "num"
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"_hi_{c}")
                    if kinds[c] == "num"
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.col(f"_lo_{c}")
                    if kinds[c] == "str"
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"_hi_{c}")
                    if kinds[c] == "str"
                    else F.lit(None).cast("string")
                ).alias("max_str"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    partitions: int = 32,
) -> DataFrame:
    """Two-dimensional skyline under maximize-both semantics: keep row p
    unless some row q has q.x >= p.x AND q.y >= p.y with at least one
    strict inequality. Ties (exactly equal (x, y)) are NOT dominance, so
    duplicate optima all survive — the standard maximal-vector
    definition, and the one a brute-force NOT EXISTS oracle replays.

    Distributed two-phase plan (the textbook partition-skyline):
      1. local phase — rows are hash-partitioned by id and each
         partition computes its own skyline with a sort + linear scan
         (a partition-local skyline is a SUPERSET filter: any globally
         non-dominated row is also locally non-dominated, so phase 1
         never loses an answer; it only discards rows some co-located
         row already dominates);
      2. merge phase — survivors (typically O(sqrt(n)) of the input;
         worst case the anti-correlated diagonal) are re-scanned as ONE
         group with the same kernel for the exact global frontier.
    Both phases run the same Arrow-batched kernel via applyInPandas;
    the merge group is a single task, sized by the LOCAL skylines, not
    the input — the standard scale contract of this algorithm (a fully
    anti-correlated 100 TB input has no small skyline under ANY
    algorithm).
    """
    import pandas as pd

    schema = T.StructType(
        [
            df.schema[id_col],
            df.schema[x_col],
            df.schema[y_col],
        ]
    )

    def _sky(pdf: pd.DataFrame) -> pd.DataFrame:
        # Sorted x desc, y desc: p is dominated iff
        #   max-y over strictly-greater x  >= p.y   (strict on x), or
        #   p.y < max-y within p's own x-group      (strict on y).
        # The first row of each x-group carries the group's max y, so a
        # single linear scan decides both conditions; exact (x, y)
        # duplicates of a frontier point all survive.
        s = pdf.sort_values(
            [x_col, y_col, id_col], ascending=[False, False, True]
        )
        keep = []
        maxy_strict = None  # max y among rows with x strictly greater
        group_x = None
        group_maxy = None
        for xv, yv in zip(s[x_col].values, s[y_col].values):
            if group_x is None or xv != group_x:
                if group_maxy is not None and (
                    maxy_strict is None or group_maxy > maxy_strict
                ):
                    maxy_strict = group_maxy
                group_x, group_maxy = xv, yv
            dominated = (
                maxy_strict is not None and maxy_strict >= yv
            ) or yv < group_maxy
            keep.append(not dominated)
        return s.loc[keep, [id_col, x_col, y_col]]

    base = df.select(id_col, x_col, y_col)
    local = (
        base.withColumn(
            "_p", F.pmod(F.xxhash64(F.col(id_col)), F.lit(partitions))
        )
        .groupBy("_p")
        .applyInPandas(lambda _, pdf: _sky(pdf), schema)
    )
    return (
        local.withColumn("_p", F.lit(0))
        .groupBy("_p")
        .applyInPandas(lambda _, pdf: _sky(pdf), schema)
    )


def check_constraints(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    ranges: list[tuple[str, float, float]] | None = None,
    ref: tuple[str, DataFrame, str] | None = None,
) -> DataFrame:
    """deequ/great-expectations-style constraint suite: evaluate each
    declared check and return (check, passed, n_violations) — the data
    contract gate a pipeline runs on every new table drop before
    training or publishing.

    Checks: NOT NULL per column; UNIQUE over column sets (violations =
    rows beyond the first per duplicate key); value RANGE [lo, hi]
    inclusive; referential integrity (left column ⊆ right column of a
    dimension frame — violations = orphan rows, NULLs exempt per SQL FK
    semantics).

    Plan: not-null + range checks fold into ONE conditional aggregate
    over a single scan; each unique check is one distinct-count
    aggregate; the FK check is one anti-join count against the
    (broadcastable) dimension. Results union to a tiny frame — at
    100 TB the cost is the scans, every check is a hash aggregate, and
    nothing collects.
    """
    not_null = not_null or []
    unique = unique or []
    ranges = ranges or []
    if not (not_null or unique or ranges or ref):
        raise ValueError("check_constraints: no checks declared")
    parts: list[DataFrame] = []

    scan_aggs = []
    names = []
    for c in not_null:
        scan_aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}")
        )
        names.append((f"not_null({c})", f"nn_{c}"))
    for c, lo, hi in ranges:
        bad = ~F.col(c).between(F.lit(lo), F.lit(hi))
        scan_aggs.append(
            F.sum(F.coalesce(bad.cast("long"), F.lit(0))).alias(f"rg_{c}")
        )
        names.append((f"range({c},{lo},{hi})", f"rg_{c}"))
    if scan_aggs:
        one = df.agg(*scan_aggs)
        rows = F.array(
            *[
                F.struct(
                    F.lit(label).alias("check"),
                    F.coalesce(F.col(alias), F.lit(0))
                    .cast("long")
                    .alias("n_violations"),
                )
                for label, alias in names
            ]
        )
        parts.append(
            one.select(F.explode(rows).alias("r")).select("r.*")
        )
    for cols in unique:
        label = f"unique({','.join(cols)})"
        parts.append(
            df.groupBy(*[F.col(c) for c in cols])
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.lit(label).alias("check"),
                F.sum(F.col("_n") - 1).cast("long").alias("n_violations"),
            )
        )
    if ref is not None:
        lcol, rdf, rcol = ref
        label = f"ref({lcol}->{rcol})"
        orphans = (
            df.where(F.col(lcol).isNotNull())
            .join(
                rdf.select(F.col(rcol).alias(lcol)).distinct(),
                lcol,
                "left_anti",
            )
            .agg(
                F.lit(label).alias("check"),
                F.count(F.lit(1)).cast("long").alias("n_violations"),
            )
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check",
        (F.col("n_violations") == 0).alias("passed"),
        "n_violations",
    )


def robust_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-key robust outlier detection: flag rows where
    ``|x - median| > k * MAD`` (median absolute deviation) — the
    classic heavy-tail-safe anomaly rule (Hampel filter family) a
    pipeline runs per segment/sensor/domain, immune to the outliers
    it hunts (unlike mean/stddev z-scores).

    Exact medians via two aggregate passes (median of values, then
    median of absolute deviations), both rank-interpolated percentiles
    — Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    h = (n-1)*q linear-interpolation definition, and integer inputs
    make every interpolated value an exact binary half, so the oracle
    replays bit-for-bit. Two key-hashed aggregates + two equi-joins
    (the per-key stat tables are categories-sized — broadcast at
    scale); no window, no Python. At 100 TB swap ``percentile`` for
    ``approx_percentile`` and keep the same shape.

    Returns the input plus (med, mad, is_outlier).
    """
    med = df.groupBy(key_col).agg(
        F.percentile(value_col, 0.5).alias("med")
    )
    dev = df.join(med, key_col).withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(key_col).agg(
        F.percentile("_absdev", 0.5).alias("mad")
    )
    return (
        dev.join(mad, key_col)
        .withColumn(
            "is_outlier", F.col("_absdev") > F.lit(float(k)) * F.col("mad")
        )
        .drop("_absdev")
    )


def trimmed_stats(
    df: DataFrame,
    key_col: str,
    val_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group trimmed + winsorized means over INTEGER values — the
    outlier-robust summary pair (drop vs clamp the tails at exact
    rank-interpolated percentiles).

    Oracle-exact numerics: Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the h=(n-1)q definition (the
    robust_outliers precedent), so p_lo/p_hi are the SAME doubles on
    both sides; the trimmed mean is one division of exact ints; the
    winsorized sum is rebuilt as sum_in + n_below*p_lo + n_above*p_hi
    — a fixed-order handful of IEEE ops (never a data-ordered sum of
    fractional doubles, which would be nondeterministic under
    shuffle).

    Plan: two key-hashed aggregates sharing one exchange shape, joined
    back broadcast (the percentile table is |keys| rows). Returns
    (key, n, p_lo, p_hi, trimmed_n, trimmed_mean, winsorized_mean).
    """
    v = F.col(val_col).cast("long")
    pct = df.groupBy(key_col).agg(
        F.expr(f"percentile({val_col}, {lo})").alias("p_lo"),
        F.expr(f"percentile({val_col}, {hi})").alias("p_hi"),
    )
    j = df.join(F.broadcast(pct), key_col)
    vd = v.cast("double")
    in_rng = (vd >= F.col("p_lo")) & (vd <= F.col("p_hi"))
    agg = j.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.first("p_lo").alias("p_lo"),
        F.first("p_hi").alias("p_hi"),
        F.sum(F.when(in_rng, v).otherwise(F.lit(0))).alias("_sum_in"),
        F.sum(F.when(in_rng, 1).otherwise(0)).alias("trimmed_n"),
        F.sum(F.when(vd < F.col("p_lo"), 1).otherwise(0)).alias("_n_below"),
        F.sum(F.when(vd > F.col("p_hi"), 1).otherwise(0)).alias("_n_above"),
    )
    return agg.select(
        F.col(key_col),
        "n",
        "p_lo",
        "p_hi",
        "trimmed_n",
        # guarded (r8, ADVICE r7): a degenerate group (p_lo/p_hi strictly
        # between its two distinct values) has trimmed_n = 0, and ANSI
        # mode makes the double division an ERROR (whole-query failure)
        # where the DuckDB oracle's x/0 yields NULL — the guard emits
        # the NULL the oracle would
        F.when(
            F.col("trimmed_n") > 0,
            F.col("_sum_in").cast("double")
            / F.col("trimmed_n").cast("double"),
        ).alias("trimmed_mean"),
        (
            (
                F.col("_sum_in").cast("double")
                + F.col("_n_below").cast("double") * F.col("p_lo")
                + F.col("_n_above").cast("double") * F.col("p_hi")
            )
            / F.col("n").cast("double")
        ).alias("winsorized_mean"),
    )


def key_skew_profile(
    df: DataFrame, key_col: str, top_k: int = 5
) -> DataFrame:
    """Shuffle-skew diagnostics for a prospective join/groupBy key: the
    per-key count distribution summarized as ONE row — total rows,
    distinct keys, max/top-k head share, and the Gini coefficient of
    the key mass (0 = uniform, ->1 = one hot key). This is the census
    that decides salting/AQE-skew strategy BEFORE paying for the big
    shuffle (cap_per_key's hot_threshold guard is the action this
    report informs).

    Exact integer numerics: counts are ints; Gini uses the sorted-rank
    identity  G = sum((2i - n_keys - 1) * c_(i)) / (n_keys * sum(c))
    (i = 1-based rank by (count, key) — deterministic ties), an integer
    numerator with ONE final double division. The only global sort is
    over DISTINCT KEYS (the count table, not the rows); top-k head
    share comes from the same ranked table.

    Returns (n_rows, n_keys, max_count, topk_count, gini).
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("c"), F.col(key_col))
    ranked = counts.select(
        F.col("c"), F.row_number().over(w).alias("i")
    )
    agg = ranked.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_count"),
        F.sum(
            (F.lit(2) * F.col("i")) * F.col("c")
        ).alias("_s2ic"),
        F.sum(F.col("c")).alias("_sc"),
    )
    topk = (
        ranked.orderBy(F.desc("i"))
        .limit(top_k)
        .agg(F.sum("c").alias("topk_count"))
    )
    return agg.crossJoin(topk).select(
        "n_rows",
        "n_keys",
        "max_count",
        "topk_count",
        (
            (
                F.col("_s2ic")
                - (F.col("n_keys") + 1) * F.col("_sc")
            ).cast("double")
            / (F.col("n_keys") * F.col("_sc")).cast("double")
        ).alias("gini"),
    )


def join_size_census(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    top_k: int = 5,
) -> DataFrame:
    """EXACT equi-join output-size census WITHOUT materializing the
    join: |L join R| = sum over keys of count_L(k) * count_R(k),
    computed from the two per-key count tables (aggregate-sized, not
    row-sized — the planning query you run before committing to a
    100-TB shuffle). Also reports matching-key count and the top-k
    hottest keys' share of the output, which is the direct input to
    the salt/AQE-skew decision (one key owning half the output = salt
    it; see key_skew_profile).

    Returns one row: (join_rows, n_matching_keys, topk_join_rows,
    max_key_rows).
    """
    lc = left.groupBy(key_col).agg(F.count(F.lit(1)).alias("_lc"))
    rc = right.groupBy(key_col).agg(F.count(F.lit(1)).alias("_rc"))
    per_key = lc.join(rc, key_col).select(
        F.col(key_col), (F.col("_lc") * F.col("_rc")).alias("_rows")
    )
    total = per_key.agg(
        F.sum("_rows").alias("join_rows"),
        F.count(F.lit(1)).alias("n_matching_keys"),
        F.max("_rows").alias("max_key_rows"),
    )
    top = (
        per_key.orderBy(F.desc("_rows"), key_col)
        .limit(top_k)
        .agg(F.sum("_rows").alias("topk_join_rows"))
    )
    return total.crossJoin(top).select(
        "join_rows", "n_matching_keys", "topk_join_rows", "max_key_rows"
    )


def ks_statistic(
    left: DataFrame, right: DataFrame, val_col: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic over integer values —
    the distribution-drift gate between two corpus slices (yesterday
    vs today, sourceA vs sourceB). EXACT: with per-side counts c1, c2
    aggregated per distinct value and n1, n2 totals,

        D = max over values |cum1 * n2 - cum2 * n1| / (n1 * n2)

    has an integer numerator (ties handled by evaluating both ECDFs at
    every distinct value), so the only floating op is the ONE final
    division. Plan: per-side hash aggregates to DISTINCT-VALUE rows,
    one merge, one window over distinct values (not raw rows) — the
    sort is |values|-sized, which is what makes an exact KS feasible
    at 100 TB when the value domain is bounded.

    Returns (n_left, n_right, d_num, ks).
    """
    lc = left.select(F.col(val_col).cast("long").alias("v")).groupBy(
        "v"
    ).agg(F.count(F.lit(1)).alias("c1"))
    rc = right.select(F.col(val_col).cast("long").alias("v")).groupBy(
        "v"
    ).agg(F.count(F.lit(1)).alias("c2"))
    m = lc.join(rc, "v", "full_outer").select(
        "v",
        F.coalesce("c1", F.lit(0)).alias("c1"),
        F.coalesce("c2", F.lit(0)).alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = m.select(
        F.sum("c1").over(w).alias("k1"), F.sum("c2").over(w).alias("k2")
    )
    tot = m.agg(
        F.sum("c1").alias("n_left"), F.sum("c2").alias("n_right")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n_left").alias("n_left"),
            F.first("n_right").alias("n_right"),
            F.max(
                F.abs(
                    F.col("k1") * F.col("n_right")
                    - F.col("k2") * F.col("n_left")
                )
            ).alias("d_num"),
        )
        .select(
            "n_left",
            "n_right",
            "d_num",
            (
                F.col("d_num").cast("double")
                / (F.col("n_left") * F.col("n_right")).cast("double")
            ).alias("ks"),
        )
    )
