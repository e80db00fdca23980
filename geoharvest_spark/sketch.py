"""Distributed data sketches: HyperLogLog cardinality (Flajolet et al.
2007), Count-Min frequency (Cormode & Muthukrishnan 2005), and a
log-scaled histogram for quantiles (HdrHistogram-style).

COUNT(DISTINCT x) is the one aggregate that does not decompose: exact
distinct over 100 TB shuffles every distinct value. The HLL register
table DOES decompose — per-partition max over 2^p tiny registers, then
a 2^p-row merge — which is why it is the industry-standard sketch for
"distinct users per cell per day" rollups. Spark ships
approx_count_distinct, but its binary sketch is neither inspectable,
mergeable across frames from SQL, nor replayable by an oracle. This
implementation is all three:

- the hash is the engine's deterministic md5-60-bit idiom (same as
  qmodel/hash_split), so registers are bit-identical on any executor
  count, partitioning, or resume — and DuckDB can rebuild them;
- rho (the first-one rank) is derived from length(bin(x)) — pure
  integer/string ops, no log2, replayable in SQL;
- the estimator is ONE double division of exact-integer-derived
  operands (sum of exact powers of two), so even the float output is
  bit-identical between Spark and DuckDB.

Register tables merge by groupBy-max: hll_merge(union of sketches) ==
sketch of the union (tested), which is what makes the sketch usable
across days/streams/clusters without re-reading raw data.

The HLL estimator implements the raw harmonic mean plus the standard
small-range linear-counting branch (m*ln(m/V) when raw <= 2.5m — that
branch is transcendental, so oracle queries target the raw regime and
the small regime is accuracy-tested instead). Raw-estimate relative
error is ~1.04/sqrt(2^p).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 prefix width: 15 hex chars = 60 bits, positive in BIGINT on both
# Spark and DuckDB (the engine-wide hash idiom).
_HASH_BITS = 60


def _alpha_num(p: int) -> float:
    """alpha_m * m^2 * 2^(W+1) — the estimator numerator, ONE float
    literal shared verbatim by the Column path and the SQL oracle
    fragment. The 2^(W+1) scale makes every register contribution an
    exact int64 even at the rho = W+1 corner (all-zero hash rest)."""
    m = 1 << p
    w = _HASH_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(2 ** (w + 1))


def hll_rho_col(col: Column, p: int = 8) -> tuple[Column, Column]:
    """(register, rho) for one value: h = md5-60bit, register = low p
    bits, rho = 1 + leading zeros of the remaining W-bit field (from
    length of the minimal binary string — no transcendentals)."""
    w = _HASH_BITS - p
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    reg = h.bitwiseAND(F.lit((1 << p) - 1))
    rest = F.shiftrightunsigned(h, p)
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(rest))
    )
    return reg.alias("reg"), rho.cast("int").alias("rho")


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 8,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HLL register table: one row per (group, non-empty register) with
    the max rho. Map-side partial max means the shuffle carries at most
    groups * 2^p tiny rows regardless of input size — the whole point
    of sketching at 100 TB. Empty registers are implicit (the estimator
    counts them as m - rows_present)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    reg, rho = hll_rho_col(F.col(col), p)
    return (
        df.where(F.col(col).isNotNull())
        .select(*group_cols, reg, rho)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Merge register tables (same p): union + groupBy-max. Sketches
    built on different days / streams / clusters combine losslessly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    p: int = 8,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Raw HLL estimate per group from a register table.

    S is the harmonic-mean denominator scaled by 2^(W+1) so it is an
    EXACT int64 (max m * 2^(W+1) = 2^61 for p=8): non-empty register ->
    2^(W+1 - rho) (>= 1 even at rho = W+1), empty -> 2^(W+1). The
    estimate is then a single double division of two exactly-
    representable operands — bit-identical in Spark and DuckDB.

    Small-range correction (standard HLL): when the raw estimate is
    <= 2.5m and empty registers remain, linear counting m*ln(m/V) is
    far more accurate. That branch is transcendental — bit-parity with
    the oracle is guaranteed only in the raw regime (the oracle query
    targets a cardinality >> 2.5m; the small regime is accuracy-tested,
    not hash-compared).
    """
    m = 1 << p
    w = _HASH_BITS - p
    s_int = F.sum(
        F.expr(f"shiftleft(cast(1 as bigint), {w + 1} - rho)")
    ) + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << (w + 1)).cast("long")
    raw = F.lit(_alpha_num(p)) / s_int.cast("double")
    v = F.lit(m) - F.count(F.lit(1))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return registers.groupBy(*group_cols).agg(est.alias("est_distinct"))


def hll_sql(val_expr: str, p: int = 8, group_by: str = "") -> str:
    """DuckDB fragment replaying registers + estimate for the oracle.

    Returns a SELECT producing (group_by cols..., est_distinct) from a
    relation alias `hllsrc(v)` the caller provides via WITH. Shares the
    estimator numerator literal with the Column path."""
    m = 1 << p
    w = _HASH_BITS - p
    grp = f"{group_by}, " if group_by else ""
    grp_by = f"GROUP BY {group_by}" if group_by else ""
    return (
        f"SELECT {grp}CASE WHEN raw <= {2.5 * m!r} AND v > 0 THEN "
        f"{float(m)!r} * ln({float(m)!r} / CAST(v AS DOUBLE)) "
        f"ELSE raw END AS est_distinct FROM ("
        f"SELECT {grp}{_alpha_num(p)!r} / CAST(sum(sc) + ({m} - count(*)) "
        f"* {1 << (w + 1)} AS DOUBLE) AS raw, {m} - count(*) AS v FROM ("
        f"SELECT {grp}reg, (1::BIGINT << ({w + 1} - max(rho))) AS sc FROM ("
        f"SELECT {grp}h & {m - 1} AS reg, CASE WHEN (h >> {p}) = 0 "
        f"THEN {w + 1} ELSE {w + 1} - length(bin(h >> {p})) END AS rho "
        f"FROM (SELECT {grp}('0x' || substr(md5(CAST({val_expr} AS VARCHAR)), "
        f"1, 15))::BIGINT AS h FROM hllsrc WHERE {val_expr} IS NOT NULL)) "
        f"GROUP BY {grp}reg) {grp_by})"
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
# The frequency twin of the HLL register table: "how often does X occur"
# over data too big to hold exact counts per key. d rows x w counters,
# updated additively -> the sketch is a SUM-mergeable fixed-size table
# (d*w rows max in the shuffle regardless of input), estimates are
# min over d counters: never an underestimate, overestimate bounded by
# e*N/w with probability 1 - e^-d. Same determinism contract as HLL:
# md5-60bit + double hashing, pure integers, SQL-replayable.


def cms_positions(col: Column, depth: int, width: int) -> Column:
    """Array of d (row, col) probe positions via double hashing —
    pos_j = (h + j*h2) mod w, h2 odd (the bloom.py probe schedule)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    h2 = F.shiftrightunsigned(h, 29).bitwiseOR(F.lit(1))
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                ((h + F.lit(j) * h2) % F.lit(width)).alias("col"),
            )
            for j in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1 << 12,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min table (row, col, c): explode d positions per value,
    one hash aggregate with map-side combine. Merge sketches built on
    different shards/days by union + groupBy-sum (tested)."""
    if not 1 <= depth <= 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")
    if width < 16:
        raise ValueError(f"width must be >= 16, got {width}")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        df.where(F.col(col).isNotNull())
        .select(
            F.explode(cms_positions(F.col(col), depth, width)).alias("p"),
            w.alias("w"),
        )
        .select(F.col("p.row").alias("row"), F.col("p.col").alias("col"), "w")
        .groupBy("row", "col")
        .agg(F.sum("w").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum-merge Count-Min tables built with the same (depth, width)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch_df: DataFrame,
    queries: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1 << 12,
) -> DataFrame:
    """Point-frequency estimates for each query value: explode the d
    probe positions, inner-join the sketch table (missing counter =
    impossible here: every probed counter was touched if the value
    occurred; a fully absent value keeps its true 0 only via left join
    + coalesce), take min over rows. Returns (value, est_count)."""
    probes = queries.select(
        F.col(col).alias("value"),
        F.explode(cms_positions(F.col(col), depth, width)).alias("p"),
    ).select("value", F.col("p.row").alias("row"), F.col("p.col").alias("col"))
    joined = probes.join(sketch_df, ["row", "col"], "left").select(
        "value", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return joined.groupBy("value").agg(F.min("c").alias("est_count"))


def cms_sql(
    val_expr: str, src: str, depth: int = 4, width: int = 1 << 12
) -> str:
    """DuckDB replay of build+estimate: returns a SELECT producing
    (value, est_count) for every distinct value of `q_expr` in relation
    `cmsq(v)`, over a sketch built from relation `{src}` (one column
    referenced by val_expr). Caller provides both via WITH."""
    h = f"('0x' || substr(md5(CAST({val_expr} AS VARCHAR)), 1, 15))::BIGINT"
    pos = (
        f"(({h}) + j.j * ((({h}) >> 29) | 1)) % {width}"
    )
    return (
        f"SELECT value, min(c) AS est_count FROM ("
        f"SELECT q.value, q.row, q.col, COALESCE(s.c, 0) AS c FROM ("
        f"SELECT v AS value, j.j AS row, "
        f"(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT "
        f"+ j.j * ((('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT "
        f">> 29) | 1)) % {width} AS col "
        f"FROM cmsq, range({depth}) j(j)) q LEFT JOIN ("
        f"SELECT j.j AS row, {pos} AS col, count(*)::BIGINT AS c "
        f"FROM {src}, range({depth}) j(j) WHERE {val_expr} IS NOT NULL "
        f"GROUP BY j.j, {pos}) s ON q.row = s.row AND q.col = s.col) "
        f"GROUP BY value"
    )


# ---------------------------------------------------------------------------
# log-scaled histogram sketch (HdrHistogram-style quantiles)
# ---------------------------------------------------------------------------
# The quantile member of the sketch family: exact percentiles need a
# global sort; this histogram needs one hash aggregate over at most
# 63 * 2^(sub_bits+1) buckets and merges by SUM (like Count-Min), with
# relative error bounded by 2^-sub_bits. Bucket id derives from the
# fixed-point value's bit length (the HLL bin() idiom) plus its top
# sub_bits+1 bits — pure integers, SQL-replayable, no transcendentals.


def _pow2_arr() -> Column:
    return F.array(*[F.lit(1 << i).cast("long") for i in range(63)])


def hist_buckets(
    df: DataFrame,
    col: str,
    sub_bits: int = 5,
    scale: int = 100,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Histogram sketch rows (group..., e, b, cnt): x = the value at
    fixed-point `scale` (clamped to >= 1 — the sketch is for positive
    measures), e = bit length of x, b = x's top min(e, sub_bits+1)
    bits. Bucket lower bound = b << (e - 1 - sub_bits) when e >
    sub_bits + 1, else exactly x (small values are EXACT)."""
    if not 0 <= sub_bits <= 12:
        raise ValueError(f"sub_bits must be in [0, 12], got {sub_bits}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    x = F.greatest(
        F.floor(F.col(col) * F.lit(scale)).cast("long"), F.lit(1).cast("long")
    )
    e = F.length(F.bin(x))
    shift = F.greatest(e - F.lit(1 + sub_bits), F.lit(0))
    div = F.element_at(_pow2_arr(), (shift + 1).cast("int"))
    b = F.expr("xv div dv")
    staged = (
        df.where(F.col(col).isNotNull())
        .select(*group_cols, x.alias("xv"), e.alias("e"), div.alias("dv"))
        .select(*group_cols, "e", b.alias("b"))
    )
    return staged.groupBy(*group_cols, "e", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def hist_merge(*sketches: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Sum-merge histogram sketches built with the same (sub_bits, scale)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "e", "b").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    buckets: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    sub_bits: int = 5,
    scale: int = 100,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quantile estimates from a histogram sketch: the LOWER BOUND of
    the first bucket whose cumulative count reaches ceil(q * N) (a
    deterministic rank rule; estimate is within 2^-sub_bits relative
    of the true quantile). The window runs over the BUCKET table —
    <= 63 * 2^(sub_bits+1) rows per group, never the data."""
    from pyspark.sql import Window

    lower = F.col("b") * F.element_at(
        _pow2_arr(),
        (F.greatest(F.col("e") - F.lit(1 + sub_bits), F.lit(0)) + 1).cast(
            "int"
        ),
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("e", "b")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = buckets.select(
        *group_cols,
        lower.alias("lo"),
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("cnt").over(wall).alias("total"),
    )
    outs = []
    for q in qs:
        rank = F.ceil(F.lit(q) * F.col("total")).cast("long")
        outs.append(
            cum.where(F.col("cum") >= rank)
            .groupBy(*group_cols)
            .agg(F.min("lo").alias("lo"))
            .select(
                *group_cols,
                F.lit(q).alias("q"),
                (F.col("lo").cast("double") / F.lit(scale)).alias("est"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
