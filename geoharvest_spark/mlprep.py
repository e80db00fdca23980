"""ML feature engineering: smoothed target encoding and the hashing
trick — the two feature transforms every large-scale tabular-ML
pipeline runs before training.

``target_encode`` replaces a high-cardinality categorical with the
smoothed per-category mean of the target (empirical-Bayes shrinkage
toward the global mean): enc = (sum_cat + m * g) / (n_cat + m) with
g = global mean and m the pseudo-count prior. Two hash aggregates (one
per-category, one global 1-row broadcast) — no window, no Python; at
100 TB the per-category table is categories-sized, the global stat is
one row.

``feature_hash`` is the hashing trick (Weinberger et al., ICML 2009):
token -> bucket index in [0, d) with a deterministic sign, collisions
left to cancel in expectation. Implemented md5-based so the DuckDB
oracle replays it bit-for-bit ('0x' || md5-prefix parse — the engine's
established cross-engine hash idiom): idx = md5_u62(token) % d, sign
from the next hex nibble. Output is a sorted sparse vector
array<struct<idx,w>> per row — narrow, shuffle-free.

Determinism (oracle discipline): target sums/counts are exact BIGINTs;
the encode is two IEEE divisions and one multiply-add mirrored verbatim
in SQL (no transcendentals); hash weights are integer sums.

Reference: the reference harvester has no ML-prep surface; this extends
the training-pipeline family (SURVEY §2 beyond-reference ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: float = 10.0,
    out_col: str = "target_enc",
) -> DataFrame:
    """Per-category smoothed target mean joined back onto every row.

    enc = (sum_cat + m * g) / (n_cat + m), g = global_sum / global_n.
    The category table is broadcast when small (Catalyst/AQE decides);
    the global stat is a 1-row broadcast cross join. Unseen-category
    handling is the caller's join against a TRAINED encoder table — this
    in-sample form is the fit step.
    """
    per = df.groupBy(cat_col).agg(
        F.sum(target_col).cast("long").alias("_s"),
        F.count(target_col).alias("_n"),
    )
    glob = df.agg(
        F.sum(target_col).cast("long").alias("_gs"),
        F.count(target_col).alias("_gn"),
    )
    enc = (
        per.crossJoin(F.broadcast(glob))
        .withColumn("_g", F.col("_gs").cast("double") / F.col("_gn"))
        .withColumn(
            out_col,
            (F.col("_s") + F.lit(float(m)) * F.col("_g"))
            / (F.col("_n") + F.lit(float(m))),
        )
        .select(cat_col, F.col("_n").alias("cat_n"), out_col)
    )
    return df.join(enc, cat_col)


def _md5_u62(col: Column) -> Column:
    """First 15 hex chars of md5 as a non-negative BIGINT (< 2^60) — the
    engine's cross-engine hash idiom (DuckDB: ('0x' || substr(md5(x),
    1, 15))::UBIGINT), avoiding xxhash64 which DuckDB lacks."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def feature_hash(
    df: DataFrame,
    text_col: str = "text",
    d: int = 1024,
    out_col: str = "features",
) -> DataFrame:
    """Hashing-trick sparse features from the whitespace token stream:
    bucket = md5_u62(token) % d; sign = +1 if the 16th md5 hex char is
    0-7 else -1; weight = signed token count summed per bucket. Emits
    ``out_col`` as array<struct<idx int, w long>> sorted by idx (a
    deterministic sparse vector), plus ``n_feat`` (occupied buckets).

    Plan: staged token split -> posexplode-free explode -> per (row,
    bucket) hash aggregate -> per-row sort_array(collect_list) — the
    per-row array is bounded by min(d, tokens). Shuffles key on the row
    id; nothing leaves the JVM.
    """
    from .textops import tokens_col

    base = df.withColumn("_toks", tokens_col(F.col(text_col)))
    toks_nonempty = F.when(F.size("_toks") > 0, F.col("_toks"))
    ex = base.select(
        "*", F.explode(toks_nonempty).alias("_tok")
    ).where(F.col("_tok") != "")
    h = _md5_u62(F.col("_tok"))
    sign = F.when(
        F.substring(F.md5(F.col("_tok")), 16, 1).isin(
            *"01234567"
        ),
        F.lit(1),
    ).otherwise(F.lit(-1))
    keys = [c for c in df.columns if c != text_col]
    per = ex.groupBy(*keys, F.pmod(h, F.lit(d)).cast("int").alias("_idx")).agg(
        F.sum(sign).cast("long").alias("_w")
    )
    return (
        per.where(F.col("_w") != 0)
        .groupBy(*keys)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("_idx").alias("idx"), F.col("_w").alias("w"))
                )
            ).alias(out_col),
            F.count(F.lit(1)).cast("long").alias("n_feat"),
        )
    )
