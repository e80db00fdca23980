"""Record linkage: blocked fuzzy string join (q-gram candidate
generation + exact Levenshtein refine).

Entity resolution across 100 TB of scraped records cannot compare all
pairs; the standard trick is an inverted index on character q-grams —
the count-filter theorem guarantees two strings within edit distance k
share at least ``max(|a|,|b|) - q + 1 - k*q`` q-grams, so for strings
longer than ``(k+1)*q + k - 1`` every true match shares AT LEAST ONE
q-gram and gram-blocking is lossless. Candidates are then refined with
the built-in JVM ``levenshtein`` (whole-stage codegen, no Python).

Plan shape (mirrors the engine's MinHash-LSH discipline,
textops.py:470): grams explode ids-only, the candidate join carries
(left_id, right_id) pairs — never the strings — and names re-attach by
id after DISTINCT, so the shuffle volume is grams x id, not grams x
payload.

Hot grams (stopword-like trigrams, shared key prefixes) skew the gram
join exactly like hot LSH buckets — and worse: on serial-numbered keys
("Customer#000000042") EVERY row shares the prefix grams and naive
gram-blocking degenerates to the all-pairs join it was built to avoid.
The LOSSLESS fix is prefix filtering (Ed-Join): under any global total
order on gram occurrences, two strings within edit distance k must
share one of each other's ``k*q + 1`` FIRST gram-occurrences — order by
ascending corpus frequency and the blocking keys become each string's
rarest grams, so universal prefixes never generate candidates. Proof
sketch: the count filter [Gravano et al., VLDB 2001] gives bag overlap
``|G(a) ∩ G(b)| >= max(|a|,|b|) - q + 1 - k*q`` for ed(a,b) <= k, and
the prefix-filter principle [Chaudhuri et al., ICDE 2006; Xiao, Wang &
Lin's Ed-Join, VLDB 2008] turns any overlap lower bound t into
intersecting prefixes of length ``|G| - t + 1``; substituting t shows
``k*q + 1`` suffices for BOTH sides regardless of length difference
(the longer side needs exactly k*q+1, the shorter strictly less). Bag
semantics (repeated grams) are preserved by keying on (gram,
occurrence#) pairs.

Tightness boundary (measured, test_linkage.py): prefix filtering prunes
when keys carry discriminative content — scaffolded keys with
pseudo-random digit tails drop from all-pairs to a small multiple of
the true matches. DENSELY serial keys ("…041" vs "…250") are provably
un-prunable by ANY lossless gram method: such a pair shares the 9
scaffold grams plus min-4 zero-run grams = bag overlap exactly t, so
the count-filter bound is met by a distance-3 pair and every pair stays
a mandatory candidate; only the levenshtein refine separates them.

Reference: the reference harvester has no fuzzy matching; this extends
the dedup/linkage family (SURVEY §2 beyond-reference web ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def qgrams(col: Column, q: int = 3) -> Column:
    """Distinct character q-grams of a string as array<string> (1-based
    substring windows; strings shorter than q yield the string itself so
    short keys still block somewhere)."""
    n = F.length(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (q - 1), F.lit(1))),
        lambda i: col.substr(i, F.lit(q)),
    )
    return F.array_distinct(grams)


def _gram_occurrences(
    df: DataFrame, id_alias: str, txt_alias: str, q: int
) -> DataFrame:
    """Bag-element rows (id, g, occ): each q-gram occurrence of the
    string, with occ = 1..count(g in string). Keying on (g, occ) makes
    set intersection of elements equal BAG intersection of q-gram
    multisets — sum over g of min(count_a, count_b) — which is what the
    count-filter theorem bounds. Built as one hash aggregate + sequence
    explode (no window); the gram array keeps duplicates (qgrams()'s
    array_distinct would undercount bag overlap)."""
    n = F.length(F.col(txt_alias))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (q - 1), F.lit(1))),
        lambda i: F.col(txt_alias).substr(i, F.lit(q)),
    )
    return (
        df.select(id_alias, F.explode(grams).alias("g"))
        .groupBy(id_alias, "g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            id_alias,
            "g",
            F.explode(F.sequence(F.lit(1), F.col("_c"))).alias("occ"),
        )
    )


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    col: str,
    max_dist: int = 1,
    q: int = 3,
    prefix_filter: bool = True,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein(left.col, right.col)
    <= max_dist``, found via q-gram blocking (complete for strings of
    length >= (max_dist+1)*q + max_dist - 1; shorter strings still
    block on their whole text, which is complete only for exact/prefix
    edits — callers with short keys should lower ``q``).

    With ``prefix_filter`` (default, the scale path) each string blocks
    only on its ``max_dist*q + 1`` gram-occurrences of LOWEST corpus
    frequency (frequency computed over left ∪ right so both sides share
    one total order; ties break on the gram string then occurrence#) —
    lossless by the Ed-Join prefix-filter argument in the module
    docstring, and immune to universal-prefix key schemes where plain
    gram-blocking degenerates to all-pairs. ``prefix_filter=False``
    blocks on every distinct gram (smaller constant factor when grams
    are near-unique anyway).

    Returns (left_id, right_id, left_<col>, right_<col>, dist) with
    dist the exact edit distance. Candidate generation shuffles ids
    only; strings re-attach by id for the refine, behind a codegen
    length-difference cut (|len_a - len_b| <= k) that skips the O(m*n)
    levenshtein on impossible pairs.
    """
    lt = left.select(
        F.col(left_id).alias("_lid"), F.col(col).alias("_ltxt")
    )
    rt = right.select(
        F.col(right_id).alias("_rid"), F.col(col).alias("_rtxt")
    )
    if prefix_filter:
        p = max_dist * q + 1
        lo = _gram_occurrences(lt, "_lid", "_ltxt", q)
        ro = _gram_occurrences(rt, "_rid", "_rtxt", q)
        freq = (
            lo.select("g", "occ")
            .unionAll(ro.select("g", "occ"))
            .groupBy("g", "occ")
            .agg(F.count(F.lit(1)).alias("_df"))
        )
        rank_w = F.row_number().over(
            Window.partitionBy("_id").orderBy("_df", "g", "occ")
        )

        def _prefix(oc, id_name):
            return (
                oc.withColumnRenamed(id_name, "_id")
                .join(freq, ["g", "occ"])
                .withColumn("_rn", rank_w)
                .where(F.col("_rn") <= p)
                .select(F.col("_id").alias(id_name), "g", "occ")
            )

        cand = (
            _prefix(lo, "_lid")
            .join(_prefix(ro, "_rid"), ["g", "occ"])
            .select("_lid", "_rid")
            .distinct()
        )
    else:
        lg = lt.select(
            "_lid", F.explode(qgrams(F.col("_ltxt"), q)).alias("g")
        )
        rg = rt.select(
            "_rid", F.explode(qgrams(F.col("_rtxt"), q)).alias("g")
        )
        cand = lg.join(rg, "g").select("_lid", "_rid").distinct()
    refined = (
        cand.join(lt, "_lid")
        .join(rt, "_rid")
        .where(
            F.abs(F.length("_ltxt") - F.length("_rtxt")) <= max_dist
        )
        .withColumn("dist", F.levenshtein(F.col("_ltxt"), F.col("_rtxt")))
        .where(F.col("dist") <= max_dist)
    )
    return refined.select(
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(right_id),
        F.col("_ltxt").alias(f"left_{col}"),
        F.col("_rtxt").alias(f"right_{col}"),
        "dist",
    )
