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
payload. Hot grams (stopword-like trigrams) skew the gram join exactly
like hot LSH buckets — AQE skew-join splitting handles moderate cases,
and a frequency-ceiling prefix filter is the lossy relaxation at the
extreme (not applied here: it trades recall, and the oracle check is
exact).

Reference: the reference harvester has no fuzzy matching; this extends
the dedup/linkage family (SURVEY §2 beyond-reference web ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    col: str,
    max_dist: int = 1,
    q: int = 3,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein(left.col, right.col)
    <= max_dist``, found via q-gram blocking (complete for strings of
    length >= (max_dist+1)*q + max_dist - 1; shorter strings still
    block on their whole text, which is complete only for exact/prefix
    edits — callers with short keys should lower ``q``).

    Returns (left_id, right_id, left_<col>, right_<col>, dist) with
    dist the exact edit distance. Candidate generation shuffles ids
    only; strings re-attach by id for the refine.
    """
    lt = left.select(
        F.col(left_id).alias("_lid"), F.col(col).alias("_ltxt")
    )
    rt = right.select(
        F.col(right_id).alias("_rid"), F.col(col).alias("_rtxt")
    )
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
