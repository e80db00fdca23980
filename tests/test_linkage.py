from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoharvest_spark.linkage import blocked_fuzzy_join, qgrams


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_qgrams_basic(spark):
    df = spark.createDataFrame([("abcde",), ("ab",)], "s string")
    out = {
        r["s"]: r["g"]
        for r in df.select("s", qgrams(F.col("s")).alias("g")).collect()
    }
    assert out["abcde"] == ["abc", "bcd", "cde"]
    assert out["ab"] == ["ab"]  # shorter than q: whole string


@pytest.mark.parametrize("prefix_filter", [True, False])
def test_fuzzy_join_equals_brute_force(spark, prefix_filter):
    # names with planted 1-edit variants + decoys
    lnames = [
        (1, "karomita"),
        (2, "venelsur"),
        (3, "dargorne"),
        (4, "shilokane"),
    ]
    rnames = [
        (10, "karomita"),  # dist 0 of 1
        (11, "karomta"),  # deletion of 1
        (12, "venelsus"),  # substitution of 2
        (13, "xylophone"),  # no match
        (14, "dargorneX"),  # insertion of 3
    ]
    left = spark.createDataFrame(lnames, "lid long, name string")
    right = spark.createDataFrame(rnames, "rid long, name string")
    got = sorted(
        (r["lid"], r["rid"], r["dist"])
        for r in blocked_fuzzy_join(
            left, right, "lid", "rid", "name", max_dist=1,
            prefix_filter=prefix_filter,
        ).collect()
    )
    want = sorted(
        (l, r, _lev(a, b))
        for l, a in lnames
        for r, b in rnames
        if _lev(a, b) <= 1
    )
    assert got == want
    assert (1, 10, 0) in got and (3, 14, 1) in got


@pytest.mark.parametrize("prefix_filter", [True, False])
def test_fuzzy_join_blocking_completeness_sweep(spark, prefix_filter):
    # every single-deletion variant of every name must be found (the
    # count-filter guarantee at q=3, k=1, len >= 7)
    base = [f"{a}{b}{c}x" for a in "abc" for b in "de" for c in "fg"]
    base = [(i, (s * 2)) for i, s in enumerate(base)]  # len 8
    variants = [
        (100 + i, s[:p] + s[p + 1 :])
        for i, s in base
        for p in (i % len(s),)
    ]
    left = spark.createDataFrame(base, "lid long, name string")
    right = spark.createDataFrame(variants, "rid long, name string")
    got = {
        (r["lid"], r["rid"])
        for r in blocked_fuzzy_join(
            left, right, "lid", "rid", "name", max_dist=1,
            prefix_filter=prefix_filter,
        ).collect()
    }
    brute = {
        (l, r)
        for l, a in base
        for r, b in variants
        if _lev(a, b) <= 1
    }
    assert got == brute
    for i, _ in base:  # each planted pair recovered
        assert (i, 100 + i) in got


@pytest.mark.parametrize("prefix_filter", [True, False])
def test_fuzzy_join_repeated_grams_bag_semantics(spark, prefix_filter):
    # strings dominated by ONE repeated gram: bag-element keying
    # (g, occ) must still recover 1-edit pairs that share only the
    # k*q+1-th occurrence of the common gram
    names = [
        (1, "abababababab"),
        (2, "abababababab"[:-1] + "x"),  # substitution at the tail
        (3, "babababababa"),
        (4, "zzzzzzzzzzzz"),
    ]
    df = spark.createDataFrame(names, "nid long, name string")
    got = {
        (r["nid"], r["nid_b"], r["dist"])
        for r in blocked_fuzzy_join(
            df,
            df.withColumnRenamed("nid", "nid_b"),
            "nid",
            "nid_b",
            "name",
            max_dist=1,
            prefix_filter=prefix_filter,
        ).collect()
        if r["nid"] < r["nid_b"]
    }
    brute = {
        (a, b, _lev(sa, sb))
        for a, sa in names
        for b, sb in names
        if a < b and _lev(sa, sb) <= 1
    }
    assert got == brute
    assert (1, 2, 1) in got


def test_fuzzy_join_serial_keys_prefix_prunes(spark):
    # scaffolded keys ("Customer#" + 9 pseudo-random digits) share every
    # prefix gram, so plain gram blocking candidates ALL pairs; the
    # frequency-ordered prefix path must (a) stay exact and (b) generate
    # o(n^2) candidates because the digit grams are discriminative.
    # (DENSELY serial keys — 000000041 vs 000000042 — are the proven
    # un-prunable case: see the module docstring's tightness note.)
    from geoharvest_spark.linkage import _gram_occurrences

    n = 300
    names = [(i, f"Customer#{(i * 7919) % 10**9:09d}") for i in range(n)]
    names += [(1000 + i, names[i][1][:-1] + "X") for i in range(8)]
    df = spark.createDataFrame(names, "cid long, name string")
    got = {
        (r["cid"], r["cid_b"])
        for r in blocked_fuzzy_join(
            df,
            df.withColumnRenamed("cid", "cid_b"),
            "cid",
            "cid_b",
            "name",
            max_dist=1,
        ).collect()
        if r["cid"] < r["cid_b"]
    }
    brute = {
        (a, b)
        for a, sa in names
        for b, sb in names
        if a < b and _lev(sa, sb) <= 1
    }
    assert got == brute and len(brute) >= 8  # the planted 1-edit twins
    # pruning property: candidate pairs from the rarest-4-gram prefixes
    # are a small multiple of the true matches, nowhere near n*(n-1)/2
    occ = _gram_occurrences(
        df.select(F.col("cid").alias("_id"), F.col("name").alias("_t")),
        "_id",
        "_t",
        3,
    )
    freq = occ.groupBy("g", "occ").agg(F.count(F.lit(1)).alias("_df"))
    from pyspark.sql import Window

    pref = (
        occ.join(freq, ["g", "occ"])
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_id").orderBy("_df", "g", "occ")
            ),
        )
        .where(F.col("_rn") <= 4)
        .select("_id", "g", "occ")
    )
    n_cand = (
        pref.join(
            pref.withColumnRenamed("_id", "_id2"), ["g", "occ"]
        )
        .where(F.col("_id") < F.col("_id2"))
        .select("_id", "_id2")
        .distinct()
        .count()
    )
    m = len(names)
    assert n_cand < m * (m - 1) / 2 / 5, n_cand
