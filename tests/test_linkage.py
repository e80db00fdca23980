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


def test_fuzzy_join_equals_brute_force(spark):
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
            left, right, "lid", "rid", "name", max_dist=1
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


def test_fuzzy_join_blocking_completeness_sweep(spark):
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
            left, right, "lid", "rid", "name", max_dist=1
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
