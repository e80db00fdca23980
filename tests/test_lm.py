"""Bigram LM perplexity-filter operator: hand-computed training golden,
integer-cost scoring parity with a pure-python reference, short-doc
semantics, and the broadcast-join plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from geoharvest_spark import lm


def test_train_bigram_lm_hand_computed():
    """Corpus 'a b a b' + 'a b c': uni a=3 b=3 c=1 (V=3);
    bigrams (a,b)=3, (b,a)=1, (b,c)=1.
    cost(a,b) = floor(-log((3+1)/(3+3)) * 1e6) = floor(-log(2/3)*1e6)."""
    m = lm.train_bigram_lm(["a b a b", "a b c"])
    assert m["vocab"] == 3 and m["n_train_tokens"] == 7
    assert m["costs"][("a", "b")] == math.floor(-math.log(4 / 6) * 1e6)
    assert m["costs"][("b", "a")] == math.floor(-math.log(2 / 6) * 1e6)
    assert m["costs"][("b", "c")] == math.floor(-math.log(2 / 6) * 1e6)
    assert ("c", "a") not in m["costs"]
    # oov: min unigram count is 1 (c) -> floor(-log(1/(1+3)) * 1e6)
    assert m["oov_cost"] == math.floor(-math.log(1 / 4) * 1e6)
    # determinism incl. input order
    assert lm.train_bigram_lm(["a b c", "a b a b"])["costs"] == m["costs"]


def test_max_bigrams_keeps_most_frequent():
    m = lm.train_bigram_lm(["x y x y x y", "p q"], max_bigrams=2)
    assert set(m["costs"]) == {("x", "y"), ("y", "x")}


def test_with_lm_score_matches_python_reference(spark):
    train = ["the cat sat on the mat", "the dog sat on the rug",
             "a cat and a dog"]
    m = lm.train_bigram_lm(train)
    docs = [
        (0, "the cat sat on the mat"),   # in-distribution
        (1, "mat the on sat cat the"),   # shuffled -> unseen bigrams
        (2, "zz qq ww"),                 # full OOV
        (3, "single"),                   # < 2 tokens: no bigrams
        (4, ""),
    ]
    out = {
        r["doc_id"]: r
        for r in lm.with_lm_score(
            spark.createDataFrame(docs, ["doc_id", "text"]), m
        ).collect()
    }
    for did, text in docs:
        toks = text.split()
        grams = list(zip(toks, toks[1:]))
        want = sum(m["costs"].get(g, m["oov_cost"]) for g in grams)
        assert out[did]["n_bigrams"] == len(grams)
        assert out[did]["cost_micronats"] == want
        if grams:
            assert out[did]["avg_cost_micronats"] == want / len(grams)
        else:
            assert out[did]["avg_cost_micronats"] is None
    # the quality signal: in-distribution beats shuffled beats gibberish
    assert (
        out[0]["avg_cost_micronats"]
        < out[1]["avg_cost_micronats"]
        <= out[2]["avg_cost_micronats"]
    )


def test_lm_score_plan_broadcast_no_udf(spark):
    m = lm.train_bigram_lm(["a b c d e f g h", "a b a b"])
    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    out = lm.with_lm_score(df, m)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys
    assert "EvalPython" not in phys and "Exchange hashpartitioning(w1" not in phys
