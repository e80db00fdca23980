"""Hashed-feature linear quality classifier: deterministic training,
engine/Python-twin score equality, plan shape, and the curation gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoharvest_spark.qmodel import (
    featurize_py,
    quality_model_scores,
    synth_labeled_docs,
    train_quality_perceptron,
)


def test_training_deterministic_and_separates():
    w1 = train_quality_perceptron()
    train_quality_perceptron.cache_clear()
    w2 = train_quality_perceptron()
    assert w1 == w2 and len(w1) > 0
    w = dict(w1)
    for text, label in synth_labeled_docs(400):
        s = sum(w.get(b, 0) for b in featurize_py(text))
        assert (s > 0) == (label > 0), (text[:40], s, label)


def test_engine_matches_python_twin(spark):
    rows = [(i, t) for i, (t, _) in enumerate(synth_labeled_docs(60))] + [
        (100, ""),  # no tokens -> score 0, pred 0
        (101, "single"),  # one token, no bigram
        (102, "  MiXeD   Case\tclick  "),  # ws collapse + lowercase
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.score, r.pred)
        for r in quality_model_scores(df).collect()
    }
    w = dict(train_quality_perceptron())
    for i, t in rows:
        s = sum(w.get(b, 0) for b in featurize_py(t))
        assert got[i] == (s, int(s > 0)), (i, got[i], s)
    assert got[100] == (0, 0)


def test_plan_codegen_broadcast_single_split(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        quality_model_scores(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # weight table broadcast, not shuffled
    assert plan.count("split(") == 1  # token array staged once


def test_curation_model_quality_gate(spark, tmp_path):
    from geoharvest_spark.curation import CurationConfig, curate

    n = 60
    i = F.col("doc_id")
    # both branches pass the upstream heuristic gates (>= 10 words,
    # English stopword markers, high distinct ratio) so the MODEL stage
    # is what separates them: spam scores -142, good +14 (threshold 1)
    text = F.when(
        i % 3 == 0,
        F.lit(
            "the click and buy of free to offer a winner in casino is "
            "cash the prize and deal of bonus"
        ),
    ).otherwise(
        F.concat(
            F.lit(
                "the study and analysis of method to result a climate in "
                "research is history the theory and nature of energy doc "
            ),
            i.cast("string"),
        )
    )
    docs = spark.range(7000, 7000 + n).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    pages = docs.select(
        "doc_id",
        F.concat(F.lit("https://q.com/d/"), i.cast("string")).alias("url"),
        F.concat(
            F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
        ).alias("html"),
    )
    bench = spark.createDataFrame(
        [(9_000_000, "benchmark only text nothing shared")],
        "doc_id long, text string",
    )
    cfg = CurationConfig(qmodel_min_score=1)
    final, rep = curate(spark, pages, bench, str(tmp_path), cfg=cfg)
    st = {s["stage"]: s for s in rep.stages}
    assert st["model_quality"]["rows_in"] == n
    assert st["model_quality"]["rows_out"] == n - n // 3
    assert final.where(F.col("doc_id") % 3 == 0).count() == 0
    assert final.count() > 0
