"""Cross-round regression pins: whole-pipeline output hashes.

If any of these change, either the generator, the extractor, or a
normalizer changed behavior — the analog of the reference's golden fixture
corpus (tests/fixtures/) compressed to content hashes.
"""

from __future__ import annotations

import hashlib

from geoharvest_spark import sinks
from geoharvest_spark.pipeline import harvest_pages_fused
from geoharvest_spark.synth import web_pages_df

GOLDEN_NORMALIZE_MD5 = "d15b19d312a085e853ef8e8ec2f19334"


def test_normalized_output_hash_pinned(spark):
    out = sinks.aardvark_jsonl_col(harvest_pages_fused(web_pages_df(spark, 100)))
    rows = out.select("url", "jsonl", "error.stage").collect()
    lines = sorted(f"{r.url}\t{r.jsonl}\t{r.stage}" for r in rows)
    assert len(lines) == 100
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    assert h == GOLDEN_NORMALIZE_MD5


def test_as_of_join_semantics(spark):
    import pandas as pd

    from geoharvest_spark.joins import as_of_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1, 2], "lt": [5.0, 2.0, 7.0], "lval": ["a", "b", "c"]}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "rt": [3.0, 9.0, 7.0], "rval": ["X", "Y", "Z"]})
    )
    got = (
        as_of_join(left, right, "k", "lt", "rt")
        .toPandas()
        .sort_values(["k", "lt"])
        .reset_index(drop=True)
    )
    # lt=2 has no earlier right row -> null; lt=5 matches rt=3;
    # lt=7 matches rt=7 (<= equality included)
    assert got.rval.fillna("~").tolist() == ["~", "X", "Z"]


def test_as_of_join_forward(spark):
    import pandas as pd

    from geoharvest_spark.joins import as_of_join

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "lt": [5.0, 10.0], "lval": ["a", "b"]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "rt": [6.0, 20.0], "rval": ["X", "Y"]})
    )
    got = (
        as_of_join(left, right, "k", "lt", "rt", direction="forward")
        .toPandas()
        .sort_values("lt")
        .reset_index(drop=True)
    )
    assert got.rval.tolist() == ["X", "Y"]
