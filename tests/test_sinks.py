"""Sink semantics tests (K1-K3, A2-A3)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from geoharvest_spark import sinks
from geoharvest_spark.normalize import split_failed
from geoharvest_spark.pipeline import harvest_pages


@pytest.fixture(scope="module")
def normalized(spark, pages_small):
    return harvest_pages(pages_small).cache()


def test_jsonl_excludes_none_and_empty(normalized):
    ok, _ = split_failed(normalized)
    out = sinks.aardvark_jsonl_col(ok).select("jsonl").limit(20).collect()
    for r in out:
        d = json.loads(r.jsonl)
        assert all(v is not None and v != [] for v in d.values())
        # required keys always present
        for k in ("id", "dct_title_s", "dct_accessRights_s", "gbl_mdVersion_s"):
            assert k in d


def test_write_combined_jsonl(tmp_path, spark, normalized):
    ok, _ = split_failed(normalized)
    sinks.write_combined_jsonl(ok, str(tmp_path / "combined"))
    back = spark.read.text(str(tmp_path / "combined"))
    assert back.count() == ok.count()
    first = json.loads(back.first().value)
    assert first["gbl_mdVersion_s"] == "Aardvark"


def test_output_filenames(normalized):
    ok, _ = split_failed(normalized)
    df = sinks.with_output_filenames(ok)
    pdf = df.select(
        "identifier", "metadata_format", "source_metadata_filename",
        "normalized_metadata_filename",
    ).limit(50).toPandas()
    for _, r in pdf.iterrows():
        ext = "xml" if r.metadata_format in ("fgdc", "iso19139", "marc") else "json"
        assert r.source_metadata_filename == (
            f"{r.identifier}.source.{r.metadata_format}.{ext}"
        )
        assert r.normalized_metadata_filename == (
            f"{r.identifier}.normalized.aardvark.json"
        )


def test_pooled_events_last_wins_and_quirk(normalized):
    ok, _ = split_failed(normalized)
    ev = sinks.pooled_events(ok)
    pdf = ev.toPandas()
    assert pdf.identifier.is_unique
    assert set(pdf.restricted.unique()) <= {"true", "false"}  # strings!
    assert set(pdf.deleted.unique()) <= {"true", "false"}
    assert all(len(o) == 3 for o in pdf.objects)


def test_run_stats_and_failure_rollup(normalized):
    stats = sinks.run_stats(normalized)
    assert stats["processed"] == 300
    assert stats["successful"] + stats["failed"] == 300
    _, failed = split_failed(normalized)
    roll = sinks.failure_rollup(failed).toPandas()
    assert roll.n.sum() == stats["failed"]
    assert all(": " in f for f in roll.failure)
