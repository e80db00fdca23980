"""Source-operator semantics tests (S1-S9 / F1-F5 / F10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoharvest_spark import sources as src
from geoharvest_spark.extract import with_metadata


def test_modified_date_filter_half_open(pages_small):
    lo = src.modified_date_filter(pages_small, "2024-03-01", "2024-06-01")
    pdf = lo.select("warc_ts").toPandas()
    assert (pdf.warc_ts >= "2024-03-01").all()
    assert (pdf.warc_ts < "2024-06-01").all()
    total = pages_small.count()
    below = src.modified_date_filter(pages_small, None, "2024-03-01").count()
    above = src.modified_date_filter(pages_small, "2024-06-01", None).count()
    assert below + above + lo.count() == total  # partition of the range


def test_extension_filter(pages_small):
    xml = src.extension_filter(
        pages_small.withColumn("url", F.regexp_replace("url", r"#rec\d+$", "")),
        ".XML",
    )
    assert xml.count() > 0
    assert all(r.url.lower().endswith(".xml") for r in xml.select("url").collect())


def test_filename_strategy_filter_xor(pages_small):
    with pytest.raises(ValueError):
        src.filename_strategy_filter(pages_small)
    with pytest.raises(ValueError):
        src.filename_strategy_filter(pages_small, "x", "y")
    byd = src.filename_strategy_filter(pages_small, file_directory="metadata")
    assert byd.count() > 0
    assert all("/metadata/" in r.url for r in byd.select("url").collect())


def test_alma_date_kind_and_daily_since_full(spark, pages_small):
    alma = pages_small.where(F.col("url").contains("//alma."))
    kinds = {
        r[0]
        for r in alma.select(src.alma_file_kind(F.col("url"))).distinct().collect()
    }
    assert kinds == {"daily", "full"}
    latest = src.latest_full_run_date(alma).first()[0]
    assert latest is not None
    kept = src.alma_daily_since_full(alma)
    pdf = kept.select(
        src.alma_file_date(F.col("url")).alias("d"),
        src.alma_file_kind(F.col("url")).alias("k"),
    ).toPandas()
    assert ((pdf.k == "full") == (pdf.d.astype(str) == str(latest))).all()
    assert (pdf[pdf.k == "daily"].d.astype(str) > str(latest)).all()


def test_incremental_since(pages_small):
    mid = "2024-06-01"
    inc = src.incremental_since(pages_small, mid)
    assert inc.count() == pages_small.where(F.col("warc_ts") > mid).count()


def test_is_empty_early_exit(spark, pages_small):
    assert not src.is_empty(pages_small)
    from geoharvest_spark.schema import PAGES_SCHEMA

    assert src.is_empty(spark.createDataFrame([], PAGES_SCHEMA))


def test_alma_geospatial_filter(spark, pages_small):
    marc = with_metadata(pages_small).where(F.col("metadata_format") == "marc")
    n_before = marc.count()
    kept = src.alma_geospatial_filter(marc)
    assert 0 < kept.count() <= n_before
    # synthetic MARC rows all carry 655 Maps./949 MAP/985 MAPRM + valid
    # leader -> everything valid passes; rows with junk leaders would drop
    assert kept.count() == n_before
