"""Extraction goldens: byte-identical text per url (BASELINE.json invariant).

Literal expected strings are pinned here so the extractor cannot drift —
mirrors the reference's golden-value fixture tests
(/root/reference/tests/test_records/test_fgdc.py:63-67 pattern).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geoharvest_spark.extract import (
    detect_format,
    extract_metadata_bytes,
    extract_text_bytes,
    with_extracted_text,
)
from geoharvest_spark.synth import page_row, web_pages_pdf


def test_extract_text_golden_literal():
    html = (
        b"<html><head><title>My Page</title><style>x{}</style></head>"
        b"<body><h1>Header  One</h1><p>a   b\n c</p>"
        b'<script type="application/geo-metadata" data-format="gbl1">{"x":1}'
        b"</script><p>tail</p></body></html>"
    )
    assert extract_text_bytes(html) == "My Page\nHeader One\na b c\ntail"


def test_extract_metadata_golden():
    html = (
        b'<html><body><script type="application/geo-metadata" '
        b'data-format="fgdc" data-event="deleted"><metadata/></script></body></html>'
    )
    fmt, event, payload = extract_metadata_bytes(html)
    assert (fmt, event, payload) == ("fgdc", "deleted", b"<metadata/>")


def test_detect_format():
    assert detect_format(b'{"gbl_mdVersion_s": "Aardvark"}') == "aardvark"
    assert detect_format(b'{"dc_title_s": "x"}') == "gbl1"
    assert detect_format(b"<gmd:MD_Metadata xmlns:gmd='x'/>") == "iso19139"
    assert detect_format(b"<record><leader>x</leader></record>") == "marc"
    assert detect_format(b"<metadata><idinfo/></metadata>") == "fgdc"
    assert detect_format(b"") is None


def test_synth_text_is_extractor_output():
    pdf = web_pages_pdf(60)
    for _, row in pdf.iterrows():
        assert extract_text_bytes(row.html) == row.text
        assert "geo-metadata" not in row.text


def test_byte_identical_extraction_on_spark(spark, pages_small):
    out = with_extracted_text(pages_small)
    mismatches = out.where(
        ~F.col("extracted_text").eqNullSafe(F.col("text"))
    ).count()
    assert mismatches == 0


def test_all_pages_have_metadata(pages_small):
    from geoharvest_spark.extract import with_metadata

    df = with_metadata(pages_small)
    assert df.where(F.col("metadata").isNull()).count() == 0
    fmts = {r[0] for r in df.select("metadata_format").distinct().collect()}
    assert fmts == {"fgdc", "iso19139", "gbl1", "aardvark", "marc"}


def test_deleted_event_rows_exist(pages_small):
    from geoharvest_spark.extract import with_metadata

    df = with_metadata(pages_small)
    assert df.where(F.col("event") == "deleted").count() > 0


def test_page_row_deterministic():
    a, b = page_row(17), page_row(17)
    assert a == b
