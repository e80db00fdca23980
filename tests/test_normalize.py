"""Normalization parity tests.

Mirrors the reference's golden-value per-field assertions
(/root/reference/tests/test_records/*: known values from fixture files) over
our deterministic synthetic payloads, plus exact-semantics unit tests for the
cleanup utilities the reference relies on (D1 dedupe, date parser, lang
codes, MARC DMS decimals).
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from geoharvest_spark import extract, synth
from geoharvest_spark.normalize import (
    dedupe_list_of_values,
    date_parser,
    normalize_record,
    remove_whitespace,
    validate_aardvark,
)
from geoharvest_spark.normalize.marc import (
    MarcRecord,
    coordinate_string_to_decimal,
    is_geospatial_marc,
    marc_event,
    marc_identifier,
)
from geoharvest_spark.normalize.vocab import convert_lang_code


def _norm(i: int):
    r = synth.page_row(i)
    fmt, ev, payload = extract.extract_metadata_bytes(r["html"])
    origin = {"fgdc": "mit", "iso19139": "mit", "marc": "alma"}.get(fmt, "ogm")
    return fmt, normalize_record(fmt, payload, f"id{i}", origin, ev)


# ---------------------------------------------------------------------------
# utilities (exact reference semantics)
# ---------------------------------------------------------------------------
def test_remove_whitespace():
    assert remove_whitespace("  a \n b\t c  ") == "a b c"
    assert remove_whitespace("   ") is None
    assert remove_whitespace(None) is None


def test_dedupe_case_preference():
    # TitleCase > UPPERCASE > lowercase (utils.py:24-72)
    assert dedupe_list_of_values(["boston", "BOSTON", "Boston"]) == ["Boston"]
    assert dedupe_list_of_values(["boston", "BOSTON"]) == ["BOSTON"]
    assert dedupe_list_of_values(["BOSTON", "boston"]) == ["BOSTON"]
    # order-preserving on first-seen key
    assert dedupe_list_of_values(["b", "a", "B"]) == ["B", "a"]
    # single-nested list unwrap
    assert dedupe_list_of_values([["x", "y"]]) == ["x", "y"]
    # non-strings pass through
    assert dedupe_list_of_values([1, 2, 1]) == [1, 2]


def test_date_parser_epoch_default():
    assert date_parser("2022").strftime("%Y-%m-%d") == "2022-01-01"
    assert date_parser("19900315").strftime("%Y-%m-%d") == "1990-03-15"


def test_convert_lang_code():
    assert convert_lang_code("en") == "eng"
    assert convert_lang_code("eng") == "eng"
    assert convert_lang_code("fr") == "fra"
    assert convert_lang_code("zz") is None
    assert convert_lang_code("zzzz") is None


def test_convert_lang_code_matches_pycountry():
    """Goldens matching pycountry (reference utils.py:75-83) on codes the
    old 72-entry map missed, plus the bibliographic-code None quirk:
    pycountry's alpha_3 index holds ISO 639-3 ids only, so 'ger'/'fre'/'cze'
    return None while 'deu'/'fra'/'ces' pass through."""
    golden = {
        # 639-1 -> 639-3 (pycountry .alpha_3)
        "cs": "ces", "is": "isl", "bo": "bod", "cy": "cym", "ga": "gle",
        "kw": "cor", "rw": "kin", "se": "sme", "yi": "yid", "za": "zha",
        "gd": "gla", "gv": "glv", "ht": "hat", "lb": "ltz", "mi": "mri",
        # 639-3 identity
        "isl": "isl", "deu": "deu", "fra": "fra", "ces": "ces",
        "grc": "grc", "enm": "enm", "haw": "haw", "yue": "yue",
        "und": "und", "zxx": "zxx", "mul": "mul",
        # bibliographic codes -> None (pycountry parity)
        "ger": None, "fre": None, "cze": None, "dut": None, "gre": None,
        "ice": None, "chi": None, "per": None, "arm": None, "wel": None,
        # garbage
        "q": None, "abcd": None, "zq": None,
    }
    for code, want in golden.items():
        assert convert_lang_code(code) == want, code


def test_marc_dms_decimal_precision10():
    # deg + min/60 + sec/3600 at Decimal precision 10 (marc.py:358-391)
    assert coordinate_string_to_decimal("W0713015") == Decimal("-71.50416667")
    assert coordinate_string_to_decimal("E1210000") == Decimal("121")
    # short strings are right-padded to 7 digits (marc.py:350-356):
    # "E121" -> "E0000121" -> 0 deg 01 min 21 sec
    assert coordinate_string_to_decimal("E121") == Decimal("0.02250000000")
    assert coordinate_string_to_decimal("N0423000") == Decimal("42.5")
    assert coordinate_string_to_decimal("-0713015") == Decimal("-71.50416667")


# ---------------------------------------------------------------------------
# per-format goldens (literal pinned values)
# ---------------------------------------------------------------------------
def test_fgdc_golden_row0():
    fmt, (aard, err) = _norm(0)
    assert fmt == "fgdc" and err is None
    assert aard["dct_title_s"] == "Water Zoning Survey 1990"
    assert aard["dct_accessRights_s"] == "Restricted"
    assert aard["dcat_bbox"] == "ENVELOPE(-68.989041, -68.938968, 44.284188, 43.675273)"
    assert aard["locn_geometry"] == aard["dcat_bbox"]
    assert aard["gbl_resourceClass_sm"] == ["Datasets"]
    assert aard["gbl_resourceType_sm"] == ["Polygon data"]
    assert aard["dct_format_s"] == "Shapefile"
    assert aard["dct_issued_s"] == "1990-03-15"
    assert aard["gbl_dateRange_drsim"] == ["[1990 TO 1992]"]
    # tempkey 1990 + mdattim caldates (multi-date single dates)
    assert aard["dct_temporal_sm"] == ["1990-01-01", "1990-06-01", "1991-06-01"]
    assert aard["gbl_indexYear_im"] == [1990, 1991]
    assert aard["dct_language_sm"] == ["eng"]
    assert aard["id"] == "mit:id0"
    assert aard["dcat_theme_sm"] == ["Transportation"]
    assert aard["gbl_suppressed_b"] is False
    assert aard["schema_provider_s"] == "GIS Lab, MIT Libraries"


def test_iso_golden_row6():
    fmt, (aard, err) = _norm(6)
    assert fmt == "iso19139" and err is None
    assert aard["dct_title_s"] == "Hydrography Parcel Rail 1996"
    assert aard["dct_accessRights_s"] == "Restricted"
    assert aard["dcat_bbox"] == "ENVELOPE(-74.11981, -73.941421, 41.658341, 41.586993)"
    # ISO dateRange has NO brackets (iso19139.py:401-418 asymmetry)
    assert aard["gbl_dateRange_drsim"] == ["1996 TO 1998"]
    assert aard["dct_temporal_sm"] == ["1996-1998"]
    assert aard["gbl_indexYear_im"] == [1996, 1998]
    assert aard["dct_alternative_sm"] == ["alt-6"]
    assert aard["dct_subject_sm"] == ["environment"]
    assert aard["dcat_theme_sm"] == ["Environment"]
    assert aard["dct_issued_s"] == "1996-03-15"
    assert aard["dct_language_sm"] == ["eng"]
    assert aard["dct_publisher_sm"] == ["US Census Bureau"]
    assert aard["dct_identifier_sm"] == ["iso-6"]


def test_iso_public_when_no_restriction():
    fmt, (aard, err) = _norm(16)  # i%3 != 0 -> no restriction element
    assert fmt == "iso19139" and err is None
    assert aard["dct_accessRights_s"] == "Public"


def test_gbl1_golden_row7():
    fmt, (aard, err) = _norm(7)
    assert fmt == "gbl1" and err is None
    assert aard["dct_title_s"] == "Building Road Soil 1997"
    assert aard["dct_accessRights_s"] == "Public"
    assert aard["gbl_resourceClass_sm"] == ["Datasets"]
    assert aard["gbl_resourceType_sm"] == ["Raster data"]  # layer_geom_type_s
    assert aard["dct_format_s"] == "Shapefile"
    assert aard["gbl_indexYear_im"] == [1997]
    assert aard["id"] == "ogm:id7"
    assert aard["dct_references_s"] == (
        '{"http://schema.org/url": "https://example.test/gbl1/7"}'
    )


def test_aardvark_golden_row3():
    fmt, (aard, err) = _norm(3)
    assert fmt == "aardvark" and err is None
    assert aard["dct_title_s"] == "Shoreline Boundary Parcel 1993"
    assert aard["gbl_resourceClass_sm"] == ["Datasets"]
    assert aard["gbl_dateRange_drsim"] == ["[1993 TO 1995]"]  # str -> [str]
    assert aard["gbl_indexYear_im"] == [1993]


def test_marc_golden_row4():
    fmt, (aard, err) = _norm(4)
    assert fmt == "marc" and err is None
    assert aard["dct_accessRights_s"] == "Public"
    # 336 'cartographic image' -> Imagery, then 007/00 'a' -> Maps
    assert aard["gbl_resourceClass_sm"] == ["Maps"]
    assert aard["dct_format_s"] is None
    assert aard["dct_issued_s"] == "1994"
    assert aard["dct_language_sm"] == ["eng"]
    assert aard["gbl_resourceType_sm"] == []
    assert aard["dct_subject_sm"] == ["Structure", "Maps"]
    assert aard["dct_spatial_sm"] == ["Chicago"]
    assert "mit.primo.exlibrisgroup.com" in aard["dct_references_s"]


def test_marc_point_degenerate():
    # i=29: 29%23==6 point_degenerate and 29%5==4 marc
    fmt, (aard, err) = _norm(29)
    assert fmt == "marc" and err is None
    assert aard["locn_geometry"].startswith("POINT(")
    assert aard["dcat_bbox"].startswith("ENVELOPE(")


def test_marc_multibbox_union():
    # i=51Γ: need i%23==5 and i%5==4 -> i=74 (74%23=5, 74%5=4)
    fmt, (aard, err) = _norm(74)
    assert fmt == "marc" and err is None
    assert aard["dcat_bbox"].startswith("ENVELOPE(")


# ---------------------------------------------------------------------------
# error channel / edge cases
# ---------------------------------------------------------------------------
def test_missing_title_errors():
    # i=24: 24%23==1 missing_title, 24%5==4 marc
    fmt, (aard, err) = _norm(24)
    assert aard is None and err is not None
    assert err["stage"] == "normalize"


def test_suppressed_to_side_channel():
    # i=2: gbl1 suppressed
    fmt, (aard, err) = _norm(2)
    assert fmt == "gbl1"
    assert err == {"stage": "suppressed", "exception": "record suppressed"}


def test_double_encoded_json():
    # i=30: 30%23==7 double_encoded, 30%5==0 fgdc -> not valid; use i=7+23*4=99?
    # need i%23==7 and i%5==2 (gbl1): i=53 (53%23=7, 53%5=3 aardvark no) ->
    # i=122: 122%23=7, 122%5=2 gbl1
    fmt, (aard, err) = _norm(122)
    assert fmt == "gbl1" and err is None
    assert aard["dct_title_s"]  # parsed through the double-decode loop


def test_invalid_bbox_nulled():
    # i=50: 50%23==4 invalid_bbox, 50%5==0 fgdc
    fmt, (aard, err) = _norm(50)
    assert fmt == "fgdc" and err is None
    assert aard["dcat_bbox"] is None
    assert aard["locn_geometry"] is None


def test_deleted_event_sets_suppressed():
    # i=26: 26%23==3 deleted, 26%5==1 iso19139
    fmt, (aard, err) = _norm(26)
    assert fmt == "iso19139" and err is None
    assert aard["gbl_suppressed_b"] is True


def test_unknown_format_dispatch_error():
    aard, err = normalize_record("nope", b"{}", "x", "web", "created")
    assert aard is None and err["stage"] == "dispatch"


def test_validate_aardvark_required():
    errs = validate_aardvark({"dct_title_s": "t"})
    assert any("dct_accessRights_s" in e for e in errs)
    errs2 = validate_aardvark(
        {
            "dct_accessRights_s": "Public",
            "dct_title_s": "t",
            "gbl_mdModified_dt": "2024-01-01T00:00:00+00:00",
            "gbl_mdVersion_s": "Aardvark",
            "gbl_resourceClass_sm": ["Datasets"],
            "id": "a:b",
            "dct_references_s": "{}",
        }
    )
    assert errs2 == []
    errs3 = validate_aardvark(
        {
            "dct_accessRights_s": "Public",
            "dct_title_s": "t",
            "gbl_mdModified_dt": "not-a-date",
            "gbl_mdVersion_s": "Aardvark",
            "gbl_resourceClass_sm": ["Bogus"],
            "id": "a:b",
            "dct_references_s": "{}",
        }
    )
    assert len(errs3) == 2


# ---------------------------------------------------------------------------
# MARC model + alma filter
# ---------------------------------------------------------------------------
def test_marc_identifier_event_and_filter():
    r = synth.page_row(4)
    _, _, payload = extract.extract_metadata_bytes(r["html"])
    rec = MarcRecord(payload)
    assert marc_identifier(rec) == "99100004"
    assert marc_event(rec) == "created"
    assert is_geospatial_marc(rec)


def test_marc_deleted_leader():
    # deleted edge: i%23==3, i%5==4 -> i=49 (49%23=3, 49%5=4)
    r = synth.page_row(49)
    _, ev, payload = extract.extract_metadata_bytes(r["html"])
    rec = MarcRecord(payload)
    assert rec.leader[5] == "d"
    assert marc_event(rec) == "deleted"
    assert ev == "deleted"


def test_marc_filter_rejects_non_geospatial():
    xml = (
        b'<record xmlns="http://www.loc.gov/MARC21/slim">'
        b"<leader>01234nam a2200000 a 4500</leader>"
        b'<controlfield tag="001">990</controlfield>'
        b"</record>"
    )
    assert not is_geospatial_marc(MarcRecord(xml))


# ---------------------------------------------------------------------------
# Spark operator end-to-end
# ---------------------------------------------------------------------------
def test_harvest_pages_spark(spark, pages_small):
    from pyspark.sql import functions as F

    from geoharvest_spark.normalize import split_failed
    from geoharvest_spark.pipeline import harvest_pages

    out = harvest_pages(pages_small).cache()
    ok, failed = split_failed(out)
    n_ok, n_failed = ok.count(), failed.count()
    assert n_ok + n_failed == 300
    assert n_ok > 230  # most rows normalize cleanly
    assert n_failed > 10  # edge rows land on the side-channel
    # required fields are non-null on the ok side
    assert ok.where(F.col("aardvark.dct_title_s").isNull()).count() == 0
    assert ok.where(F.col("aardvark.id").isNull()).count() == 0
    # error rollup (A2): counts by stage
    roll = {
        r["stage"]: r["n"]
        for r in failed.groupBy("error.stage").agg(F.count("*").alias("n")).collect()
    }
    assert set(roll) <= {"normalize", "suppressed", "dispatch"}
    assert roll.get("normalize", 0) > 0 and roll.get("suppressed", 0) > 0
    out.unpersist()
