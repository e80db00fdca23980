"""Deep parity tests for the reference's subtle behaviors — hand-built
payloads targeting one quirk each (fixture style of
/root/reference/tests/test_records/)."""

from __future__ import annotations

from geoharvest_spark.normalize import normalize_record
from geoharvest_spark.normalize.fgdc import FGDC
from geoharvest_spark.normalize.gbl1 import GBL1
from geoharvest_spark.normalize.iso19139 import ISO19139
from geoharvest_spark.normalize.marc import MARC


def _fgdc(body: str) -> bytes:
    return f"<metadata><idinfo>{body}</idinfo></metadata>".encode()


def test_fgdc_string_minmax_bbox_quirk():
    """fgdc.py:110-122 compares coordinate STRINGS: '-9.5' < '-74.0' is
    FALSE lexicographically ('-7' < '-9'), so the 'min' west of {-74.0, -9.5}
    is '-74.0' — numerically right here, but for {9.5, 74.0} max east as
    strings gives '9.5' (wrong numerically). Reproduce exactly."""
    body = (
        "<citation><citeinfo><title>T</title></citeinfo></citation>"
        "<spdom>"
        "<bounding><westbc>-74.0</westbc><eastbc>9.5</eastbc>"
        "<northbc>40.0</northbc><southbc>10.0</southbc></bounding>"
        "<bounding><westbc>-9.5</westbc><eastbc>74.0</eastbc>"
        "<northbc>8.0</northbc><southbc>-10.0</southbc></bounding>"
        "</spdom>"
    )
    rec = FGDC(_fgdc(body), identifier="x", origin="mit")
    # string min west: min('-74.0','-9.5') = '-74.0'; string max east:
    # max('9.5','74.0') = '9.5' (!); max north: max('40.0','8.0') = '8.0' (!)
    assert rec._dcat_bbox() == "ENVELOPE(-74.0, 9.5, 8.0, -10.0)"


def test_fgdc_rights_uses_misspelled_acconst():
    body = (
        "<citation><citeinfo><title>T</title></citeinfo></citation>"
        "<useconst>Use freely.</useconst>"
        "<accconst>Unrestricted</accconst>"  # NOT picked up by rights
        "<acconst>From the misspelled element.</acconst>"
    )
    rec = FGDC(_fgdc(body), identifier="x", origin="mit")
    assert rec._dct_rights_sm() == ["Use freely.", "From the misspelled element."]
    # but accessRights DOES read accconst
    assert rec._dct_accessRights_s() == "Public"


def test_fgdc_temporal_timeprd_misspelling():
    """sngdate/caldate only matches under the misspelled 'timeprd' path."""
    correct = (
        "<citation><citeinfo><title>T</title></citeinfo></citation>"
        "<timeperd><timeinfo><sngdate><caldate>1999</caldate></sngdate>"
        "</timeinfo></timeperd>"
    )
    rec = FGDC(_fgdc(correct), identifier="x", origin="mit")
    assert rec._dct_temporal_sm() == []  # correctly-spelled path NOT read
    misspelled = (
        "<citation><citeinfo><title>T</title></citeinfo></citation>"
        "<timeprd><timeinfo><sngdate><caldate>1999</caldate></sngdate>"
        "</timeinfo></timeprd>"
    )
    rec2 = FGDC(_fgdc(misspelled), identifier="x", origin="mit")
    assert rec2._dct_temporal_sm() == ["1999-01-01"]


def test_fgdc_title_multiplicity_raises():
    body = (
        "<citation><citeinfo><title>A</title><title>B</title>"
        "</citeinfo></citation>"
    )
    rec = FGDC(_fgdc(body), identifier="x", origin="mit")
    try:
        rec._dct_title_s()
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "Expected one or none" in str(e)


def test_iso_indeterminate_position():
    """iso19139.py:595-606: indeterminatePosition attr wins over text."""
    xml = (
        '<gmd:MD_Metadata xmlns:gmd="http://www.isotc211.org/2005/gmd" '
        'xmlns:gco="http://www.isotc211.org/2005/gco" '
        'xmlns:gml="http://www.opengis.net/gml">'
        "<gmd:identificationInfo><gmd:MD_DataIdentification>"
        "<gmd:citation><gmd:CI_Citation><gmd:title>"
        "<gco:CharacterString>T</gco:CharacterString></gmd:title>"
        "</gmd:CI_Citation></gmd:citation>"
        "<gmd:extent><gmd:EX_Extent><gmd:temporalElement>"
        "<gmd:EX_TemporalExtent><gmd:extent>"
        "<gml:TimePeriod>"
        "<gml:beginPosition>1990-01-01</gml:beginPosition>"
        '<gml:endPosition indeterminatePosition="now"/>'
        "</gml:TimePeriod>"
        "</gmd:extent></gmd:EX_TemporalExtent></gmd:temporalElement>"
        "</gmd:EX_Extent></gmd:extent>"
        "</gmd:MD_DataIdentification></gmd:identificationInfo>"
        "</gmd:MD_Metadata>"
    ).encode()
    rec = ISO19139(xml, identifier="x", origin="mit")
    te = rec._get_temporal_extents()
    assert te["periods"][0]["end_timestamp"] == "now"
    # dateutil can't parse 'now' -> the period is SKIPPED for ranges
    # (iso19139.py:404-417 catches ParserError and continues)...
    assert rec._gbl_dateRange_drsim() == []
    # ...but per-date year extraction still keeps the parseable begin year
    assert rec._gbl_indexYear_im() == [1990]


def test_iso_nsmap_reconciliation():
    """iso19139.py:37-47: document-declared gml URI overrides the default."""
    rec_gml2 = ISO19139(
        b'<gmd:MD_Metadata xmlns:gmd="http://www.isotc211.org/2005/gmd" '
        b'xmlns:gml="http://www.opengis.net/gml"/>',
        identifier="x", origin="mit",
    )
    assert rec_gml2.nsmap["gml"] == "http://www.opengis.net/gml"
    rec_default = ISO19139(
        b'<gmd:MD_Metadata xmlns:gmd="http://www.isotc211.org/2005/gmd"/>',
        identifier="x", origin="mit",
    )
    assert rec_default.nsmap["gml"] == "http://www.opengis.net/gml/3.2"


def test_gbl1_language_sm_preferred_over_s():
    import json

    payload = json.dumps(
        {
            "dc_title_s": "T",
            "dc_rights_s": "Public",
            "dc_language_s": "English",
            "dc_language_sm": ["eng", "fra"],
            "dct_references_s": json.dumps({"http://schema.org/url": "http://x"}),
        }
    ).encode()
    rec = GBL1(payload, identifier="x", origin="ogm")
    assert rec._dct_language_sm() == [["eng", "fra"]]  # scalar-to-array wrap
    # cleanup pass unwraps the single-nested list (D1 [[..]] unwrap)
    aard, err = normalize_record("gbl1", payload, "x", "ogm", "created")
    assert err is None
    assert aard["dct_language_sm"] == ["eng", "fra"]


def test_marc_language_code_splitting():
    """041 concatenated codes split every 3 chars (marc.py:205-215)."""
    xml = (
        b'<record xmlns="http://www.loc.gov/MARC21/slim">'
        b"<leader>01234cem a2200000 a 4500</leader>"
        b'<controlfield tag="001">1</controlfield>'
        b'<controlfield tag="008">120523s1990    mau           000 0 eng d</controlfield>'
        b'<datafield tag="245" ind1="1" ind2="0"><subfield code="a">T</subfield></datafield>'
        b'<datafield tag="041" ind1=" " ind2=" ">'
        b'<subfield code="a">engfreger</subfield></datafield>'
        b"</record>"
    )
    rec = MARC(xml, identifier="1", origin="alma")
    assert rec._dct_language_sm() == ["eng", "eng", "fre", "ger"]  # 008 + 041


def test_marc_alternative_concat_and_publisher_comma():
    xml = (
        b'<record xmlns="http://www.loc.gov/MARC21/slim">'
        b"<leader>01234cem a2200000 a 4500</leader>"
        b'<controlfield tag="001">1</controlfield>'
        b'<controlfield tag="008">120523s1990    mau           000 0 eng d</controlfield>'
        b'<datafield tag="245" ind1="1" ind2="0"><subfield code="a">T</subfield></datafield>'
        b'<datafield tag="246" ind1="1" ind2=" ">'
        b'<subfield code="a">Alt title</subfield>'
        b'<subfield code="b">part two</subfield></datafield>'
        b'<datafield tag="260" ind1=" " ind2=" ">'
        b'<subfield code="b">Pub Co,</subfield></datafield>'
        b"</record>"
    )
    rec = MARC(xml, identifier="1", origin="alma")
    assert rec._dct_alternative_sm() == ["Alt title part two"]  # concat=True
    assert rec._dct_publisher_sm() == ["Pub Co"]  # trailing comma stripped


def test_theme_title_casing_multiword():
    """'inland waters' -> 'Inland Waters' via str.title (record.py:470-474)."""
    import json

    payload = json.dumps(
        {
            "dct_title_s": "T",
            "dct_accessRights_s": "Public",
            "gbl_mdVersion_s": "Aardvark",
            "gbl_mdModified_dt": "2024-01-01T00:00:00Z",
            "gbl_resourceClass_sm": ["Datasets"],
            "id": "a",
            "dct_references_s": json.dumps({"http://schema.org/url": "http://x"}),
            "dct_subject_sm": ["inland waters", "TRANSPORTATION", "unrelated"],
        }
    ).encode()
    aard, err = normalize_record("aardvark", payload, "a", "ogm", "created")
    assert err is None
    assert aard["dcat_theme_sm"] == ["Inland Waters", "Transportation"]


def test_format_variant_rules_order():
    """record.py:236-259: variant rules order matters — 'tiff/jpeg' -> Mixed
    before 'tiff' -> TIFF; esri/geodatabase -> Shapefile."""
    import json

    def fmt_of(value: str) -> str | None:
        payload = json.dumps(
            {
                "dc_title_s": "T",
                "dc_rights_s": "Public",
                "dc_format_s": value,
                "dct_references_s": json.dumps(
                    {"http://schema.org/url": "http://x"}
                ),
            }
        ).encode()
        rec = GBL1(payload, identifier="x", origin="ogm")
        return rec._dct_format_s()

    assert fmt_of("TIFF/JPEG") == "Mixed"
    assert fmt_of("GeoTIFF") == "GeoTIFF"
    assert fmt_of("TIFF") == "TIFF"
    assert fmt_of("ESRI Shapefile") == "Shapefile"
    assert fmt_of("esri geodatabase") == "Shapefile"
    assert fmt_of("multiple formats") == "Mixed"
    assert fmt_of("jpg") == "JPEG"
    assert fmt_of("unknown thing") is None
    # the reference's exact parametrize list (test_record.py,
    # test_controlled_format_variant_matches + direct/miss cases)
    assert fmt_of("shp") == "Shapefile"
    assert fmt_of("geotiff") == "GeoTIFF"
    assert fmt_of("tiff") == "TIFF"
    assert fmt_of("jpeg2000") == "JPEG2000"
    assert fmt_of("tiff/jpeg") == "Mixed"
    assert fmt_of("multiple") == "Mixed"
    assert fmt_of("tabular") == "Tabular"
    assert fmt_of("watermleon") is None


def test_resource_type_variants_and_dedupe():
    import json

    payload = json.dumps(
        {
            "dct_title_s": "T",
            "dct_accessRights_s": "Public",
            "gbl_mdVersion_s": "Aardvark",
            "gbl_mdModified_dt": "2024-01-01T00:00:00Z",
            "gbl_resourceClass_sm": ["Datasets"],
            "id": "a",
            "dct_references_s": json.dumps({"http://schema.org/url": "http://x"}),
            "gbl_resourceType_sm": [
                "Polygon layer", "POLYGON data", "multipoint string thing",
                "raster grid", "weird",
            ],
        }
    ).encode()
    aard, err = normalize_record("aardvark", payload, "a", "ogm", "created")
    assert err is None
    # polygon* -> Polygon data (deduped); 'point' is checked BEFORE
    # 'line/string' (record.py:297-306 order) so 'multipoint string thing'
    # -> Point data; raster -> Raster data; 'weird' dropped
    assert aard["gbl_resourceType_sm"] == [
        "Polygon data", "Point data", "Raster data",
    ]
