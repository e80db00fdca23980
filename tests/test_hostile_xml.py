"""Hostile real-web XML (VERDICT r2 item 6): encoding declarations that
disagree with the bytes, CDATA, entity refs, junk before the prolog.
Each case either normalizes identically to the clean parse (matching
lxml-recover behavior, which the reference relies on —
record.py:502-511) or lands in the error channel — never a task/batch
failure (F7, harvest/__init__.py:169-188). Divergences from lxml are
documented per case inline."""

from __future__ import annotations

import pytest

from geoharvest_spark.normalize import normalize_record
from geoharvest_spark.normalize.base import tolerant_fromstring
from geoharvest_spark.normalize.fgdc import FGDC

CLEAN = (
    b"<metadata><idinfo>"
    b"<citation><citeinfo><title>Cambridge Parcels</title>"
    b"<geoform>vector digital data</geoform></citeinfo></citation>"
    b"<descript><abstract>City parcels</abstract></descript>"
    b"<spdom><bounding><westbc>-71.2</westbc><eastbc>-71.0</eastbc>"
    b"<northbc>42.4</northbc><southbc>42.3</southbc></bounding></spdom>"
    b"</idinfo></metadata>"
)


def _norm(data: bytes) -> dict:
    return FGDC(data, identifier="x", origin="mit").normalize()


def test_clean_baseline():
    out = _norm(CLEAN)
    assert out["dct_title_s"] == "Cambridge Parcels"


def test_junk_before_prolog_recovers():
    # lxml recover tolerates leading garbage; expat rejects it — the
    # tolerant parser strips to the first '<' and matches the clean parse
    hostile = b"--- log line the server leaked ---\n" + CLEAN
    assert _norm(hostile) == _norm(CLEAN)


def test_utf8_bom_and_whitespace_prolog():
    hostile = b"\xef\xbb\xbf\n  " + b'<?xml version="1.0"?>' + CLEAN
    assert _norm(hostile) == _norm(CLEAN)


def test_cdata_section_extracts_text():
    hostile = CLEAN.replace(
        b"<title>Cambridge Parcels</title>",
        b"<title><![CDATA[Cambridge Parcels]]></title>",
    )
    # CDATA is first-class in both parsers — identical normalization
    assert _norm(hostile) == _norm(CLEAN)


def test_predefined_and_numeric_entities():
    hostile = CLEAN.replace(
        b"<title>Cambridge Parcels</title>",
        b"<title>Cambridge &amp; Boston &#x2014; v&#233;lo</title>",
    )
    assert _norm(hostile)["dct_title_s"] == "Cambridge & Boston — v\xe9lo"


def test_undefined_entity_dropped():
    # lxml recover drops undefined entity refs; we reproduce that (the
    # entity text is removed, surrounding text survives)
    hostile = CLEAN.replace(
        b"<title>Cambridge Parcels</title>",
        b"<title>Cambridge &nbsp;Parcels</title>",
    )
    assert _norm(hostile)["dct_title_s"] == "Cambridge Parcels"


def test_declared_utf8_actual_latin1_recovers():
    # bytes say latin-1 (0xE9), prolog says utf-8: expat dies on the bad
    # byte; the ladder re-decodes (utf-8 replace -> still parses) or
    # latin-1. lxml recover substitutes the bad byte too — both engines
    # keep the record; the accented char round-trips via latin-1 only
    # when utf-8-replace already yields a parse, so expect either the
    # replacement char or the real e-acute, deterministically ours: utf-8
    # with errors="replace" parses first -> U+FFFD.
    body = '<?xml version="1.0" encoding="utf-8"?>'.encode() + CLEAN.replace(
        b"Cambridge Parcels", b"v\xe9lo city"
    )
    out = _norm(body)
    assert out["dct_title_s"] in ("v�lo city", "v\xe9lo city")


def test_declared_latin1_actual_latin1_parses():
    body = '<?xml version="1.0" encoding="ISO-8859-1"?>'.encode() + CLEAN.replace(
        b"Cambridge Parcels", b"v\xe9lo city"
    )
    # expat honors the declared single-byte encoding natively
    assert _norm(body)["dct_title_s"] == "v\xe9lo city"


def test_unclosed_tag_lands_in_error_channel():
    hostile = CLEAN[:-20]  # truncated mid-document
    aardvark, err = normalize_record("fgdc", hostile, "x", "mit", "created")
    assert aardvark is None
    assert err is not None and err["stage"] == "normalize"


def test_total_garbage_lands_in_error_channel():
    aardvark, err = normalize_record("fgdc", b"\x00\x01 not xml", "x", "mit", "created")
    assert aardvark is None
    assert err is not None


def test_tolerant_parser_no_markup_raises():
    import xml.etree.ElementTree as ET

    with pytest.raises(ET.ParseError):
        tolerant_fromstring(b"plain text, zero angle brackets")


def test_batch_survives_hostile_blobs(spark):
    """A micro-batch mixing clean and hostile blobs yields ok + error rows
    and never a task failure (F7 at the DataFrame surface)."""
    import pandas as pd

    from geoharvest_spark.normalize import normalize_pages, split_failed

    rows = [
        ("u1", "i1", "mit", "fgdc", "created", CLEAN),
        ("u2", "i2", "mit", "fgdc", "created", b"--junk--" + CLEAN),
        ("u3", "i3", "mit", "fgdc", "created", b"\x00\x01garbage"),
        ("u4", "i4", "mit", "fgdc", "created", CLEAN[:-25]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[
                "url", "identifier", "origin", "metadata_format",
                "event", "metadata",
            ],
        )
    )
    out = normalize_pages(df)
    ok, failed = split_failed(out)
    assert ok.count() == 2  # u1 clean + u2 recovered
    assert failed.count() == 2  # u3, u4 in the error channel
