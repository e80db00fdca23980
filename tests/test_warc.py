"""WARC ingest: byte-accurate round-trip, HTTP payload parsing, and the
divert (ok=false) contract for malformed files.

Reference analog: the harvester diverts bad records to a failure sink
rather than aborting the run (reference harvester/records/record.py
failed-record path); parse_warc_bytes applies the same contract to a
crawl-archive container format the reference never reads.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoharvest_spark import warc as wc

RECS = [
    ("http://a.example/one", "2024-01-01T00:00:00Z", b"<html>one</html>"),
    ("http://a.example/two", "2024-01-02T00:00:00Z", b"<p>two \xc3\xa9</p>"),
    ("http://b.example/", "2024-01-03T00:00:00Z", b""),
]


def test_roundtrip_single_file():
    payload = wc.build_warc_file(RECS, file_id=7)
    rows = wc.parse_warc_bytes(payload, file_id=7)
    assert [r["ok"] for r in rows] == [True] * 4
    assert rows[0]["warc_type"] == "warcinfo"
    resp = rows[1:]
    assert [r["warc_type"] for r in resp] == ["response"] * 3
    assert [r["target_uri"] for r in resp] == [u for u, _, _ in RECS]
    assert [r["warc_date"] for r in resp] == [d for _, d, _ in RECS]
    # HTTP envelope stripped: body is exactly the original html bytes
    assert [r["body"] for r in resp] == [b for _, _, b in RECS]
    assert [r["http_status"] for r in resp] == [200] * 3
    assert all(
        r["http_content_type"] == "text/html; charset=utf-8" for r in resp
    )
    assert rows[2]["record_id"] == (
        "<urn:uuid:"
        + hashlib.md5(b"http://a.example/two").hexdigest()
        + ">"
    )
    assert all(r["file_id"] == 7 for r in rows)
    assert [r["rec_idx"] for r in rows] == [0, 1, 2, 3]


def test_build_is_deterministic():
    assert wc.build_warc_file(RECS, 3) == wc.build_warc_file(RECS, 3)


def test_body_may_contain_separator_bytes():
    # Content-Length framing, not delimiter scanning: a body containing
    # CRLFCRLF and even a fake "WARC/1.0" line must not split the record.
    tricky = b"x\r\n\r\nWARC/1.0\r\n\r\ny"
    payload = wc.build_warc_file([("http://t/", "2024-01-01T00:00:00Z", tricky)])
    rows = wc.parse_warc_bytes(payload)
    assert [r["ok"] for r in rows] == [True, True]
    assert rows[1]["body"] == tricky


def test_divert_bad_magic():
    rows = wc.parse_warc_bytes(b"GARBAGE not a warc", file_id=1)
    assert len(rows) == 1
    assert rows[0]["ok"] is False
    assert "magic" in rows[0]["err"]


def test_divert_truncated_payload_stops_walk():
    payload = wc.build_warc_file(RECS)
    rows = wc.parse_warc_bytes(payload[:-30])
    # earlier records parse; the truncated one diverts and the walk stops
    assert [r["ok"] for r in rows[:-1]] == [True] * (len(rows) - 1)
    assert rows[-1]["ok"] is False
    assert "truncated" in rows[-1]["err"]


def test_divert_missing_content_length():
    bad = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"WARC-Record-ID: <urn:uuid:x>\r\n\r\nbody"
    )
    rows = wc.parse_warc_bytes(bad)
    assert rows[0]["ok"] is False
    assert "Content-Length" in rows[0]["err"]


def test_divert_midfile_preserves_prior_records():
    good = wc.build_warc_file(RECS[:1])
    rows = wc.parse_warc_bytes(good + b"JUNK TRAILER")
    assert [r["ok"] for r in rows] == [True, True, False]
    assert rows[1]["target_uri"] == RECS[0][0]


def test_non_http_response_body_passthrough():
    # a response whose payload is not HTTP keeps the raw payload
    raw = wc.build_warc_file([("http://r/", "2024-01-01T00:00:00Z", b"x")])
    mangled = raw.replace(b"HTTP/1.1 200 OK", b"NOTHTTP 200 OK")
    rows = wc.parse_warc_bytes(mangled)
    r = rows[1]
    assert r["ok"] is True and r["http_status"] is None
    assert r["body"].startswith(b"NOTHTTP 200 OK")


def test_parse_warc_records_distributed(spark):
    files = [
        (i, wc.build_warc_file(
            [(f"http://f{i}.example/{j}", "2024-01-01T00:00:00Z",
              f"<b>doc {i}-{j}</b>".encode()) for j in range(4)],
            file_id=i,
        ))
        for i in range(6)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(files, columns=["file_id", "payload"])
    ).repartition(4)
    recs = wc.parse_warc_records(df)
    out = recs.where(F.col("warc_type") == "response").toPandas()
    assert len(out) == 24
    assert bool(out["ok"].all())
    got = sorted(zip(out.file_id, out.target_uri))
    want = sorted(
        (i, f"http://f{i}.example/{j}") for i in range(6) for j in range(4)
    )
    assert got == want
    bodies = {
        (f, u): b for f, u, b in zip(out.file_id, out.target_uri, out.body)
    }
    assert bytes(bodies[(2, "http://f2.example/3")]) == b"<b>doc 2-3</b>"


def test_parse_warc_records_divert_row_survives_schema(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(0, wc.build_warc_file(RECS[:1])), (1, b"NOPE")],
            columns=["file_id", "payload"],
        )
    )
    out = wc.parse_warc_records(df).toPandas().sort_values(
        ["file_id", "rec_idx"]
    )
    ok_by_file = out.groupby("file_id")["ok"].all()
    assert bool(ok_by_file[0]) and not bool(ok_by_file[1])
    assert out[~out.ok].err.str.contains("magic").all()


@pytest.mark.parametrize("nrec", [0, 1])
def test_tiny_files(nrec):
    payload = wc.build_warc_file(RECS[:nrec])
    rows = wc.parse_warc_bytes(payload)
    assert len(rows) == nrec + 1  # warcinfo always present
    assert all(r["ok"] for r in rows)


def test_wet_records_extracts_html_responses_only(spark):
    html = (
        b"<html><head><script>var j=1;</script></head>"
        b"<body><p>Hello &amp; world</p><!-- c --></body></html>"
    )
    payload = wc.build_warc_file(
        [("http://s/1", "2024-01-01T00:00:00Z", html)]
    )
    files = spark.createDataFrame(
        [(0, bytearray(payload))], "file_id long, payload binary"
    )
    wet = wc.wet_records(wc.parse_warc_records(files)).collect()
    # warcinfo record filtered out, response kept with stripped text
    assert [(r.target_uri, r.wet_text) for r in wet] == [
        ("http://s/1", "Hello & world")
    ]


def test_pipeline_warc_ingest_roundtrip(spark):
    # the demo pipeline's crawl-archive mode: synth pages -> WARC files
    # -> parse -> (doc_id, url, html) must round-trip exactly
    from jobs.webtext_pipeline import pages_via_warc, synth_pages

    pages = synth_pages(spark, 600)
    back = pages_via_warc(spark, pages)
    a = {(r.doc_id, r.url, r.html) for r in pages.collect()}
    b = {(r.doc_id, r.url, r.html) for r in back.collect()}
    assert a == b


def test_offsets_and_cdx(spark):
    from geoharvest_spark.warc import (
        build_warc_file,
        cdx_index,
        parse_warc_bytes,
    )

    recs = [
        (f"http://sub.Example.com/p/{i}", "2024-01-01T00:00:00Z",
         b"<html>" + b"x" * (10 * i) + b"</html>")
        for i in range(4)
    ]
    payload = build_warc_file(recs, 9)
    rows = parse_warc_bytes(payload, 9)
    # offsets index back into the file: the bytes at each offset are the
    # record's own version line, and rec_len reaches the payload end
    for r in rows:
        assert payload[r["offset"] : r["offset"] + 9] == b"WARC/1.0\r"
        assert payload[r["offset"] + r["rec_len"] : r["offset"] + r["rec_len"] + 4] == b"\r\n\r\n"
    # next offset = offset + rec_len + 4 (separator not in the record)
    for a, b in zip(rows, rows[1:]):
        assert b["offset"] == a["offset"] + a["rec_len"] + 4

    df = spark.createDataFrame(
        pd.DataFrame([{"file_id": 9, "payload": payload}]),
        "file_id long, payload binary",
    )
    from geoharvest_spark.warc import parse_warc_records

    cdx = cdx_index(parse_warc_records(df)).collect()
    assert len(cdx) == 4
    for r in cdx:
        assert r["surt_key"].startswith("com,example,sub)/p/")
        assert r["rec_len"] > 0 and r["offset"] > 0
