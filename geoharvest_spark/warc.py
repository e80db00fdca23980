"""WARC (ISO 28500) web-archive ingest — the container format crawl
corpora (Common Crawl, Internet Archive) actually arrive in.

A WARC file is a concatenation of records: a ``WARC/1.0`` version line,
CRLF-separated named headers (WARC-Type, WARC-Target-URI, WARC-Date,
Content-Length, ...), a blank line, ``Content-Length`` bytes of payload,
and a CRLF CRLF separator. ``response`` records carry a full HTTP
response (status line + headers + body) as their payload.

Scale shape: one WARC *file* is the parallelism unit (exactly how crawl
pipelines shard — Common Crawl segments are ~1 GB gzip members listed in
a manifest). Files arrive as rows of a binary column; parsing is one
``mapInPandas`` pass per file — sequential WITHIN a file because records
are length-prefixed (a mid-file seek cannot know record boundaries), and
embarrassingly parallel ACROSS files, which is where the 100 TB lives.
Malformed records DIVERT (ok=false + err, parse stops at the
unrecoverable point) rather than crash the task — the same contract as
the normalize/base failed-record path (reference harvester diverts bad
records to a failure sink instead of aborting the run).

Synthesis (`build_warc_file`) exists so tests and driver queries can
round-trip REAL byte-accurate WARC payloads deterministically — the
pattern of synth_jpeg/encode_tiff: exercise the parser on true wire
bytes, no fixtures checked in.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame

WARC_RECORDS_DDL = (
    "file_id long, rec_idx int, warc_type string, record_id string, "
    "target_uri string, warc_date string, http_status int, "
    "http_content_type string, body binary, ok boolean, err string, "
    "offset long, rec_len long"
)


def build_warc_file(
    records: "list[tuple[str, str, bytes]]", file_id: int = 0
) -> bytes:
    """Compose a WARC 1.0 file: one ``warcinfo`` header record, then one
    ``response`` record per (target_uri, warc_date, html_bytes). Record
    ids are md5-of-uri urns, so output bytes are a pure function of the
    input (no RNG, no clock)."""
    out = bytearray()

    def rec(headers: "list[tuple[str, str]]", payload: bytes) -> None:
        out.extend(b"WARC/1.0\r\n")
        for k, v in headers:
            out.extend(f"{k}: {v}\r\n".encode())
        out.extend(f"Content-Length: {len(payload)}\r\n\r\n".encode())
        out.extend(payload)
        out.extend(b"\r\n\r\n")

    info = (
        b"software: geoharvest-spark-synth\r\n"
        b"format: WARC File Format 1.0\r\n"
    )
    rec(
        [
            ("WARC-Type", "warcinfo"),
            (
                "WARC-Record-ID",
                f"<urn:uuid:file-{int(file_id):016x}>",
            ),
            ("WARC-Date", "2024-01-01T00:00:00Z"),
            ("Content-Type", "application/warc-fields"),
        ],
        info,
    )
    for uri, date, html in records:
        body = bytes(html)
        http = (
            "HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        rid = "<urn:uuid:" + hashlib.md5(uri.encode()).hexdigest() + ">"
        rec(
            [
                ("WARC-Type", "response"),
                ("WARC-Record-ID", rid),
                ("WARC-Target-URI", uri),
                ("WARC-Date", date),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            http,
        )
    return bytes(out)


def parse_warc_bytes(payload: bytes, file_id: int = 0) -> "list[dict]":
    """Sequential record walk over one WARC file's bytes. Returns one
    dict per record (WARC_RECORDS_DDL fields). On an unrecoverable
    malformation (bad magic, truncated headers/payload, unparseable
    Content-Length) a single divert row (ok=False, err set) is emitted
    and the walk stops — byte offsets past the defect are guesses."""

    def divert(idx: int, err: str) -> dict:
        return {
            "file_id": int(file_id),
            "rec_idx": idx,
            "warc_type": None,
            "record_id": None,
            "target_uri": None,
            "warc_date": None,
            "http_status": None,
            "http_content_type": None,
            "body": None,
            "ok": False,
            "err": err,
            "offset": None,
            "rec_len": None,
        }

    rows: list[dict] = []
    i, idx, n = 0, 0, len(payload)
    while i < n:
        while payload[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        start = i
        if not payload[i:].startswith(b"WARC/"):
            rows.append(divert(idx, f"bad record magic at offset {i}"))
            break
        hdr_end = payload.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            rows.append(divert(idx, "truncated record headers"))
            break
        headers: dict[str, str] = {}
        for line in payload[i:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        try:
            clen = int(headers["content-length"])
            if clen < 0:
                raise ValueError(clen)
        except (KeyError, ValueError):
            rows.append(divert(idx, "missing/bad Content-Length"))
            break
        body = payload[hdr_end + 4 : hdr_end + 4 + clen]
        if len(body) < clen:
            rows.append(divert(idx, "truncated record payload"))
            break
        wtype = headers.get("warc-type")
        status = None
        ctype = None
        content = body
        if wtype == "response" and body.startswith(b"HTTP/"):
            hend = body.find(b"\r\n\r\n")
            if hend >= 0:
                head_lines = body[:hend].split(b"\r\n")
                parts = head_lines[0].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in head_lines[1:]:
                    k, sep, v = line.partition(b":")
                    if sep and k.strip().lower() == b"content-type":
                        ctype = v.strip().decode("latin-1")
                content = body[hend + 4 :]
        rows.append(
            {
                "file_id": int(file_id),
                "rec_idx": idx,
                "warc_type": wtype,
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "http_status": status,
                "http_content_type": ctype,
                "body": bytes(content),
                "ok": True,
                "err": None,
                # CDX fields: record start and header+payload byte count
                # (the CRLF CRLF separator is NOT part of the record, so
                # next offset = offset + rec_len + 4)
                "offset": start,
                "rec_len": hdr_end + 4 + clen - start,
            }
        )
        idx += 1
        i = hdr_end + 4 + clen
    return rows


def parse_warc_records(
    df: DataFrame,
    payload_col: str = "payload",
    file_id_col: str = "file_id",
) -> DataFrame:
    """Explode a DataFrame of WARC files (binary column) into records —
    Arrow-batched mapInPandas, one sequential walk per file, parallel
    across files."""

    def _parse(batches):
        for pdf in batches:
            out: list[dict] = []
            for fid, payload in zip(pdf[file_id_col], pdf[payload_col]):
                out.extend(parse_warc_bytes(bytes(payload), int(fid)))
            yield pd.DataFrame(
                out,
                columns=[f.split()[0] for f in WARC_RECORDS_DDL.split(", ")],
            )

    return df.select(file_id_col, payload_col).mapInPandas(
        _parse, WARC_RECORDS_DDL
    )


def wet_records(recs: DataFrame, text_col: str = "wet_text") -> DataFrame:
    """WARC -> WET conversion: keep successful HTML ``response``
    records and attach the boilerplate-stripped plain text of the body
    (webops.extract_text_from_html) — the "WET file" derivation Common
    Crawl publishes alongside its WARCs, and the entry point of every
    text-curation pipeline that starts from raw crawl archives.

    The binary body is decoded as UTF-8 (Spark's binary->string cast);
    the extraction chain itself is pure Catalyst, so downstream of the
    parse this is all whole-stage codegen — no second Python stage."""
    from pyspark.sql import functions as F

    from geoharvest_spark.webops import extract_text_from_html

    return recs.where(
        F.col("ok")
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").contains("text/html")
    ).withColumn(text_col, extract_text_from_html(F.col("body").cast("string")))


def cdx_index(recs: DataFrame) -> DataFrame:
    """CDX capture index from parsed WARC records — the lookup artifact
    real crawl archives ship next to the WARCs (Common Crawl's cdx-*):
    one row per successful response capture, keyed by SURT (reversed
    host + path, so one host's captures sort contiguously), carrying
    the byte location (file_id, offset, rec_len) a reader needs to
    fetch that single record without scanning the file, plus a content
    digest. Pure codegen over the parse output — building the index for
    a 100-TB crawl is one narrow projection, and serving a URL lookup
    is a sorted-key range scan (pair with zorder-style range writes).
    """
    from pyspark.sql import functions as F

    host = F.regexp_extract("target_uri", r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    path = F.regexp_extract(
        "target_uri", r"^[a-z][a-z0-9+.-]*://[^/]+(/.*)?$", 1
    )
    surt = F.concat(
        F.array_join(F.reverse(F.split(F.lower(host), r"\.")), ","),
        F.lit(")"),
        path,
    )
    return recs.where(F.col("ok") & (F.col("warc_type") == "response")).select(
        surt.alias("surt_key"),
        "warc_date",
        "target_uri",
        "file_id",
        "offset",
        "rec_len",
        F.md5("body").alias("body_md5"),
    )
