"""HTML -> text and embedded-metadata extraction (Arrow-batched).

North-star invariant (BASELINE.json input_hint): *byte-identical extracted
text per url*. The extractor below is the single source of truth — the
synthetic generator (synth.py) stores its output as the golden ``text``
column, and tests pin literal expected strings so the algorithm cannot
drift silently.

Extraction spec (deterministic, stdlib-only — selectolax/lxml are not in
this container; the implementation is import-gated so a faster backend can
slot in without changing semantics):

1. decode bytes as UTF-8 (errors="replace");
2. drop <script>/<style>/<head> subtree text entirely;
3. every block-level element boundary (p, div, h1..h6, li, br, tr, title,
   section, article) closes the current text chunk;
4. within a chunk, collapse all whitespace runs to a single space and strip
   (parity with the reference's remove_whitespace, record.py:520-526);
5. join non-empty chunks with "\n".

Metadata payloads ride inside
``<script type="application/geo-metadata" data-format="{fmt}">...</script>``
— the engine analog of the reference's zip-member metadata file selection
(mit.py:313-392): one opaque blob per page, format-tagged, never parsed at
extraction time (lazy parse happens in normalize/, once per blob).

All functions here run as mapInPandas / pandas_udf over Arrow batches; no
per-row Python from the driver's perspective.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "br", "tr",
    "title", "section", "article", "table", "ul", "ol", "header", "footer",
}
_SKIP_TAGS = {"script", "style"}
_WS_RE = re.compile(r"\s+")

_META_RE = re.compile(
    rb'<script type="application/geo-metadata" data-format="([a-z0-9]+)"'
    rb'(?: data-event="([a-z]+)")?>(.*?)</script>',
    re.S,
)


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._buf: list[str] = []
        self._skip_depth = 0

    def _flush(self) -> None:
        if self._buf:
            txt = _WS_RE.sub(" ", "".join(self._buf)).strip()
            if txt:
                self.chunks.append(txt)
            self._buf = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self._buf.append(data)

    def result(self) -> str:
        self._flush()
        return "\n".join(self.chunks)


def extract_text_bytes(html: bytes | None) -> str | None:
    """html bytes -> deterministic visible text (the per-url golden)."""
    if html is None:
        return None
    p = _TextExtractor()
    p.feed(html.decode("utf-8", errors="replace"))
    return p.result()


def extract_metadata_bytes(html: bytes | None) -> tuple[str | None, str | None, bytes | None]:
    """html bytes -> (metadata_format, event, payload bytes) or Nones."""
    if html is None:
        return None, None, None
    m = _META_RE.search(html)
    if not m:
        return None, None, None
    fmt = m.group(1).decode("ascii")
    event = m.group(2).decode("ascii") if m.group(2) else "created"
    return fmt, event, m.group(3)


def detect_format(blob: bytes | None) -> str | None:
    """Content sniffing when the format tag is absent — mirrors the
    reference's ordered metadata-file pattern priority (mit.py:345-384)
    collapsed to content detection: ISO19139 preferred over FGDC."""
    if not blob:
        return None
    head = blob.lstrip()[:400]
    if head.startswith(b"{"):
        if b'"gbl_mdVersion_s"' in blob or b'"gbl_resourceClass_sm"' in blob:
            return "aardvark"
        return "gbl1"
    if b"MD_Metadata" in head or b"gmd:" in head:
        return "iso19139"
    if b"<record" in head or b"<collection" in head or b"<leader" in blob[:800]:
        return "marc"
    if b"<metadata" in head or b"<idinfo" in blob[:800]:
        return "fgdc"
    return None


# ---------------------------------------------------------------------------
# DataFrame-level operators
# ---------------------------------------------------------------------------
def with_extracted_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Add ``extracted_text`` from the html column (Arrow-batched)."""

    @F.pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(extract_text_bytes)

    return df.withColumn("extracted_text", _extract(F.col(html_col)))


def with_metadata(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Add (metadata_format, event, metadata) columns from embedded payloads.

    mapInPandas so the three outputs come from ONE pass over each blob
    (reference parses each zip member once — mit.py:313-333).
    """
    fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    out_schema = ", ".join(
        fields + ["metadata_format string", "event string", "metadata binary"]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            trips = [extract_metadata_bytes(h) for h in pdf[html_col]]
            pdf = pdf.copy()
            pdf["metadata_format"] = [t[0] for t in trips]
            pdf["event"] = [t[1] for t in trips]
            pdf["metadata"] = [t[2] for t in trips]
            yield pdf

    return df.mapInPandas(_map, out_schema)


def origin_from_url(url: Column) -> Column:
    """Derive origin from the url host prefix (FIXTURES.md T1 convention;
    reference origins: alma|mit|ogm, record.py:133-160)."""
    return (
        F.when(url.contains("//cdn.mit."), F.lit("mit"))
        .when(url.contains("//github."), F.lit("ogm"))
        .when(url.contains("//alma."), F.lit("alma"))
        .otherwise(F.lit("web"))
    )


def identifier_from_url(url: Column) -> Column:
    """Identifier derivation, per-origin:

    - mit: zip basename without extension (mit.py:50-53)
    - ogm: "<repo>:<md5(path)[:12]>" (ogm.py:404-414)
    - alma: trailing fragment (#rec<k>) standing in for MARC 001
    - web: md5 of the full url (stable synthetic id)
    """
    origin = origin_from_url(url)
    mit_id = F.regexp_extract(url, r"([^/]+)\.zip", 1)
    repo = F.regexp_extract(url, r"github\.[^/]+/[^/]+/([^/]+)/", 1)
    path = F.regexp_extract(url, r"github\.[^/]+/[^/]+/[^/]+/(.+)$", 1)
    ogm_id = F.concat(repo, F.lit(":"), F.substring(F.md5(path), 1, 12))
    alma_id = F.regexp_extract(url, r"#rec(\d+)$", 1)
    return (
        F.when(origin == "mit", mit_id)
        .when(origin == "ogm", ogm_id)
        .when(origin == "alma", F.concat(F.lit("990"), alma_id))
        .otherwise(F.substring(F.md5(url), 1, 16))
    )
