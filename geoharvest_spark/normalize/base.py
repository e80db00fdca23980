"""Normalization core: cleanup utilities, record base classes, dispatch,
validation, and the Spark operator.

Reference lifecycle re-expressed (SURVEY.md §2.3): ``normalize()`` is a
42-column projection driven by field-method reflection
(record.py:320-359) with two cleanup passes and JSON-schema validation.
Here each metadata blob is parsed ONCE per row inside an Arrow batch
(mapInPandas), all field methods read the single parse, and failures
become the error column instead of task failures (F7 semantics,
harvester/harvest/__init__.py:169-188).
"""

from __future__ import annotations

import datetime as dt
import json
import re
import xml.etree.ElementTree as ET
from typing import Any, Callable, Iterator

import pandas as pd
from dateutil.parser import ParserError
from dateutil.parser import parse as _dateutil_parse
from pyspark.sql import DataFrame

from ..schema import AARDVARK_FIELDS, AARDVARK_REQUIRED_FIELDS, NORMALIZED_SCHEMA
from .vocab import (
    DCAT_THEME_TERMS,
    DCT_FORMAT_S_OGM_TERMS,
    GBL_RESOURCE_CLASS_ENUM,
    GBL_RESOURCETYPE_SM_TERMS,
    convert_lang_code,
)

# Frozen-clock default for gbl_mdModified_dt — the reference freezes time in
# tests with freezegun (tests/conftest.py:460); production injects now().
DEFAULT_MD_MODIFIED = "2024-06-01T00:00:00+00:00"

CDN_ROOT = "https://cdn.example.test/geo"  # engine-local stand-in for config

# entity refs that are neither predefined XML entities nor numeric
_UNDEFINED_ENTITY = re.compile(rb"&(?!amp;|lt;|gt;|quot;|apos;|#)(\w+);")
_XML_DECL = re.compile(rb"^\s*<\?xml[^>]*\?>", re.S)
_DECL_ENCODING = re.compile(rb'encoding=["\']([A-Za-z0-9._-]+)["\']')


def tolerant_fromstring(data: bytes) -> "ET.Element":
    """Tolerant XML parse for harvested real-web blobs — intentionally MORE
    permissive than the reference. The reference parses with lxml's strict
    defaults (recover=False, record.py:502-511), which RAISE on undefined
    entities and leading junk, routing such blobs to its failure channel;
    this engine instead behaves like lxml recover=True and salvages them,
    diverting only the truly unparseable (a deliberate divergence: at
    web-harvest scale a recoverable blob is data, not an error). Recovery
    ladder, applied only after the clean strict parse fails:

    1. strip junk/BOM before the first ``<`` and trailing NULs;
    2. drop undefined entity references (lxml recover does the same);
    3. on encoding-mismatch failures, re-decode permissively — declared
       encoding, then utf-8, then latin-1 (which cannot fail), each with
       the (now lying) declaration stripped.

    Still raises ET.ParseError when nothing salvageable remains; callers
    route that to the error channel (F7) so one bad blob never kills a
    batch (normalize_record, below)."""
    try:
        return ET.fromstring(data)
    except ET.ParseError as first_err:
        last_err: Exception = first_err
    i = data.find(b"<")
    if i < 0:
        raise ET.ParseError("no markup found")
    cleaned = _UNDEFINED_ENTITY.sub(b"", data[i:].rstrip(b"\x00 \t\r\n"))
    try:
        return ET.fromstring(cleaned)
    except ET.ParseError as exc:
        last_err = exc
    decl = _DECL_ENCODING.search(cleaned[:200])
    encodings = ["utf-8", "latin-1"]
    if decl:
        declared = decl.group(1).decode("ascii", "ignore").lower()
        if declared in ("utf8", "utf-8"):
            pass  # already first in the ladder
        else:
            encodings.insert(0, declared)
    body = _XML_DECL.sub(b"", cleaned)
    for enc in encodings:
        try:
            return ET.fromstring(body.decode(enc, errors="replace"))
        except (ET.ParseError, LookupError) as exc:
            last_err = exc
    raise ET.ParseError(f"unrecoverable XML: {last_err}")


# ---------------------------------------------------------------------------
# Cleanup / scalar utilities (X1-X5, D1 — exact reference semantics)
# ---------------------------------------------------------------------------
def remove_whitespace(s: str | None) -> str | None:
    """Collapse whitespace runs to single spaces; None if empty
    (record.py:520-526)."""
    if s is None:
        return None
    cleaned = " ".join(s.split())
    return cleaned or None


def dedupe_list_of_values(values: list) -> list:
    """Order-preserving dedupe on lower/strip key with case preference
    TitleCase > UPPERCASE > lowercase; unwraps [[...]] single-nested lists
    (utils.py:24-72 — byte-parity matters for golden checks)."""
    if not values:
        return values
    if isinstance(values, list) and len(values) == 1 and isinstance(values[0], list):
        values = values[0]
    temp: dict = {}
    for item in values:
        if isinstance(item, str):
            key = item.lower().strip()
            value = item.strip()
            if key not in temp:
                temp[key] = value
            elif value.istitle():
                temp[key] = value
            elif value.isupper() and not temp[key].istitle():
                temp[key] = value
            elif value.islower() and not (temp[key].isupper() or temp[key].istitle()):
                temp[key] = value
        else:
            temp.setdefault(item, item)
    return list(temp.values())


def date_parser(date_string: str) -> dt.datetime:
    """dateutil parse with epoch default 0001-01-01 so "2022" -> 2022-01-01
    (utils.py:13-21)."""
    return _dateutil_parse(
        date_string, default=dt.datetime(1, 1, 1, tzinfo=dt.timezone.utc)
    )


class FieldMethodError(Exception):
    """Raised when a field method fails (records/exceptions.py:11-21)."""

    def __init__(self, original: Exception, message: str) -> None:
        super().__init__(message)
        self.original = original


# ---------------------------------------------------------------------------
# Validation — engine analog of MITAardvarkFormatValidator
# (records/validators.py:112-193 + the two JSON schemas)
# ---------------------------------------------------------------------------
_ISO_DT_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$"
)


# Per-field shape of the MIT/geoblacklight Aardvark schemas, authored as a
# compact table: 's' = string, 'a' = array<string>, 'ai' = array<integer>,
# 'b' = boolean, 'dt' = string with format date-time. Field inventory and
# the resourceClass enum match the published OpenGeoMetadata Aardvark
# schema + MIT's required list (validators.py:118-139).
_AARDVARK_FIELD_KINDS: dict[str, str] = {
    "id": "s", "dct_title_s": "s", "schema_provider_s": "s",
    "dct_issued_s": "s", "locn_geometry": "s", "dcat_bbox": "s",
    "dcat_centroid": "s", "dct_accessRights_s": "s", "dct_format_s": "s",
    "gbl_fileSize_s": "s", "gbl_wxsIdentifier_s": "s",
    "dct_references_s": "s", "gbl_mdVersion_s": "s",
    "gbl_mdModified_dt": "dt",
    "gbl_suppressed_b": "b", "gbl_georeferenced_b": "b",
    "gbl_indexYear_im": "ai",
    "dct_alternative_sm": "a", "dct_description_sm": "a",
    "dct_language_sm": "a", "gbl_displayNote_sm": "a",
    "dct_creator_sm": "a", "dct_publisher_sm": "a",
    "gbl_resourceClass_sm": "a", "gbl_resourceType_sm": "a",
    "dct_subject_sm": "a", "dcat_theme_sm": "a", "dcat_keyword_sm": "a",
    "dct_temporal_sm": "a", "gbl_dateRange_drsim": "a",
    "dct_spatial_sm": "a", "dct_relation_sm": "a", "pcdm_memberOf_sm": "a",
    "dct_isPartOf_sm": "a", "dct_source_sm": "a", "dct_isVersionOf_sm": "a",
    "dct_replaces_sm": "a", "dct_isReplacedBy_sm": "a", "dct_rights_sm": "a",
    "dct_rightsHolder_sm": "a", "dct_license_sm": "a",
    "dct_identifier_sm": "a",
}


def _build_aardvark_jsonschema() -> dict:
    kinds = {
        "s": {"type": "string"},
        "dt": {"type": "string", "format": "date-time"},
        "b": {"type": "boolean"},
        "a": {"type": "array", "items": {"type": "string"}},
        "ai": {"type": "array", "items": {"type": "integer"}},
    }
    props: dict = {
        name: dict(kinds[kind]) for name, kind in _AARDVARK_FIELD_KINDS.items()
    }
    props["gbl_resourceClass_sm"] = {
        "type": "array",
        "items": {"type": "string", "enum": list(GBL_RESOURCE_CLASS_ENUM)},
    }
    return {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": props,
        "required": list(AARDVARK_REQUIRED_FIELDS),
    }


try:  # full-fidelity path: real Draft 2020-12 validation (validators.py:193)
    from jsonschema import Draft202012Validator, FormatChecker

    _AARDVARK_VALIDATOR = Draft202012Validator(
        schema=_build_aardvark_jsonschema(), format_checker=FormatChecker()
    )
except Exception:  # pragma: no cover — jsonschema absent
    _AARDVARK_VALIDATOR = None

try:  # same checker jsonschema's FormatChecker uses for 'date-time'
    from rfc3339_validator import validate_rfc3339 as _rfc3339_ok
except Exception:  # pragma: no cover
    _rfc3339_ok = None


def _fast_valid(slim: dict) -> bool:
    """Conservative validity predicate: True ONLY for records the full
    Draft 2020-12 validator provably accepts (same field-kind table, same
    enum, same rfc3339 date-time checker). Anything uncertain returns
    False and falls through to jsonschema — which is ~300us/record, ~30%
    of the whole normalize pipeline, so the valid-record common case must
    not pay it. Equivalence is fuzz-tested in tests/test_reference_parity.
    """
    if _rfc3339_ok is None:
        return False
    for f in AARDVARK_REQUIRED_FIELDS:
        if f not in slim:
            return False
    for k, v in slim.items():
        kind = _AARDVARK_FIELD_KINDS.get(k)
        if kind is None:
            continue  # additional properties are unconstrained
        if kind == "s":
            if not isinstance(v, str):
                return False
        elif kind == "dt":
            if not (isinstance(v, str) and _rfc3339_ok(v)):
                return False
        elif kind == "b":
            if not isinstance(v, bool):
                return False
        elif kind == "a":
            if not (
                isinstance(v, list) and all(isinstance(x, str) for x in v)
            ):
                return False
        elif kind == "ai":
            if not (
                isinstance(v, list)
                and all(
                    isinstance(x, int) and not isinstance(x, bool) for x in v
                )
            ):
                return False
    rc = slim.get("gbl_resourceClass_sm")
    if isinstance(rc, list) and any(
        x not in GBL_RESOURCE_CLASS_ENUM for x in rc
    ):
        return False
    return True


def validate_aardvark(rec: dict) -> list[str]:
    """Return sorted validation error strings (empty = valid).

    Full parity with MITAardvarkFormatValidator.validate (validators.py:
    178-193): the record is pre-filtered like Record.to_dict() (None values
    and empty lists dropped, record.py:121-123), then validated with a real
    Draft 2020-12 validator + FormatChecker against the authored schema
    table above. Falls back to a hand-rolled subset check only if the
    jsonschema wheel is absent.
    """
    slim = {
        k: v
        for k, v in rec.items()
        if v is not None and not (isinstance(v, (list, tuple)) and len(v) == 0)
    }
    if _AARDVARK_VALIDATOR is not None:
        if _fast_valid(slim):
            return []
        # reference sorts ValidationError OBJECTS by str(error) — the full
        # repr incl. path/context — then extracts .message
        # (validators.py:186); sorting the bare messages can reorder
        # multi-error output, so mirror the reference exactly.
        return [
            e.message
            for e in sorted(_AARDVARK_VALIDATOR.iter_errors(slim), key=str)
        ]
    errors: list[str] = []  # degraded fallback (no jsonschema wheel)
    for f in AARDVARK_REQUIRED_FIELDS:
        if f not in slim:
            errors.append(f"'{f}' is a required property")
    rc = slim.get("gbl_resourceClass_sm")
    if rc:
        for v in rc:
            if v not in GBL_RESOURCE_CLASS_ENUM:
                errors.append(f"'{v}' is not an allowed gbl_resourceClass_sm value")
    md = slim.get("gbl_mdModified_dt")
    if md and not _ISO_DT_RE.match(md):
        errors.append(f"'{md}' is not a 'date-time'")
    iy = slim.get("gbl_indexYear_im")
    if iy and not all(isinstance(v, int) for v in iy):
        errors.append("gbl_indexYear_im items must be integers")
    return sorted(errors)


# ---------------------------------------------------------------------------
# Record base classes (parse-once + field-method reflection)
# ---------------------------------------------------------------------------
class BaseNormalizer:
    """One source record; subclasses define ``_<aardvark_field>`` methods.

    Mirrors SourceRecord.normalize (record.py:320-359): loop the Aardvark
    field list, call matching methods, apply the two cleanup passes.
    """

    metadata_format: str = "base"

    def __init__(
        self,
        data: bytes,
        identifier: str,
        origin: str,
        event: str = "created",
        md_modified: str = DEFAULT_MD_MODIFIED,
        config: dict | None = None,
    ) -> None:
        self.data = data
        self.identifier = identifier
        self.origin = origin
        self.event = event
        self.md_modified = md_modified
        self.config = config or {}

    # --- suppression / restriction (record.py:199-223) ---
    @property
    def is_suppressed(self) -> bool | None:
        return False

    @property
    def is_restricted(self) -> bool:
        return {"Public": False, "Restricted": True, None: True}[
            self._dct_accessRights_s()
        ]

    @property
    def is_deleted(self) -> bool:
        return self.event == "deleted"

    # --- shared field methods (record.py:413-487) ---
    def _id(self) -> str:
        return f"{self.origin}:{self.identifier}"

    def _gbl_mdModified_dt(self) -> str:
        return self.md_modified

    def _gbl_mdVersion_s(self) -> str:
        return "Aardvark"

    def _dcat_theme_sm(self) -> list[str]:
        if not hasattr(self, "_dct_subject_sm"):
            return []
        subjects = self._dct_subject_sm()
        if not subjects:
            return []
        return [
            s.title() for s in subjects if s.lower().strip() in DCAT_THEME_TERMS
        ]

    def _gbl_suppressed_b(self) -> bool:
        return self.event == "deleted"

    # --- controlled-vocab helpers (record.py:225-318) ---
    def get_controlled_dct_format_s_term(self, value: str | None) -> str | None:
        controlled_value = None
        if value:
            value = value.lower().strip()
            if (
                "shapefile" in value
                or value in ("shp", "avshp")
                or "shp," in value
                or "esri" in value
                or "geodatabase" in value
            ):
                value = "shapefile"
            elif "geotiff" in value:
                value = "geotiff"
            elif "jpeg2000" in value:
                value = "jpeg2000"
            elif "tiff/jpeg" in value or "multiple" in value:
                value = "mixed"
            elif "tiff" in value:
                value = "tiff"
            elif "jpeg" in value or "jpg" in value:
                value = "jpeg"
            elif "tabular" in value:
                value = "tabular"
            controlled_value = {
                t.lower(): t for t in DCT_FORMAT_S_OGM_TERMS
            }.get(value)
        if not controlled_value:
            fallback = {
                "Polygon data": "Shapefile",
                "Point data": "Shapefile",
                "Line data": "Shapefile",
                "Vector data": "Shapefile",
            }
            for rt in self._gbl_resourceType_sm():  # type: ignore[attr-defined]
                if mapped := fallback.get(rt):
                    controlled_value = mapped
        return controlled_value

    def get_controlled_gbl_resourceType_sm_terms(
        self, values: list[str] | None
    ) -> list[str]:
        if not values:
            return []
        controlled_terms = set(GBL_RESOURCETYPE_SM_TERMS)
        controlled_terms.update(["Image data", "Vector data", "Mixed"])
        out = []
        for value in values:
            pv = value.strip().lower()
            if "polygon" in pv:
                pv = "polygon data"
            elif "raster" in pv:
                pv = "raster data"
            elif "point" in pv:
                pv = "point data"
            elif "line" in pv or "string" in pv:
                pv = "line data"
            elif "image" in pv:
                pv = "image data"
            elif "vector" in pv:
                pv = "vector data"
            elif "mixed" in pv or "composite" in pv:
                pv = "mixed"
            if cv := {t.lower(): t for t in controlled_terms}.get(pv):
                out.append(cv)
        return dedupe_list_of_values(out)

    # --- normalize (record.py:320-384) ---
    @staticmethod
    def _remove_none_and_blank_strings(v: Any) -> Any:
        if isinstance(v, str):
            return None if v.strip() == "" else v
        if isinstance(v, list):
            return [
                x
                for x in v
                if x is not None and not (isinstance(x, str) and x.strip() == "")
            ]
        return v

    @staticmethod
    def _dedupe_list_fields(v: Any) -> Any:
        if isinstance(v, list):
            return dedupe_list_of_values(v)
        return v

    def normalize(self) -> dict:
        values: dict[str, Any] = {}
        for name in AARDVARK_FIELDS:
            method = getattr(self, f"_{name}", None)
            if method is None:
                continue
            try:
                values[name] = method()
            except Exception as exc:
                msg = f"Error getting value for field '{name}': {exc}"
                raise FieldMethodError(exc, msg) from exc
        for name, v in values.items():
            v = self._remove_none_and_blank_strings(v)
            values[name] = self._dedupe_list_fields(v)
        verrs = validate_aardvark(values)
        if verrs:
            raise FieldMethodError(
                ValueError("; ".join(verrs)), f"Validation failed: {'; '.join(verrs)}"
            )
        return values


class XmlNormalizer(BaseNormalizer):
    """XML-backed record: parse once, path helpers (record.py:489-556).

    lxml is unavailable; stdlib ElementTree + explicit per-field logic covers
    the reference's XPath surface (namespaces, attribute predicates and the
    ISO role/thesaurus predicates are implemented in the field methods).
    """

    nsmap: dict[str, str] = {}

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self._root: ET.Element | None = None
        self._reconcile_nsmap()

    def _reconcile_nsmap(self) -> None:
        """Dynamic nsmap reconciliation (iso19139.py:37-47): if the document
        declares a different URI for a known prefix, adopt the document's."""
        if not self.nsmap:
            return
        decls = dict(
            re.findall(rb'xmlns:(\w+)="([^"]+)"', self.data[:4000] or b"")
        )
        new = dict(self.nsmap)
        for prefix, default_uri in self.nsmap.items():
            file_uri = decls.get(prefix.encode())
            if file_uri is not None and file_uri.decode() != default_uri:
                new[prefix] = file_uri.decode()
        self.nsmap = new

    @property
    def root(self) -> ET.Element:
        if self._root is None:
            self._root = tolerant_fromstring(self.data)
        return self._root

    def findall(self, path: str) -> list[ET.Element]:
        """ElementTree findall with the class nsmap ('.//a/b' style paths)."""
        return self.root.findall(path, self.nsmap)

    remove_whitespace = staticmethod(remove_whitespace)

    def string_list_from_path(self, path: str) -> list:
        """string_list_from_xpath parity (record.py:527-538): whitespace-
        collapsed texts, blanks dropped, case-preference dedupe."""
        matches = self.findall(path)
        strings = [remove_whitespace(m.text) for m in matches]
        strings = [s for s in strings if s]
        if all(s is None or s == "" for s in strings):
            return []
        return dedupe_list_of_values(strings)

    def single_string_from_path(self, path: str) -> str | None:
        """single_string_from_xpath parity (record.py:540-556): raises when
        more than one element matches."""
        matches = self.findall(path)
        if not matches:
            return None
        if len(matches) > 1:
            raise ValueError(
                "Expected one or none matches for XPath query, "
                f"but {len(matches)} were found."
            )
        return remove_whitespace(matches[0].text)


class JsonNormalizer(BaseNormalizer):
    """JSON-backed record with the double-decode loop (record.py:570-583)."""

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self._parsed: dict | None = None

    @property
    def parsed_data(self) -> dict:
        if self._parsed is None:
            data: Any = self.data
            if isinstance(data, bytes):
                data = data.decode()
            while not isinstance(data, dict):
                data = json.loads(data)
            self._parsed = data
        return self._parsed

    def _convert_scalar_to_array(self, field_name: str) -> list[str]:
        if value := self.parsed_data.get(field_name):
            return [value]
        return []


# ---------------------------------------------------------------------------
# Origin layers (sources/mit.py, sources/ogm.py, sources/alma.py)
# ---------------------------------------------------------------------------
def mit_references(normalizer: BaseNormalizer) -> str:
    """MIT dct_references_s payload (sources/mit.py:36-67)."""
    ident = normalizer.identifier
    cdn_folder = {True: "restricted", False: "public"}[normalizer.is_restricted]
    download_urls = [
        {
            "label": "Source Metadata",
            "url": f"{CDN_ROOT}/public/{ident}.source."
            f"{normalizer.metadata_format}.xml",
        },
        {
            "label": "Aardvark Metadata",
            "url": f"{CDN_ROOT}/public/{ident}.normalized.aardvark.json",
        },
        {"label": "Data", "url": f"{CDN_ROOT}/{cdn_folder}/{ident}.zip"},
    ]
    website_url = (
        "https://geodata.libraries.mit.edu/record/"
        f"gismit:{ident.removeprefix('mit:')}"
    )
    return json.dumps(
        {
            "http://schema.org/downloadUrl": download_urls,
            "http://schema.org/url": website_url,
        }
    )


class NoExternalUrlError(Exception):
    pass


def ogm_references_from_json(normalizer: JsonNormalizer) -> str:
    """OGM GBL1/Aardvark dct_references_s (sources/ogm.py:50-150), default
    strategy: required http://schema.org/url + optional single downloadUrl."""
    strategy = (normalizer.config or {}).get("external_url_strategy")
    refs_raw = normalizer.parsed_data.get("dct_references_s")
    refs_dict = json.loads(refs_raw) if refs_raw else {}
    if strategy:
        name = strategy["name"]
        if name == "base_url_and_slug":
            url = "/".join(
                [strategy["base_url"], normalizer.parsed_data[strategy["gbl1_field"]]]
            )
        elif name == "field_value":
            url = normalizer.parsed_data.get(strategy["gbl1_field"])
            if url and not url.startswith("http"):
                url = None
        else:
            raise ValueError(f"Alternate URL strategy not recognized: {name}")
    else:
        url = refs_dict.get("http://schema.org/url")
    if not url:
        raise NoExternalUrlError("no external url found")
    urls_dict: dict[str, Any] = {"http://schema.org/url": url}
    download_value = refs_dict.get("http://schema.org/downloadUrl")
    if download_value and isinstance(download_value, str):
        urls_dict["http://schema.org/downloadUrl"] = [
            {"label": "Data", "url": download_value}
        ]
    return json.dumps(urls_dict)


# ---------------------------------------------------------------------------
# Registry + Spark operator
# ---------------------------------------------------------------------------
_REGISTRY: dict[str, type[BaseNormalizer]] = {}


def register(fmt: str) -> Callable[[type[BaseNormalizer]], type[BaseNormalizer]]:
    def deco(cls: type[BaseNormalizer]) -> type[BaseNormalizer]:
        _REGISTRY[fmt] = cls
        return cls

    return deco


def get_normalizer_class(fmt: str) -> type[BaseNormalizer]:
    from . import aardvark, fgdc, gbl1, iso19139, marc  # noqa: F401 (register)

    return _REGISTRY[fmt]


def normalize_record(
    fmt: str,
    data: bytes,
    identifier: str,
    origin: str,
    event: str,
    md_modified: str = DEFAULT_MD_MODIFIED,
) -> tuple[dict | None, dict | None]:
    """(aardvark_dict, error_dict) — exactly one is non-None."""
    try:
        cls = get_normalizer_class(fmt)
    except KeyError:
        return None, {"stage": "dispatch", "exception": f"unknown format: {fmt}"}
    try:
        rec = cls(
            data, identifier=identifier, origin=origin, event=event,
            md_modified=md_modified,
        )
        if rec.is_suppressed:
            # OGM harvest skips suppressed records silently (ogm.py:119-120);
            # we keep them addressable on the error side-channel instead
            return None, {"stage": "suppressed", "exception": "record suppressed"}
        return rec.normalize(), None
    except Exception as exc:
        return None, {"stage": "normalize", "exception": f"{type(exc).__name__}: {exc}"}


def normalize_pages(
    df: DataFrame, md_modified: str = DEFAULT_MD_MODIFIED
) -> DataFrame:
    """Spark operator: (url, identifier, origin, metadata_format, event,
    metadata) -> NORMALIZED_SCHEMA with aardvark struct + error column.

    mapInPandas: each blob parsed once per row inside the Arrow batch; a bad
    blob produces an error row, never a task failure (F7 parity).
    """
    ordered = [f.name for f in NORMALIZED_SCHEMA.fields]

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for row in pdf.itertuples(index=False):
                aard, err = normalize_record(
                    row.metadata_format,
                    row.metadata,
                    row.identifier,
                    row.origin,
                    row.event,
                    md_modified,
                )
                if aard is not None:
                    aard = {k: aard.get(k) for k in AARDVARK_FIELDS}
                out_rows.append(
                    {
                        "url": row.url,
                        "identifier": row.identifier,
                        "origin": row.origin,
                        "metadata_format": row.metadata_format,
                        "event": row.event,
                        "aardvark": aard,
                        "error": err,
                    }
                )
            yield pd.DataFrame(out_rows, columns=ordered)

    return df.mapInPandas(_map, NORMALIZED_SCHEMA)


def split_failed(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """filter_failed_records parity (harvest/__init__.py:169-188):
    (ok, failed) split on the error column."""
    return df.where(df.error.isNull()), df.where(df.error.isNotNull())
