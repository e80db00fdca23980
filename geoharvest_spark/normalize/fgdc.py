"""FGDC normalizer — semantics mirror /root/reference/harvester/records/
formats/fgdc.py (field-by-field citations inline). Quirks preserved on
purpose:

- bbox union compares coordinate values AS STRINGS (fgdc.py:110-122);
- _dct_temporal_sm reads sngdate/caldate under the misspelled ``timeprd``
  path (fgdc.py:195-203) — real-world FGDC files use ``timeperd``, so that
  branch rarely matches, exactly like the reference;
- _dct_rights_sm reads ``acconst`` (single 'c', fgdc.py:354-368), NOT the
  ``accconst`` element used by _dct_accessRights_s.
"""

from __future__ import annotations

from dateutil.parser import ParserError

from ..geo import validated_envelope_wkt  # noqa: F401 (validation applied Spark-side)
from .base import (
    XmlNormalizer,
    date_parser,
    dedupe_list_of_values,
    mit_references,
    register,
)
from .vocab import convert_lang_code

_WKT_VALIDATE = True


def _validate_envelope_str(wkt: str | None) -> str | None:
    """ValidateGeoshapeWKT decorator analog (validators.py:26-106).

    Reference semantics are PARSEABILITY-ONLY: ``shapely.box`` happily
    constructs an inverted (w>e) box, so such envelopes pass; only
    non-numeric vertices (literal_eval failure) null the value. Range/order
    sanity for the spatial compute path is a separate engine gate
    (geo.validated_envelope_wkt)."""
    if wkt is None or not isinstance(wkt, str):
        return None
    import re as _re

    m = _re.match(r"^ENVELOPE\s?\((.*)\)$", wkt)
    if not m:
        return None
    try:
        parts = [float(p.strip()) for p in m.group(1).split(",")]
    except ValueError:
        return None
    if len(parts) != 4:
        return None
    return wkt


@register("fgdc")
class FGDC(XmlNormalizer):
    metadata_format = "fgdc"

    # --- required (fgdc.py:27-81) ---
    def _dct_accessRights_s(self) -> str:
        value = self.single_string_from_path(".//idinfo/accconst")
        if value:
            if "Restricted" in value:
                return "Restricted"
            if "Unrestricted" in value:
                return "Public"
        return "Restricted"

    def _dct_title_s(self) -> str:
        value = self.single_string_from_path(".//idinfo/citation/citeinfo/title")
        if not value:
            raise ValueError("Could not find <title> element")
        return value

    def _gbl_resourceClass_sm(self) -> list[str]:
        value_map = {
            "vector digital data": "Datasets",
            "raster digital data": "Datasets",
            "remote-sensing image": "Imagery",
        }
        values = self.string_list_from_path(".//idinfo/citation/citeinfo/geoform")
        return [
            m for v in values if (m := value_map.get(v.strip().lower())) is not None
        ]

    def _dct_references_s(self) -> str:
        return mit_references(self)

    def _schema_provider_s(self) -> str:
        return "GIS Lab, MIT Libraries"

    # --- optional ---
    def _dcat_bbox(self) -> str | None:
        """Union envelope with STRING min/max (fgdc.py:86-123)."""
        data: dict[str, list[str]] = {
            "westbc": [], "eastbc": [], "northbc": [], "southbc": [],
        }
        for bounding in self.findall(".//idinfo/spdom/bounding"):
            for child in bounding:
                tag = child.tag.rsplit("}", 1)[-1]
                if tag in data and child.text is not None:
                    data[tag].append(child.text)
        if not all(data.values()):
            raise ValueError("incomplete bounding box data")
        env = ", ".join(
            [
                min(data["westbc"]).strip(),
                max(data["eastbc"]).strip(),
                max(data["northbc"]).strip(),
                min(data["southbc"]).strip(),
            ]
        )
        return _validate_envelope_str(f"ENVELOPE({env})")

    def _dct_identifier_sm(self) -> list[str]:
        identifiers: list[str] = [self.identifier]
        for el in self.findall(".//spdoinfo/ptvctinf/sdtsterm"):
            if el.get("Name") is not None:
                identifiers.append(el.get("Name"))
        for el in self.findall("./idinfo/citation/citeinfo/onlink"):
            if el.text and "handle.net" in el.text:
                s = self.remove_whitespace(el.text)
                if s:
                    identifiers.append(s)
        identifiers.extend(
            self.string_list_from_path("./idinfo/citation/citeinfo/ftname")
        )
        return dedupe_list_of_values(identifiers)

    def _dct_subject_sm(self) -> list[str]:
        return self.string_list_from_path("./idinfo/keywords//themekey")

    def _dct_spatial_sm(self) -> list[str]:
        return self.string_list_from_path("./idinfo/keywords//placekey")

    def _dct_temporal_sm(self) -> list[str]:
        values: list[str] = []
        values.extend(self.string_list_from_path("./idinfo/keywords//tempkey"))
        # NOTE 'timeprd' misspelling preserved from fgdc.py:195-203
        values.extend(
            self.string_list_from_path("./idinfo/timeprd/timeinfo/sngdate/caldate")
        )
        values.extend(
            self.string_list_from_path(
                "./idinfo/timeperd/timeinfo/mdattim/sngdate/caldate"
            )
        )
        values.extend(
            self.string_list_from_path("./idinfo/timeperd/timeinfo/rngdates/begdate")
        )
        parsed = []
        for v in values:
            try:
                parsed.append(date_parser(v).strftime("%Y-%m-%d"))
            except (ParserError, OverflowError, ValueError):
                continue
        return parsed

    def _gbl_dateRange_drsim(self) -> list[str]:
        out = []
        for rng in self.findall("./idinfo/timeperd/timeinfo/rngdates"):
            try:
                beg = date_parser(rng.find("begdate").text).strftime("%Y")
                end = date_parser(rng.find("enddate").text).strftime("%Y")
            except (ParserError, AttributeError, ValueError, OverflowError):
                continue
            out.append(f"[{beg} TO {end}]")
        return out

    def _dct_description_sm(self) -> list[str]:
        return self.string_list_from_path("./idinfo/descript/abstract")

    def _dct_creator_sm(self) -> list[str]:
        return self.string_list_from_path("./idinfo/citation/citeinfo/origin")

    def _dct_format_s(self) -> str | None:
        return self.get_controlled_dct_format_s_term(
            self.single_string_from_path(
                ".//distinfo/stdorder/digform/digtinfo/formname"
            )
        )

    def _dct_issued_s(self) -> str | None:
        value = self.single_string_from_path("./idinfo/citation/citeinfo/pubdate")
        if value:
            try:
                return date_parser(value).strftime("%Y-%m-%d")
            except (ParserError, ValueError, OverflowError):
                pass
        return None

    def _dct_language_sm(self) -> list[str]:
        codes = self.string_list_from_path("./idinfo/descript/langdata")
        out = []
        for code in codes:
            try:
                out.append(convert_lang_code(code))
            except Exception:
                continue
        return [c for c in out if c is not None]

    def _dct_publisher_sm(self) -> list[str]:
        return self.string_list_from_path(
            "./idinfo/citation/citeinfo/pubinfo/publish"
        )

    def _dct_rights_sm(self) -> list[str]:
        rights: list[str] = []
        rights.extend(self.string_list_from_path("./idinfo/useconst"))
        # 'acconst' (sic) preserved from fgdc.py:361-367
        rights.extend(self.string_list_from_path("./idinfo/acconst"))
        return rights

    def _gbl_indexYear_im(self) -> list[int]:
        years = []
        for d in self._dct_temporal_sm():
            try:
                years.append(int(date_parser(d).strftime("%Y")))
            except (ParserError, ValueError, OverflowError):
                continue
        return years

    def _gbl_resourceType_sm(self) -> list[str]:
        return self.get_controlled_gbl_resourceType_sm_terms(
            self.string_list_from_path(".//spdoinfo/ptvctinf/sdtsterm/sdtstype")
        )

    def _locn_geometry(self) -> str | None:
        return self._dcat_bbox()
