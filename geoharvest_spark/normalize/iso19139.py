"""ISO19139 normalizer — semantics mirror /root/reference/harvester/records/
formats/iso19139.py. Namespaced paths use ElementTree with the class nsmap
(dynamically reconciled against the document's xmlns declarations,
iso19139.py:37-47). The lxml-only XPath predicates (role codes,
preceding-sibling creator dedupe, FGDC-thesaurus filter) are implemented as
explicit element walks with identical semantics.

Quirk preserved: gbl_dateRange_drsim emits ``"{begin} TO {end}"`` WITHOUT
brackets (iso19139.py:401-418) — asymmetric with FGDC's ``[a TO b]``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from dateutil.parser import ParserError

from .base import XmlNormalizer, date_parser, mit_references, register
from .fgdc import _validate_envelope_str
from .vocab import convert_lang_code

_DATE_ERRORS = (ParserError, ValueError, OverflowError, TypeError)


@register("iso19139")
class ISO19139(XmlNormalizer):
    metadata_format = "iso19139"

    nsmap = {
        "gmd": "http://www.isotc211.org/2005/gmd",
        "gco": "http://www.isotc211.org/2005/gco",
        "gts": "http://www.isotc211.org/2005/gts",
        "srv": "http://www.isotc211.org/2005/srv",
        "gml": "http://www.opengis.net/gml/3.2",
    }

    # --- required (iso19139.py:52-143) ---
    def _dct_accessRights_s(self) -> str:
        els = self.findall(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification"
            "/gmd:resourceConstraints/gmd:MD_LegalConstraints"
            "/gmd:accessConstraints/gmd:MD_RestrictionCode"
        )
        if not els:
            return "Public"
        codes = []
        for el in els:
            if el.text:
                codes.append(el.text.strip().lower())
            if attr := el.attrib.get("codeListValue"):
                codes.append(attr.strip().lower())
        for code in codes:
            if "public" in code or "unrestricted" in code:
                return "Public"
        return "Restricted"

    def _dct_title_s(self) -> str:
        value = self.single_string_from_path(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification/gmd:citation"
            "/gmd:CI_Citation/gmd:title/gco:CharacterString"
        )
        if not value:
            raise ValueError("Could not find <title> element")
        return value

    def _gbl_resourceClass_sm(self) -> list[str]:
        values = self.string_list_from_path(
            ".//gmd:hierarchyLevel/gmd:MD_ScopeCode"
        )
        if not values:
            return []
        value_map = {"dataset": "Datasets"}  # only mapped value (iso19139.py:120-137)
        return [
            m for v in values if (m := value_map.get(v.strip().lower())) is not None
        ]

    def _dct_references_s(self) -> str:
        return mit_references(self)

    def _schema_provider_s(self) -> str:
        return "GIS Lab, MIT Libraries"

    # --- optional ---
    def _dcat_bbox(self) -> str | None:
        """Union envelope, STRING min/max (iso19139.py:148-192)."""
        data: dict[str, list[str]] = {
            "westBoundLongitude": [], "eastBoundLongitude": [],
            "southBoundLatitude": [], "northBoundLatitude": [],
        }
        for box in self.findall(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification/gmd:extent"
            "/gmd:EX_Extent/gmd:geographicElement/gmd:EX_GeographicBoundingBox"
        ):
            for child in box:
                tag = child.tag.rsplit("}", 1)[-1]
                if tag in data and len(child) and child[0].text is not None:
                    data[tag].append(child[0].text)
        if not all(data.values()):
            raise ValueError("incomplete bounding box data")
        env = ", ".join(
            [
                min(data["westBoundLongitude"]).strip(),
                max(data["eastBoundLongitude"]).strip(),
                max(data["northBoundLatitude"]).strip(),
                min(data["southBoundLatitude"]).strip(),
            ]
        )
        return _validate_envelope_str(f"ENVELOPE({env})")

    def _dct_description_sm(self) -> list[str]:
        return self.string_list_from_path(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification/gmd:abstract"
            "/gco:CharacterString"
        )

    def _dcat_keyword_sm(self) -> list[str]:
        return self.string_list_from_path(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification"
            "/gmd:descriptiveKeywords/gmd:MD_Keywords/gmd:keyword"
            "/gco:CharacterString"
        )

    def _dct_alternative_sm(self) -> list[str]:
        return self.string_list_from_path(
            ".//gmd:MD_DataIdentification/gmd:citation/gmd:CI_Citation"
            "/gmd:alternateTitle/gco:CharacterString"
        )

    def _dct_creator_sm(self) -> list[str]:
        """Originator-role responsible parties, deduped by name — explicit
        walk matching the preceding-sibling XPath (iso19139.py:225-254)."""
        names: list[str] = []
        seen: set[str] = set()
        for party in self.findall(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification/gmd:citation"
            "/gmd:CI_Citation/gmd:citedResponsibleParty"
        ):
            rp = party.find("gmd:CI_ResponsibleParty", self.nsmap)
            if rp is None:
                continue
            role = rp.find("gmd:role/gmd:CI_RoleCode", self.nsmap)
            if role is None or role.attrib.get("codeListValue") != "originator":
                continue
            org = rp.find("gmd:organisationName/gco:CharacterString", self.nsmap)
            ind = rp.find("gmd:individualName/gco:CharacterString", self.nsmap)
            key = (org.text if org is not None else None) or (
                ind.text if ind is not None else None
            )
            if key is None or key in seen:
                continue
            seen.add(key)
            if org is not None and org.text:
                s = self.remove_whitespace(org.text)
                if s:
                    names.append(s)
        from .base import dedupe_list_of_values

        return dedupe_list_of_values(names)

    def _dct_format_s(self) -> str | None:
        return self.get_controlled_dct_format_s_term(
            self.single_string_from_path(
                ".//gmd:distributionInfo/gmd:MD_Distribution"
                "/gmd:distributionFormat/gmd:MD_Format/gmd:name"
                "/gco:CharacterString"
            )
        )

    def _dct_issued_s(self) -> str | None:
        """CI_Date with dateType text 'publication' (iso19139.py:270-294)."""
        values = []
        for ci_date in self.findall(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification/gmd:citation"
            "/gmd:CI_Citation/gmd:date/gmd:CI_Date"
        ):
            dtype = ci_date.find(
                "gmd:dateType/gmd:CI_DateTypeCode", self.nsmap
            )
            if dtype is None or (dtype.text or "").strip() != "publication":
                continue
            d = ci_date.find("gmd:date/gco:Date", self.nsmap)
            if d is not None:
                values.append(self.remove_whitespace(d.text))
        values = [v for v in values if v]
        if not values:
            return None
        if len(values) > 1:
            raise ValueError(
                "Expected one or none matches for XPath query, "
                f"but {len(values)} were found."
            )
        try:
            return date_parser(values[0]).strftime("%Y-%m-%d")
        except _DATE_ERRORS:
            return None

    def _dct_identifier_sm(self) -> list[str]:
        return self.string_list_from_path(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification/gmd:citation"
            "/gmd:CI_Citation/gmd:identifier/gmd:MD_Identifier/gmd:code"
            "/gco:CharacterString"
        )

    def _dct_language_sm(self) -> list[str]:
        codes = self.string_list_from_path(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification/gmd:language"
            "/gmd:LanguageCode"
        )
        out = []
        for code in codes:
            try:
                out.append(convert_lang_code(code))
            except Exception:
                continue
        return [c for c in out if c is not None]

    def _dct_publisher_sm(self) -> list[str]:
        """CI_ResponsibleParty with publisher role (iso19139.py:329-337)."""
        names = []
        for rp in self.findall(".//gmd:CI_ResponsibleParty"):
            role = rp.find("gmd:role/gmd:CI_RoleCode", self.nsmap)
            if role is None or role.attrib.get("codeListValue") != "publisher":
                continue
            org = rp.find("gmd:organisationName/gco:CharacterString", self.nsmap)
            if org is not None and org.text:
                s = self.remove_whitespace(org.text)
                if s:
                    names.append(s)
        from .base import dedupe_list_of_values

        return dedupe_list_of_values(names)

    def _dct_rights_sm(self) -> list[str]:
        """All resourceConstraints strings except literal 'None'
        (iso19139.py:339-347)."""
        strings = []
        for rc in self.findall(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification"
            "/gmd:resourceConstraints"
        ):
            for el in rc.iter():
                if el.tag.endswith("}CharacterString") and el.text != "None":
                    s = self.remove_whitespace(el.text)
                    if s:
                        strings.append(s)
        from .base import dedupe_list_of_values

        return dedupe_list_of_values(strings)

    def _dct_spatial_sm(self) -> list[str]:
        """Keywords typed 'place' (iso19139.py:349-362)."""
        out = []
        for kw in self.findall(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification"
            "/gmd:descriptiveKeywords/gmd:MD_Keywords"
        ):
            ktype = kw.find("gmd:type/gmd:MD_KeywordTypeCode", self.nsmap)
            if ktype is None or ktype.attrib.get("codeListValue") != "place":
                continue
            for k in kw.findall("gmd:keyword/gco:CharacterString", self.nsmap):
                s = self.remove_whitespace(k.text)
                if s:
                    out.append(s)
        from .base import dedupe_list_of_values

        return dedupe_list_of_values(out)

    def _dct_subject_sm(self) -> list[str]:
        return self.string_list_from_path(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification"
            "/gmd:topicCategory/gmd:MD_TopicCategoryCode"
        )

    def _dct_temporal_sm(self) -> list[str]:
        te = self._get_temporal_extents()
        out = []
        for inst in te["instances"]:
            try:
                out.append(date_parser(inst["timestamp"]).strftime("%Y-%m-%d"))
            except _DATE_ERRORS:
                continue
        for period in te["periods"]:
            try:
                beg = date_parser(period["begin_timestamp"]).strftime("%Y")
                end = date_parser(period["end_timestamp"]).strftime("%Y")
            except _DATE_ERRORS:
                continue
            out.append(f"{beg}-{end}")
        return out

    def _gbl_dateRange_drsim(self) -> list[str]:
        te = self._get_temporal_extents()
        out = []
        for period in te["periods"]:
            try:
                beg = date_parser(period["begin_timestamp"]).strftime("%Y")
                end = date_parser(period["end_timestamp"]).strftime("%Y")
            except _DATE_ERRORS:
                continue
            out.append(f"{beg} TO {end}")  # no brackets (iso19139.py:416)
        return out

    def _gbl_resourceType_sm(self) -> list[str]:
        """Keywords whose thesaurus title is 'FGDC' (iso19139.py:420-436)."""
        values = []
        for kw in self.findall(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification"
            "/gmd:descriptiveKeywords/gmd:MD_Keywords"
        ):
            thes = kw.find(
                "gmd:thesaurusName/gmd:CI_Citation/gmd:title/gco:CharacterString",
                self.nsmap,
            )
            if thes is None or thes.text != "FGDC":
                continue
            for k in kw.findall("gmd:keyword/gco:CharacterString", self.nsmap):
                s = self.remove_whitespace(k.text)
                if s:
                    values.append(s)
        return self.get_controlled_gbl_resourceType_sm_terms(values)

    def _gbl_indexYear_im(self) -> list[int]:
        te = self._get_temporal_extents()
        dates = [i["timestamp"] for i in te["instances"]]
        dates.extend(
            ts
            for p in te["periods"]
            for ts in (p["begin_timestamp"], p["end_timestamp"])
        )
        years = []
        for d in dates:
            try:
                years.append(int(date_parser(d).strftime("%Y")))
            except _DATE_ERRORS:
                continue
        return years

    def _locn_geometry(self) -> str | None:
        return self._dcat_bbox()

    # --- temporal helpers (iso19139.py:477-606) ---
    def _get_temporal_extents(self) -> dict:
        out: dict[str, list] = {"instances": [], "periods": []}
        for te in self.findall(
            ".//gmd:identificationInfo/gmd:MD_DataIdentification/gmd:extent"
            "/gmd:EX_Extent/gmd:temporalElement/gmd:EX_TemporalExtent"
        ):
            if (inst := self._parse_time_instant(te)) is not None:
                out["instances"].append(inst)
            if (period := self._parse_time_period(te)) is not None:
                out["periods"].append(period)
        return out

    def _parse_time_instant(self, te: ET.Element) -> dict | None:
        instant = te.find("gmd:extent/gml:TimeInstant", self.nsmap)
        if instant is None:
            return None
        d = {"description": None, "timestamp": None}
        desc = instant.find("gml:description", self.nsmap)
        if desc is not None:
            d["description"] = desc.text
        d["timestamp"] = self._parse_time_position(
            instant.find("gml:timePosition", self.nsmap)
        )
        return d

    def _parse_time_period(self, te: ET.Element) -> dict | None:
        period = te.find("gmd:extent/gml:TimePeriod", self.nsmap)
        if period is None:
            return None
        d = {"description": None, "begin_timestamp": None, "end_timestamp": None}
        desc = period.find("gml:description", self.nsmap)
        if desc is not None:
            d["description"] = desc.text
        d["begin_timestamp"] = self._parse_time_position(
            period.find("gml:beginPosition", self.nsmap)
        )
        d["end_timestamp"] = self._parse_time_position(
            period.find("gml:endPosition", self.nsmap)
        )
        return d

    @staticmethod
    def _parse_time_position(el: ET.Element | None) -> str | None:
        if el is None:
            return None
        if ip := el.attrib.get("indeterminatePosition"):
            return str(ip)
        if el.text:
            return el.text.strip()
        return None
