"""GBL1 (GeoBlacklight 1.x) normalizer — semantics mirror
/root/reference/harvester/records/formats/gbl1.py (JSON key mapping)."""

from __future__ import annotations

from .base import JsonNormalizer, ogm_references_from_json, register
from .vocab import GBL_RESOURCE_CLASS_VALUE_MAP


@register("gbl1")
class GBL1(JsonNormalizer):
    metadata_format = "gbl1"

    @property
    def is_suppressed(self) -> bool | None:
        return self.parsed_data.get("suppressed_b")

    # --- required (gbl1.py:31-52) ---
    def _dct_accessRights_s(self) -> str:
        return self.parsed_data.get("dc_rights_s", "Public")

    def _dct_title_s(self) -> str | None:
        return self.parsed_data["dc_title_s"]

    def _gbl_resourceClass_sm(self) -> list[str]:
        if value := self.parsed_data.get("dc_type_s"):
            if mapped := GBL_RESOURCE_CLASS_VALUE_MAP.get(value.strip().lower()):
                return [mapped]
        return ["Other"]

    def _dct_references_s(self) -> str:
        return ogm_references_from_json(self)

    def _schema_provider_s(self) -> str:
        return self.config.get("name", "OpenGeoMetadata")

    def _dcat_bbox(self) -> str | None:
        # raw solr_geom passthrough — the reference does NOT apply the WKT
        # validator decorator on GBL1 (gbl1.py:48-52)
        return self.parsed_data.get("solr_geom", None)

    def _locn_geometry(self) -> str | None:
        return self._dcat_bbox()

    # --- optional (gbl1.py:58-118) ---
    def _dct_description_sm(self) -> list[str]:
        return self._convert_scalar_to_array("dc_description_s")

    def _dcat_keyword_sm(self) -> list[str]:
        return []  # new in Aardvark; no GBL1 mapping

    def _dct_alternative_sm(self) -> list[str]:
        return []  # new in Aardvark; no GBL1 mapping

    def _dct_creator_sm(self) -> list[str] | None:
        return self.parsed_data.get("dc_creator_sm")

    def _dct_format_s(self) -> str | None:
        return self.get_controlled_dct_format_s_term(
            self.parsed_data.get("dc_format_s")
        )

    def _dct_issued_s(self) -> str | None:
        return self.parsed_data.get("dct_issued_s")

    def _dct_identifier_sm(self) -> list[str]:
        return self._convert_scalar_to_array("dc_identifier_s")

    def _dct_language_sm(self) -> list[str]:
        if self.parsed_data.get("dc_language_sm"):
            return self._convert_scalar_to_array("dc_language_sm")
        if self.parsed_data.get("dc_language_s"):
            return self._convert_scalar_to_array("dc_language_s")
        return []

    def _dct_publisher_sm(self) -> list[str]:
        return self._convert_scalar_to_array("dc_publisher_s")

    def _dct_rights_sm(self) -> list[str]:
        return []  # new in Aardvark; no GBL1 mapping

    def _dct_spatial_sm(self) -> list[str] | None:
        return self.parsed_data.get("dct_spatial_sm")

    def _dct_subject_sm(self) -> list[str] | None:
        return self.parsed_data.get("dc_subject_sm")

    def _dct_temporal_sm(self) -> list[str] | None:
        return self.parsed_data.get("dct_temporal_sm")

    def _gbl_dateRange_drsim(self) -> list[str]:
        return []  # new in Aardvark; no GBL1 mapping

    def _gbl_resourceType_sm(self) -> list[str]:
        return self.get_controlled_gbl_resourceType_sm_terms(
            self._convert_scalar_to_array("layer_geom_type_s")
        )

    def _gbl_indexYear_im(self) -> list[int]:
        if value := self.parsed_data.get("solr_year_i"):
            if isinstance(value, list):
                return [int(value[0])]
            return [int(value)]
        return []
