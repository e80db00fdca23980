"""Aardvark (GeoBlacklight 4.x) normalizer — mostly passthrough; semantics
mirror /root/reference/harvester/records/formats/aardvark.py."""

from __future__ import annotations

from .base import JsonNormalizer, ogm_references_from_json, register
from .vocab import GBL_RESOURCE_CLASS_VALUE_MAP


@register("aardvark")
class Aardvark(JsonNormalizer):
    metadata_format = "aardvark"

    @property
    def is_suppressed(self) -> bool | None:
        return self.parsed_data.get("gbl_suppressed_b")

    # --- required (aardvark.py:25-43) ---
    def _dct_accessRights_s(self) -> str:
        return self.parsed_data["dct_accessRights_s"]

    def _dct_title_s(self) -> str | None:
        return self.parsed_data["dct_title_s"]

    def _gbl_resourceClass_sm(self) -> list[str]:
        mapped_values = []
        for value in self.parsed_data.get("gbl_resourceClass_sm", []):
            if mapped := GBL_RESOURCE_CLASS_VALUE_MAP.get(value.strip().lower()):
                mapped_values.append(mapped)
        return mapped_values or ["Other"]

    def _dct_references_s(self) -> str:
        return ogm_references_from_json(self)

    def _schema_provider_s(self) -> str:
        return self.config.get("name", "OpenGeoMetadata")

    def _dcat_bbox(self) -> str | None:
        return self.parsed_data.get("dcat_bbox", None)

    def _locn_geometry(self) -> str | None:
        return self.parsed_data.get("locn_geometry", None)

    # --- optional (aardvark.py:49-100) ---
    def _dct_description_sm(self) -> list[str]:
        return self.parsed_data.get("dct_description_sm", [])

    def _dcat_keyword_sm(self) -> list[str]:
        return self.parsed_data.get("dcat_keyword_sm", [])

    def _dct_alternative_sm(self) -> list[str]:
        return self.parsed_data.get("dct_alternative_sm", [])

    def _dct_creator_sm(self) -> list[str]:
        return self.parsed_data.get("dct_creator_sm", [])

    def _dct_format_s(self) -> str | None:
        return self.get_controlled_dct_format_s_term(
            self.parsed_data.get("dct_format_s")
        )

    def _dct_issued_s(self) -> str | None:
        return self.parsed_data.get("dct_issued_s")

    def _dct_identifier_sm(self) -> list[str]:
        return self.parsed_data.get("dct_identifier_sm", [])

    def _dct_language_sm(self) -> list[str]:
        return self.parsed_data.get("dct_language_sm", [])

    def _dct_publisher_sm(self) -> list[str]:
        return self.parsed_data.get("dct_publisher_sm", [])

    def _dct_rights_sm(self) -> list[str]:
        return self.parsed_data.get("dct_rights_sm", [])

    def _dct_spatial_sm(self) -> list[str]:
        return self.parsed_data.get("dct_spatial_sm", [])

    def _dct_subject_sm(self) -> list[str]:
        return self.parsed_data.get("dct_subject_sm", [])

    def _dct_temporal_sm(self) -> list[str]:
        return self.parsed_data.get("dct_temporal_sm", [])

    def _gbl_dateRange_drsim(self) -> list[str]:
        # string -> [string] coercion (aardvark.py:87-91)
        value = self.parsed_data.get("gbl_dateRange_drsim", [])
        if isinstance(value, str):
            return [value]
        return value

    def _gbl_resourceType_sm(self) -> list[str]:
        return self.get_controlled_gbl_resourceType_sm_terms(
            self.parsed_data.get("gbl_resourceType_sm", [])
        )

    def _gbl_indexYear_im(self) -> list[int]:
        return [int(v) for v in self.parsed_data.get("gbl_indexYear_im", [])]
