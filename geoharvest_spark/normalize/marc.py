"""MARC normalizer — semantics mirror /root/reference/harvester/records/
formats/marc.py + sources/alma.py. marcalyx is not installed; a minimal
MARC-XML model (leader / control fields / data fields+subfields) built on
stdlib ElementTree stands in. Subfield "value" of a data field is the
space-joined subfield values (title statement behavior).

Key parity points:
- 034 bbox: repeatable tags, subfields d/e/f/g all required per tag
  (marc.py:315-321); 'hdddmmss' -> Decimal at precision 10 via
  deg + min/60 + sec/3600, W/S/- negates (marc.py:350-391); across tags
  w=min, e=max, n=max, s=min (marc.py:335-348); POINT when degenerate
  (marc.py:106-120).
- identifier from 001, event from leader[5] map (sources/alma.py:38-62).
- 4-predicate geospatial filter (harvest/alma.py:194-231).
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET
from decimal import Decimal, localcontext

from .base import BaseNormalizer, register

COORD_REGEX = re.compile(
    r"""^(?P<hemisphere>[NSEW+-])?
         (?P<degrees>\d{3}(\.\d*)?)
         (?P<minutes>\d{2}(\.\d*)?)?
         (?P<seconds>\d{2}(\.\d*)?)?""",
    re.IGNORECASE | re.VERBOSE,
)

TAG_034_SUBFIELD_TO_DIRECTION = {"d": "w", "e": "e", "f": "n", "g": "s"}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


class MarcRecord:
    """Minimal MARC-XML record model (marcalyx stand-in)."""

    def __init__(self, data: bytes | ET.Element) -> None:
        from .base import tolerant_fromstring

        root = data if isinstance(data, ET.Element) else tolerant_fromstring(data)
        if _local(root.tag) != "record":
            found = root.find(".//{*}record")
            if found is None:
                raise ValueError("no <record> element found")
            root = found
        self.node = root
        self.leader = ""
        self._control: dict[str, list[str]] = {}
        self._data: dict[str, list[list[tuple[str, str]]]] = {}
        for el in root:
            name = _local(el.tag)
            if name == "leader":
                self.leader = el.text or ""
            elif name == "controlfield":
                self._control.setdefault(el.get("tag", ""), []).append(el.text or "")
            elif name == "datafield":
                subs = [
                    (sf.get("code", ""), sf.text or "")
                    for sf in el
                    if _local(sf.tag) == "subfield"
                ]
                self._data.setdefault(el.get("tag", ""), []).append(subs)

    def control(self, tag: str) -> list[str]:
        return self._control.get(tag, [])

    def field(self, tag: str) -> list[list[tuple[str, str]]]:
        return self._data.get(tag, [])

    @staticmethod
    def subfield_values(tag_subs: list[tuple[str, str]], code: str) -> list[str]:
        return [v for c, v in tag_subs if c == code]


def marc_identifier(rec: MarcRecord) -> str:
    """Identifier from control field 001 (sources/alma.py:40-48)."""
    vals = rec.control("001")
    if not vals:
        raise ValueError("Could not extract identifier from ControlField 001")
    return vals[0]


def marc_event(rec: MarcRecord) -> str:
    """Event from leader[5] (sources/alma.py:50-62)."""
    return {"a": "created", "c": "created", "d": "deleted", "n": "created",
            "p": "created"}[rec.leader[5]]


def is_geospatial_marc(rec: MarcRecord) -> bool:
    """4-predicate geospatial filter (harvest/alma.py:194-231)."""
    if len(rec.leader) < 6 or rec.leader[5] not in ("a", "c", "d", "n", "p"):
        return False
    if not any(
        "Maps." in v
        for tag in rec.field("655")
        for v in rec.subfield_values(tag, "a")
    ):
        return False
    if not any(
        v in ("MAP", "CDROM", "DVDROM")
        for tag in rec.field("949")
        for v in rec.subfield_values(tag, "k")
    ):
        return False
    if not any(
        v in ("MAPRM", "GIS")
        for tag in rec.field("985")
        for v in rec.subfield_values(tag, "aa")
    ):
        return False
    return True


def pad_coordinate_string(coordinate_string: str) -> str:
    """Zero-pad (marc.py:350-356)."""
    hemisphere, coordinate = coordinate_string[0], coordinate_string[1:]
    if hemisphere in "NSEW":
        coordinate = f"{coordinate:>07}"
    return hemisphere + coordinate


def coordinate_string_to_decimal(
    coordinate_string: str, precision: int = 10
) -> Decimal | None:
    """'hdddmmss' -> Decimal at precision 10 (marc.py:358-391)."""
    with localcontext() as ctx:
        ctx.prec = precision
        matches = COORD_REGEX.search(pad_coordinate_string(coordinate_string))
        if not matches:
            return None
        parts = matches.groupdict()
        value = (
            Decimal(parts["degrees"])
            + Decimal(parts.get("minutes") or 0) / 60
            + Decimal(parts.get("seconds") or 0) / 3600
        )
        if parts.get("hemisphere") and parts["hemisphere"].lower() in "ws-":
            value = value * -1
        return value


@register("marc")
class MARC(BaseNormalizer):
    metadata_format = "marc"

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.marc = MarcRecord(self.data)
        self._date_strings: list[str] | None = None
        # Alma source-record construction derives identifier from control
        # field 001 and event from leader[5] (sources/alma.py:38-62,
        # harvest/alma.py:236-245) — override whatever the URL suggested.
        self.identifier = marc_identifier(self.marc)
        self.event = marc_event(self.marc)

    # --- marcalyx-helper parity (record.py:597-659) ---
    def get_single_tag(self, tag: str) -> list[tuple[str, str]] | None:
        tags = self.marc.field(tag)
        if len(tags) == 1:
            return tags[0]
        if len(tags) > 1:
            raise ValueError(f"Multiple tags found in MARC record for tag: {tag}")
        return None

    def get_single_control(self, tag: str) -> str:
        vals = self.marc.control(tag)
        if len(vals) != 1:
            raise ValueError(f"Record has no single instance of tag '{tag}'")
        return vals[0]

    def get_multiple_tag_subfield_values(
        self,
        tag_and_subfields: list[tuple[str, str]],
        concat: bool = False,
        separator: str = " ",
    ) -> list[str]:
        values = []
        for tag_code, subfield_codes in tag_and_subfields:
            for tag in self.marc.field(tag_code):
                subfield_values = []
                for code in subfield_codes:
                    subfield_values.extend(self.marc.subfield_values(tag, code))
                if concat:
                    values.append(separator.join(subfield_values))
                else:
                    values.extend(subfield_values)
        return values

    # --- required (marc.py:46-91) ---
    def _dct_accessRights_s(self) -> str:
        return "Public"

    def _dct_title_s(self) -> str | None:
        tags = self.marc.field("245")
        if not tags:
            raise ValueError("no title statement (245) found")
        return " ".join(v for _, v in tags[0]).strip()

    def _gbl_resourceClass_sm(self) -> list[str]:
        tag_336_map = {
            "cartographic dataset": "Datasets",
            "cartographic images": "Imagery",
            "text": "Other",
            "unspecified": "Other",
            "still image": "Imagery",
            "computer dataset": "Datasets",
            "cartographic image": "Imagery",
            "cartographic three-dimensional form": "Other",
        }
        values = self.get_multiple_tag_subfield_values([("336", "a")])
        controlled = [tag_336_map[v] for v in values]
        # 007/00 in {a, d} refines Imagery -> Maps (marc.py:80-89)
        for tag_007 in self.marc.control("007"):
            if tag_007 and tag_007[0] in ("a", "d"):
                controlled = ["Maps" if v == "Imagery" else v for v in controlled]
                break
        return controlled

    def _dct_references_s(self) -> str:
        primo_url = (
            "https://mit.primo.exlibrisgroup.com/permalink/01MIT_INST/jp08pj/alma"
            + marc_identifier(self.marc)
        )
        return json.dumps({"http://schema.org/url": primo_url})

    def _schema_provider_s(self) -> str:
        return "MIT Libraries"

    # --- bbox (marc.py:93-348) ---
    def get_largest_bounding_box(self) -> dict[str, Decimal] | None:
        valid_tags = [
            tag
            for tag in self.marc.field("034")
            if all(
                self.marc.subfield_values(tag, sf)
                for sf in TAG_034_SUBFIELD_TO_DIRECTION
            )
        ]
        bbox_data: dict[str, list[Decimal]] = {"w": [], "e": [], "n": [], "s": []}
        for tag in valid_tags:
            for sf_code, direction in TAG_034_SUBFIELD_TO_DIRECTION.items():
                vals = self.marc.subfield_values(tag, sf_code)
                if len(vals) == 1:
                    value = coordinate_string_to_decimal(vals[0])
                    if value is not None:
                        bbox_data[direction].append(value)
        for direction in TAG_034_SUBFIELD_TO_DIRECTION.values():
            if len(bbox_data[direction]) == 0:
                return None
        return {
            "w": min(bbox_data["w"]),
            "e": max(bbox_data["e"]),
            "n": max(bbox_data["n"]),
            "s": min(bbox_data["s"]),
        }

    def _dcat_bbox(self) -> str | None:
        b = self.get_largest_bounding_box()
        if b is None:
            return None
        return f"ENVELOPE({b['w']}, {b['e']}, {b['n']}, {b['s']})"

    def _locn_geometry(self) -> str | None:
        b = self.get_largest_bounding_box()
        if b is None:
            return None
        if b["w"] == b["e"] and b["n"] == b["s"]:
            return f"POINT({b['w']}, {b['n']})"
        return self._dcat_bbox()

    # --- optional (marc.py:126-296) ---
    def _dct_description_sm(self) -> list[str]:
        return self.get_multiple_tag_subfield_values([("520", "a")])

    def _dct_alternative_sm(self) -> list[str]:
        return self.get_multiple_tag_subfield_values(
            [
                ("130", "adfghklmnoprst"),
                ("240", "adfghklmnoprs"),
                ("246", "abfghnp"),
                ("730", "adfghiklmnoprst"),
                ("740", "anp"),
            ],
            concat=True,
        )

    def _dct_creator_sm(self) -> list[str] | None:
        return self.get_multiple_tag_subfield_values(
            [("100", "abc"), ("110", "ab"), ("700", "a"), ("710", "a")],
            concat=True,
        )

    def _dct_format_s(self) -> None:
        return None  # physical resources (marc.py:152-161)

    def _dct_issued_s(self) -> str:
        return self.get_single_control("008")[7:11]

    def _dct_identifier_sm(self) -> list[str]:
        identifiers = [self.identifier]
        identifiers.extend(
            self.get_multiple_tag_subfield_values(
                [
                    ("010", "a"), ("020", "a"), ("022", "a"),
                    ("024", "a"), ("024", "2"), ("035", "a"),
                ]
            )
        )
        return identifiers

    def _dct_language_sm(self) -> list[str]:
        codes: list[str] = [self.get_single_control("008")[35:38]]
        codes.extend(
            self.get_multiple_tag_subfield_values(
                [("041", sf) for sf in "abdefghjkmn"]
            )
        )
        pattern = re.compile(r".{3}")
        return [chunk for code in codes for chunk in pattern.findall(code)]

    def _dct_publisher_sm(self) -> list[str]:
        values = self.get_multiple_tag_subfield_values(
            [("260", "b"), ("264", "b")], concat=True
        )
        return [v.strip().removesuffix(",") for v in values]

    def _dct_rights_sm(self) -> list[str]:
        return self.get_multiple_tag_subfield_values(
            [("506", "a"), ("540", "a"), ("542", "a")]
        )

    def _dct_spatial_sm(self) -> list[str] | None:
        values = self.get_multiple_tag_subfield_values(
            [("650", "z"), ("651", "az")], concat=True
        )
        return [v.strip().removesuffix(".") for v in values]

    def _dct_subject_sm(self) -> list[str] | None:
        values = self.get_multiple_tag_subfield_values(
            [("650", "a"), ("651", "az"), ("655", "a")], concat=True
        )
        return [v.strip().removesuffix(".") for v in values]

    def _dct_temporal_sm(self) -> list[str] | None:
        return self.get_date_strings()

    def _gbl_dateRange_drsim(self) -> list[str]:
        pattern = re.compile(r"(\d{3,4})\s*[-TOto]+\s*(\d{3,4})")
        out = []
        for s in self.get_date_strings():
            if m := pattern.search(s):
                start, end = m.groups()
                out.append(f"[{start} TO {end}]")
        return out

    def _gbl_resourceType_sm(self) -> list[str]:
        values = self.get_multiple_tag_subfield_values([("655", "a")])
        values = [v.strip().removesuffix(".") for v in values]
        return self.get_controlled_gbl_resourceType_sm_terms(values)

    def _gbl_indexYear_im(self) -> list[int]:
        pattern = re.compile(r"(\d{3,4})")
        years: list[int] = []
        for s in self.get_date_strings():
            years.extend(int(y) for y in pattern.findall(s))
        return years

    def get_date_strings(self) -> list[str]:
        """Cached date strings (marc.py:393-418)."""
        if self._date_strings:
            return self._date_strings
        date_strings: list[str] = [self._dct_issued_s()]
        date_strings.extend(
            self.get_multiple_tag_subfield_values(
                [("650", "y"), ("651", "y"), ("655", "y")]
            )
        )
        date_strings.extend(
            self.get_multiple_tag_subfield_values(
                [("245", "f"), ("245", "g"), ("246", "c")]
            )
        )
        self._date_strings = date_strings
        return self._date_strings
