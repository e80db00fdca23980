"""Per-format Aardvark normalizers (Arrow-batched, parse-once-per-blob).

Dispatch mirrors the reference's format-class registry
(/root/reference/harvester/records/formats/__init__.py:5-9, ogm.py:146-166).
"""

from .base import (  # noqa: F401
    DEFAULT_MD_MODIFIED,
    BaseNormalizer,
    FieldMethodError,
    date_parser,
    dedupe_list_of_values,
    get_normalizer_class,
    normalize_pages,
    normalize_record,
    remove_whitespace,
    split_failed,
    validate_aardvark,
)
from . import aardvark, fgdc, gbl1, iso19139, marc  # noqa: F401,E402 (register)
