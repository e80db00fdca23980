"""Canonical schemas for the engine.

The reference's data model (SURVEY.md §1) is an ``Iterator[Record]`` of attrs
objects; here it is a table. Field inventory mirrors
``/root/reference/harvester/records/record.py:54-135`` (MITAardvark: 7
required + 35 optional fields) re-typed per SURVEY.md §1.2.

Error-channel design (reference F7, ``harvester/harvest/__init__.py:169-188``):
Spark has no per-row exception side-channel, so errors are data — every
normalization stage emits a nullable ``error struct<stage, exception>`` column
and downstream splits on ``error IS NULL``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: Common-Crawl-style web pages (BASELINE.json input_hint, exact shape)
# ---------------------------------------------------------------------------
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Error side-channel struct (F7 semantics)
ERROR_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), True),
        T.StructField("exception", T.StringType(), True),
    ]
)

# Bounding box used for all geometry compute. WKT strings
# (ENVELOPE/POINT/POLYGON) are the serialized forms, this is the working form.
BBOX_SCHEMA = T.StructType(
    [
        T.StructField("w", T.DoubleType(), True),
        T.StructField("e", T.DoubleType(), True),
        T.StructField("n", T.DoubleType(), True),
        T.StructField("s", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# MITAardvark normalized record: field-for-field with
# harvester/records/record.py:66-113 (str -> String, list -> Array<String>,
# gbl_indexYear_im -> Array<Int>, gbl_suppressed_b -> Boolean).
# NOTE gbl_georeferenced_b is declared `str` in the reference attrs class
# (record.py:104) though the JSON schema types it boolean; we keep Boolean and
# serialize to JSON bool (the reference only ever sets None for it).
# ---------------------------------------------------------------------------
_REQ = [  # aardvark + MIT required (mit-schema-aardvark.json "required")
    ("dct_accessRights_s", T.StringType()),
    ("dct_title_s", T.StringType()),
    ("gbl_mdModified_dt", T.StringType()),
    ("gbl_mdVersion_s", T.StringType()),
    ("gbl_resourceClass_sm", T.ArrayType(T.StringType())),
    ("id", T.StringType()),
    ("dct_references_s", T.StringType()),
]
_OPT = [
    ("dcat_bbox", T.StringType()),
    ("dcat_centroid", T.StringType()),
    ("dcat_keyword_sm", T.ArrayType(T.StringType())),
    ("dcat_theme_sm", T.ArrayType(T.StringType())),
    ("dct_alternative_sm", T.ArrayType(T.StringType())),
    ("dct_creator_sm", T.ArrayType(T.StringType())),
    ("dct_description_sm", T.ArrayType(T.StringType())),
    ("dct_format_s", T.StringType()),
    ("dct_identifier_sm", T.ArrayType(T.StringType())),
    ("dct_isPartOf_sm", T.ArrayType(T.StringType())),
    ("dct_isReplacedBy_sm", T.ArrayType(T.StringType())),
    ("dct_issued_s", T.StringType()),
    ("dct_isVersionOf_sm", T.ArrayType(T.StringType())),
    ("dct_language_sm", T.ArrayType(T.StringType())),
    ("dct_license_sm", T.ArrayType(T.StringType())),
    ("dct_publisher_sm", T.ArrayType(T.StringType())),
    ("dct_relation_sm", T.ArrayType(T.StringType())),
    ("dct_replaces_sm", T.ArrayType(T.StringType())),
    ("dct_rights_sm", T.ArrayType(T.StringType())),
    ("dct_rightsHolder_sm", T.ArrayType(T.StringType())),
    ("dct_source_sm", T.ArrayType(T.StringType())),
    ("dct_spatial_sm", T.ArrayType(T.StringType())),
    ("dct_subject_sm", T.ArrayType(T.StringType())),
    ("dct_temporal_sm", T.ArrayType(T.StringType())),
    ("gbl_dateRange_drsim", T.ArrayType(T.StringType())),
    ("gbl_displayNote_sm", T.ArrayType(T.StringType())),
    ("gbl_fileSize_s", T.StringType()),
    ("gbl_georeferenced_b", T.BooleanType()),
    ("gbl_indexYear_im", T.ArrayType(T.IntegerType())),
    ("gbl_resourceType_sm", T.ArrayType(T.StringType())),
    ("gbl_suppressed_b", T.BooleanType()),
    ("gbl_wxsIdentifier_s", T.StringType()),
    ("locn_geometry", T.StringType()),
    ("pcdm_memberOf_sm", T.ArrayType(T.StringType())),
    ("schema_provider_s", T.StringType()),
]

AARDVARK_REQUIRED_FIELDS = [name for name, _ in _REQ]
AARDVARK_FIELDS = [name for name, _ in _REQ + _OPT]

AARDVARK_SCHEMA = T.StructType(
    [T.StructField(name, dtype, True) for name, dtype in _REQ + _OPT]
)

# Full normalize() output: identity + aardvark struct + error channel
NORMALIZED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("identifier", T.StringType(), True),
        T.StructField("origin", T.StringType(), True),
        T.StructField("metadata_format", T.StringType(), True),
        T.StructField("event", T.StringType(), True),
        T.StructField("aardvark", AARDVARK_SCHEMA, True),
        T.StructField("error", ERROR_SCHEMA, True),
    ]
)

# Spatial sides
POLYGONS_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.StringType(), False),
        T.StructField("wkt", T.StringType(), True),
        T.StructField("bbox", BBOX_SCHEMA, True),
    ]
)

QUERY_POINTS_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.StringType(), False),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("k", T.IntegerType(), True),
    ]
)

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("snapshot_id", T.StringType(), True),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("rows", T.LongType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("updated_ts", T.TimestampType(), True),
    ]
)
