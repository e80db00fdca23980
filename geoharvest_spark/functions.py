"""Public scalar/array function surface (SURVEY.md §2.8 X1-X16).

Everything that CAN be a native Column expression is one (codegen); the
Python-semantics-exact functions (D1 case-preference dedupe, dateutil
parsing, ISO-639 mapping) are Arrow-batched pandas UDFs — the reference's
behaviors are not expressible bit-exactly in Catalyst.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .geo import (  # noqa: F401 (re-export: X9, X10)
    envelope_wkt,
    parse_envelope,
    point_wkt,
    validated_envelope_wkt,
)
from .normalize.base import date_parser, dedupe_list_of_values
from .normalize.vocab import convert_lang_code


def remove_whitespace_col(c: Column) -> Column:
    """X1: collapse whitespace runs, NULL if empty (record.py:520-526).

    Native expression — regexp_replace + trim + nullif is behaviorally
    identical to ``" ".join(s.split())`` for this use."""
    return F.nullif(F.regexp_replace(F.trim(c), r"\s+", " "), F.lit(""))


# NOTE: DataType objects (not DDL strings) so these module-level UDFs don't
# require an active SparkContext at import time.
@F.pandas_udf(T.ArrayType(T.StringType()))
def dedupe_array_udf(arrs: pd.Series) -> pd.Series:
    """D1: order-preserving case-preference dedupe (utils.py:24-72).

    TitleCase > UPPERCASE > lowercase on a lower/strip key; [[..]] unwrap.
    Kept in Python for byte parity (str.istitle/isupper subtleties)."""
    return pd.Series(
        [None if a is None else dedupe_list_of_values(list(a)) for a in arrs]
    )


@F.pandas_udf(T.StringType())
def date_parse_ymd_udf(dates: pd.Series) -> pd.Series:
    """X3: dateutil parse with epoch default -> '%Y-%m-%d', NULL on failure
    (utils.py:13-21 + per-format error skipping)."""
    out = []
    for d in dates:
        if d is None:
            out.append(None)
            continue
        try:
            out.append(date_parser(str(d)).strftime("%Y-%m-%d"))
        except Exception:
            out.append(None)
    return pd.Series(out)


@F.pandas_udf(T.StringType())
def lang_code_udf(codes: pd.Series) -> pd.Series:
    """X5: 2/3-letter -> ISO 639-2 3-letter, NULL if unknown (utils.py:75-83)."""
    return pd.Series(
        [None if c is None else convert_lang_code(str(c)) for c in codes]
    )


def short_md5_id(name: Column, path: Column, n: int = 12) -> Column:
    """X13: '<name>:<md5(path)[:12]>' (ogm.py:404-414). Native expression."""
    return F.concat(name, F.lit(":"), F.substring(F.md5(path), 1, n))


def remove_prefix(c: Column, prefix: str) -> Column:
    """X7: str.removeprefix as an anchored regexp."""
    import re as _re

    return F.regexp_replace(c, "^" + _re.escape(prefix), "")


def remove_suffix(c: Column, suffix: str) -> Column:
    """X7: str.removesuffix as an anchored regexp."""
    import re as _re

    return F.regexp_replace(c, _re.escape(suffix) + "$", "")
