"""Extra edge coverage: OGM external-url strategies, MULTIPOLYGON PIP,
media-features -> ANN integration."""

from __future__ import annotations

import json

import numpy as np
import pytest

from geoharvest_spark import geo
from geoharvest_spark.normalize.base import NoExternalUrlError, ogm_references_from_json
from geoharvest_spark.normalize.gbl1 import GBL1


def _gbl1(payload: dict, config: dict | None = None) -> GBL1:
    return GBL1(
        json.dumps(payload).encode(), identifier="x", origin="ogm",
        config=config,
    )


def test_ogm_url_strategy_default():
    rec = _gbl1(
        {
            "dct_references_s": json.dumps(
                {
                    "http://schema.org/url": "https://site.test/item/1",
                    "http://schema.org/downloadUrl": "https://site.test/d.zip",
                }
            )
        }
    )
    out = json.loads(ogm_references_from_json(rec))
    assert out["http://schema.org/url"] == "https://site.test/item/1"
    assert out["http://schema.org/downloadUrl"] == [
        {"label": "Data", "url": "https://site.test/d.zip"}
    ]


def test_ogm_url_strategy_download_array_skipped():
    """array downloadUrl is skipped — can't pick one (sources/ogm.py:60-66)."""
    rec = _gbl1(
        {
            "dct_references_s": json.dumps(
                {
                    "http://schema.org/url": "https://site.test/item/1",
                    "http://schema.org/downloadUrl": ["a", "b"],
                }
            )
        }
    )
    out = json.loads(ogm_references_from_json(rec))
    assert "http://schema.org/downloadUrl" not in out


def test_ogm_url_strategy_base_url_and_slug():
    rec = _gbl1(
        {"layer_slug_s": "abc-123", "dct_references_s": json.dumps({})},
        config={
            "external_url_strategy": {
                "name": "base_url_and_slug",
                "base_url": "https://geo.example.test/catalog",
                "gbl1_field": "layer_slug_s",
            }
        },
    )
    out = json.loads(ogm_references_from_json(rec))
    assert out["http://schema.org/url"] == "https://geo.example.test/catalog/abc-123"


def test_ogm_url_strategy_field_value():
    rec = _gbl1(
        {"my_url": "https://direct.test/x", "dct_references_s": json.dumps({})},
        config={
            "external_url_strategy": {
                "name": "field_value", "gbl1_field": "my_url",
            }
        },
    )
    out = json.loads(ogm_references_from_json(rec))
    assert out["http://schema.org/url"] == "https://direct.test/x"
    # non-http field value -> None -> NoExternalUrlError
    rec2 = _gbl1(
        {"my_url": "not-a-url", "dct_references_s": json.dumps({})},
        config={
            "external_url_strategy": {
                "name": "field_value", "gbl1_field": "my_url",
            }
        },
    )
    with pytest.raises(NoExternalUrlError):
        ogm_references_from_json(rec2)


def test_ogm_url_strategy_unknown_raises():
    rec = _gbl1(
        {"dct_references_s": json.dumps({})},
        config={"external_url_strategy": {"name": "bogus"}},
    )
    with pytest.raises(ValueError, match="not recognized"):
        ogm_references_from_json(rec)


def test_no_external_url_error():
    rec = _gbl1({"dct_references_s": json.dumps({})})
    with pytest.raises(NoExternalUrlError):
        ogm_references_from_json(rec)


def test_multipolygon_pip_kernel():
    wkt = (
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
        "((10 10, 12 10, 12 12, 10 12, 10 10)))"
    )
    rings = geo.parse_polygon_wkt(wkt)
    assert len(rings) == 2
    lons = np.array([2.0, 11.0, 6.0, 13.0])
    lats = np.array([2.0, 11.0, 6.0, 11.0])
    inside = geo.points_in_polygon(lons, lats, rings)
    assert inside.tolist() == [True, True, False, False]


def test_multipolygon_pip_join(spark):
    import pandas as pd

    from geoharvest_spark.joins import pip_join
    from geoharvest_spark.schema import POLYGONS_SCHEMA

    polys = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "poly_id": "mp1",
                    "wkt": (
                        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
                        "((10 10, 12 10, 12 12, 10 12, 10 10)))"
                    ),
                    "bbox": {"w": 0.0, "e": 12.0, "n": 12.0, "s": 0.0},
                }
            ]
        ),
        schema=POLYGONS_SCHEMA,
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "point_id": ["in_a", "in_b", "between", "outside"],
                "lon": [2.0, 11.0, 6.0, 50.0],
                "lat": [2.0, 11.0, 6.0, 50.0],
            }
        )
    )
    got = {
        r.point_id
        for r in pip_join(pts, polys, res=5).select("point_id").collect()
    }
    assert got == {"in_a", "in_b"}  # bbox-cover candidate 'between' refined out


def test_media_features_into_ann(spark):
    """Integration: stubbed media features flow into the ANN operator."""
    from pyspark.sql import functions as F

    from geoharvest_spark.multimodal import synth_media_df, with_media_features
    from geoharvest_spark.simsearch import cosine_topk_bruteforce

    media = with_media_features(synth_media_df(spark, 40)).select(
        F.monotonically_increasing_id().alias("vec_id"),
        F.col("features").alias("embedding"),
    ).cache()
    q = media.limit(5)
    out = cosine_topk_bruteforce(q, media, k=3).toPandas()
    assert len(out) == 15
    top1 = out[out["rank"] == 1]
    assert (top1.qid == top1.vec_id).all()  # self is nearest (cos=1)
