"""Multimodal plumbing tests: binary columns + Arrow-batched decode stub
(the codec itself is stubbed; schema/batching/fan-out are real)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from citydata_etl_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, ["image", "audio", "video"][i % 3], bytes([i % 256]) * (100 + i),
         64 if i % 3 == 0 else None, 64 if i % 3 == 0 else None,
         5000 if i % 3 == 2 else None)
        for i in range(30)
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_decode_features_shape(spark, media):
    out = M.decode_features(media, partitions=4)
    rows = out.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["features"]) == M.FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r["features"])
        # deterministic: features derive from content hash
        blob = bytes([r["media_id"] % 256]) * (100 + r["media_id"])
        assert r["content_sha"] == hashlib.sha256(blob).hexdigest()
        assert r["n_bytes"] == len(blob)


def test_frame_sample_fanout(spark, media):
    out = M.frame_sample_plan(media, every_ms=1000)
    rows = out.collect()
    videos = media.filter(F.col("media_type") == "video").count()
    assert len(rows) == videos * 5  # 5000ms / 1000ms
    assert {r["frame_ts_ms"] for r in rows} == {0, 1000, 2000, 3000, 4000}


def test_resize_stub_raises(spark, media):
    import py4j

    with pytest.raises(Exception):
        M.resize_stub(media, 32, 32).collect()
