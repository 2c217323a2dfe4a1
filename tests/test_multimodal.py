"""Multimodal plumbing: Arrow-batched binary-payload pipelines with the
codec kernels stubbed (no image/audio libs in this container) — schema,
batch shapes and size contracts are the production surface under test."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ophidia_io_server_spark.pipeline.multimodal import (
    attach_binary_payload,
    extract_features,
    frame_sample_plan,
    resize_media,
)
from ophidia_io_server_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return attach_binary_payload(load_table(spark, SF, "documents")).cache()


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_features(media)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "media_type", "payload_bytes", "features"]
    rows = {r.doc_id: r for r in out.collect()}
    again = {r.doc_id: r for r in extract_features(media).collect()}
    assert len(rows) == media.count()
    for k, r in rows.items():
        assert len(r.features) == 4
        assert r.features == again[k].features  # deterministic stub
        assert r.features[0] == float(r.payload_bytes)


def test_resize_media_size_contract(spark, media):
    h, w, c = 8, 16, 3
    out = resize_media(media, height=h, width=w, channels=c)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert (r.out_h, r.out_w, r.channels) == (h, w, c)
        assert len(bytes(r.resized)) == h * w * c  # fixed-size output buffer


def test_resize_media_deterministic_and_content_derived(spark, media):
    a = {r.doc_id: bytes(r.resized) for r in resize_media(media, 4, 4).collect()}
    b = {r.doc_id: bytes(r.resized) for r in resize_media(media, 4, 4).collect()}
    assert a == b
    # different payloads must produce different resized buffers (content flows
    # through the kernel, it is not a constant fill)
    assert len(set(a.values())) > 1


def test_resize_media_rejects_bad_dims(spark, media):
    with pytest.raises(ValueError):
        resize_media(media, height=0, width=4)


def test_frame_sample_plan_counts(spark, media):
    out = frame_sample_plan(media, every_nth=2)
    rows = out.groupBy("doc_id").count().collect()
    sizes = {r.doc_id: r.payload_bytes for r in media.collect()}
    for r in rows:
        n_frames = max(sizes[r.doc_id] // 1024, 1)
        import math
        assert r["count"] == math.ceil(n_frames / 2)
