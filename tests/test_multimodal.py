"""Multimodal plumbing tests: binary schema, Arrow batch path, frame
sampling cardinality, decode stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.multimodal import (
    HAS_IMAGE_LIBS,
    attach_payload,
    decode_image,
    extract_features,
    sample_frames,
)
from weather_data_warehouse_aws_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_smoke_dir):
    docs = load_table(spark, sf_smoke_dir, "documents")
    return attach_payload(docs, "doc_id", "text").cache()


def test_payload_schema_and_sizes(media):
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "mime": "string",
        "n_bytes": "int",
    }
    bad = media.filter(F.octet_length("payload") != F.col("n_bytes"))
    assert bad.count() == 0


def test_extract_features_roundtrip(media, spark):
    feats = extract_features(media)
    n = media.count()
    rows = feats.collect()
    assert len(rows) == n
    assert all(64 <= r.fake_width < 256 and 64 <= r.fake_height < 256 for r in rows)
    assert all(len(r.header_hex) == 16 for r in rows)
    want = {r.doc_id: r.n_bytes for r in media.select("doc_id", "n_bytes").collect()}
    assert {r.doc_id: r.n_bytes for r in rows} == want


def test_sample_frames_cardinality(media):
    frames = sample_frames(media, n_frames=4)
    assert frames.count() == media.count() * 4
    per_doc = frames.groupBy("doc_id").agg(
        F.countDistinct("frame_index").alias("k"),
        F.countDistinct("frame_checksum").alias("d"),
    )
    assert per_doc.filter(F.col("k") != 4).count() == 0


def test_decode_stub_gated():
    if HAS_IMAGE_LIBS:
        pytest.skip("image libs present; stub not applicable")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
