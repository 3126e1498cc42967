"""Multimodal plumbing unit tests: stubbed codecs, real Spark-side
schema/batching semantics (SURVEY §2.11 L5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from diachronic_spark.catalog import load
from diachronic_spark.operators.multimodal import (
    binarize,
    extract_features,
    resize,
    sample_frames,
)


def test_resize_bounds_payload_and_updates_meta(spark, sf_dir):
    b = binarize(load(spark, sf_dir, "documents").limit(20))
    out = resize(b, 8, 4).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.payload) <= 32
        assert (r.meta.width, r.meta.height) == (8, 4)
        assert r.meta.n_bytes == len(r.payload)


def test_resize_is_identity_below_target(spark):
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    r = resize(binarize(df), 100, 100).collect()[0]
    assert bytes(r.payload) == b"ab"


def test_sample_frames_fan_out_and_stride(spark):
    # 300 bytes -> 5 frames of 64 (last partial); every 2nd -> idx 0,2,4
    df = spark.createDataFrame(
        [(7, "x" * 300)], "doc_id long, text string"
    )
    rows = sorted(
        sample_frames(binarize(df), frame_bytes=64, every_n=2).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.n_frame_bytes) for r in rows] == [
        (0, 64), (2, 64), (4, 44)
    ]
    assert all(r.doc_id == 7 for r in rows)


def test_feature_extraction_matches_expression_side(spark, sf_dir):
    """mapInPandas features agree with pure-expression byte math."""
    b = binarize(load(spark, sf_dir, "documents").limit(50))
    feats = extract_features(b).select("doc_id", "byte_len", "sha_hex")
    expr = b.select(
        "doc_id",
        F.octet_length("payload").alias("byte_len"),
        F.sha2("payload", 256).alias("sha_hex"),
    )
    assert sorted(map(tuple, feats.collect())) == sorted(
        map(tuple, expr.collect())
    )
