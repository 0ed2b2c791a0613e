"""Multimodal plumbing: Arrow batch shape, schema, determinism of the
stubbed decoder, and the NotImplementedError gate on the real one."""

from __future__ import annotations

import pytest

from featurestore_for_joycastle_java_spark.operators.multimodal import (
    DECODED_SCHEMA,
    attach_blob,
    decode_image,
    fake_decode_features,
    frame_sample_plan,
)
from featurestore_for_joycastle_java_spark.sources import load_table


def test_decode_schema_and_coverage(spark, sf_dir):
    d = attach_blob(load_table(spark, sf_dir, "documents"))
    out = fake_decode_features(d)
    assert out.schema == DECODED_SCHEMA
    assert out.count() == d.count()


def test_decode_deterministic(spark, sf_dir):
    d = attach_blob(load_table(spark, sf_dir, "documents")).limit(50)
    r1 = sorted(map(tuple, fake_decode_features(d).collect()))
    r2 = sorted(map(tuple, fake_decode_features(d).collect()))
    assert r1 == r2


def test_decode_meta_ranges(spark, sf_dir):
    d = attach_blob(load_table(spark, sf_dir, "documents")).limit(100)
    for r in fake_decode_features(d).collect():
        assert 64 <= r.width < 256 and 64 <= r.height < 256
        assert 1 <= r.n_channels <= 4
        assert 0.0 <= r.feat_mean <= 1.0
        assert r.blob_len > 0


def test_real_decoder_is_gated(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake bytes")


def test_frame_sample_fanout(spark, sf_dir):
    d = attach_blob(load_table(spark, sf_dir, "documents")).limit(20)
    frames = frame_sample_plan(d, n_frames=4)
    assert frames.count() == 80
    assert frames.columns == ["doc_id", "frame_no", "frame_bytes_preview"]


def test_fake_resize_aspect_and_bounds(spark):
    # integer-exact resize: downscale preserves aspect via floor division,
    # max(w,h) maps exactly to max_dim when dividing evenly, never < 1
    from featurestore_for_joycastle_java_spark.operators.multimodal import (
        fake_resize,
    )

    df = spark.createDataFrame(
        [(1, 448, 224), (2, 100, 50), (3, 64, 255)],
        "doc_id long, width int, height int",
    )
    got = {r["doc_id"]: r for r in fake_resize(df, max_dim=224).collect()}
    assert (got[1]["out_w"], got[1]["out_h"]) == (224, 112)
    # upscale allowed: 100x50 -> 224x112
    assert (got[2]["out_w"], got[2]["out_h"]) == (224, 112)
    # floor division: 64*224//255 = 56
    assert (got[3]["out_w"], got[3]["out_h"]) == (56, 224)
    assert got[3]["scale_mille"] == 224000 // 255
