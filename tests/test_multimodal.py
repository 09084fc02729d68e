"""Multimodal binary-column plumbing gates: schema, determinism,
Arrow batch shapes, explode fan-out, byte-based repartitioning, and
the unregistered-codec NotImplementedError contract."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark import multimodal as mm  # noqa: E402


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, 30).cache()


def test_decode_schema_and_determinism(spark, media):
    d1 = mm.decode_media(media).orderBy("doc_id").collect()
    d2 = mm.decode_media(media).orderBy("doc_id").collect()
    assert [r.asDict(True) for r in d1] == [r.asDict(True) for r in d2]
    assert len(d1) == 30
    for r in d1:
        assert len(r["pixels"]) == r["width"] * r["height"] * r["n_frames"]


def test_resize_shapes(spark, media):
    dec = mm.decode_media(media)
    out = mm.resize_images(dec, 4, 3).collect()
    assert len(out) == 30
    for r in out:
        assert (r["width"], r["height"]) == (4, 3)
        assert len(r["pixels"]) == 12


def test_frame_sample_fanout(spark, media):
    dec = mm.decode_media(media)
    frames = mm.frame_sample(dec, every=2).collect()
    vids = {r["doc_id"]: r["n_frames"]
            for r in dec.filter("media_type = 'video'").collect()}
    want = sum(len(range(0, n, 2)) for n in vids.values())
    assert len(frames) == want
    for r in frames:
        assert r["doc_id"] in vids and r["frame_idx"] % 2 == 0


def test_extract_features_fixed_width(spark, media):
    feats = mm.extract_features(media, dim=8).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == 8
        assert all(0.0 <= v < 1.0 for v in r["feature"])
    # deterministic across runs
    again = mm.extract_features(media, dim=8).collect()
    a = {r["doc_id"]: np.float32(r["feature"]).tobytes() for r in feats}
    b = {r["doc_id"]: np.float32(r["feature"]).tobytes() for r in again}
    assert a == b


def test_repartition_by_bytes(spark, media):
    out = mm.repartition_by_bytes(media, target_bytes=512)
    assert out.rdd.getNumPartitions() > media.rdd.getNumPartitions() or \
        out.rdd.getNumPartitions() >= 1
    assert out.count() == 30


def test_unregistered_codec_raises(spark):
    df = spark.createDataFrame(
        [(0, "image", bytearray(b"JPEGJUNK"), 1, 1, None, None, "jpeg")],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as ei:
        mm.decode_media(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_registered_decoder_plugs_in(spark):
    df = spark.createDataFrame(
        [(0, "image", bytearray(b"RAW!" + bytes(range(6))), 3, 2,
          None, None, "raw6")],
        mm.MEDIA_SCHEMA,
    )

    def raw6(payload):
        import numpy as _np
        return 3, 2, 1, _np.frombuffer(bytes(payload)[4:], dtype=_np.uint8)

    mm.register_decoder("raw6", raw6)
    try:
        out = mm.decode_media(df).collect()
        assert out[0]["width"] == 3 and len(out[0]["pixels"]) == 6
    finally:
        mm._DECODERS.pop("raw6", None)
