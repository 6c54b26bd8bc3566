"""Multimodal plumbing (schemas, batch shapes, codec stub boundary) and
streaming sketch maintenance (stream == batch equivalence)."""

import numpy as np
import pytest

from tetrex_spark.operators.multimodal import (
    _decode_image,
    audio_features,
    image_features,
    image_resize,
    synth_media,
    video_frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=24).cache()


def test_media_schema_and_counts(media):
    assert media.count() == 24
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_deterministic_and_exact(media):
    out = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(out) == 8  # every 3rd row is an image
    pdf = media.filter("kind = 'image'").toPandas()
    for _, r in pdf.iterrows():
        img = _decode_image(bytes(r["payload"]), r["meta"], "fake")
        got = out[r["media_id"]]
        assert got["width"] == img.shape[1] and got["height"] == img.shape[0]
        assert np.allclose(got["mean_rgb"], img.mean(axis=(0, 1)))
    # determinism across runs
    again = {r["media_id"]: r["mean_rgb"] for r in image_features(media).collect()}
    assert all(np.allclose(again[k], out[k]["mean_rgb"]) for k in again)


def test_image_resize_roundtrip(media):
    resized = image_resize(media, 8, 8)
    rows = resized.collect()
    assert len(rows) == 8
    for r in rows:
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 8
        assert len(bytes(r["payload"])) == 8 * 8 * 3
    # resize of resize is identity in shape
    again = image_resize(resized, 8, 8).collect()
    assert {bytes(r["payload"]) for r in again} == {bytes(r["payload"]) for r in rows}


def test_audio_features(media):
    out = audio_features(media).collect()
    assert len(out) == 8
    for r in out:
        assert 0 < r["rms"] < 1
        assert r["duration_sec"] > 0


def test_video_frame_sample_cardinality(media):
    frames = video_frame_sample(media, every_n=2).collect()
    pdf = media.filter("kind = 'video'").toPandas()
    want = sum((m["n_frames"] + 1) // 2 for m in pdf["meta"])
    assert len(frames) == want
    f0 = [f for f in frames if f["media_id"] == 2 and f["frame_idx"] == 0][0]
    assert len(bytes(f0["frame"])) == 8 * 8 * 3


def test_real_codec_raises_not_implemented(media):
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        image_features(media, codec="real").collect()


# -- streaming ----------------------------------------------------------------


def test_stream_equals_batch(spark, tmp_path):
    """Feeding the corpus in two file drops through the streaming path
    must produce byte-identical lattice sketches to one batch build."""
    from tetrex_spark.operators.sketch_build import SketchSpec, build_sketches
    from tetrex_spark.sources.corpus import webtext_small, with_bin_id
    from tetrex_spark.streaming.sketch_stream import SketchStream

    corpus = with_bin_id(webtext_small(spark), 8)
    specs = [
        SketchSpec("bloom", "bloom", "token_shingle", k=2,
                   params={"m_bits": 1 << 14, "n_hashes": 3}),
        SketchSpec("hll", "hll", "token_shingle", k=2, params={"p": 11}),
    ]
    batch = {
        (r["bin_id"], r["name"]): bytes(r["payload"])
        for r in build_sketches(corpus, specs).collect()
    }

    input_dir = str(tmp_path / "in")
    half1 = corpus.filter("pmod(xxhash64(url), 2) = 0").drop("bin_id")
    half2 = corpus.filter("pmod(xxhash64(url), 2) = 1").drop("bin_id")
    half1.write.mode("append").parquet(input_dir)

    ss = SketchStream(str(tmp_path / "state"), specs, n_bins=8)
    q = ss.start(spark, input_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    v1 = ss.current_version()
    assert v1 >= 0

    half2.write.mode("append").parquet(input_dir)
    q = ss.start(spark, input_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert ss.current_version() > v1

    streamed = {
        (r["bin_id"], r["name"]): bytes(r["payload"])
        for r in ss.current_state(spark).collect()
    }
    assert streamed == batch
