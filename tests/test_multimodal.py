"""Multimodal binary-column plumbing tests (driver-brief mandate)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_infotheoretic_feature_selection_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).cache()


def test_media_meta_matches_utf8_length(docs):
    rows = mm.media_meta(docs).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(rows) == 50
    for r in rows:
        nb = len(texts[r["doc_id"]].encode("utf-8"))
        assert r["n_bytes"] == nb
        assert r["n_frames"] == nb // mm.FRAME_BYTES
        assert r["media_type"] == ["image", "audio", "video"][r["doc_id"] % 3]


def test_fake_decode_shape_and_determinism(docs):
    media = mm.attach_media(docs)
    out = mm.fake_decode(media, height=4, width=8).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(out) == 50
    for r in out:
        assert (r["height"], r["width"]) == (4, 8)
        assert len(r["pixels"]) == 32
        b = texts[r["doc_id"]].encode("utf-8")
        expect = np.tile(np.frombuffer(b, np.uint8), 32)[:32] / 255.0
        np.testing.assert_allclose(r["pixels"], expect.astype(np.float32), rtol=1e-6)


def test_extract_features_is_normalized_histogram(docs):
    media = mm.attach_media(docs)
    out = mm.extract_features(media, dim=16).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        assert len(r["features"]) == 16
        assert sum(r["features"]) == pytest.approx(1.0, abs=1e-5)
        b = np.frombuffer(texts[r["doc_id"]].encode("utf-8"), np.uint8)
        expect = np.bincount(b // 16, minlength=16)[:16] / len(b)
        np.testing.assert_allclose(r["features"], expect.astype(np.float32), atol=1e-6)


def test_frame_sample_exact(docs):
    media = mm.attach_media(docs)
    out = mm.frame_sample(media, every_k=3).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        b = np.frombuffer(texts[doc_id].encode("utf-8"), np.uint8)
        n_frames = len(b) // mm.FRAME_BYTES
        expect_idx = list(range(0, n_frames, 3))
        assert sorted(r["frame_idx"] for r in rows) == expect_idx
        for r in rows:
            frame = b[r["frame_idx"] * mm.FRAME_BYTES : (r["frame_idx"] + 1) * mm.FRAME_BYTES]
            assert r["frame_len"] == mm.FRAME_BYTES
            assert r["frame_sum"] == int(frame.sum())


def test_decode_media_is_stubbed(docs):
    with pytest.raises(NotImplementedError):
        mm.decode_media(mm.attach_media(docs))
