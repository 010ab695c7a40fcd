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


def test_decode_media_accepts_injected_decoder(docs):
    # the extension point: a toy codec plugs in without editing the
    # operator; output reflects the injected decode rule exactly
    def toy(buf, h, w):
        return np.full((h, w), (len(buf) % 7) / 10.0, dtype=np.float32)

    rows = mm.decode_media(mm.attach_media(docs), height=2, width=3, decoder=toy).collect()
    bufs = {r["doc_id"]: bytes(r["media"]) for r in mm.attach_media(docs).collect()}
    assert rows
    for r in rows:
        assert (r["height"], r["width"]) == (2, 3)
        expect = (len(bufs[r["doc_id"]]) % 7) / 10.0
        assert r["pixels"] == pytest.approx([expect] * 6)


def test_decode_media_rejects_wrong_shape(docs):
    # the worker-side ValueError surfaces client-side as PythonException
    # with the original message — pin the specific guard, not any error
    from pyspark.errors import PythonException

    bad = lambda buf, h, w: np.zeros((h + 1, w), dtype=np.float32)
    with pytest.raises(PythonException, match="decoder returned shape"):
        mm.decode_media(mm.attach_media(docs), decoder=bad).collect()


def test_resize_media_average_pools(docs):
    from flink_infotheoretic_feature_selection_spark.operators.multimodal import (
        attach_media,
        fake_decode,
        resize_media,
    )
    import numpy as np

    decoded = fake_decode(attach_media(docs), height=8, width=8)
    out = resize_media(decoded, out_h=4, out_w=4)
    rows = out.collect()
    # bounded long shape: docs × 4 × 4
    n_docs = docs.count()
    assert len(rows) == n_docs * 16

    # spot-check one doc against a NumPy pool of the same decoded grid
    one = decoded.filter("doc_id = %d" % rows[0].doc_id).collect()[0]
    grid = np.asarray(one.pixels, dtype=np.float32).reshape(8, 8)
    pooled = grid.astype(np.float64).reshape(4, 2, 4, 2).mean(axis=(1, 3))
    got = {
        (r.oy, r.ox): r.val for r in rows if r.doc_id == rows[0].doc_id
    }
    for oy in range(4):
        for ox in range(4):
            assert got[(oy, ox)] == round(float(pooled[oy, ox]), 5)


def test_resize_media_rejects_indivisible(docs):
    import pytest as _pytest

    from flink_infotheoretic_feature_selection_spark.operators.multimodal import (
        attach_media,
        fake_decode,
        resize_media,
    )

    decoded = fake_decode(attach_media(docs), height=8, width=8)
    with _pytest.raises(Exception, match="not divisible"):
        resize_media(decoded, out_h=3, out_w=4).collect()


def test_extract_features_non_divisor_dim_conserves_mass(spark):
    # dim=10 doesn't divide 256: bytes 250..255 must fold into the top
    # bucket, not silently vanish (histogram must still sum to 1).
    from flink_infotheoretic_feature_selection_spark.operators.multimodal import (
        extract_features,
    )

    media = spark.createDataFrame(
        [(1, bytearray([255, 254, 250, 0, 10]))], "doc_id long, media binary"
    )
    feats = extract_features(media, dim=10).collect()[0]["features"]
    assert len(feats) == 10
    assert abs(sum(feats) - 1.0) < 1e-6
    assert feats[9] > 0  # the >=250 bytes landed in the top bucket
