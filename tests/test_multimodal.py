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


# ---- real-codec injection proof (r8) --------------------------------------
# The pluggable decoder was only ever exercised by deterministic
# stand-ins; these prove the contract against a REAL container format.
# PNG bytes are built in-test (signature + IHDR + zlib IDAT + IEND), so
# the stdlib-zlib test runs everywhere; the PIL test additionally proves
# a third-party codec slots in unchanged where PIL is installed.


def _png_bytes(gray: "np.ndarray") -> bytes:
    """Minimal valid 8-bit grayscale PNG for an h×w uint8 array."""
    import struct
    import zlib

    h, w = gray.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bitdepth 8, gray
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))  # filter 0
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_png_decoder():
    """Factory so the decoder pickles BY VALUE (a nested closure) —
    module-level test functions pickle by reference, and executors
    can't import the tests package."""

    def _png_decode_stdlib(buf: bytes, height: int, width: int):
        # Real-format decoder using only stdlib zlib: parses PNG chunks,
        # inflates IDAT, strips per-row filter bytes (filter 0 only).
        import struct
        import zlib

        import numpy as _np

        assert buf[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
        pos, idat = 8, b""
        w = h = None
        while pos < len(buf):
            (ln,) = struct.unpack(">I", buf[pos : pos + 4])
            tag = buf[pos + 4 : pos + 8]
            payload = buf[pos + 8 : pos + 8 + ln]
            if tag == b"IHDR":
                w, h = struct.unpack(">II", payload[:8])
            elif tag == b"IDAT":
                idat += payload
            pos += 12 + ln
        assert (w, h) == (width, height)
        raw = zlib.decompress(idat)
        rows = []
        for y in range(height):
            line = raw[y * (width + 1) : (y + 1) * (width + 1)]
            assert line[0] == 0, "only filter 0 expected"
            rows.append(_np.frombuffer(line[1:], dtype=_np.uint8))
        return _np.stack(rows).astype(_np.float32) / 255.0

    return _png_decode_stdlib


def _png_media_df(spark, grids):
    rows = [(int(i), _png_bytes(g)) for i, g in enumerate(grids)]
    return spark.createDataFrame(rows, "doc_id long, media binary")


def test_decode_media_with_real_png_codec_stdlib(spark):
    rng = np.random.default_rng(42)
    grids = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8) for _ in range(5)]
    media = _png_media_df(spark, grids)
    out = mm.decode_media(media, height=8, width=8, decoder=_make_png_decoder())
    got = {r["doc_id"]: np.array(r["pixels"], dtype=np.float32) for r in out.collect()}
    for i, g in enumerate(grids):
        want = (g.astype(np.float32) / 255.0).reshape(-1)
        assert np.array_equal(got[i], want), f"doc {i} pixel mismatch"


def test_resize_media_over_real_png_decode(spark):
    # the full pipeline slot: real-format decode -> average-pool resize,
    # verified against the numpy pooling of the known source image
    rng = np.random.default_rng(7)
    grids = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8) for _ in range(3)]
    media = _png_media_df(spark, grids)
    decoded = mm.decode_media(media, height=8, width=8, decoder=_make_png_decoder())
    out = mm.resize_media(decoded, out_h=4, out_w=4)
    got = {(r["doc_id"], r["oy"], r["ox"]): r["val"] for r in out.collect()}
    for i, g in enumerate(grids):
        f = (g.astype(np.float32) / 255.0).astype(np.float64)
        pooled = f.reshape(4, 2, 4, 2).mean(axis=(1, 3))
        for oy in range(4):
            for ox in range(4):
                assert got[(i, oy, ox)] == round(float(pooled[oy, ox]), 5)


def test_decode_media_with_pil_codec(spark):
    # optional-dependency twin: a third-party codec must slot into the
    # same injection point unchanged.  Skips where PIL isn't installed
    # (this container); green in any CI that has it.
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    def pil_decoder(buf: bytes, height: int, width: int) -> np.ndarray:
        img = PIL_Image.open(io.BytesIO(buf)).convert("L")
        assert img.size == (width, height)
        return np.asarray(img, dtype=np.float32) / 255.0

    rng = np.random.default_rng(11)
    grids = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8) for _ in range(3)]
    media = _png_media_df(spark, grids)
    out = mm.decode_media(media, height=8, width=8, decoder=pil_decoder)
    got = {r["doc_id"]: np.array(r["pixels"], dtype=np.float32) for r in out.collect()}
    for i, g in enumerate(grids):
        want = (g.astype(np.float32) / 255.0).reshape(-1)
        assert np.array_equal(got[i], want)


def test_attach_media_total_on_null_and_negative_doc_ids(spark):
    # r12: media_type is a total CASE matching the oracle — NULL doc_id
    # and negative remainders land in ELSE ('video') on BOTH engines.
    # The previous element_at(array, doc_id % 3 + 1) hit Spark 4.1's
    # ANSI NULL-index bug (returned 'video' by ACCIDENT) and THREW an
    # INVALID_ARRAY_INDEX on negative ids (index 0/-1).
    df = spark.createDataFrame(
        [(None, "a"), (-1, "b"), (-2, "c"), (-3, "d"), (0, "e")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["media_type"] for r in mm.attach_media(df).collect()}
    assert rows[None] == "video"
    assert rows[-1] == "video" and rows[-2] == "video"  # CASE -1/-2 -> ELSE
    assert rows[-3] == "image"  # -3 % 3 == 0 on both engines
    assert rows[0] == "image"
