"""Multimodal (image/audio/video) column plumbing over opaque binary.

Design for a 100 TB training-data pipeline: media lives as an opaque
``binary`` column with typed metadata alongside; every transformation is
an Arrow-batched ``mapInPandas`` so bytes never round-trip per-row, and
the frame/patch layout keeps each batch bounded regardless of total
scale.  Partitioning is inherited from the source scan — no shuffle is
introduced by any operator here.

The container has no image/audio codecs, so the *decode* step is a
pluggable extension point (SURVEY-brief mandate): ``decode_media`` takes
a ``decoder(bytes, h, w) -> ndarray`` callback, defaulting to the
deterministic byte-fold stand-in (:func:`byte_fold_decoder`) — a real
codec wires in without editing the operator, and every downstream
schema, batch shape, and test stays real either way.

Testdata has no binary column; :func:`attach_media` synthesizes one
deterministically from ``documents.text`` so the plumbing runs against
driver-provided tables only.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "attach_media",
    "media_meta",
    "decode_media",
    "byte_fold_decoder",
    "fake_decode",
    "extract_features",
    "extract_features_long",
    "frame_sample",
    "resize_media",
    "MEDIA_META_ORACLE",
    "MEDIA_FEATURES_ORACLE",
    "FRAME_SAMPLE_ORACLE",
    "MEDIA_RESIZE_ORACLE",
]

FRAME_BYTES = 64  # fixed frame size for the synthetic video layout


def attach_media(documents: DataFrame) -> DataFrame:
    """(doc_id, media binary, media_type, n_bytes) from the documents table.

    The payload is ``encode(text, 'UTF-8')`` — deterministic, so DuckDB
    can reproduce byte lengths; media_type cycles by doc_id for coverage.
    """
    return documents.select(
        "doc_id",
        # coalesce: a NULL text doc attaches an EMPTY blob, not a NULL
        # one — every kernel has an empty-buffer path, while a NULL
        # buffer used to crash the Arrow kernels (bytes(None)); the
        # oracles coalesce identically so n_bytes is 0 on both engines
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("media"),
        # the SAME total CASE the DuckDB oracle carries — NULL doc_id and
        # negative remainders both land in ELSE on BOTH engines.  NOT
        # element_at(array, doc_id % 3 + 1): a NULL doc_id hits Spark
        # 4.1's ANSI element_at NULL-index bug (returns the LAST element
        # — see sources/keel.py write_keel note) and a negative doc_id
        # makes index 0/-1 THROW at scan time.
        F.expr(
            "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' "
            "WHEN 1 THEN 'audio' ELSE 'video' END"
        ).alias("media_type"),
        F.length(F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")).alias("n_bytes"),
    )


def media_meta(documents: DataFrame) -> DataFrame:
    """Typed metadata: byte length + full-frame count per document.

    Pure JVM expressions (no UDF) — at scale this is a narrow projection
    fused into the parquet scan.
    """
    m = attach_media(documents)
    return m.select(
        "doc_id",
        "media_type",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        (F.col("n_bytes") / FRAME_BYTES).cast("bigint").alias("n_frames"),
    )


# DuckDB oracle for media_meta — identical payload via encode().
MEDIA_META_ORACLE = f"""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
           CAST(floor(octet_length(encode(coalesce(text, ''))) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames
    FROM documents
"""


_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("pixels", ArrayType(FloatType())),
    ]
)



def _to_bytes(buf) -> bytes:
    """NULL media blob == empty blob: one corrupt/missing payload must
    not kill the executor task (bytes(None) raises) — the empty-buffer
    path every kernel already has is the right degradation."""
    return b"" if buf is None else bytes(buf)

def byte_fold_decoder(buf: bytes, height: int, width: int) -> "np.ndarray":
    """Default decoder stand-in: fold bytes into an h×w float grid,
    pixel[i] = byte[i mod n]/255.  Deterministic, codec-free — keeps the
    whole decode pipeline testable in environments without image/audio
    libraries."""
    npix = height * width
    b = np.frombuffer(_to_bytes(buf), dtype=np.uint8)
    if len(b) == 0:
        b = np.zeros(1, dtype=np.uint8)
    reps = int(np.ceil(npix / len(b)))
    return (np.tile(b, reps)[:npix].astype(np.float32) / 255.0).reshape(height, width)


def decode_media(
    media: DataFrame,
    height: int = 8,
    width: int = 8,
    decoder: "Callable[[bytes, int, int], np.ndarray] | None" = None,
) -> DataFrame:
    """Decode binary media to an h×w float grid via a pluggable decoder.

    ``decoder(buf, height, width) -> np.ndarray[height, width]`` is the
    extension point: a real codec (``PIL``/``cv2``/``soundfile`` — not
    shipped in this container) plugs in without editing the operator;
    the default is :func:`byte_fold_decoder`, a deterministic stand-in.

    The Spark-side plumbing is real either way: binary column in via
    Arrow-batched ``mapInPandas``, fixed-shape float array out — the
    decoder runs once per row inside the batch loop, so swapping it never
    changes partitioning, schema, or batch shape.
    """
    decoder = decoder or byte_fold_decoder

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pixels = []
            for buf in pdf["media"]:
                grid = np.asarray(decoder(_to_bytes(buf), height, width), dtype=np.float32)
                if grid.shape != (height, width):
                    raise ValueError(
                        f"decoder returned shape {grid.shape}, expected {(height, width)}"
                    )
                pixels.append(grid.reshape(-1).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "height": height,
                    "width": width,
                    "pixels": pixels,
                }
            )

    return media.select("doc_id", "media").mapInPandas(batches, _DECODED_SCHEMA)


def fake_decode(media: DataFrame, height: int = 8, width: int = 8) -> DataFrame:
    """Back-compat alias: :func:`decode_media` with the default
    byte-fold decoder."""
    return decode_media(media, height=height, width=width)


_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Byte-distribution feature vector per media blob (normalized
    ``dim``-bin histogram) — the feature-extraction slot of the pipeline,
    deterministic and codec-free.  Arrow-batched; O(bytes) per batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for buf in pdf["media"]:
                b = np.frombuffer(_to_bytes(buf), dtype=np.uint8)
                if len(b) == 0:
                    feats.append([0.0] * dim)
                    continue
                # clip: when dim doesn't divide 256 the remainder bytes
                # (e.g. 250..255 at dim=10) land past the last bucket —
                # truncating them loses counts and the histogram stops
                # summing to 1; fold them into the top bucket instead
                idx = np.minimum(b // (256 // dim), dim - 1)
                hist = np.bincount(idx, minlength=dim)
                feats.append((hist / len(b)).astype(np.float32).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return media.select("doc_id", "media").mapInPandas(batches, _FEATURES_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("oy", IntegerType()),
        StructField("ox", IntegerType()),
        StructField("val", DoubleType()),
    ]
)


def resize_media(decoded: DataFrame, out_h: int = 4, out_w: int = 4) -> DataFrame:
    """Average-pool resize of decoded h×w grids to out_h×out_w.

    The resize slot of the pipeline (decode → resize → featurize).
    Arrow-batched ``mapInPandas``; pooling accumulates in float64 over the
    float32 pixels so an SQL oracle doing the same mean is bit-identical.
    Output is long-form ``(doc_id, oy, ox, val)`` — canonicalizable and
    bounded at docs × out_h × out_w rows.  Requires the input dims to be
    divisible by the output dims.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "oy": [], "ox": [], "val": []}
            for doc_id, h, w, pixels in zip(
                pdf["doc_id"], pdf["height"], pdf["width"], pdf["pixels"]
            ):
                h, w = int(h), int(w)
                if h % out_h or w % out_w:
                    raise ValueError(
                        f"grid {h}x{w} not divisible by output {out_h}x{out_w}"
                    )
                grid = np.asarray(pixels, dtype=np.float32).reshape(h, w)
                by, bx = h // out_h, w // out_w
                pooled = (
                    grid.astype(np.float64)
                    .reshape(out_h, by, out_w, bx)
                    .mean(axis=(1, 3))
                )
                for oy in range(out_h):
                    for ox in range(out_w):
                        out["doc_id"].append(doc_id)
                        out["oy"].append(oy)
                        out["ox"].append(ox)
                        out["val"].append(round(float(pooled[oy, ox]), 5))
            yield pd.DataFrame(out)

    return decoded.select("doc_id", "height", "width", "pixels").mapInPandas(
        batches, _RESIZE_SCHEMA
    )


# DuckDB oracle for fake_decode(8x8) → resize_media(4x4) over the
# synthetic ASCII payload: pixel i of the 64-cell grid is
# float32(byte[(i mod n)] / 255), where byte values are unicode code
# points (pure-ASCII corpus); the 2×2 average pool runs in float64 like
# the engine.  Validates the full decode→resize plumbing end-to-end.
MEDIA_RESIZE_ORACLE = """
    WITH pix AS (
      -- empty/NULL text mirrors byte_fold_decoder's zeros(1) stand-in:
      -- every pixel is 0 (the kernel substitutes one zero byte)
      SELECT doc_id,
             CAST(p.range AS INT) AS i,
             CAST(CAST(CASE WHEN length(coalesce(text, '')) = 0 THEN 0
                  ELSE unicode(substr(
                      text, (CAST(p.range AS INT) % length(text)) + 1, 1))
                  END AS FLOAT)
               / CAST(255.0 AS FLOAT) AS FLOAT) AS v
      FROM documents, range(64) p),
    cells AS (
      SELECT doc_id,
             (i // 8) // 2 AS oy,
             (i % 8) // 2 AS ox,
             CAST(v AS DOUBLE) AS v
      FROM pix)
    SELECT doc_id, CAST(oy AS INT) AS oy, CAST(ox AS INT) AS ox,
           round(avg(v), 5) AS val
    FROM cells GROUP BY doc_id, oy, ox
"""


_FEATURES_LONG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bin", IntegerType()),
        StructField("cnt", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def extract_features_long(media: DataFrame, dim: int = 16) -> DataFrame:
    """Byte-histogram features in long form: one (doc_id, bin, cnt,
    n_bytes, val) row per histogram bin (all ``dim`` bins emitted, zeros
    included, so row count is exactly docs×dim).

    Same Arrow-batched kernel as :func:`extract_features`, but the
    normalized value is computed as a JVM-side float64 division
    (``cnt / n_bytes``) AFTER the UDF, so an SQL oracle doing the same
    division is bit-identical — no float32 rounding at the boundary.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "bin": [], "cnt": [], "n_bytes": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                b = np.frombuffer(_to_bytes(buf), dtype=np.uint8)
                # clip like extract_features: remainder bytes fold into
                # the top bucket when dim doesn't divide 256 (no-op for
                # the gate's dim=16); truncation would lose their counts
                hist = np.bincount(
                    np.minimum(b // (256 // dim), dim - 1) if len(b) else b,
                    minlength=dim,
                )[:dim]
                out["doc_id"].extend([doc_id] * dim)
                out["bin"].extend(range(dim))
                out["cnt"].extend(int(c) for c in hist)
                out["n_bytes"].extend([len(b)] * dim)
            yield pd.DataFrame(out)

    long = media.select("doc_id", "media").mapInPandas(batches, _FEATURES_LONG_SCHEMA)
    return long.select(
        "doc_id",
        "bin",
        "cnt",
        F.when(F.col("n_bytes") == 0, F.lit(0.0))
        .otherwise(F.col("cnt") / F.col("n_bytes"))
        .alias("val"),
    )


# DuckDB oracle for extract_features_long (dim=16).  The synthetic media
# payload is encode(text) and the corpus is pure ASCII (verified per-SF),
# so byte values equal unicode code points — the oracle walks characters
# with range()+substr and buckets code//16.  Zero bins come from a
# doc×bin grid left-join.
MEDIA_FEATURES_ORACLE = """
    WITH pos AS (
      SELECT doc_id, text, unnest(range(1, length(coalesce(text, '')) + 1)) AS i
      FROM documents),
    chars AS MATERIALIZED (
      SELECT doc_id,
             unicode(substr(text, CAST(i AS INT), 1)) // 16 AS bin
      FROM pos),
    cnts AS (SELECT doc_id, bin, count(*) AS c FROM chars GROUP BY 1, 2),
    docs AS (SELECT doc_id, octet_length(encode(coalesce(text, ''))) AS n_bytes FROM documents),
    grid AS (SELECT doc_id, n_bytes, r.range AS bin FROM docs, range(16) r)
    SELECT g.doc_id,
           CAST(g.bin AS INT) AS bin,
           CAST(coalesce(c.c, 0) AS BIGINT) AS cnt,
           CASE WHEN g.n_bytes = 0 THEN 0.0
                ELSE CAST(coalesce(c.c, 0) AS DOUBLE) / g.n_bytes END AS val
    FROM grid g LEFT JOIN cnts c ON c.doc_id = g.doc_id AND c.bin = g.bin
"""


def frame_sample(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Sample every k-th fixed-size frame from a (synthetic) video blob.

    Returns (doc_id, frame_idx, frame_len, frame_sum) — the frame slice
    itself stays binary-safe inside the batch; only bounded per-frame
    stats leave, so the output is small no matter the media size.
    """
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_len", IntegerType()),
            StructField("frame_sum", LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in schema.fields}
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                b = np.frombuffer(_to_bytes(buf), dtype=np.uint8)
                n_frames = len(b) // FRAME_BYTES
                for idx in range(0, n_frames, every_k):
                    frame = b[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_len"].append(len(frame))
                    out["frame_sum"].append(int(frame.sum()))
            yield pd.DataFrame(out)

    return media.select("doc_id", "media").mapInPandas(batches, schema)


# DuckDB oracle for frame_sample (every_k=4, FRAME_BYTES=64).  Same
# ASCII-bytes-as-code-points trick as MEDIA_FEATURES_ORACLE: walk
# character positions, bucket into complete 64-byte frames, keep every
# 4th frame, sum byte values.
FRAME_SAMPLE_ORACLE = f"""
    WITH pos AS (
      SELECT doc_id, text, unnest(range(1, length(coalesce(text, '')) + 1)) AS i
      FROM documents),
    chars AS MATERIALIZED (
      SELECT doc_id,
             (CAST(i AS INT) - 1) // {FRAME_BYTES} AS frame_idx,
             unicode(substr(text, CAST(i AS INT), 1)) AS byte,
             length(text) // {FRAME_BYTES} AS n_frames
      FROM pos)
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           {FRAME_BYTES} AS frame_len,
           CAST(sum(byte) AS BIGINT) AS frame_sum
    FROM chars
    WHERE frame_idx % 4 = 0 AND frame_idx < n_frames
    GROUP BY doc_id, frame_idx
"""
