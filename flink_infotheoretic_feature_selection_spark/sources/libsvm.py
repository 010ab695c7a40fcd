"""LibSVM input surface + vector⇄columnar bridges.

The reference consumes LibSVM files via ``MLUtils.readLibSVM``
(``InfoSelectorTest.scala:113``, ``ErrorTest.scala:49``) into
``DataSet[LabeledVector]``.  Spark has a native datasource for the same
format — a distributed scan, no driver parsing.

Bridges:

- :func:`vectors_to_wide` — (label, features:Vector) → wide tinyint
  columns ``f0..fN, label``; the JVM-side ``vector_to_array`` keeps the
  conversion out of Python (one narrow projection, fuses into the scan).
- :func:`vectors_to_long` — → sparse long format ``(row_id, feat, x)`` +
  ``(row_id, y)`` for :class:`SparseInfoThSelector`; built on
  ``posexplode``, shuffle-free until the consumer aggregates.
- :func:`slice_vectors` — projection transform over vector rows with the
  reference's sparse re-basing semantics (``InfoSelector.scala:242-257``:
  keep indices ∩ selection, re-based to positions in the selection) —
  exactly ``pyspark.ml.feature.VectorSlicer``.

Labels: LibSVM convention allows −1/+1; the reference casts labels to
byte and its 0..255 assumption breaks on negatives (SURVEY.md §7.4), so
``normalize_label=True`` (default) maps them to a dense 0..C−1 index by
first-seen sorted order.
"""

from __future__ import annotations

from pyspark.ml.feature import VectorSlicer
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_libsvm",
    "vectors_to_wide",
    "vectors_to_long",
    "slice_vectors",
]


def read_libsvm(
    spark: SparkSession, path: str, num_features: int | None = None
) -> DataFrame:
    """(label double, features Vector) via Spark's libsvm datasource."""
    reader = spark.read.format("libsvm")
    if num_features is not None:
        reader = reader.option("numFeatures", str(num_features))
    return reader.load(path)


def _label_index(df: DataFrame, label_col: str) -> F.Column:
    """Map raw labels to 0..C−1 by ascending value (driver-side tiny map)."""
    values = sorted(r[0] for r in df.select(label_col).distinct().collect())
    mapping = F.create_map(
        *[x for i, v in enumerate(values) for x in (F.lit(float(v)), F.lit(i))]
    )
    return mapping.getItem(F.col(label_col).cast("double"))


def vectors_to_wide(
    df: DataFrame,
    num_features: int | None = None,
    features_col: str = "features",
    label_col: str = "label",
    normalize_label: bool = True,
) -> DataFrame:
    """Wide tinyint matrix f0..fN, label from (label, features) rows."""
    if num_features is None:
        head = df.select(features_col).head()
        if head is None:
            raise ValueError(
                "empty input: cannot infer num_features — pass it explicitly"
            )
        num_features = len(head[0])
    arr = vector_to_array(F.col(features_col))
    label = (
        _label_index(df, label_col) if normalize_label else F.col(label_col)
    ).cast("tinyint").alias("label")
    return df.select(
        *[
            arr.getItem(i).cast("tinyint").alias(f"f{i}")
            for i in range(num_features)
        ],
        label,
    )


def vectors_to_long(
    df: DataFrame,
    num_features: int | None = None,
    features_col: str = "features",
    label_col: str = "label",
    normalize_label: bool = True,
) -> tuple[DataFrame, DataFrame, int, DataFrame]:
    """Sparse long format: ``(nonzeros(row_id, feat, x), labels(row_id, y),
    nf, base)``.

    ``base`` is the PERSISTED row-id'd frame both outputs derive from —
    returned so the caller can ``base.unpersist()`` after the fit (the
    same contract as :func:`operators.sparse.matrix_to_sparse_long`);
    without it the cache could never be released for the session's
    lifetime.  Nonzero extraction happens after a JVM-side
    densify+posexplode — at scale the explode is a narrow op and the
    zero filter drops the bulk before any shuffle.
    """
    if num_features is None:
        head = df.select(features_col).head()
        if head is None:
            raise ValueError(
                "empty input: cannot infer num_features — pass it explicitly"
            )
        num_features = len(head[0])
    label = (
        _label_index(df, label_col) if normalize_label else F.col(label_col)
    ).cast("int").alias("y")
    base = df.select(
        F.monotonically_increasing_id().alias("row_id"),
        vector_to_array(F.col(features_col)).alias("arr"),
        label,
    ).persist()
    nonzeros = (
        base.select("row_id", F.posexplode("arr").alias("feat", "x"))
        .filter(F.col("x") != 0)
        .select("row_id", "feat", F.col("x").cast("int").alias("x"))
    )
    labels = base.select("row_id", "y")
    return nonzeros, labels, num_features, base


def slice_vectors(
    df: DataFrame,
    indices: list[int],
    features_col: str = "features",
    output_col: str = "selected",
) -> DataFrame:
    """Project vector rows to ``indices`` with sparse re-basing
    (``InfoSelector.scala:242-257`` semantics — VectorSlicer is the exact
    Spark counterpart, including sorted-merge index intersection)."""
    slicer = VectorSlicer(
        inputCol=features_col, outputCol=output_col, indices=sorted(indices)
    )
    return slicer.transform(df)
