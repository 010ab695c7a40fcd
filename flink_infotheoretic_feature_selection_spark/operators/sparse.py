"""Sparse columnar histogram path — implicit zeros done right.

The reference *declares* a sparse path but it is broken: `trainOn` throws
for sparse input (``InfoSelector.scala:378-386``) and its sparse
``getRedundancies`` contains an always-false comparison
(``InfoTheory.scala:252``, Int == DataSet).  We implement the semantics it
*intended* — absent entries are value 0, credited in bulk
(``InfoTheory.scala:296-304`` for 2-D, ``:377-384`` for 3-D) — as pure
DataFrame aggregations, which unlike the reference's
one-dense-vector-per-feature design (``InfoSelector.scala:459-470``)
scales to any row count.

Input layout (long format): one row per *nonzero* cell
``(row_id long, feat int, x tinyint/int)`` plus a per-row label table
``(row_id, y)`` (and optionally the z column for 3-D).

Zero-crediting algebra (per feature):
    count(x=0, y)    = N_y    − Σ_{x≠0} count(x, y)
    count(x=0, y, z) = N_{yz} − Σ_{x≠0} count(x, y, z)
where N_y / N_yz are the label(-pair) histograms over ALL rows — the
reference's broadcast y-histogram trick, here an outer join against the
(tiny) per-feature nonzero aggregate.

Every step is a hash aggregation or a broadcast-able join on small keys;
shuffle volume is O(nonzeros + n_features × dims) — never row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sparse_hist2d", "sparse_hist3d", "matrix_to_sparse_long"]


def matrix_to_sparse_long(
    matrix: DataFrame, feats: list[str], label_col: str = "label"
):
    """Derive the sparse long-format input from a wide matrix.

    Returns ``(base, nonzeros, labels)`` where ``base`` is PERSISTED and
    must be unpersisted by the caller after the fit: ``nonzeros`` and
    ``labels`` are two separate subplans over the same
    ``monotonically_increasing_id`` — without the persist each would
    re-evaluate the nondeterministic id assignment independently (task
    retry, partition-layout change) and could pair cells with the wrong
    labels.
    """
    from pyspark.storagelevel import StorageLevel

    base = matrix.select(
        F.monotonically_increasing_id().alias("row_id"),
        *[F.col(c).cast("int").alias(c) for c in feats],
        F.col(label_col).cast("int").alias("y"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    nonzeros = base.select(
        "row_id", F.posexplode(F.array(*feats)).alias("feat", "x")
    ).filter(F.col("x") != 0)
    labels = base.select("row_id", "y")
    return base, nonzeros, labels


def sparse_hist2d(nonzeros: DataFrame, labels: DataFrame, n_features: int) -> DataFrame:
    """2-D contingency tables from sparse long format.

    nonzeros: (row_id, feat, x≠0); labels: (row_id, y).
    Returns (feat, x, y, cnt) including the credited x=0 cells,
    for ALL features 0..n_features-1 (features with no nonzeros get
    the full label histogram at x=0).
    """
    spark = nonzeros.sparkSession
    # nonzero cells joined with their row's label — shuffle on row_id,
    # the only data-sized join; Catalyst/AQE picks the strategy.
    nz = (
        nonzeros.join(labels, "row_id")
        .groupBy("feat", "x", "y")
        .agg(F.count("*").alias("cnt"))
    )
    # per-(feat, y) nonzero totals, to subtract from the label histogram
    nz_per_y = nz.groupBy("feat", "y").agg(F.sum("cnt").alias("nz_cnt"))
    y_hist = labels.groupBy("y").agg(F.count("*").alias("n_y"))  # tiny
    feats = spark.range(n_features).select(F.col("id").cast("int").alias("feat"))
    # credited zeros: every (feat, y) cell, minus that feature's nonzeros in y
    zeros = (
        feats.crossJoin(F.broadcast(y_hist))
        .join(nz_per_y, ["feat", "y"], "left")
        .select(
            "feat",
            F.lit(0).alias("x"),
            "y",
            (F.col("n_y") - F.coalesce(F.col("nz_cnt"), F.lit(0))).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    return nz.select("feat", "x", "y", "cnt").unionByName(zeros)


def sparse_hist3d(
    nonzeros: DataFrame, labels: DataFrame, z_col: DataFrame, n_features: int
) -> DataFrame:
    """3-D contingency tables from sparse long format.

    nonzeros: (row_id, feat, x≠0); labels: (row_id, y); z_col: (row_id, z).
    Returns (feat, x, y, z, cnt) with credited x=0 cells
    (``InfoTheory.scala:377-384`` zero-credit semantics).
    """
    spark = nonzeros.sparkSession
    yz = labels.join(z_col, "row_id")  # (row_id, y, z)
    nz = (
        nonzeros.join(yz, "row_id")
        .groupBy("feat", "x", "y", "z")
        .agg(F.count("*").alias("cnt"))
    )
    nz_per_yz = nz.groupBy("feat", "y", "z").agg(F.sum("cnt").alias("nz_cnt"))
    yz_hist = yz.groupBy("y", "z").agg(F.count("*").alias("n_yz"))  # tiny
    feats = spark.range(n_features).select(F.col("id").cast("int").alias("feat"))
    zeros = (
        feats.crossJoin(F.broadcast(yz_hist))
        .join(nz_per_yz, ["feat", "y", "z"], "left")
        .select(
            "feat",
            F.lit(0).alias("x"),
            "y",
            "z",
            (F.col("n_yz") - F.coalesce(F.col("nz_cnt"), F.lit(0))).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    return nz.select("feat", "x", "y", "z", "cnt").unionByName(zeros)
