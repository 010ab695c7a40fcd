"""Table profiling: per-column stats in ONE scan.

The naive profile (one aggregate query per column) scans the table once
PER COLUMN — at 100 TB that's the difference between one pass and
dozens.  Here the columns are unpivoted (``stack``) into ``(col, val)``
long format map-side, then a single hash aggregate per column computes
count / nulls / distinct / min / max — one scan, one shuffle carrying
group cells only.

No reference analogue (the reference has no profiling; extension
surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "profile_columns",
    "profile_lineitem",
    "PROFILE_LINEITEM_ORACLE",
    "key_skew_profile",
    "key_skew_profile_query",
    "KEY_SKEW_PROFILE_ORACLE",
]

# numeric lineitem columns profiled by the gate query (stable order)
_LINEITEM_NUMERIC = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
]


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile of ``cols`` (cast to double): row count, null
    count, distinct count, min, max.  One scan + one shuffle."""
    from pyspark.sql import functions as F

    n = len(cols)
    pairs = ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c in cols)
    long = df.selectExpr(f"stack({n}, {pairs}) AS (col, val)")
    return long.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("val").isNull(), 1)).alias("n_null"),
        F.countDistinct("val").alias("n_distinct"),
        F.round(F.min("val"), 5).alias("min_val"),
        F.round(F.max("val"), 5).alias("max_val"),
    )


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: profile the numeric lineitem columns."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return profile_columns(df, _LINEITEM_NUMERIC)


# Oracle: per-column UNION ALL (oracle-side perf is irrelevant; the
# Spark side is the one-scan plan under test).
PROFILE_LINEITEM_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col,
       count(*) AS n_rows,
       count(CASE WHEN {c} IS NULL THEN 1 END) AS n_null,
       count(DISTINCT CAST({c} AS DOUBLE)) AS n_distinct,
       round(min(CAST({c} AS DOUBLE)), 5) AS min_val,
       round(max(CAST({c} AS DOUBLE)), 5) AS max_val
FROM lineitem"""
    for c in _LINEITEM_NUMERIC
)


# ---------------------------------------------------------------------------
# Join-key skew profile
# ---------------------------------------------------------------------------
SKEW_TOP = 20


def key_skew_profile(df: DataFrame, key: str, top: int = SKEW_TOP) -> DataFrame:
    """Top-``top`` heaviest values of ``key`` with their share of all
    rows — the diagnostic you run BEFORE a big join to decide between a
    plain shuffle join, AQE skew splitting, or `joins.salted_join`.

    One partial+final count agg (shuffle carries key cells, not rows)
    + a TakeOrderedAndProject for the top slice.  The total is a
    1-row aggregate broadcast back onto the cells — NOT an
    ``OVER ()`` window, which would funnel every distinct key through
    a single partition (billions of cells at 100 TB).  Ties rank by
    key value so the slice is deterministic.

    The count agg is evaluated twice (once for cells, once for the
    total) — callers profiling a table they already have cached pay
    one scan; for a one-off diagnostic the second pass of an
    already-pruned single-column scan is the explicit price of keeping
    the plan window-free.  ``.persist()`` the input to collapse it.
    """
    from pyspark.sql import functions as F

    counts = df.groupBy(F.col(key).alias("key")).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n") / F.col("__total"), 5))
        .drop("__total")
        .orderBy(F.col("n").desc(), "key")
        .limit(top)
    )


def key_skew_profile_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: heaviest users in the events table."""
    from flink_infotheoretic_feature_selection_spark.datasets import load_events

    return key_skew_profile(load_events(spark, sf_dir), "user_id")


KEY_SKEW_PROFILE_ORACLE = f"""
WITH counts AS (
  SELECT user_id AS key, count(*) AS n FROM events GROUP BY user_id)
SELECT key, n, round(CAST(n AS DOUBLE) / sum(n) OVER (), 5) AS share
FROM counts
ORDER BY n DESC, key
LIMIT {SKEW_TOP}
"""
