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
    "cross_source_overlap",
    "cross_source_overlap_oracle",
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


# ---------------------------------------------------------------------------
# Cross-source shingle-overlap matrix
# ---------------------------------------------------------------------------
def _cross_source_overlap_sql(duck: bool, n: int = 3) -> str:
    """Pairwise Jaccard of the sources' distinct shingle sets.

    The corpus-level twin of doc-level near-dup: before mixing sources
    into a training set you want to know which ones are secretly the
    same crawl (mirror sites, re-hosted dumps) — a high source-pair
    Jaccard means the mixture weights double-count that content and the
    dedup pass will be load-bearing.  Same diagnostic family as
    key_skew_profile: run it BEFORE committing a mix.

    Spark scale shape (duck=False): ONE data-sized exchange total.  Each
    shingle's source set is collect_set-aggregated (partial map-side,
    the shuffled value is a ≤n_sources set per shingle, never doc
    rows), and both the per-source sizes and the pairwise intersections
    derive from those sets with narrow explodes whose fanout is bounded
    by n_sources (sizes) / n_sources² (pairs) per shingle — partial
    counts collapse them to sources²-sized cells before any further
    exchange.  The first cut of this op was the textbook
    distinct-then-self-join (still the DuckDB oracle below, which keeps
    the cross-engine check independently formulated); it needs THREE
    data-sized exchanges (the distinct, then a shingle repartition of
    each self-join side).  Honest measurement at 500k docs (min-of-3,
    noisy host): the two are PAR (~12 s both) because gram tokenization
    dominates at this scale — the 3→1 exchange cut is kept for the
    regime where shuffle volume, not CPU, binds (the corpus >> memory
    cluster case this repo designs for).

    The pair grid is dense-completed from ``SELECT DISTINCT source FROM
    documents`` (NOT from the shingle-set sizes, which would silently
    drop a source whose docs are all shorter than n tokens — the
    round-5 review finding) + LEFT JOINs with coalesce-0, so every
    source pair appears, zero-overlap and even zero-shingle ones, with
    jaccard 0.0 (0/0 guarded to 0.0).  Jaccard divides exact integer
    counts: no float accumulation, hash-stable across engines.
    """
    if duck:
        tokens = r"string_split_regex(trim(lower(text)), '\s+')"
        return f"""
        WITH tok AS (SELECT source, {tokens} AS ts FROM documents),
        gr_all AS (
          SELECT source,
                 unnest(list_transform(range(1, len(ts) - {n - 2}),
                        i -> array_to_string(ts[i : i + {n - 1}], ' '))) AS shingle
          FROM tok WHERE len(ts) >= {n}),
        ssh AS (SELECT DISTINCT source, shingle FROM gr_all),
        sizes AS (SELECT source, count(*) AS n_sh FROM ssh GROUP BY source),
        inter AS (
          SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
          FROM ssh a JOIN ssh b ON a.shingle = b.shingle AND a.source < b.source
          GROUP BY a.source, b.source),
        srcs AS (SELECT DISTINCT source FROM documents),
        grid AS (
          SELECT sa.source AS source_a, sb.source AS source_b,
                 coalesce(za.n_sh, CAST(0 AS BIGINT)) AS n_a,
                 coalesce(zb.n_sh, CAST(0 AS BIGINT)) AS n_b
          FROM srcs sa JOIN srcs sb ON sa.source < sb.source
          LEFT JOIN sizes za ON za.source = sa.source
          LEFT JOIN sizes zb ON zb.source = sb.source)
        SELECT g.source_a, g.source_b, g.n_a, g.n_b,
               coalesce(i.n_common, 0) AS n_common,
               CASE WHEN g.n_a + g.n_b - coalesce(i.n_common, 0) = 0
                    THEN CAST(0 AS DOUBLE)
                    ELSE round(CAST(coalesce(i.n_common, 0) AS DOUBLE)
                         / (g.n_a + g.n_b - coalesce(i.n_common, 0)), 5)
               END AS jaccard
        FROM grid g LEFT JOIN inter i
          ON g.source_a = i.source_a AND g.source_b = i.source_b
        """
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        SHINGLE_TOKENS_EXPR,
        shingle_grams_expr,
    )

    grams = shingle_grams_expr(n, "ts")
    # i is 0-based in transform's index lambda; slice() is 1-based, so
    # "everything after element i" starts at i + 2.  OUTER explodes keep
    # InferFiltersFromGenerate from re-evaluating the higher-order gram /
    # pair expressions in an interpreted per-row Filter (the measured 6×
    # generate trap — see _shingles_cte).
    pairs_expr = (
        "flatten(transform(ss, (x, i) -> "
        "transform(slice(ss, i + 2, size(ss)), y -> struct(x AS a, y AS b))))"
    )
    return f"""
    WITH tok AS (SELECT source, {SHINGLE_TOKENS_EXPR} AS ts FROM documents),
    gr AS (
      SELECT source, shingle
      FROM tok
      LATERAL VIEW OUTER explode({grams}) t AS shingle
      WHERE size(ts) >= {n}),
    sets AS (
      SELECT shingle, sort_array(collect_set(source)) AS ss
      FROM gr GROUP BY shingle),
    sizes AS (
      SELECT source, count(*) AS n_sh
      FROM sets LATERAL VIEW explode(ss) t AS source
      GROUP BY source),
    inter AS (
      SELECT pr.a AS source_a, pr.b AS source_b, count(*) AS n_common
      FROM sets
      LATERAL VIEW OUTER explode({pairs_expr}) t AS pr
      WHERE pr IS NOT NULL
      GROUP BY pr.a, pr.b),
    srcs AS (SELECT DISTINCT source FROM documents),
    grid AS (
      SELECT sa.source AS source_a, sb.source AS source_b,
             coalesce(za.n_sh, CAST(0 AS BIGINT)) AS n_a,
             coalesce(zb.n_sh, CAST(0 AS BIGINT)) AS n_b
      FROM srcs sa JOIN srcs sb ON sa.source < sb.source
      LEFT JOIN sizes za ON za.source = sa.source
      LEFT JOIN sizes zb ON zb.source = sb.source)
    SELECT g.source_a, g.source_b, g.n_a, g.n_b,
           coalesce(i.n_common, 0) AS n_common,
           CASE WHEN g.n_a + g.n_b - coalesce(i.n_common, 0) = 0
                THEN CAST(0 AS DOUBLE)
                ELSE round(CAST(coalesce(i.n_common, 0) AS DOUBLE)
                     / (g.n_a + g.n_b - coalesce(i.n_common, 0)), 5)
           END AS jaccard
    FROM grid g LEFT JOIN inter i
      ON g.source_a = i.source_a AND g.source_b = i.source_b
    """


def cross_source_overlap(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Gate query: the source×source shingle-Jaccard matrix of the
    documents corpus."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_cross_source_overlap_sql(duck=False, n=n))


def cross_source_overlap_oracle(n: int = 3) -> str:
    return _cross_source_overlap_sql(duck=True, n=n)
