"""Similarity search over the embeddings table (SURVEY.md §7.4/M7).

- **brute-force cosine top-k** — the exactness baseline.  Engine path is a
  vectorized Pandas iterator (`mapInPandas`): the corpus matrix is
  broadcast once, each Arrow batch of queries does one NumPy matmul and an
  ``argpartition`` top-k.  At 100 TB the corpus side no longer fits a
  broadcast — that is what the IVF variant below is for; brute force
  remains the per-bucket kernel.
- **IVF/LSH-bucketed ANN** — sign-grid coarse quantizer (bucket = sign
  bits of the leading dimensions), candidates restricted to the query's
  bucket, ranked by exact cosine.  Pure DataFrame ops: the bucket id is a
  narrow map and the candidate generation is an equi-join on the bucket
  key — broadcast-able and skew-tolerant (bucket population is bounded by
  the data, and AQE splits hot buckets).
- **embedding near-dup pairs** — cosine ≥ threshold pair mining within
  buckets.

Every variant has a DuckDB oracle twin (``list_cosine_similarity`` on
DOUBLE[] + window rank), with cosines rounded to 5 decimals on both sides
before ranking so cross-engine float noise cannot flip the comparison.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "cosine_topk",
    "ivf_topk",
    "embedding_neardup_pairs",
    "cosine_topk_oracle",
    "ivf_topk_oracle",
    "embedding_neardup_oracle",
]

N_SIGN_BITS = 6  # IVF grid: 2^6 = 64 buckets


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.createOrReplaceTempView("embeddings")
    return df


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (Pandas-vectorized engine path)
# ---------------------------------------------------------------------------
def cosine_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    query_limit: int = 200,
) -> DataFrame:
    """Exact top-k cosine neighbors (excluding self) for the first
    ``query_limit`` vec_ids.  Returns (query_id, neighbor_id, cos, rank)."""
    df = _emb(spark, sf_dir)
    pdf = df.select("vec_id", "embedding").toPandas()
    corpus_ids = pdf["vec_id"].to_numpy()
    corpus = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((corpus_ids, corpus))

    queries = df.filter(df.vec_id < query_limit).select("vec_id", "embedding")

    def topk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        for pdf_q in batches:
            q = np.stack(pdf_q["embedding"].to_numpy()).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ mat.T  # (nq, N)
            qids = pdf_q["vec_id"].to_numpy()
            sims_r = np.round(sims, 5)
            rows = []
            for r, qid in enumerate(qids):
                s = sims_r[r].copy()
                s[ids == qid] = -np.inf  # exclude self
                # deterministic order: (-cos_rounded, neighbor_id)
                order = np.lexsort((ids, -s))[:k]
                for rank, j in enumerate(order, start=1):
                    rows.append((int(qid), int(ids[j]), float(s[j]), rank))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos", "rank"])

    return queries.mapInPandas(
        topk_batches, "query_id long, neighbor_id long, cos double, rank int"
    )


def cosine_topk_oracle(k: int = 5, query_limit: int = 200) -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.emb, c.emb), 5) AS cos
      FROM e q JOIN e c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {query_limit}),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM pairs)
    SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# IVF (sign-grid) bucketed ANN — scale path, pure DataFrame ops
# ---------------------------------------------------------------------------
def _bucket_expr(emb_col: str, duck: bool) -> str:
    get = (lambda i: f"{emb_col}[{i + 1}]") if duck else (lambda i: f"{emb_col}[{i}]")
    return " + ".join(
        f"(CASE WHEN {get(i)} > 0 THEN {1 << i} ELSE 0 END)" for i in range(N_SIGN_BITS)
    )


def _dot_expr_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_expr_spark(a: str) -> str:
    return f"sqrt({_dot_expr_spark(a, a)})"


def _ivf_sql_spark(k: int, query_limit: int) -> str:
    dot = _dot_expr_spark("q.emb", "c.emb")
    return f"""
    WITH e AS (SELECT vec_id, embedding AS emb,
                      {_bucket_expr('embedding', duck=False)} AS bucket
               FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({dot} / ({_norm_expr_spark('q.emb')} * {_norm_expr_spark('c.emb')}), 5) AS cos
      FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
      WHERE q.vec_id < {query_limit}),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM pairs)
    SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def ivf_topk(spark: SparkSession, sf_dir: str, k: int = 3, query_limit: int = 200) -> DataFrame:
    """Approximate top-k: candidates share the query's sign-grid bucket."""
    _emb(spark, sf_dir)
    return spark.sql(_ivf_sql_spark(k, query_limit))


def ivf_topk_oracle(k: int = 3, query_limit: int = 200) -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                      {_bucket_expr('embedding', duck=True)} AS bucket
               FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.emb, c.emb), 5) AS cos
      FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
      WHERE q.vec_id < {query_limit}),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM pairs)
    SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Embedding near-dup pairs (bucketed)
# ---------------------------------------------------------------------------
def embedding_neardup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """Pairs with cosine ≥ threshold (default tuned to the synthetic corpus), candidates restricted to the same
    sign-grid bucket (scale path — no cross join)."""
    _emb(spark, sf_dir)
    dot = _dot_expr_spark("a.emb", "b.emb")
    return spark.sql(
        f"""
        WITH e AS (SELECT vec_id, embedding AS emb,
                          {_bucket_expr('embedding', duck=False)} AS bucket
                   FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round({dot} / ({_norm_expr_spark('a.emb')} * {_norm_expr_spark('b.emb')}), 5) AS cos
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {dot} / ({_norm_expr_spark('a.emb')} * {_norm_expr_spark('b.emb')}) >= {threshold}
        """
    )


def embedding_neardup_oracle(threshold: float = 0.35) -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                      {_bucket_expr('embedding', duck=True)} AS bucket
               FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.emb, b.emb), 5) AS cos
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.emb, b.emb) >= {threshold}
    """
