"""Similarity search over the embeddings table (SURVEY.md §7.4/M7).

- **brute-force cosine top-k** — the exactness baseline, block-partitioned:
  the *query* side (bounded by ``query_limit``, a parameter — never the
  corpus) is collected and broadcast; the corpus stays distributed and is
  scanned once by an Arrow-batched ``mapInPandas`` that emits each batch's
  per-query top-k candidates (≤ batches×queries×k tiny rows); a global
  window rank merges candidates into the exact top-k.  No corpus-sized
  driver state at any scale — the corpus-side cost is one scan, embarrassingly
  parallel over partitions.
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
    "ivf_multiprobe_topk",
    "ivf_multiprobe_vectorized",
    "embedding_neardup_pairs",
    "embedding_neardup_vectorized",
    "embedding_quantize",
    "ivf_topk_q8",
    "ivf_kmeans_topk",
    "ivf_kmeans_fixture_topk",
    "ivf_kmeans_fixture_oracle",
    "pq_encode",
    "pq_encode_oracle",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_vectorized",
    "ann_ivf_pq_oracle",
    "with_pq_codes",
    "pq_corpus_index",
    "pq_adc_score_terms",
    "label_centroids",
    "LABEL_CENTROIDS_ORACLE",
    "cosine_topk_oracle",
    "ivf_topk_oracle",
    "ivf_multiprobe_oracle",
    "embedding_neardup_oracle",
    "semantic_decontaminate",
    "semantic_decontaminate_vectorized",
    "semantic_decontaminate_oracle",
    "embedding_quantize_oracle",
    "ivf_topk_q8_oracle",
]

N_SIGN_BITS = 6  # IVF grid: 2^6 = 64 buckets


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.createOrReplaceTempView("embeddings")
    return df


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (Pandas-vectorized engine path)
# ---------------------------------------------------------------------------
def _collect_queries(df: DataFrame, query_limit: int) -> tuple[np.ndarray, np.ndarray]:
    """Collect the bounded query side (vec_id < query_limit) to the driver.

    This is the ONLY driver collect in the exact path, and it is bounded
    by the ``query_limit`` parameter, never the corpus size: the filter
    pushes into the parquet scan (pinned by test_plans).  Returns
    (ids, row-normalized float64 matrix).
    """
    pdf = (
        df.filter(df.vec_id < query_limit).select("vec_id", "embedding").toPandas()
    )
    ids = pdf["vec_id"].to_numpy()
    if len(ids) == 0:
        # np.stack crashes on an empty list; an empty query set is a
        # legitimate input (small corpus, renumbered ids)
        return ids, np.zeros((0, 0), dtype=np.float64)
    q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    # Zero-norm queries divide to NaN rows; their candidates are all
    # dropped by the isfinite guard below, so such queries are absent
    # from the result.  (Known cross-engine boundary: DuckDB's
    # list_cosine_similarity returns -1.0 for a zero-norm operand, so an
    # oracle would rank it last instead of dropping it — the synthetic
    # corpus has no zero vectors, and production callers should filter
    # them upstream.)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return ids, q


def cosine_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    query_limit: int = 200,
) -> DataFrame:
    """Exact top-k cosine neighbors (excluding self) for the first
    ``query_limit`` vec_ids.  Returns (query_id, neighbor_id, cos, rank).

    Block-partitioned: broadcast the (bounded) query matrix, stream the
    corpus through ``mapInPandas`` — each Arrow batch does one NumPy
    matmul and keeps its local per-query top-k — then a global window
    rank over the tiny candidate set yields the exact answer.  Local
    top-k truncation is lossless: within a batch candidates are kept in
    the same (cos desc, neighbor_id asc) order the global rank uses, so
    any dropped row is dominated by k kept rows from its own batch.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = _emb(spark, sf_dir)
    q_ids, q_mat = _collect_queries(df, query_limit)
    if len(q_ids) == 0:
        # no queries -> no pairs; short-circuit instead of shipping a
        # 0-row matrix into the corpus scan (matmul rejects 0-dim)
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank integer"
        )
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def block_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, qmat = bc.value
        for pdf_c in batches:
            ids = pdf_c["vec_id"].to_numpy()
            mat = np.stack(pdf_c["embedding"].to_numpy()).astype(np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = np.round(qmat @ mat.T, 5)  # (nq, nb)
            rows = []
            kk = min(k, len(ids))
            for r, qid in enumerate(qids):
                s = sims[r].copy()
                s[ids == qid] = -np.inf  # exclude self
                order = np.lexsort((ids, -s))[:kk]
                for j in order:
                    # isfinite drops both the self-marker (-inf) and any
                    # NaN cosine from a zero-norm embedding — Spark's
                    # window sort ranks NaN ABOVE all doubles, so a NaN
                    # candidate must never reach the global merge.
                    if np.isfinite(s[j]):
                        rows.append((int(qid), int(ids[j]), float(s[j])))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    cand = df.select("vec_id", "embedding").mapInPandas(
        block_topk, "query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
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
def _bucket_expr(emb_col: str, duck: bool, n_bits: int = N_SIGN_BITS) -> str:
    # n_bits is the parallelism/recall dial for the same-bucket-only
    # ops: buckets under a finer grid REFINE the coarser grid's (bit i
    # agreement is independent of bit j), so raising n_bits only ever
    # shrinks each bucket's pair set — pinned by test.
    get = (lambda i: f"{emb_col}[{i + 1}]") if duck else (lambda i: f"{emb_col}[{i}]")
    return " + ".join(
        f"(CASE WHEN {get(i)} > 0 THEN {1 << i} ELSE 0 END)" for i in range(n_bits)
    )


def _dot_expr_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_expr_spark(a: str) -> str:
    return f"sqrt({_dot_expr_spark(a, a)})"


def _ivf_sql_spark(k: int, query_limit: int) -> str:
    # Norms are precomputed per ROW in the e CTE, not per PAIR in the
    # join: each bucket-mate pair then costs one dot product instead of
    # three O(d) folds.  Values are bit-identical (same sqrt of the same
    # sequential dot), so the value-level oracle is unaffected.
    dot = _dot_expr_spark("q.emb", "c.emb")
    return f"""
    WITH e AS (SELECT vec_id, embedding AS emb,
                      {_norm_expr_spark('embedding')} AS nrm,
                      {_bucket_expr('embedding', duck=False)} AS bucket
               FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({dot} / (q.nrm * c.nrm), 5) AS cos
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


def _probe_list(bucket_expr: str, n_bits: int, duck: bool) -> str:
    """bucket plus its n_bits Hamming-distance-1 neighbors."""
    if duck:
        probes = [bucket_expr] + [f"xor({bucket_expr}, {1 << i})" for i in range(n_bits)]
        return f"unnest([{', '.join(probes)}])"
    probes = [bucket_expr] + [f"({bucket_expr}) ^ {1 << i}" for i in range(n_bits)]
    return f"explode(array({', '.join(probes)}))"


def _ivf_multiprobe_sql(duck: bool, k: int, query_limit: int) -> str:
    """Multi-probe IVF: the query searches its own sign-grid bucket AND
    every bucket at Hamming distance 1 — (n_bits+1)× the candidates,
    sharply better recall near the sign boundaries, still bucket-join
    shaped (each candidate has one bucket, so probes never duplicate a
    pair).  The 100 TB answer to "64 buckets is coarse": recall scales
    with probes, never with an all-pairs join.
    """
    if duck:
        bucket = _bucket_expr("embedding", duck=True)
        cos = "round(list_cosine_similarity(q.emb, c.emb), 5)"
        emb_cast = "CAST(embedding AS DOUBLE[])"
        nrm = "CAST(1 AS DOUBLE)"  # unused on the duck side
    else:
        bucket = _bucket_expr("embedding", duck=False)
        dot = _dot_expr_spark("q.emb", "c.emb")
        # per-row norm (see _ivf_sql_spark): one O(d) fold per pair, not 3
        cos = f"round({dot} / (q.nrm * c.nrm), 5)"
        emb_cast = "embedding"
        nrm = _norm_expr_spark("embedding")
    probe = _probe_list("bucket", N_SIGN_BITS, duck)
    return f"""
    WITH e AS (SELECT vec_id, {emb_cast} AS emb, {nrm} AS nrm, {bucket} AS bucket
               FROM embeddings),
    q AS (SELECT vec_id, emb, nrm, {probe} AS probe
          FROM e WHERE vec_id < {query_limit}),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos
      FROM q JOIN e c ON c.bucket = q.probe AND q.vec_id != c.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM pairs)
    SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def ivf_multiprobe_topk(
    spark: SparkSession, sf_dir: str, k: int = 3, query_limit: int = 200
) -> DataFrame:
    """Approximate top-k with Hamming-1 multi-probe over the sign grid."""
    _emb(spark, sf_dir)
    return spark.sql(_ivf_multiprobe_sql(duck=False, k=k, query_limit=query_limit))


def ivf_multiprobe_oracle(k: int = 3, query_limit: int = 200) -> str:
    return _ivf_multiprobe_sql(duck=True, k=k, query_limit=query_limit)


def ivf_multiprobe_vectorized(
    spark: SparkSession, sf_dir: str, k: int = 3, query_limit: int = 200
) -> DataFrame:
    """Arrow-vectorized multiprobe IVF — identical bucket/probe geometry
    to :func:`ivf_multiprobe_topk`, different kernel.

    The SQL form computes each candidate cosine as a per-pair O(d)
    fold; measured at 100× corpus (200k×64, BASELINE round-6 table)
    that fold dominates (12.1 s for ~4.2M pairs).  Here the bucket
    equi-join becomes a COGROUP on the bucket key and each bucket's
    (queries × members) cosine block is ONE NumPy matmul inside
    ``applyInPandas`` — ~100× fewer interpreter/codegen dispatches per
    pair, same candidates, same (cos desc, id) ranking on the round-5
    value.  Per-bucket local top-k truncation is lossless for the same
    reason as :func:`cosine_topk`'s per-batch truncation.

    NOT the gated variant: a matmul's pairwise summation order differs
    from the sequential SQL fold, so a cosine within float-epsilon of a
    0.5e-5 rounding boundary could round differently — the sequential
    fold IS the cross-engine oracle contract.  Library/perf path only;
    equivalence to the gated plan is unit-pinned (≥98% pair overlap,
    ≤2e-5 cos delta on current fixtures).

    Scale shape: shuffle = one exchange of each side on bucket (the
    probe explode is map-side); state per task = one bucket's members ×
    queries probing it.  A hot bucket is the standard skew class (AQE /
    salting compose); candidates never exceed probes × bucket size.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    bucket = _bucket_expr("embedding", duck=False)
    corpus = emb.selectExpr("vec_id", "embedding", f"{bucket} AS bucket")
    probe = _probe_list(f"({bucket})", N_SIGN_BITS, duck=False)
    queries = emb.filter(F.col("vec_id") < query_limit).selectExpr(
        "vec_id AS query_id", "embedding", f"{probe} AS bucket"
    )

    def block(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos": []}).astype(
                {"query_id": "int64", "neighbor_id": "int64", "cos": "float64"}
            )
        qm = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
        cm = np.stack(cpdf["embedding"].to_numpy()).astype(np.float64)
        qm /= np.linalg.norm(qm, axis=1, keepdims=True)
        cm /= np.linalg.norm(cm, axis=1, keepdims=True)
        sims = np.round(qm @ cm.T, 5)
        qids = qpdf["query_id"].to_numpy()
        cids = cpdf["vec_id"].to_numpy()
        rows = []
        kk = min(k, len(cids))
        for r, qid in enumerate(qids):
            s = sims[r].copy()
            s[cids == qid] = -np.inf
            order = np.lexsort((cids, -s))[:kk]
            rows.extend(
                (int(qid), int(cids[j]), float(s[j])) for j in order if np.isfinite(s[j])
            )
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    cand = (
        queries.groupBy("bucket")
        .cogroup(corpus.groupBy("bucket"))
        .applyInPandas(block, "query_id long, neighbor_id long, cos double")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


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
# Int8 embedding quantization + quantized ANN (the 100 TB memory/IO path)
# ---------------------------------------------------------------------------
def _quantize_cte(duck: bool) -> str:
    """CTE ``qz(vec_id, scale, q)``: per-vector symmetric int8
    quantization — scale = max|v| / 127, q_i = round-half-up(v_i/scale).

    The arithmetic is a fixed sequence of IEEE double ops written
    identically for both engines (abs → max → mul → div → +0.5 → floor),
    so the emitted ints and scale are bit-identical by construction —
    no engine-native round(), whose tie-breaking differs.  floor() makes
    the value integral before the int cast (DuckDB CAST(double AS INT)
    ROUNDS; casting an exact integer sidesteps it).  An all-zero vector
    gets scale 0 and an all-zero code instead of a 0/0 NaN.

    Scale shape: a narrow per-row projection fused into the scan — int8
    codes + one f64 scale cut embedding bytes ~4× (the dominant IO/
    shuffle cost of every downstream ANN pass) for ≤ scale/2 per-coord
    reconstruction error.
    """
    if duck:
        mx = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
        code = (
            "list_transform(embedding, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx + 0.5) AS INTEGER))"
        )
        zeros = "list_transform(embedding, x -> 0)"
    else:
        mx = "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
        code = (
            "transform(embedding, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx + 0.5) AS INT))"
        )
        zeros = "transform(embedding, x -> 0)"
    return f"""
    mxe AS (SELECT vec_id, embedding, {mx} AS mx FROM embeddings),
    qz AS (
      SELECT vec_id,
             CASE WHEN mx = 0.0 THEN CAST(0.0 AS DOUBLE) ELSE mx / 127.0 END AS scale,
             CASE WHEN mx = 0.0 THEN {zeros} ELSE {code} END AS q
      FROM mxe)
    """


def _quantize_sql(duck: bool) -> str:
    """Long-format emission ``(vec_id, pos, qv, scale)`` — one row per
    code coordinate, 1-based ``pos``.

    SCALAR COLUMNS ONLY by contract: the round-4 gate crash was this
    query emitting ``q`` as ``array<tinyint>``, which the driver's
    pandas canonicalizer cannot sort ("unhashable type: 'list'") — the
    same failure media_features hit in round 1.  Every gate output must
    be flat; ``tools/gate_check.py`` now asserts this in-repo.  The wide
    array form stays available to engine code via :func:`_quantize_cte`
    (the q8 ANN path composes on it without ever leaving SQL).
    """
    if duck:
        explode = """
    x AS (SELECT vec_id, scale,
                 unnest(list_transform(generate_series(1, len(q)),
                        i -> struct_pack(pos := i, qv := q[i]))) AS u
          FROM qz)
    SELECT vec_id, CAST(u.pos AS INT) AS pos, CAST(u.qv AS INT) AS qv, scale
    FROM x"""
        return f"WITH {_quantize_cte(duck)},{explode}"
    return (
        f"WITH {_quantize_cte(duck)} "
        "SELECT vec_id, CAST(pos + 1 AS INT) AS pos, qv, scale "
        "FROM qz LATERAL VIEW posexplode(q) t AS pos, qv"
    )


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 codes + per-vector scale for every embedding,
    long shape ``(vec_id, pos, qv, scale)``."""
    _emb(spark, sf_dir)
    return spark.sql(_quantize_sql(duck=False))


def embedding_quantize_oracle() -> str:
    return _quantize_sql(duck=True)


def _ivf_q8_sql(duck: bool, k: int, query_limit: int) -> str:
    """IVF top-k over DEQUANTIZED int8 vectors — identical plan to
    ``ivf_topk`` (sign-grid bucket equi-join, never all-pairs), but every
    candidate comparison reads the 4×-smaller quantized form.  Cosines
    round to 5 decimals before ranking like every ANN gate here (absorbs
    summation-order float noise between Spark's sequential fold and
    DuckDB's list_cosine_similarity).  Dequantized values themselves are
    bit-identical across engines (scale * int, same ops), so bucket ids
    and ranks agree exactly.
    """
    if duck:
        dq = "list_transform(q, v -> scale * CAST(v AS DOUBLE))"
        bucket = _bucket_expr("emb", duck=True)
        cos = "round(list_cosine_similarity(q.emb, c.emb), 5)"
        nrm = "CAST(1 AS DOUBLE)"  # unused on the duck side
    else:
        dq = "transform(q, v -> scale * CAST(v AS DOUBLE))"
        bucket = _bucket_expr("emb", duck=False)
        dot = _dot_expr_spark("q.emb", "c.emb")
        cos = f"round({dot} / (q.nrm * c.nrm), 5)"
        nrm = _norm_expr_spark("emb")
    return f"""
    WITH {_quantize_cte(duck)},
    dq AS (SELECT vec_id, {dq} AS emb FROM qz),
    e AS (SELECT vec_id, emb, {nrm} AS nrm, {bucket} AS bucket FROM dq),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos
      FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
      WHERE q.vec_id < {query_limit}),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM pairs)
    SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def ivf_topk_q8(
    spark: SparkSession, sf_dir: str, k: int = 3, query_limit: int = 200
) -> DataFrame:
    """IVF ANN over int8-quantized embeddings (4× less IO, same plan)."""
    _emb(spark, sf_dir)
    return spark.sql(_ivf_q8_sql(duck=False, k=k, query_limit=query_limit))


def ivf_topk_q8_oracle(k: int = 3, query_limit: int = 200) -> str:
    return _ivf_q8_sql(duck=True, k=k, query_limit=query_limit)


# ---------------------------------------------------------------------------
# Embedding near-dup pairs (bucketed)
# ---------------------------------------------------------------------------
def embedding_neardup_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.35,
    n_bits: int = N_SIGN_BITS,
) -> DataFrame:
    """Pairs with cosine ≥ threshold (default tuned to the synthetic
    corpus), candidates restricted to the same sign-grid bucket (scale
    path — no cross join).  The threshold applies to the ROUNDED cosine
    on both engines — the module invariant; thresholding raw values
    would let sub-ulp summation-order noise flip membership of a pair
    sitting exactly on the threshold.

    ``n_bits`` is the candidate-volume dial: same-bucket pairs are
    ~n²/2^n_bits, so the 6-bit gate default is quadratic-heavy past
    ~100k vectors (408 s at 200k measured) — scale callers raise it
    (finer buckets strictly refine, losing only cross-bucket recall)
    and/or use :func:`embedding_neardup_vectorized` for the kernel."""
    _emb(spark, sf_dir)
    dot = _dot_expr_spark("a.emb", "b.emb")
    # per-row norms + a pairs CTE so the dot product is evaluated once
    # per pair (the old form folded the arrays 4x: dot twice via the
    # WHERE + projection, plus two per-pair norms)
    return spark.sql(
        f"""
        WITH e AS (SELECT vec_id, embedding AS emb,
                          {_norm_expr_spark('embedding')} AS nrm,
                          {_bucket_expr('embedding', duck=False, n_bits=n_bits)} AS bucket
                   FROM embeddings),
        pairs AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 {dot} / (a.nrm * b.nrm) AS raw_cos
          FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        SELECT vec_a, vec_b, round(raw_cos, 5) AS cos
        FROM pairs WHERE round(raw_cos, 5) >= {threshold}
        """
    )


def embedding_neardup_vectorized(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.35,
    n_bits: int = N_SIGN_BITS,
) -> DataFrame:
    """Arrow-vectorized twin of :func:`embedding_neardup_pairs` —
    identical bucket geometry, per-bucket pairwise cosine as ONE NumPy
    matmul inside ``applyInPandas`` instead of a per-pair interpreted
    O(d) fold (the fold dominates the SQL route at vector scale:
    ~300M candidate folds at 200k×64).

    NOT the gated variant, for the same reason as
    :func:`ivf_multiprobe_vectorized`: matmul summation order differs
    from the sequential SQL fold, so a cosine within float-epsilon of a
    0.5e-5 rounding boundary could round differently — equivalence is
    unit-pinned (pair overlap + cos delta), the SQL fold stays the
    cross-engine oracle contract.

    Scale shape: one exchange on bucket; state per task = one bucket's
    members (matmul is blocked row-wise so peak memory is
    block × bucket, not bucket²).  Bucket population is the memory/skew
    dial — raise ``n_bits`` when buckets outgrow a task."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    e = emb.selectExpr(
        "vec_id", "embedding",
        f"{_bucket_expr('embedding', duck=False, n_bits=n_bits)} AS bucket",
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos": "float64"}
            )
        pdf = pdf.sort_values("vec_id")
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        ids = pdf["vec_id"].to_numpy()
        out_a, out_b, out_c = [], [], []
        block = 1024
        for s in range(0, len(ids) - 1, block):
            e_ = min(s + block, len(ids))
            sims = np.round(m[s:e_] @ m.T, 5)
            for r in range(e_ - s):
                i = s + r
                row = sims[r, i + 1 :]
                hit = np.nonzero(row >= threshold)[0]
                if len(hit):
                    out_a.extend([int(ids[i])] * len(hit))
                    out_b.extend(int(x) for x in ids[i + 1 + hit])
                    out_c.extend(float(x) for x in row[hit])
        return pd.DataFrame({"vec_a": out_a, "vec_b": out_b, "cos": out_c})

    return e.groupBy("bucket").applyInPandas(
        bucket_pairs, "vec_a long, vec_b long, cos double"
    )


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, long shape
    ``(label, dim, centroid)`` — the seed step for classifier sanity
    checks / clustering over a labeled embedding table.

    Scale shape: posexplode is map-side (rows × dims long format built
    inside the scan stage); the single hash aggregate shuffles only
    (label, dim) cells — cardinality labels × dims, independent of row
    count.
    """
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .select("label", (F.col("pos") + 1).alias("dim"), "val")
        .groupBy("label", "dim")
        .agg(F.round(F.avg("val"), 5).alias("centroid"))
    )


LABEL_CENTROIDS_ORACLE = """
WITH x AS (
  SELECT label,
         unnest(list_transform(generate_series(1, len(embedding)),
                i -> struct_pack(dim := i, val := embedding[i]))) AS u
  FROM embeddings)
SELECT label, CAST(u.dim AS INT) AS dim, round(avg(u.val), 5) AS centroid
FROM x GROUP BY label, u.dim
"""


def embedding_neardup_oracle(threshold: float = 0.35) -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                      {_bucket_expr('embedding', duck=True)} AS bucket
               FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.emb, b.emb), 5) AS cos
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.emb, b.emb), 5) >= {threshold}
    """


# ---------------------------------------------------------------------------
# k-means IVF — the production coarse quantizer (sign-grid is the
# portable/oracle-friendly LSH variant; learned centroids follow the data
# distribution, so bucket populations are balanced and recall-per-probe is
# higher on clustered embeddings)
# ---------------------------------------------------------------------------
def ivf_kmeans_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    query_limit: int = 200,
    n_centroids: int = 16,
    n_probes: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k with a LEARNED coarse quantizer: k-means
    centroids partition the corpus; each query probes its ``n_probes``
    nearest centroids and ranks those buckets' members by exact cosine.

    Scale shape — identical to the sign-grid variants: the corpus is
    scanned once for assignment (distributed ``KMeansModel.transform``),
    candidates come from a bucket equi-join (probes × bucket members,
    never all pairs), and only the bounded query side plus the
    n_centroids × dim centroid matrix ever reach the driver.  Training
    is `pyspark.ml` k-means|| (distributed, seeded — deterministic for a
    fixed input).  No DuckDB oracle (the iterative fit has no SQL
    analogue): gated rows-only, with recall pinned by unit test against
    brute force.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    # bounded query side FIRST: the empty case must cost nothing (no
    # k-means fit), matching cosine_topk's short-circuit discipline
    q_ids, q_mat = _collect_queries(emb, query_limit)
    if len(q_ids) == 0:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank integer"
        )
    # Fit and assign on L2-NORMALIZED vectors: ranking is by cosine, so
    # the coarse quantizer must partition directions, not magnitudes —
    # and the probe ranking below must use the SAME metric as the
    # assignment, else a query's probed buckets can exclude the very
    # bucket its neighbors were assigned to.
    nrm = _norm_expr_spark("embedding")
    vec = emb.select(
        "vec_id",
        array_to_vector(
            F.expr(f"transform(embedding, x -> CAST(x AS DOUBLE) / {nrm})")
        ).alias("features"),
    )
    # Persist the normalized projection for the DURATION OF THE FIT
    # (guide §5: reused and expensive to recompute): k-means|| init plus
    # every Lloyd iteration re-scans its input, and re-evaluating the
    # transform()/norm expressions per iteration measured 12.2 s vs
    # 3.5 s cached at sf0.1 (local[32]).  Centers are bit-identical
    # either way (caching changes neither partitioning nor row order,
    # so the fit's treeAggregate folds in the same order — verified).
    # The linear (vec_id, bucket) assignment is checkpointed so the
    # cache never outlives the call.
    vec = vec.persist()
    try:
        model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(vec)
        assigned = model.transform(vec).select(
            "vec_id", F.col("prediction").alias("bucket")
        ).localCheckpoint(eager=True)
    finally:
        vec.unpersist()
    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])

    # probes: Euclidean to the centers, exactly KMeans' assignment
    # metric on the normalized space — ||q-c||^2 = 1 + |c|^2 - 2 q.c
    # (q is unit), so rank ascending by |c|^2 - 2 q.c
    c_norm2 = (centers**2).sum(axis=1)
    probe_rows = [
        (int(qid), int(b))
        for qid, qrow in zip(q_ids, q_mat)
        for b in np.argsort(c_norm2 - 2.0 * (qrow @ centers.T))[:n_probes]
    ]
    probes = spark.createDataFrame(probe_rows, "query_id long, bucket int")

    e = spark.sql(
        f"SELECT vec_id, embedding AS emb, {_norm_expr_spark('embedding')} AS nrm "
        "FROM embeddings"
    )
    cand = (
        probes.join(assigned, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
    )
    # broadcast ONLY the bounded query rows — broadcasting the unfiltered
    # e would collect the whole corpus to the driver
    qe = e.filter(F.col("vec_id") < query_limit).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    dot = _dot_expr_spark("q_emb", "emb")
    pairs = (
        cand.join(F.broadcast(qe), "query_id")
        .join(e, "vec_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.expr(f"{dot} / (q_nrm * nrm)"), 5).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# k-means IVF against FROZEN centroids — the value-checkable gate form.
#
# Production IVF separates the quantizer's LIFECYCLE from the query: the
# centroids are trained once on a corpus sample (k-means||, seeded —
# tools/fit_kmeans_centroids.py, frozen into fixtures/ivf_centroids.json)
# and then broadcast for assignment of the full corpus.  With the
# centroids as literals, assignment + probing + exact-cosine ranking are
# all SQL — so this gate is DuckDB-value-checkable end-to-end, unlike the
# live iterative fit (ivf_kmeans_topk above, unit-pinned for recall).
# ---------------------------------------------------------------------------
def _load_centroid_fixture() -> dict:
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "ivf_centroids.json",
    )
    with open(path) as f:
        return json.load(f)


def _kmeans_fixture_sql(
    duck: bool, k: int = 3, query_limit: int = 200, n_probes: int = 2
) -> str:
    """Dual-dialect IVF query over the frozen centroid fixture.

    Assignment metric: Euclidean distance on L2-normalized vectors,
    d = |c|^2 - 2*(v.c)/|v| (the |v_hat|^2 = 1 term is constant per row
    and cannot change the argmin).  |c|^2 is precomputed in Python from
    the SAME literal values both engines parse, so it is one shared
    constant, not a cross-engine sum.  d rounds to 5 decimals with cid
    as tiebreak before the argmin/probe rank — the module-wide
    round-then-compare contract, so assignment can never diverge across
    engines on float fold order.

    Scale shape: ``cent`` is n_centroids rows — the cross join is a
    broadcast of the (tiny) frozen quantizer against the corpus scan,
    assignment is one narrow map, and candidates come from the same
    bucket equi-join as every IVF variant here (probes x bucket members,
    never all-pairs).
    """
    fx = _load_centroid_fixture()
    cent_rows = []
    for cid, c in enumerate(fx["centroids"]):
        cn2 = 0.0
        for x in c:
            cn2 += float(x) * float(x)
        arr = ", ".join(repr(float(x)) for x in c)
        arr = f"CAST([{arr}] AS DOUBLE[])" if duck else f"CAST(array({arr}) AS ARRAY<DOUBLE>)"
        cent_rows.append(f"SELECT {cid} AS cid, {arr} AS cvec, CAST({cn2!r} AS DOUBLE) AS cn2")
    cent = " UNION ALL ".join(cent_rows)
    if duck:
        emb_cast = "CAST(embedding AS DOUBLE[])"
        nrm = "sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))"
        adot = "list_inner_product(e.emb, c.cvec)"
        cos = "round(list_cosine_similarity(q.emb, n.emb), 5)"
    else:
        emb_cast = "embedding"
        nrm = _norm_expr_spark("embedding")
        adot = _dot_expr_spark("e.emb", "c.cvec")
        cos = f"round({_dot_expr_spark('q.emb', 'n.emb')} / (q.nrm * n.nrm), 5)"
    return f"""
    WITH cent AS ({cent}),
    e AS (SELECT vec_id, {emb_cast} AS emb, {nrm} AS nrm FROM embeddings),
    scored AS (
      SELECT e.vec_id, c.cid,
             round(c.cn2 - 2.0 * ({adot}) / e.nrm, 5) AS d
      FROM e CROSS JOIN cent c),
    rankedc AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS crn
      FROM scored),
    assigned AS (SELECT vec_id, cid AS bucket FROM rankedc WHERE crn = 1),
    probes AS (
      SELECT vec_id AS query_id, cid AS bucket
      FROM rankedc WHERE crn <= {n_probes} AND vec_id < {query_limit}),
    pairs AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, {cos} AS cos
      FROM probes p
      JOIN assigned a ON a.bucket = p.bucket AND a.vec_id != p.query_id
      JOIN e q ON q.vec_id = p.query_id
      JOIN e n ON n.vec_id = a.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM pairs)
    SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def ivf_kmeans_fixture_topk(
    spark: SparkSession, sf_dir: str, k: int = 3, query_limit: int = 200, n_probes: int = 2
) -> DataFrame:
    """IVF top-k against the frozen k-means quantizer (gate form)."""
    _emb(spark, sf_dir)
    return spark.sql(
        _kmeans_fixture_sql(duck=False, k=k, query_limit=query_limit, n_probes=n_probes)
    )


def ivf_kmeans_fixture_oracle(
    k: int = 3, query_limit: int = 200, n_probes: int = 2
) -> str:
    return _kmeans_fixture_sql(duck=True, k=k, query_limit=query_limit, n_probes=n_probes)


# ---------------------------------------------------------------------------
# IVF-PQ: product quantization with asymmetric distance computation — the
# billion-scale memory path (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011; the FAISS IVFPQ index shape).
#
# Each L2-normalized vector splits into M subvectors; each subspace has a
# frozen K-entry codebook (tools/fit_pq_codebooks.py — offline seeded
# Lloyd fit on the sf0.01 sample, same quantizer lifecycle as the k-means
# IVF gate).  A vector is stored as M small codes — 8 codes of 4 bits
# here vs 256 bytes of floats, a 64x memory/IO compression — and scored
# against a query WITHOUT touching its floats: the query precomputes a
# (M x K) lookup table of partial dots, and approx_cos(q, v) =
# sum_m LUT[m][code_m(v)] (ADC).
#
# Cross-engine determinism: every LUT partial dot is rounded to 5
# decimals and SCALED TO AN INTEGER (x 100000) before the per-pair sum —
# integer addition is order-independent, so the M-term fold can never
# diverge between Spark's and DuckDB's summation orders (the
# token_mi_topk float-sum boundary risk class, designed out here).
# Encode-side argmins use the module's round(d, 5)-then-tiebreak
# contract.
# ---------------------------------------------------------------------------
def _load_pq_fixture() -> dict:
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "pq_codebooks.json",
    )
    with open(path) as f:
        return json.load(f)


PQ_SCORE_SCALE = 100_000  # 5-decimal fixed point for the integer ADC sum


def _pq_codebook_cte(duck: bool) -> tuple[str, int, int, int]:
    """Literal codebook table ``cb(m, code, cvec, cn2)``; returns
    (cte_sql, M, SUB_DIM, K).  cn2 is precomputed in Python from the same
    literal floats both engines parse — one shared constant."""
    fx = _load_pq_fixture()
    sub_dim = fx["sub_dim"]
    rows = []
    for m, book in enumerate(fx["codebooks"]):
        for code, c in enumerate(book):
            cn2 = 0.0
            for x in c:
                cn2 += float(x) * float(x)
            arr = ", ".join(repr(float(x)) for x in c)
            arr = (
                f"CAST([{arr}] AS DOUBLE[])"
                if duck
                else f"CAST(array({arr}) AS ARRAY<DOUBLE>)"
            )
            rows.append(
                f"SELECT {m} AS m, {code} AS code, {arr} AS cvec, "
                f"CAST({cn2!r} AS DOUBLE) AS cn2"
            )
    return " UNION ALL ".join(rows), fx["m"], sub_dim, fx["k"]


def _pq_sub_dot(duck: bool, emb: str, sub_dim: int) -> str:
    """dot(subvector m of ``emb``, cb.cvec) — the subvector is sliced at
    runtime from the codebook row's m, so one cross join scores every
    subspace without M query copies."""
    if duck:
        return (
            f"list_inner_product("
            f"list_slice({emb}, cb.m * {sub_dim} + 1, (cb.m + 1) * {sub_dim}), cb.cvec)"
        )
    return _dot_expr_spark(f"slice({emb}, cb.m * {sub_dim} + 1, {sub_dim})", "cb.cvec")


# Argmin-as-integer-min: the (round(d, 5), code) ordering is packed into
# ONE sortable BIGINT key = (d_fixed_point + OFFSET) * K + code, so the
# per-(vector, subspace) argmin is a plain min() aggregation — partial +
# final merge with map-side combine, NO window shuffle (measured ~2x on
# the whole IVF-PQ query at sf0.1).  |d| <= |c|^2 + 2|v_sub||c|/|v| < 4,
# so the 5-decimal fixed point is < 4e5, far under the 2^24 offset.
_PQ_D_OFFSET = 1 << 24


def _pq_argmin_key(d_expr: str, k_codes: int) -> str:
    d_int = f"CAST(round(round({d_expr}, 5) * {PQ_SCORE_SCALE}, 0) AS BIGINT)"
    return f"(({d_int} + {_PQ_D_OFFSET}) * {k_codes} + cb.code)"


def _pq_encode_sql(duck: bool) -> str:
    """``(vec_id, m, code)`` long-format PQ encoding of the corpus.

    Assignment per (vector, subspace): argmin over the K codebook rows of
    d = |c|^2 - 2*(v_sub . c)/|v| (the |v_sub/|v||^2 term is constant per
    (vector, m) and cannot change the argmin), d rounded to 5 with code
    as tiebreak — the same metric/contract as the k-means fixture gate,
    packed into an integer min() (see ``_pq_argmin_key``).

    Scale shape: corpus scan CROSS JOIN the M*K-row literal codebook
    (broadcast by size), map-side-combined min() per (vec_id, m).
    Output is M small ints per vector — the compressed index a
    production deployment would persist instead of the floats.
    """
    cb, m_total, sub_dim, k_codes = _pq_codebook_cte(duck)
    if duck:
        emb_cast = "CAST(embedding AS DOUBLE[])"
        nrm = "sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))"
    else:
        emb_cast = "embedding"
        nrm = _norm_expr_spark("embedding")
    sdot = _pq_sub_dot(duck, "e.emb", sub_dim)
    key = _pq_argmin_key(f"cb.cn2 - 2.0 * ({sdot}) / e.nrm", k_codes)
    return f"""
    WITH cb AS ({cb}),
    e AS (SELECT vec_id, {emb_cast} AS emb, {nrm} AS nrm FROM embeddings),
    scored AS (
      SELECT e.vec_id, cb.m, {key} AS key
      FROM e CROSS JOIN cb)
    SELECT vec_id, m, CAST(min(key) % {k_codes} AS INT) AS code
    FROM scored GROUP BY vec_id, m
    """


def _emb_spread(spark: SparkSession, sf_dir: str) -> None:
    """Register ``embeddings`` with a starved-scan spread (guide §2.5) —
    for the PQ queries ONLY, whose codes CTE evaluates M×K interpreted
    HOF dots per row in the scan stage (measured 2.2-2.6 s single-task
    at sf0.1, 3.6 s query → parallelized).  Their outputs are
    partition-independent: codes are per-row argmins over constants,
    scores are exact integer sums, ranks break ties on neighbor_id.
    NOT for label_centroids (order-sensitive float avg) or the live
    k-means fit (float treeAggregate)."""
    from flink_infotheoretic_feature_selection_spark.session import spread_starved_scan

    spread_starved_scan(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        cache_key=f"{sf_dir}/embeddings.parquet",
    ).createOrReplaceTempView("embeddings")


# Corpus row count above which the PQ codes stage routes through the
# inline-constant expressions (with_pq_codes) instead of the HOF
# codebook-CTE SQL (r13, VERDICT r12 ask #7).  Regime A/B, committed in
# OPTIMIZATION_r13.md: at 1M vectors the CTE's per-row interpreted
# M×K HOF dots cost 36.5 s vs 6.9 s inline (5.3×, outputs exactly equal
# by count + integer checksum); at 2k vectors the inline route's ~1-2 s
# constant plan/codegen cost makes it a wash-to-slightly-slower
# (2.38 vs 2.58 s).  Crossover is ~30-60k rows; 100k keeps margin.  The
# two routes are bit-equal (with_pq_codes is unit-pinned to the codes
# CTE), so this is purely a cost decision.
PQ_CODES_INLINE_MIN_ROWS = 100_000

# footer row counts per embeddings path (immutable fixture inputs; same
# staleness contract as session.spread_starved_scan's cache_key)
_EMB_ROWS_CACHE: dict[str, int] = {}


def _embeddings_row_count(sf_dir: str) -> int:
    """Total row count of ``{sf_dir}/embeddings.parquet`` from parquet
    FOOTERS only — a driver-side O(files) metadata read, no data scan."""
    path = f"{sf_dir}/embeddings.parquet"
    n = _EMB_ROWS_CACHE.get(path)
    if n is None:
        import pyarrow.parquet as pq_mod

        from flink_infotheoretic_feature_selection_spark.operators.packed import (
            list_parquet_files,
        )

        n = sum(
            pq_mod.ParquetFile(f).metadata.num_rows
            for f in list_parquet_files(path)
        )
        _EMB_ROWS_CACHE[path] = n
    return n


def _pq_codes_inline_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(vec_id, m, code)`` via the inline-constant expression route —
    bit-equal to the codes CTE (unit-pinned; the argmin keys are the
    same ``_pq_argmin_key`` packing with the same left-assoc dot
    accumulation), unpivoted to the gate's long layout."""
    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.session import spread_starved_scan

    fx = _load_pq_fixture()
    m_total = fx["m"]
    emb = spread_starved_scan(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        cache_key=f"{sf_dir}/embeddings.parquet",
    )
    wide = with_pq_codes(emb)
    stack = ", ".join(f"{m}, c{m}" for m in range(m_total))
    return wide.selectExpr(
        "vec_id", f"stack({m_total}, {stack}) as (m, code)"
    ).select("vec_id", "m", F.col("code").cast("int").alias("code"))


def pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encode the corpus against the frozen codebooks (gate form).

    Auto-routes the codes computation on corpus size (footer row count):
    the HOF codebook-CTE SQL below ``PQ_CODES_INLINE_MIN_ROWS``, the
    inline-constant expression route above it — identical (vec_id, m,
    code) rows either way (pinned by test)."""
    if _embeddings_row_count(sf_dir) >= PQ_CODES_INLINE_MIN_ROWS:
        return _pq_codes_inline_df(spark, sf_dir)
    _emb_spread(spark, sf_dir)
    return spark.sql(_pq_encode_sql(duck=False))


def pq_encode_oracle() -> str:
    return _pq_encode_sql(duck=True)


def _ann_ivf_pq_sql(
    duck: bool, k: int, query_limit: int, codes_view: str | None = None
) -> str:
    """IVF-PQ approximate top-k, one statement, both dialects.

    Plan shape at 100 TB: candidates come from the sign-grid multiprobe
    bucket equi-join (probes x bucket members, never all-pairs); each
    candidate is scored by joining its M CODES against the query's
    broadcast-sized LUT (queries x M x K integer rows) and summing M
    integers — the corpus FLOATS are never touched after the one encode
    pass, which is the entire point of PQ (64x less IO on the scoring
    path).  The integer sum makes the score independent of engine
    summation order; ranking is (score desc, neighbor_id) on exact ints.
    """
    cb, m_total, sub_dim, k_codes = _pq_codebook_cte(duck)
    if duck:
        emb_cast = "CAST(embedding AS DOUBLE[])"
        nrm = "sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))"
        bucket = _bucket_expr("embedding", duck=True)
    else:
        emb_cast = "embedding"
        nrm = _norm_expr_spark("embedding")
        bucket = _bucket_expr("embedding", duck=False)
    probe = _probe_list("bucket", N_SIGN_BITS, duck)
    sdot_e = _pq_sub_dot(duck, "e.emb", sub_dim)
    sdot_q = _pq_sub_dot(duck, "qq.emb", sub_dim)
    key = _pq_argmin_key(f"cb.cn2 - 2.0 * ({sdot_e}) / e.nrm", k_codes)
    # r13 auto-route: at large corpus sizes the caller precomputes the
    # codes via the bit-equal inline expression route and passes them in
    # as a view — the CTE body is then a plain reference (Spark only;
    # the DuckDB oracle always takes the CTE, duck callers never pass a
    # view).
    codes_body = (
        f"SELECT vec_id, m, code FROM {codes_view}"
        if codes_view
        else f"""SELECT vec_id, m, CAST(min(key) % {k_codes} AS INT) AS code FROM (
        SELECT e.vec_id, cb.m, {key} AS key
        FROM e CROSS JOIN cb) s GROUP BY vec_id, m"""
    )
    return f"""
    WITH cb AS ({cb}),
    e AS (SELECT vec_id, {emb_cast} AS emb, {nrm} AS nrm, {bucket} AS bucket
          FROM embeddings),
    codes AS (
      {codes_body}),
    lut AS (
      SELECT qq.vec_id AS query_id, cb.m, cb.code,
             CAST(round(round(({sdot_q}) / qq.nrm, 5) * {PQ_SCORE_SCALE}, 0) AS BIGINT)
               AS pdot
      FROM e qq CROSS JOIN cb WHERE qq.vec_id < {query_limit}),
    q AS (SELECT vec_id AS query_id, {probe} AS probe
          FROM e WHERE vec_id < {query_limit}),
    cand AS (
      SELECT q.query_id, c.vec_id AS neighbor_id
      FROM q JOIN e c ON c.bucket = q.probe AND c.vec_id != q.query_id),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id, sum(l.pdot) AS iscore
      FROM cand
      JOIN codes ON codes.vec_id = cand.neighbor_id
      JOIN lut l ON l.query_id = cand.query_id
                AND l.m = codes.m AND l.code = codes.code
      GROUP BY cand.query_id, cand.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, iscore,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY iscore DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id,
           CAST(iscore AS DOUBLE) / {PQ_SCORE_SCALE} AS approx_cos,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def ann_ivf_pq_topk(
    spark: SparkSession, sf_dir: str, k: int = 3, query_limit: int = 200
) -> DataFrame:
    """IVF-PQ approximate top-k against the frozen codebooks.

    Same codes auto-route as :func:`pq_encode`: above
    ``PQ_CODES_INLINE_MIN_ROWS`` the codes CTE is fed by the bit-equal
    inline expression route (5.3× at 1M vectors — the interpreted M×K
    HOF dots per row dominate the query there), below it the SQL CTE
    stays (the DuckDB-parity form, cheaper at small scale)."""
    _emb_spread(spark, sf_dir)
    codes_view = None
    if _embeddings_row_count(sf_dir) >= PQ_CODES_INLINE_MIN_ROWS:
        codes_view = "__pq_codes_inline"
        _pq_codes_inline_df(spark, sf_dir).createOrReplaceTempView(codes_view)
    return spark.sql(
        _ann_ivf_pq_sql(duck=False, k=k, query_limit=query_limit, codes_view=codes_view)
    )


def ann_ivf_pq_vectorized(
    spark: SparkSession, sf_dir: str, k: int = 3, query_limit: int = 200
) -> DataFrame:
    """Arrow-vectorized IVF-PQ twin — BIT-IDENTICAL rows to
    :func:`ann_ivf_pq_topk`, unlike the float matmul twins: every
    ingredient is exact.

    The SQL route's scoring joins each candidate's M codes against the
    LUT row-at-a-time — measured 54 s at 1M vectors (~25M candidates ×
    M joins) where this runs the same arithmetic as a NumPy LUT gather.
    Exactness argument: the LUT's fixed-point integers are computed by
    the SAME JVM SQL expressions the gate uses (tiny queries × M × K
    collect — the one driver collect, bounded by ``query_limit``);
    candidate codes come from :func:`pq_corpus_index`
    (:func:`with_pq_codes` is unit-pinned bit-equal to the gate's codes
    CTE); and the per-candidate score is a SUM OF INTEGERS — exact in
    any summation order, so the gather can never diverge the way a
    float matmul can.  Per-batch local top-k truncation is lossless
    (kept in the global (iscore desc, neighbor_id) order — the
    :func:`cosine_topk` argument).

    Scale shape: corpus index scanned once via ``mapInPandas`` with the
    broadcast LUT + probe map; no join, no shuffle until the tiny
    candidate merge window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    _emb(spark, sf_dir)
    fx = _load_pq_fixture()
    m_total, sub_dim, k_codes = fx["m"], fx["sub_dim"], fx["k"]
    cb, _, _, _ = _pq_codebook_cte(duck=False)
    sdot_q = _pq_sub_dot(duck=False, emb="qq.emb", sub_dim=sub_dim)
    lut_rows = spark.sql(
        f"""
        WITH cb AS ({cb}),
        e AS (SELECT vec_id, embedding AS emb,
                     {_norm_expr_spark('embedding')} AS nrm,
                     {_bucket_expr('embedding', duck=False)} AS bucket
              FROM embeddings)
        SELECT qq.vec_id AS query_id, qq.bucket, cb.m, cb.code,
               CAST(round(round(({sdot_q}) / qq.nrm, 5) * {PQ_SCORE_SCALE}, 0)
                 AS BIGINT) AS pdot
        FROM e qq CROSS JOIN cb WHERE qq.vec_id < {query_limit}
        """
    ).collect()
    if not lut_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, approx_cos double, rank integer"
        )
    qids = sorted({r["query_id"] for r in lut_rows})
    q_idx = {q: i for i, q in enumerate(qids)}
    lut = np.zeros((len(qids), m_total, k_codes), dtype=np.int64)
    q_bucket = {}
    for r in lut_rows:
        lut[q_idx[r["query_id"]], r["m"], r["code"]] = r["pdot"]
        q_bucket[r["query_id"]] = r["bucket"]
    probe_map: dict[int, list[int]] = {}
    for q, b in q_bucket.items():
        for p in [b] + [b ^ (1 << i) for i in range(N_SIGN_BITS)]:
            probe_map.setdefault(int(p), []).append(q_idx[q])
    qid_arr = np.asarray(qids, dtype=np.int64)
    bc = spark.sparkContext.broadcast((lut, probe_map, qid_arr))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lut_, pmap, qarr = bc.value
        marange = np.arange(m_total)
        for pdf in batches:
            buckets = pdf["bucket"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            codes = np.stack(
                [pdf[f"c{m}"].to_numpy() for m in range(m_total)], axis=1
            )
            rows = []
            for b in np.unique(buckets):
                qs = pmap.get(int(b))
                if not qs:
                    continue
                sel = buckets == b
                v, c = vids[sel], codes[sel]
                qi_arr = np.asarray(qs)
                # (nq_b, nsel) integer score block in m_total gathers —
                # vectorized across the bucket's probing queries, not a
                # per-query Python loop (the first cut looped and spent
                # 40 of 43 s in interpreter dispatch at 1M vectors)
                s = np.zeros((len(qi_arr), len(v)), dtype=np.int64)
                for m in range(m_total):
                    s += lut_[qi_arr[:, None], m, c[None, :, m]]
                for row in range(len(qi_arr)):
                    qid = qarr[qi_arr[row]]
                    mask = v != qid
                    vm, sm = v[mask], s[row][mask]
                    order = np.lexsort((vm, -sm))[: min(k, len(vm))]
                    rows.extend((int(qid), int(vm[j]), int(sm[j])) for j in order)
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "iscore"]
            ).astype({"query_id": "int64", "neighbor_id": "int64", "iscore": "int64"})

    cand = pq_corpus_index(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ).mapInPandas(score, "query_id long, neighbor_id long, iscore long")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("iscore"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            (F.col("iscore").cast("double") / PQ_SCORE_SCALE).alias("approx_cos"),
            "rank",
        )
    )


def ann_ivf_pq_oracle(k: int = 3, query_limit: int = 200) -> str:
    return _ann_ivf_pq_sql(duck=True, k=k, query_limit=query_limit)


def with_pq_codes(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Append the PQ code of every subspace as COLUMNS ``c0..c{M-1}`` —
    the expression form of :func:`pq_encode`'s CTE stages.

    Pure stateless projections (the argmin over the K frozen centroids
    is ``least()`` over K inline integer keys, the same
    ``_pq_argmin_key`` packing the SQL route min()s), so unlike the
    batch SQL — whose codebook CROSS JOIN + groupBy would be a STATEFUL
    aggregation on a stream — this composes with arbitrary DataFrames
    including Structured Streaming ones in append mode.  A unit test
    pins bit-equality with the SQL route's (vec_id, m, code) output.
    """
    from pyspark.sql import functions as F

    fx = _load_pq_fixture()
    sub_dim, k_codes = fx["sub_dim"], fx["k"]
    # The norm STAYS the HOF fold: an inline 64-term sum was measured
    # 4x SLOWER overall — CollapseProject inlines the __nrm alias into
    # all M x K key expressions, so the "faster" inline form gets
    # evaluated 128x per row where the single fold is one interpreted
    # eval (negative result, kept so nobody retries it).
    nrm = _norm_expr_spark(emb_col)
    out = df.withColumn("__nrm", F.expr(nrm))
    for m, book in enumerate(fx["codebooks"]):
        keys = []
        for code, c in enumerate(book):
            cn2 = 0.0
            for x in c:
                cn2 += float(x) * float(x)
            # INLINE codegen dot, not the aggregate(zip_with(...)) fold:
            # a higher-order expression is CodegenFallback, and M×K of
            # them per row dominated the 1M-vector index build (~35 of
            # 43 s).  Subspace positions and centroid components are
            # compile-time constants, so the dot is a flat multiply-add
            # chain — and the leading `0.0 +` makes its left-assoc
            # accumulation ((0.0+t0)+t1)... IDENTICAL to the fold's,
            # keeping the codes bit-equal to the SQL route (unit-pinned).
            dot = "0.0D + " + " + ".join(
                f"CAST({emb_col}[{m * sub_dim + j}] AS DOUBLE) * {float(x)!r}D"
                for j, x in enumerate(c)
            )
            d_int = (
                f"CAST(round(round({cn2!r}D - 2.0D * ({dot}) / __nrm, 5) "
                f"* {PQ_SCORE_SCALE}, 0) AS BIGINT)"
            )
            keys.append(f"(({d_int} + {_PQ_D_OFFSET}) * {k_codes} + {code})")
        out = out.withColumn(
            f"c{m}", F.expr(f"CAST(least({', '.join(keys)}) % {k_codes} AS INT)")
        )
    return out.drop("__nrm")


def pq_corpus_index(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """``(vec_id, bucket, c0..c{M-1})`` — the compact ANN index a
    deployment persists instead of the floats: sign-grid bucket for
    candidate generation plus PQ codes for scoring.  Built entirely from
    stateless column expressions (:func:`with_pq_codes`), so it also
    serves as the static side of stream-static ANN joins."""
    from pyspark.sql import functions as F

    fx = _load_pq_fixture()
    return with_pq_codes(df, emb_col).select(
        "vec_id",
        F.expr(_bucket_expr(emb_col, duck=False)).alias("bucket"),
        *[f"c{m}" for m in range(fx["m"])],
    )


def pq_adc_score_terms(
    q_emb: str = "q_emb", q_nrm: str = "q_nrm"
) -> tuple[str, int]:
    """Spark SQL expression summing the integer ADC terms for a row that
    carries a query embedding (``q_emb``, ``q_nrm``) and a candidate's
    PQ codes (``c0..c{M-1}``): term_m = the same 5-decimal fixed-point
    integer the batch gate's LUT carries, so stream-side scores are
    BIT-IDENTICAL to :func:`ann_ivf_pq_topk`'s iscore.  Returns
    (sum_expr, scale)."""
    fx = _load_pq_fixture()
    sub_dim = fx["sub_dim"]
    terms = []
    for m, book in enumerate(fx["codebooks"]):
        books_lit = "array(" + ", ".join(
            f"CAST(array({', '.join(repr(float(x)) for x in c)}) AS ARRAY<DOUBLE>)"
            for c in book
        ) + ")"
        sub = f"slice({q_emb}, {m * sub_dim + 1}, {sub_dim})"
        # try_element_at: a NULL code (e.g. a stream row with a NULL
        # embedding) must yield a NULL score — plain element_at under
        # Spark 4.1 ANSI silently returns the LAST codebook entry for a
        # NULL index (see sources/keel.py write_keel note)
        dot = _dot_expr_spark(sub, f"try_element_at({books_lit}, c{m} + 1)")
        terms.append(
            f"CAST(round(round(({dot}) / {q_nrm}, 5) * {PQ_SCORE_SCALE}, 0) AS BIGINT)"
        )
    return " + ".join(terms), PQ_SCORE_SCALE


# ---------------------------------------------------------------------------
# Semantic decontamination (embedding-level benchmark overlap)
# ---------------------------------------------------------------------------
SEMANTIC_DECON_EVAL_PRED = "vec_id % 20 = 0"


def _semantic_decon_sql(
    duck: bool, threshold: float, eval_pred: str = SEMANTIC_DECON_EVAL_PRED
) -> str:
    """Training vectors semantically overlapping the eval/benchmark set:
    one row per (train vector, eval vector) pair with round-5 cosine ≥
    ``threshold``, candidates from the eval side's Hamming-1 multiprobe
    over the sign grid.

    The embedding-level complement of the n-gram :func:`~.dedup
    .decontaminate`: paraphrased or reformatted benchmark material
    keeps no shingle overlap but keeps its embedding neighborhood —
    the standard second pass of a production contamination check.

    Scale shape: the eval side is a benchmark (bounded), the training
    corpus is touched only through the bucket equi-join — eval explodes
    onto its probes, train vectors sit in their one bucket each, so no
    pair is generated twice and nothing is all-pairs.  Probes are the
    recall dial; the threshold applies to the ROUNDED cosine on both
    engines (module invariant).
    """
    if duck:
        bucket = _bucket_expr("embedding", duck=True)
        cos = "round(list_cosine_similarity(t.emb, ev.emb), 5)"
        emb_cast = "CAST(embedding AS DOUBLE[])"
        nrm = "CAST(1 AS DOUBLE)"  # unused on the duck side
    else:
        bucket = _bucket_expr("embedding", duck=False)
        dot = _dot_expr_spark("t.emb", "ev.emb")
        cos = f"round({dot} / (t.nrm * ev.nrm), 5)"
        emb_cast = "embedding"
        nrm = _norm_expr_spark("embedding")
    probe = _probe_list("bucket", N_SIGN_BITS, duck)
    return f"""
    WITH e AS (SELECT vec_id, {emb_cast} AS emb, {nrm} AS nrm, {bucket} AS bucket
               FROM embeddings),
    ev AS (SELECT vec_id, emb, nrm, {probe} AS probe
           FROM e WHERE {eval_pred}),
    t AS (SELECT * FROM e WHERE NOT ({eval_pred}))
    SELECT t.vec_id, ev.vec_id AS eval_id, {cos} AS cos
    FROM ev JOIN t ON t.bucket = ev.probe
    WHERE {cos} >= {threshold}
    """


def semantic_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.35,
    eval_pred: str = SEMANTIC_DECON_EVAL_PRED,
) -> DataFrame:
    """Embedding-level contamination flags (train × eval, cos ≥ t)."""
    _emb(spark, sf_dir)
    return spark.sql(
        _semantic_decon_sql(duck=False, threshold=threshold, eval_pred=eval_pred)
    )


def semantic_decontaminate_oracle(
    threshold: float = 0.35, eval_pred: str = SEMANTIC_DECON_EVAL_PRED
) -> str:
    return _semantic_decon_sql(duck=True, threshold=threshold, eval_pred=eval_pred)


def semantic_decontaminate_vectorized(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.35,
    eval_pred: str = SEMANTIC_DECON_EVAL_PRED,
) -> DataFrame:
    """Cogroup-matmul twin of :func:`semantic_decontaminate` — same
    probe geometry, per-bucket NumPy cosine block instead of the
    per-pair interpreted fold.

    Exists because the eval side is only "bounded" operationally: the
    gate's ``vec_id % 20`` predicate scales WITH the corpus, and at a
    200k-vector fixture the SQL route's ~220M interpreted folds ran
    107 s where this runs the identical candidate set as bucket
    matmuls.  Same perf-twin contract as
    :func:`ivf_multiprobe_vectorized`: float matmul summation order
    differs from the SQL fold, so round-5 boundary pairs could differ —
    equivalence unit-pinned on the fixtures, the SQL route stays the
    gated form."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    bucket = _bucket_expr("embedding", duck=False)
    # SEPARATE scan for the corpus side, not a second branch of `emb`:
    # a self-cogroup shares attribute ids across both children, and when
    # nothing downstream reads the UDF output (a bare count) the
    # optimizer binds the corpus side's `embedding` to the EVAL child's
    # identically-numbered attribute and prunes it from the corpus
    # projection entirely — the kernel then KeyErrors on a frame of
    # [bucket, vec_id].  A fresh read gets fresh exprIds, making the
    # two children's columns un-conflatable.  (The multiprobe twin is
    # not exposed: its downstream window reads the UDF output, which
    # keeps the pruning honest.)  Regression-pinned by a bare-count
    # unit test.
    corpus = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(f"NOT ({eval_pred})")
        .selectExpr("vec_id", "embedding", f"{bucket} AS bucket")
    )
    probe = _probe_list(f"({bucket})", N_SIGN_BITS, duck=False)
    evals = emb.where(eval_pred).selectExpr(
        "vec_id AS eval_id", "embedding", f"{probe} AS bucket"
    )

    def block(epdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
        if epdf.empty or tpdf.empty:
            return pd.DataFrame({"vec_id": [], "eval_id": [], "cos": []}).astype(
                {"vec_id": "int64", "eval_id": "int64", "cos": "float64"}
            )
        em = np.stack(epdf["embedding"].to_numpy()).astype(np.float64)
        tm = np.stack(tpdf["embedding"].to_numpy()).astype(np.float64)
        em /= np.linalg.norm(em, axis=1, keepdims=True)
        tm /= np.linalg.norm(tm, axis=1, keepdims=True)
        sims = np.round(em @ tm.T, 5)
        eids = epdf["eval_id"].to_numpy()
        tids = tpdf["vec_id"].to_numpy()
        ei, ti = np.nonzero(sims >= threshold)
        return pd.DataFrame(
            {
                "vec_id": tids[ti].astype("int64"),
                "eval_id": eids[ei].astype("int64"),
                "cos": sims[ei, ti].astype("float64"),
            }
        )

    return (
        evals.groupBy("bucket")
        .cogroup(corpus.groupBy("bucket"))
        .applyInPandas(block, "vec_id long, eval_id long, cos double")
    )
