"""The composed LLM training-data pipeline, end to end, as ONE statement:

    clean (quality + language + repetition + exact-dedup)
      → decontaminate (drop docs sharing a trigram with the eval split)
      → pack (token-budget training sequences)

Each stage is gated individually elsewhere; this query proves the stages
compose — same fragments, one verifiable result.

Plan shape (Spark): the clean stage is one scan + one window shuffle
(per-row stats fused into the dedup window's projection); the
contamination check is a shingle equi-join against the (small) eval
side — AQE broadcasts it; packing is one shuffle on the hash-shard key.
CTE inlining re-derives the clean set for the shingle branch rather than
re-using a materialization — at production scale you'd persist the clean
set between stages (as `corpus_clean` consumers do); the single
statement exists to make the composition oracle-verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_infotheoretic_feature_selection_spark.operators.dedup import (
    DECONTAMINATE_EVAL_PRED,
    _shingles_cte,
)
from flink_infotheoretic_feature_selection_spark.operators.text import (
    CORPUS_CLEAN_LANG,
    CORPUS_CLEAN_MIN_QUALITY,
    PACK_BUDGET,
    PACK_SHARDS,
    REPETITION_MAX_DUP_FRAC,
    _lang_case,
    _stats_select,
    pack_tail_sql,
    dup_frac_expr,
    rolling_hash_expr_duckdb,
    rolling_hash_expr_spark,
)

__all__ = [
    "pipeline_clean_pack",
    "pipeline_oracle",
    "pipeline_curate_split",
    "pipeline_curate_split_oracle",
]


def _clean_sql(duck: bool) -> str:
    """Stage 1: quality/language/repetition filters + exact dedup →
    ``(doc_id, text, n_tokens)``.  A standalone statement so the Spark
    side can MATERIALIZE it at the stage boundary."""
    return f"""
    WITH enriched AS (
      SELECT {_stats_select(duck)},
             text,
             {_lang_case(duck)} AS lang_pred,
             {dup_frac_expr(duck)} AS dup_frac,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
      FROM documents
    )
    SELECT doc_id, text, n_tokens
    FROM enriched
    WHERE doc_id = keep_id
      AND quality_score >= {CORPUS_CLEAN_MIN_QUALITY}
      AND lang_pred = '{CORPUS_CLEAN_LANG}'
      AND dup_frac <= {REPETITION_MAX_DUP_FRAC}
      AND NOT ({DECONTAMINATE_EVAL_PRED})
    """


def _tail_ctes(duck: bool, clean_table: str) -> str:
    """Stages 2+3 (decontaminate → pack) as a CTE list + final SELECT,
    reading the clean set from ``clean_table``."""
    rh = (
        rolling_hash_expr_duckdb("lower(trim(text))")
        if duck
        else rolling_hash_expr_spark("lower(trim(text))")
    )
    return f"""
    eval_docs AS (SELECT doc_id, text FROM documents WHERE {DECONTAMINATE_EVAL_PRED}),
    {_shingles_cte(duck, table="eval_docs", prefix="ev_")},
    eval_sh AS (SELECT DISTINCT shingle FROM ev_sh),
    {_shingles_cte(duck, table=clean_table, prefix="cl_")},
    contaminated AS (
      SELECT DISTINCT cl_sh.doc_id FROM cl_sh JOIN eval_sh USING (shingle)
    ),
    kept AS (
      SELECT doc_id, n_tokens, {rh} % {PACK_SHARDS} AS shard
      FROM {clean_table}
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    {pack_tail_sql("kept", with_tok_before=False)}
    """


def _pipeline_sql(duck: bool) -> str:
    return f"WITH clean AS ({_clean_sql(duck)}),\n{_tail_ctes(duck, 'clean')}"


def pipeline_clean_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean → decontaminate → pack over the documents table.

    The Spark side MATERIALIZES the clean set at the stage boundary
    (``localCheckpoint`` — the in-session analogue of the parquet persist
    a 100 TB deployment would use between stages): Catalyst inlines CTEs,
    so the downstream shingle branch + rolling-hash branch + anti-join
    re-derive the whole stats/window stage per reference — measured 4.4×
    on a stats-heavy corpus (5.2 s inline vs 1.2 s materialized on the
    extreme-length corpus of tests/test_random_corpus_gate_sweep.py; a
    wash at sf0.01 where the stats are cheap).  The same corpus also
    exposed the far larger quadratic in the gram builders themselves
    (62.8 s before the zip_with rewrite at text._grams_expr /
    dedup.shingle_grams_expr — see those docstrings).  The DuckDB oracle
    stays one statement (single-evaluation semantics are the oracle's
    problem, not the contract's)."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    clean = spark.sql(_clean_sql(duck=False)).localCheckpoint(eager=True)
    clean.createOrReplaceTempView("__pipeline_clean_mat")
    return spark.sql(f"WITH {_tail_ctes(False, '__pipeline_clean_mat')}")


def pipeline_oracle() -> str:
    return _pipeline_sql(duck=True)


def _curate_split_sql(duck: bool) -> str:
    """quantile-filter → hash-split → mixture-upsample(train), composed.

    The split assignment and the mixture's fractional draw BOTH need a
    uniform hash in [0,100) — but using the SAME bucket would correlate
    them (every upsampled doc would also sit in the low-bucket corner of
    the train split).  The mixture draw therefore uses the NEXT two
    digits of the same rolling hash (``(h DIV 100) % 100``), an
    independent stream from one hash computation.
    """
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        QUANTILE_KEEP,
        _lang_case,
        _quality_expr,
        copy_explode_expr,
        mixture_copies_case,
        split_case,
    )

    rh = (
        rolling_hash_expr_duckdb("lower(trim(text))")
        if duck
        else rolling_hash_expr_spark("lower(trim(text))")
    )
    idiv = "//" if duck else "DIV"
    return f"""
    WITH scored AS (
      SELECT doc_id, source,
             {_lang_case(duck)} AS lang_pred,
             {_quality_expr(duck)} AS quality_score,
             {rh} AS h
      FROM documents),
    ranked AS (
      SELECT doc_id, source, h,
             percent_rank() OVER (PARTITION BY lang_pred
                                  ORDER BY quality_score DESC, doc_id) AS pr
      FROM scored),
    kept AS (
      SELECT doc_id, source, h % 100 AS bucket, (h {idiv} 100) % 100 AS bucket2
      FROM ranked WHERE pr <= {QUANTILE_KEEP}),
    splits AS (
      SELECT doc_id, source, bucket2,
             {split_case()} AS split
      FROM kept),
    counted AS (
      SELECT doc_id, source, split,
             CASE WHEN split <> 'train' THEN 1
                  ELSE {mixture_copies_case("bucket2")}
             END AS n_copies
      FROM splits)
    SELECT doc_id, source, split, CAST(copy AS INT) AS copy
    FROM (SELECT doc_id, source, split, {copy_explode_expr(duck)} AS copy
          FROM counted WHERE n_copies >= 1)
    """


def pipeline_curate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation: per-language quality-quantile filter →
    content-hash train/val/test split → per-source mixture upsampling of
    the train split (val/test never duplicated).  One statement; the
    only shuffle is the quantile window's exchange on lang_pred —
    everything downstream is narrow."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_curate_split_sql(duck=False))


def pipeline_curate_split_oracle() -> str:
    return _curate_split_sql(duck=True)
