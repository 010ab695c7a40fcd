"""Text-analysis operators for LLM training-data pipelines (SURVEY.md §7.4/M7).

All hot paths are JVM-side Spark SQL expressions (no Python UDFs): tokenize,
token statistics, quality scoring, language-ID heuristic, and a document
fingerprint (polynomial rolling hash via ``aggregate`` over characters).

Every operator has a DuckDB-portable twin used by the correctness oracle —
the generator functions below emit both dialects from one definition, so
the semantics cannot drift.

Scale: narrow per-row maps over the documents scan; no shuffle, no UDF,
fully whole-stage-codegen.  At 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "text_stats",
    "lang_id",
    "fingerprint",
    "corpus_clean",
    "TEXT_STATS_ORACLE",
    "LANG_ID_ORACLE",
    "FINGERPRINT_ORACLE",
    "CORPUS_CLEAN_ORACLE",
]

STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is")
_LANG_WORDS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "los", "y", "es"),
    "fr": ("le", "les", "et", "est"),
}

# ---------------------------------------------------------------------------
# Shared SQL fragments (valid in both Spark SQL and DuckDB unless noted)
# ---------------------------------------------------------------------------
_TOKENS = r"split(trim(text), '\\s+')"  # spark
_TOKENS_DUCK = r"string_split_regex(trim(text), '\s+')"
_WORDS = r"regexp_extract_all(lower(text), '[a-z]+', 0)"  # spark needs group idx
_WORDS_DUCK = r"regexp_extract_all(lower(text), '[a-z]+')"
_BPE = r"regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]', 0)"
_BPE_DUCK = r"regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')"


def _stats_select(duck: bool) -> str:
    tokens = _TOKENS_DUCK if duck else _TOKENS
    words = _WORDS_DUCK if duck else _WORDS
    bpe = _BPE_DUCK if duck else _BPE
    size = "len" if duck else "size"
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    stop_filter = f"{size}(filter({tokens}, t -> t IN ({stop_list})))" if not duck else (
        f"len(list_filter({tokens}, t -> t IN ({stop_list})))"
    )
    return f"""
      doc_id,
      length(text) AS n_chars,
      {size}({tokens}) AS n_tokens,
      {size}({words}) AS n_words,
      {size}({bpe}) AS n_bpe_tokens,
      round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / {size}({tokens}), 5) AS avg_token_len,
      round(CAST({stop_filter} AS DOUBLE) / {size}({tokens}), 5) AS stopword_ratio,
      round(least(CAST(1.0 AS DOUBLE), {size}({tokens}) / CAST(97.0 AS DOUBLE))
            * (CAST(0.5 AS DOUBLE)
               + CAST(0.5 AS DOUBLE) * least(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                                  / {size}({tokens}) / CAST(7.3 AS DOUBLE),
                                  CAST(1.0 AS DOUBLE))), 5) AS quality_score
    """


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts, stopword ratio and quality score."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(f"SELECT {_stats_select(duck=False)} FROM documents")


TEXT_STATS_ORACLE = f"SELECT {_stats_select(duck=True)} FROM documents"


def _lang_case(duck: bool) -> str:
    """Just the language-ID CASE expression (no doc_id, no alias)."""
    tokens = _TOKENS_DUCK if duck else _TOKENS
    size = "len" if duck else "size"
    flt = "list_filter" if duck else "filter"
    hits = {
        lang: f"{size}({flt}({tokens}, t -> t IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in _LANG_WORDS.items()
    }
    return f"""CASE
        WHEN {hits['en']} = 0 AND {hits['es']} = 0 AND {hits['fr']} = 0 THEN 'und'
        WHEN {hits['en']} >= {hits['es']} AND {hits['en']} >= {hits['fr']} THEN 'en'
        WHEN {hits['es']} >= {hits['fr']} THEN 'es'
        ELSE 'fr'
      END"""


def _lang_select(duck: bool) -> str:
    return f"""
      doc_id,
      {_lang_case(duck)} AS lang_pred
    """


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic (n-gram-free, deterministic)."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(f"SELECT {_lang_select(duck=False)} FROM documents")


LANG_ID_ORACLE = f"SELECT {_lang_select(duck=True)} FROM documents"


ROLLING_MOD = 1_000_000_007
ROLLING_MULT = 31


def rolling_hash_expr_spark(text_expr: str) -> str:
    """Polynomial rolling hash over characters, JVM-side via aggregate()."""
    return (
        f"aggregate(split({text_expr}, ''), CAST(0 AS BIGINT), "
        f"(acc, c) -> (acc * {ROLLING_MULT} + CAST(coalesce(ascii(c), 0) AS BIGINT)) % {ROLLING_MOD})"
    )


def rolling_hash_expr_duckdb(text_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(regexp_split_to_array({text_expr}, ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc * {ROLLING_MULT} + x) % {ROLLING_MOD})"
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint (rolling hash of lower(trim(text)))."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(
        f"SELECT doc_id, {rolling_hash_expr_spark('lower(trim(text))')} AS fp FROM documents"
    )


FINGERPRINT_ORACLE = (
    f"SELECT doc_id, {rolling_hash_expr_duckdb('lower(trim(text))')} AS fp FROM documents"
)


# ---------------------------------------------------------------------------
# Composed pipeline: exact-dedup + quality + language filter in ONE pass
# ---------------------------------------------------------------------------
CORPUS_CLEAN_MIN_QUALITY = 0.5
CORPUS_CLEAN_LANG = "en"


def _corpus_clean_sql(duck: bool) -> str:
    """The LLM-corpus cleaning pipeline as a single statement.

    Everything per-row (token stats, quality score, language-ID) is
    computed in the same projection as the dedup window's hash key, so
    the plan is: one scan of documents → one shuffle on md5(text) for
    the keeper window → filter.  No joins, no second scan — this is why
    it's written as one enriched CTE rather than composing the three
    standalone operators (Spark inlines CTEs; three would triple-scan).
    """
    return f"""
    WITH enriched AS (
      SELECT {_stats_select(duck)},
             {_lang_case(duck)} AS lang_pred,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
      FROM documents
    )
    SELECT doc_id, n_tokens, quality_score, lang_pred
    FROM enriched
    WHERE doc_id = keep_id
      AND quality_score >= {CORPUS_CLEAN_MIN_QUALITY}
      AND lang_pred = '{CORPUS_CLEAN_LANG}'
    """


def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus cleaner: drop exact duplicates (keep lowest
    doc_id), low-quality docs, and non-English docs — composed from the
    same fragments as ``text_stats``/``lang_id``/``exact_dedup`` but
    planned as one scan + one window shuffle."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_corpus_clean_sql(duck=False))


CORPUS_CLEAN_ORACLE = _corpus_clean_sql(duck=True)
