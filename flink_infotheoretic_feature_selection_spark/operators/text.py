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
    "doc_repetition",
    "lm_score",
    "lm_score_oracle",
    "tfidf_topk",
    "stratified_sample",
    "corpus_rollup",
    "pack_sequences",
    "pack_sequences_oracle",
    "scrub_pii",
    "vocab_topk",
    "VOCAB_TOPK_ORACLE",
    "chunk_documents",
    "CHUNK_DOCUMENTS_ORACLE",
    "CORPUS_ROLLUP_ORACLE",
    "TEXT_STATS_ORACLE",
    "LANG_ID_ORACLE",
    "FINGERPRINT_ORACLE",
    "CORPUS_CLEAN_ORACLE",
    "DOC_REPETITION_ORACLE",
    "TFIDF_TOPK_ORACLE",
    "STRATIFIED_SAMPLE_ORACLE",
    "mixture_sample",
    "MIXTURE_SAMPLE_ORACLE",
    "token_mi_topk",
    "token_mi_topk_oracle",
    "quality_quantile_filter",
    "quality_quantile_filter_oracle",
    "hash_split",
    "HASH_SPLIT_ORACLE",
    "mixture_copies_case",
    "split_case",
    "copy_explode_expr",
    "quality_threshold_filter",
    "source_token_cap",
    "source_token_cap_skew",
    "source_token_cap_oracle",
    "epoch_shuffle",
    "epoch_shuffle_oracle",
    "tokenize_bpe",
    "tokenize_bpe_oracle",
    "tokenize_bpe_vectorized",
    "bpe_encode_word",
    "pack_sequences_exact",
    "pack_sequences_exact_oracle",
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
def _bpe_words_expr(duck: bool, col: str = "lower(text)") -> str:
    """BPE pretoken list over ``col`` (letter runs, single digits, single
    punctuation; whitespace never emits).  Parameterized on the input
    expression (r11 advisor: the NULL-handling variant used to be patched
    in via a string replace of the literal ``lower(text)`` — a silent
    no-op if this expression were ever reworded)."""
    if duck:
        return rf"regexp_extract_all({col}, '[a-z]+|[0-9]|[^a-z0-9\s]')"
    return rf"regexp_extract_all({col}, '[a-z]+|[0-9]|[^a-z0-9\\s]', 0)"


_BPE = _bpe_words_expr(duck=False)
_BPE_DUCK = _bpe_words_expr(duck=True)


def _quality_expr(duck: bool) -> str:
    """Just the round-5 quality-score expression (no alias) — shared by
    text_stats and the per-language quantile filter so the two can never
    disagree on what quality means."""
    tokens = _TOKENS_DUCK if duck else _TOKENS
    size = "len" if duck else "size"
    return f"""round(least(CAST(1.0 AS DOUBLE), {size}({tokens}) / CAST(97.0 AS DOUBLE))
            * (CAST(0.5 AS DOUBLE)
               + CAST(0.5 AS DOUBLE) * least(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                                  / {size}({tokens}) / CAST(7.3 AS DOUBLE),
                                  CAST(1.0 AS DOUBLE))), 5)"""


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
      {_quality_expr(duck)} AS quality_score
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


# ---------------------------------------------------------------------------
# Corpus rollup over (source, lang) grouping sets
# ---------------------------------------------------------------------------
def _rollup_sql(duck: bool) -> str:
    """Plan shape at scale: a single scan expanded 4× into one
    partial+final hash agg — the grouping-sets Expand happens map-side,
    so the shuffle carries only (source, lang) group cells, not rows.

    Hash-stability (the round-3 driver lesson): every emitted value is
    derived from exact integer arithmetic and CAST to a type both
    engines serialize identically —

    - ``total_chars``: DuckDB types ``sum(integer)`` as HUGEINT
      (arrow decimal128(38,0)) while Spark emits int64; equal VALUES
      hash differently at the serialization level, so the sum is cast
      to BIGINT explicitly.
    - ``avg_chars``: never computed as a float average.  It is the
      5-decimal TRUNCATED rational sum/count, assembled from integer
      div/mod (overflow-safe: the remainder < count, so the ×100000
      blowup never leaves int64 range even at 100 TB) plus one IEEE
      double divide that is bit-identical on any engine given
      identical integer inputs.  No round(), no HALF_UP-vs-float
      divergence possible.
    - subtotal rows are marked via GROUPING() (not coalesce), so a
      genuinely-NULL source/lang can never collide with the '(all)'
      subtotal label.
    """
    idiv = "//" if duck else "DIV"
    avg = (
        f"CAST(sum(n_chars) {idiv} count(*) AS DOUBLE) + "
        f"CAST((sum(n_chars) % count(*)) * 100000 {idiv} count(*) AS DOUBLE) "
        "/ 100000.0"
    )
    return f"""
SELECT CASE WHEN grouping(source) = 1 THEN '(all)'
            ELSE coalesce(source, '(null)') END AS source,
       CASE WHEN grouping(lang) = 1 THEN '(all)'
            ELSE coalesce(lang, '(null)') END AS lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       {avg} AS avg_chars
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
"""


def corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc counts / char totals per source, per lang, per (source, lang),
    and grand total — the monitoring rollup every corpus pipeline keeps.
    Grouping sets were ABSENT from the reference (SURVEY §2.8); extension
    surface."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_rollup_sql(duck=False))


CORPUS_ROLLUP_ORACLE = _rollup_sql(duck=True)


# ---------------------------------------------------------------------------
# Training-sequence packing
# ---------------------------------------------------------------------------
PACK_BUDGET = 2048  # tokens per training sequence
PACK_SHARDS = 8


def _pack_sql(duck: bool, budget: int = PACK_BUDGET, shards: int = PACK_SHARDS) -> str:
    """Deterministic doc → (shard, seq_id) assignment for sequence packing.

    Offset-based first-fit: docs are hash-sharded (content-addressed, so
    resharding the corpus reproduces the SAME packing), ordered by doc_id
    within the shard, and a running token cumsum places each doc at
    ``floor(tokens_before / budget)``.  A sequence may overflow ``budget``
    by at most one doc (training-side truncation handles the tail) — the
    standard scalable approximation of greedy packing, since exact
    first-fit is inherently sequential.

    Plan at scale: ONE shuffle on the shard key, then a per-shard window
    cumsum — shards are hash-uniform so the window never sees skew, and
    parallelism = number of shards (thousands at 100 TB).
    """
    tokens = _TOKENS_DUCK if duck else _TOKENS
    size = "len" if duck else "size"
    rh = (
        rolling_hash_expr_duckdb("lower(trim(text))")
        if duck
        else rolling_hash_expr_spark("lower(trim(text))")
    )
    return f"""
    WITH t AS (
      SELECT doc_id, {size}({tokens}) AS n_tokens, {rh} % {shards} AS shard
      FROM documents),
    {pack_tail_sql("t", budget)}
    """


def pack_tail_sql(src: str, budget: int = PACK_BUDGET, with_tok_before: bool = True) -> str:
    """Cumsum + sequence assignment over ``src(doc_id, shard, n_tokens)``
    — the ONE definition of the packing rule, shared by
    :func:`pack_sequences` and the composed pipeline so the semantics
    cannot drift between the individually-gated and composed forms."""
    extra = (
        ",\n           CAST(tok_before AS BIGINT) AS tok_before"
        if with_tok_before
        else ""
    )
    return f"""
    __pk_c AS (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS tok_before
      FROM {src})
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(floor(tok_before / {budget}.0) AS INT) AS seq_id,
           CAST(n_tokens AS INT) AS n_tokens{extra}
    FROM __pk_c
    """


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Assign every document to a (shard, training-sequence) slot under a
    token budget — the packing step that turns a cleaned corpus into
    fixed-length training sequences.

    ``token_counts`` (r11, VERDICT ask #3): a ``(doc_id, n_tokens)``
    frame of EXACT tokenizer counts (e.g. from
    :func:`tokenize_bpe_vectorized`) replaces the built-in whitespace
    approximation; the shard hash and packing rule are unchanged, so
    only the budget arithmetic differs.  With a broadcastable counts
    frame the join is map-side; at corpus scale both sides hash-join on
    doc_id before the one shard shuffle.

    Contract: the counts frame must cover EVERY doc and be unique per
    doc_id — BOTH violations raise at execution (r11 review + advisor: a
    silent inner join would drop missed docs from packing; a silent
    duplicate would pack a doc twice and corrupt every later cumsum in
    its shard).  The dup check is a window on the counts side — the
    small side of the join — not an extra pass over documents."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    if token_counts is None:
        return spark.sql(_pack_sql(duck=False, budget=budget, shards=shards))
    # project to exactly (doc_id, n_tokens) BEFORE registering the view
    # (r11 advisor): a counts frame carrying extra columns (text, source —
    # easy if a caller forgets to project the tokenizer output) would
    # make the generated SQL's unqualified text reference ambiguous
    token_counts.select("doc_id", "n_tokens").createOrReplaceTempView(
        "__pack_token_counts"
    )
    rh = rolling_hash_expr_spark("lower(trim(text))")
    # LEFT join + runtime raise (r11 review find): an inner join would
    # SILENTLY drop every doc the counts frame misses — data loss a
    # stale/partial counts table must not be able to cause.
    return spark.sql(f"""
    WITH tc AS (
      SELECT doc_id, n_tokens,
             count(*) OVER (PARTITION BY doc_id) AS __dup
      FROM __pack_token_counts),
    t AS (
      SELECT d.doc_id,
             CASE WHEN tc.n_tokens IS NULL THEN
                    CAST(raise_error('token_counts is missing doc_ids present in documents') AS BIGINT)
                  WHEN tc.__dup > 1 THEN
                    CAST(raise_error('token_counts has duplicate doc_ids') AS BIGINT)
                  ELSE CAST(tc.n_tokens AS BIGINT) END AS n_tokens,
             {rh} % {shards} AS shard
      FROM documents d LEFT JOIN tc ON d.doc_id = tc.doc_id),
    {pack_tail_sql("t", budget)}
    """)


def pack_sequences_oracle(
    budget: int = PACK_BUDGET, shards: int = PACK_SHARDS
) -> str:
    # function, not a module constant: _pack_sql needs the rolling-hash
    # helpers defined further down the module
    return _pack_sql(duck=True, budget=budget, shards=shards)


# ---------------------------------------------------------------------------
# Global vocabulary top-k
# ---------------------------------------------------------------------------
VOCAB_TOP = 50


def _word_explode(duck: bool) -> str:
    """The one word-explode fragment (``SELECT doc_id, term FROM
    documents``) shared by TF-IDF and vocabulary — a single definition so
    the two can never disagree on what a term is.  OUTER explode on the
    Spark side: see the shingle paths for why inner explode is 6× slower
    here, and a NULL term never survives the downstream aggregates/joins
    (both filter or equi-join on term)."""
    if duck:
        return f"SELECT doc_id, unnest({_WORDS_DUCK}) AS term FROM documents"
    return (
        f"SELECT doc_id, term FROM documents "
        f"LATERAL VIEW OUTER explode({_WORDS}) t AS term"
    )


def _vocab_sql(duck: bool, top: int = VOCAB_TOP) -> str:
    """Corpus-wide top-``top`` terms by document frequency.

    Ties broken by term (deterministic).  Plan at scale: word explode is
    map-side, the (doc, term) + term aggregates are partial+final hash
    aggs, and the final top-k is TakeOrderedAndProject — no global sort
    materializes the full vocabulary."""
    return f"""
    WITH w AS ({_word_explode(duck)}),
    byterm AS (
      SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
      FROM w WHERE term IS NOT NULL GROUP BY term)
    SELECT term, df, tf
    FROM byterm
    ORDER BY df DESC, tf DESC, term ASC
    LIMIT {top}
    """


def vocab_topk(spark: SparkSession, sf_dir: str, top: int = VOCAB_TOP) -> DataFrame:
    """Global top-``top`` vocabulary terms by document frequency."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_vocab_sql(duck=False, top=top))


VOCAB_TOPK_ORACLE = _vocab_sql(duck=True)


# ---------------------------------------------------------------------------
# Context-window chunking
# ---------------------------------------------------------------------------
CHUNK_CHARS = 200
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


def _chunk_sql(duck: bool, size: int = CHUNK_CHARS, stride: int = CHUNK_STRIDE) -> str:
    """Split each doc into overlapping fixed-size character chunks —
    the context-window chunking step before embedding/indexing.

    Per-row explode of a computed substring list: map-side, no shuffle.
    Chunk count per doc = ceil(max(len - (size-stride), 1) / stride), so
    every character is covered and consecutive chunks overlap by
    ``size - stride``."""
    if not 0 < stride <= size:
        raise ValueError(
            f"stride must be in (0, size]: got stride={stride}, size={size} "
            "(stride > size would leave uncovered gaps; 0 divides)"
        )
    # one chunk-count definition for both dialects — the formula must
    # never drift between the engine and its oracle.  The inner
    # greatest(..., 1) makes ceil >= 1 for short docs.
    n_chunks = (
        f"CAST(ceil(CAST(greatest(length(text) - {size - stride}, 1) "
        f"AS DOUBLE) / {stride}) AS INT)"
    )
    if duck:
        # range(0, n) in DuckDB is end-exclusive, = sequence(0, n-1)
        return f"""
    WITH c AS (
      SELECT doc_id,
             unnest(list_transform(range(0, {n_chunks}),
                    i -> struct_pack(idx := i, chunk := substr(text, i*{stride} + 1, {size})))) AS u
      FROM documents WHERE text IS NOT NULL AND length(text) > 0)
    SELECT doc_id, CAST(u.idx AS INT) AS chunk_idx, u.chunk AS chunk,
           length(u.chunk) AS chunk_len
    FROM c
    """
    return f"""
    WITH c AS (
      SELECT doc_id, chunk_idx, substr(text, chunk_idx*{stride} + 1, {size}) AS chunk
      FROM documents
      LATERAL VIEW OUTER explode(sequence(0, {n_chunks} - 1)) t AS chunk_idx
      WHERE text IS NOT NULL AND length(text) > 0)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk,
           length(chunk) AS chunk_len
    FROM c
    """


def chunk_documents(
    spark: SparkSession, sf_dir: str, size: int = CHUNK_CHARS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Overlapping fixed-size character chunks per document."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_chunk_sql(duck=False, size=size, stride=stride))


CHUNK_DOCUMENTS_ORACLE = _chunk_sql(duck=True)


# ---------------------------------------------------------------------------
# PII / boilerplate scrubbing
# ---------------------------------------------------------------------------
_PII_PATTERNS = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("longnum", r"[0-9]{6,}", "<NUM>"),
]


def scrub_pii(docs: DataFrame) -> DataFrame:
    """Redact emails, URLs and long digit runs; emit per-doc hit counts.

    Count semantics (deliberate, pinned by test): each ``n_*`` is the
    number of RAW-TEXT matches of that pattern, counted independently
    over the original text — a per-pattern detection census.  The
    redactions themselves apply sequentially (email → url → longnum), so
    a token matched by two patterns (a digit run inside a URL, an email
    inside a URL's query string) is COUNTED under both but consumed by
    whichever replacement runs first; ``n_*`` totals can therefore exceed
    the number of ``<...>`` markers in the scrubbed text.  Counting
    against the progressively-scrubbed text instead would make each
    count depend on the redaction ORDER — a census is the more useful
    audit signal, and the only order-independent one.

    Chained JVM-side ``regexp_replace`` / ``regexp_extract_all`` — a
    narrow projection fused into the scan, no UDF, no shuffle.  The
    testdata corpus contains no PII, so this op is verified by a crafted
    fixture test rather than the DuckDB gate (a zero-hit oracle would
    check nothing).
    """
    from pyspark.sql import functions as F

    counts = []
    # NULL-safe basis: under ANSI (this deployment's default) a NULL
    # text propagates NULL through the regex chain; coalescing keeps the
    # scrubbed text a string.  (Under legacy sizeOfNull, size(NULL) is
    # -1, which would additionally surface as
    # hit count -1 on a NULL-text row; coalesce once instead.
    scrubbed = F.coalesce(F.col("text"), F.lit(""))
    for name, pat, repl in _PII_PATTERNS:
        # SQL string literals eat one level of backslash; the Column API
        # (regexp_replace) takes the pattern verbatim
        sql_pat = pat.replace("\\", "\\\\")
        counts.append(
            F.size(
                F.expr(f"regexp_extract_all(coalesce(text, ''), '{sql_pat}', 0)")
            ).alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select("doc_id", scrubbed.alias("text"), *counts)


ROLLING_MOD = 1_000_000_007
ROLLING_MULT = 31


def rolling_hash_expr_spark(text_expr: str, mult: int = ROLLING_MULT) -> str:
    """Polynomial rolling hash over characters, JVM-side via aggregate().

    ``mult`` selects the polynomial base: two hashes with different
    bases (e.g. 31 and 131) are independent enough that a simultaneous
    collision of two DISTINCT texts under both is ~1e-18 — the tiebreak
    pattern source_token_cap uses.

    TOTAL over NULL by construction: the input coalesces to '' (hash 0,
    same as rolling_hash_py('')), because the engines disagree on the
    bare-NULL fold — Spark's aggregate(split(NULL, ...)) is NULL while
    DuckDB's list_prepend(0, NULL) folds to 0 — so a NULL-text doc would
    hash-split/shuffle/cap DIFFERENTLY per engine (found by the
    random-corpora cross-engine property test).  Non-null inputs are
    bit-for-bit unchanged by the wrap.
    """
    return (
        f"aggregate(split(coalesce({text_expr}, ''), ''), CAST(0 AS BIGINT), "
        f"(acc, c) -> (acc * {mult} + CAST(coalesce(ascii(c), 0) AS BIGINT)) % {ROLLING_MOD})"
    )


def rolling_hash_expr_duckdb(text_expr: str, mult: int = ROLLING_MULT) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(regexp_split_to_array(coalesce({text_expr}, ''), ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc * {mult} + x) % {ROLLING_MOD})"
    )


def rolling_hash_py(s: str, mult: int = ROLLING_MULT) -> int:
    """Python twin of the SQL rolling hash (ASCII inputs only) — used to
    fold CONSTANT strings (e.g. an epoch-seed label) into plan-time
    literals instead of re-hashing them per row in both engines."""
    acc = 0
    for c in s:
        acc = (acc * mult + ord(c)) % ROLLING_MOD
    return acc


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


# ---------------------------------------------------------------------------
# Within-document repetition (Gopher-style quality signal)
# ---------------------------------------------------------------------------
REPETITION_NGRAM = 2
REPETITION_MAX_DUP_FRAC = 0.2


def _grams_expr(duck: bool, src: str, n: int) -> str:
    """Word n-gram list over the token-array expression ``src`` — the ONE
    fragment shared by the repetition operator and the composed pipeline,
    so their n-gram semantics cannot drift apart.

    Spark dialect: ``n`` shifted O(len) slices zipped together, NOT a
    slice per gram position — ``transform(sequence(...), i ->
    slice(src, i, n))`` is O(len²) on non-codegen paths (interpreted
    ``slice`` walks the array from the start every call), and predicate
    pushdown puts filters like ``dup_frac <= x`` on exactly that path
    (measured quadratic: 13.6 s for one 8k-token doc; see
    dedup.shingle_grams_expr for the twin note).  Callers still guard
    ``size(src) >= n`` — for shorter docs the slice length goes
    non-positive, exactly as the old form's descending sequence did."""
    if duck:
        return (
            f"list_transform(range(1, len({src}) - {n - 2}), "
            f"i -> array_to_string({src}[i : i + {n - 1}], ' '))"
        )
    m = f"(size({src}) - {n - 1})"
    grams = f"slice({src}, 1, {m})"
    for k in range(1, n):
        grams = (
            f"zip_with({grams}, slice({src}, {k + 1}, {m}), "
            f"(x, y) -> concat(x, ' ', y))"
        )
    return grams


def _dialect_tokens(duck: bool) -> tuple[str, str, str]:
    """(tokens_expr, size_fn, distinct_fn) for the repetition fragments —
    ONE definition so the two call sites cannot drift."""
    if duck:
        return (r"string_split_regex(trim(lower(text)), '\s+')", "len", "list_distinct")
    return (r"split(trim(lower(text)), '\\s+')", "size", "array_distinct")


def _repetition_sql(duck: bool, n: int = REPETITION_NGRAM) -> str:
    """Duplicate word n-gram fraction per doc — repeated boilerplate
    (lorem-style loops, scraped nav bars) shows up as a high fraction of
    non-distinct n-grams.  Pure per-row array expressions: no shuffle,
    no UDF, runs at scan speed on both engines."""
    grams = _grams_expr(duck, "ts", n)
    tokens, size, distinct = _dialect_tokens(duck)
    return f"""
    WITH tok AS (SELECT doc_id, {tokens} AS ts FROM documents),
    g AS (SELECT doc_id, {grams} AS gs FROM tok WHERE {size}(ts) >= {n})
    SELECT doc_id,
           {size}(gs) AS n_grams,
           {size}({distinct}(gs)) AS n_distinct,
           round(CAST(1.0 AS DOUBLE)
                 - CAST({size}({distinct}(gs)) AS DOUBLE) / {size}(gs), 5) AS dup_frac,
           CAST(CASE WHEN CAST(1.0 AS DOUBLE)
                          - CAST({size}({distinct}(gs)) AS DOUBLE) / {size}(gs)
                          > {REPETITION_MAX_DUP_FRAC}
                THEN 1 ELSE 0 END AS INT) AS repetitive
    FROM g
    """


def dup_frac_expr(duck: bool, n: int = REPETITION_NGRAM) -> str:
    """Standalone duplicate-n-gram-fraction expression over ``text``
    (0.0 for docs shorter than ``n`` tokens) — reusable in composed
    statements where the CTE form doesn't fit.  Built from the same
    :func:`_grams_expr` fragment as :func:`doc_repetition`."""
    tokens, size, distinct = _dialect_tokens(duck)
    grams = _grams_expr(duck, tokens, n)
    return (
        f"CASE WHEN {size}({tokens}) >= {n} THEN "
        f"CAST(1.0 AS DOUBLE) - CAST({size}({distinct}({grams})) AS DOUBLE) / {size}({grams}) "
        f"ELSE CAST(0.0 AS DOUBLE) END"
    )


def doc_repetition(spark: SparkSession, sf_dir: str, n: int = REPETITION_NGRAM) -> DataFrame:
    """Per-doc duplicate-bigram fraction + repetitive flag (Gopher-style
    repetition filter).  Docs shorter than ``n`` tokens are excluded
    (no n-grams exist)."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_repetition_sql(duck=False, n=n))


DOC_REPETITION_ORACLE = _repetition_sql(duck=True)


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------
TFIDF_TOP_TERMS = 3


def _tfidf_sql(duck: bool, top: int = TFIDF_TOP_TERMS) -> str:
    """Top terms per doc by TF-IDF.

    Ranking key is the INTEGER triple (tf DESC, df ASC, term ASC), not
    the float score — cross-engine float `ln` can differ in the last ulp
    and flip a rank at a near-tie boundary (the mim_topk lesson).  The
    tf-idf score itself is still emitted (rounded) so the oracle checks
    the arithmetic; the rank is just decided on exact integers.

    Plan at scale: explode words (map-side) → hash-agg on (doc_id, term)
    with partial aggregation → tiny df/doc-count aggs → join on term
    (AQE broadcasts the vocabulary side when it fits, plain shuffle join
    otherwise) → per-doc window on doc_id.  No global sort.
    """
    return f"""
    WITH w AS ({_word_explode(duck)}),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             round(tf.tf * ln(n_docs / dfreq.df), 5) AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rnk
      FROM tf JOIN dfreq ON tf.term = dfreq.term
      CROSS JOIN nd)
    SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS INT) AS rnk
    FROM scored WHERE rnk <= {top}
    """


def tfidf_topk(spark: SparkSession, sf_dir: str, top: int = TFIDF_TOP_TERMS) -> DataFrame:
    """Top-``top`` distinctive terms per document by TF-IDF."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_tfidf_sql(duck=False, top=top))


TFIDF_TOPK_ORACLE = _tfidf_sql(duck=True)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (language-mix rebalancing)
# ---------------------------------------------------------------------------
# Per-language keep-rate out of 100: downsample dominant English, keep all
# es/fr, thin undetermined.  The sampling key is the portable rolling hash
# of the text (content-addressed: resharding or re-ingesting the corpus
# yields the SAME sample — doc ids need not be stable at 100 TB).
STRATA_RATES = {"en": 50, "es": 100, "fr": 100, "und": 10}


def _stratified_sql(duck: bool) -> str:
    rh = (
        rolling_hash_expr_duckdb("lower(trim(text))")
        if duck
        else rolling_hash_expr_spark("lower(trim(text))")
    )
    rate_case = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in STRATA_RATES.items()
    )
    return f"""
    WITH tagged AS (
      SELECT doc_id, {_lang_case(duck)} AS lang_pred, {rh} % 100 AS bucket
      FROM documents)
    SELECT doc_id, lang_pred, CAST(bucket AS INT) AS bucket
    FROM tagged
    WHERE bucket < CASE lang_pred {rate_case} ELSE 0 END
    """


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sample of the corpus.

    A narrow filter over the scan (language tag + content-hash bucket are
    per-row expressions) — no shuffle, no RNG, reproducible across
    engines, partitionings, and reruns.
    """
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_stratified_sql(duck=False))


STRATIFIED_SAMPLE_ORACLE = _stratified_sql(duck=True)


# ---------------------------------------------------------------------------
# Corpus-trained bigram LM quality score (CCNet/Gopher-style signal)
# ---------------------------------------------------------------------------
def _lm_score_sql(duck: bool) -> str:
    """Per-doc mean log2 Laplace-smoothed bigram probability, with the
    LM trained on the corpus ITSELF (the standard self-scoring pass:
    boilerplate and fluent text score high, token soup scores low).

    score(doc) = mean over its bigrams of
        log2( (count(w1 w2) + 1) / (count(w1) + V) )
    where counts are corpus-global and V = vocabulary size.

    Scale shape: two hash aggregations (bigram and unigram counts — the
    classic map-side-combined word count), then one join of the doc
    bigram stream against the two count tables keyed by bigram/w1, one
    doc_id agg.  No driver state; V is a scalar subquery.  Cross-engine:
    log2 may differ in the last ulp per term and the sum order differs,
    so the emitted score rounds to 5 decimals on both engines (same
    contract as the MI oracles and every cosine gate here).
    """
    tokens, size, _ = _dialect_tokens(duck)
    grams = _grams_expr(duck, "ts", 2)
    if duck:
        # token <> '' drops the single empty token an empty/whitespace
        # doc produces (split of '' is ['']), which would otherwise
        # inflate V with a phantom vocab entry
        explode_uni = (
            "SELECT doc_id, token FROM "
            "(SELECT doc_id, unnest(ts) AS token FROM tok) WHERE token <> ''"
        )
        explode_big = (
            f"SELECT doc_id, unnest({grams}) AS bigram FROM tok WHERE len(ts) >= 2"
        )
        w1 = "list_extract(string_split(b.bigram, ' '), 1)"
    else:
        explode_uni = (
            "SELECT doc_id, token FROM tok "
            "LATERAL VIEW OUTER explode(ts) t AS token "
            "WHERE size(ts) >= 1 AND token <> ''"
        )
        # CASE guard + OUTER explode: see _shingles_cte (sequence() on a
        # short doc runs descending and throws if hoisted; OUTER avoids
        # the InferFiltersFromGenerate interpreted-filter trap)
        guarded = f"CASE WHEN size(ts) >= 2 THEN {grams} ELSE array() END"
        explode_big = (
            "SELECT doc_id, bigram FROM tok "
            f"LATERAL VIEW OUTER explode({guarded}) t AS bigram "
            "WHERE size(ts) >= 2 AND bigram IS NOT NULL"
        )
        w1 = "element_at(split(b.bigram, ' '), 1)"
    return f"""
    WITH tok AS (SELECT doc_id, {tokens} AS ts FROM documents),
    uni AS ({explode_uni}),
    big AS ({explode_big}),
    ugc AS (SELECT token, count(*) AS cu FROM uni GROUP BY token),
    bgc AS (SELECT bigram, count(*) AS cb FROM big GROUP BY bigram),
    vocab AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM ugc)
    SELECT b.doc_id,
           count(*) AS n_bigrams,
           round(sum(log2((CAST(cb AS DOUBLE) + 1.0) / (CAST(cu AS DOUBLE) + v)))
                 / count(*), 5) AS lm_logprob
    FROM big b
    JOIN bgc ON b.bigram = bgc.bigram
    JOIN ugc ON {w1} = ugc.token
    CROSS JOIN vocab
    GROUP BY b.doc_id
    """


def lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM score per doc (higher = more typical of
    the corpus); docs shorter than one bigram are absent."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_lm_score_sql(duck=False))


def lm_score_oracle() -> str:
    return _lm_score_sql(duck=True)


# ---------------------------------------------------------------------------
# Mixture sampling (per-source up/down-weighting for training-data mixes)
# ---------------------------------------------------------------------------
# weights in percent: 250 = 2.5x upsample (2 guaranteed copies + a 50%
# third), 100 = keep once, 40 = keep 40%, 0 = drop the source entirely.
MIXTURE_WEIGHTS_PCT = {"src0": 250, "src1": 125, "src2": 100, "src3": 60, "src17": 0}
MIXTURE_DEFAULT_PCT = 40


def mixture_copies_case(bucket_col: str = "bucket") -> str:
    """The per-source ``n_copies`` CASE over a [0,100) hash bucket column
    — ONE definition shared by the standalone op and the composed
    pipeline so mixture semantics can never drift between them."""
    cases = " ".join(
        f"WHEN '{s}' THEN {w // 100} + (CASE WHEN {bucket_col} < {w % 100} THEN 1 ELSE 0 END)"
        for s, w in MIXTURE_WEIGHTS_PCT.items()
    )
    d, f = MIXTURE_DEFAULT_PCT // 100, MIXTURE_DEFAULT_PCT % 100
    return (
        f"CASE source {cases} "
        f"ELSE {d} + (CASE WHEN {bucket_col} < {f} THEN 1 ELSE 0 END) END"
    )


def copy_explode_expr(duck: bool) -> str:
    """Engine-specific copy-index generator.  Spark's sequence(1, 0) is
    the DESCENDING [1, 0] (default step -1), not empty — callers MUST
    filter ``n_copies >= 1`` BEFORE this explode on both engines; and
    generators can't be nested in expressions (Spark 42K0E), so it needs
    its own subquery with the type-unifying CAST outside (generate_series
    yields BIGINT, sequence INT)."""
    return (
        "unnest(generate_series(1, n_copies))"
        if duck
        else "explode(sequence(1, n_copies))"
    )


def _mixture_sql(duck: bool) -> str:
    rh = (
        rolling_hash_expr_duckdb("lower(trim(text))")
        if duck
        else rolling_hash_expr_spark("lower(trim(text))")
    )
    return f"""
    WITH tagged AS (
      SELECT doc_id, source, {rh} % 100 AS bucket FROM documents),
    counted AS (
      SELECT doc_id, source,
             {mixture_copies_case()} AS n_copies
      FROM tagged)
    SELECT doc_id, source, CAST(copy AS INT) AS copy
    FROM (SELECT doc_id, source, {copy_explode_expr(duck)} AS copy
          FROM counted WHERE n_copies >= 1)
    """


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source corpus mixing: each source gets a weight
    (percent); weight > 100 UPSAMPLES by emitting multiple copies (the
    ``copy`` index lets downstream shuffling/packing treat them as
    distinct rows), fractional parts resolve by content-hash bucket —
    no RNG, reproducible across engines, partitionings and reruns.

    This is the data-mixing primitive LLM pipelines run right before
    sequence packing (e.g. "3x Wikipedia, 0.5x CommonCrawl").  Plan
    shape: narrow per-row expressions + a generator — zero shuffle,
    zero state; at 100 TB it is scan-speed and embarrassingly parallel.
    """
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_mixture_sql(duck=False))


MIXTURE_SAMPLE_ORACLE = _mixture_sql(duck=True)


# ---------------------------------------------------------------------------
# MI-based discriminative-token selection (the reference's core measure,
# pointed at the corpus)
# ---------------------------------------------------------------------------
TOKEN_MI_TOP = 25
TOKEN_MI_MIN_DF = 5


def _token_mi_sql(duck: bool, top: int = TOKEN_MI_TOP, min_df: int = TOKEN_MI_MIN_DF) -> str:
    """MI(token-presence; source) per vocabulary term, top-k.

    Exactly the reference's relevance measure (InfoTheory.scala:431's
    MI(feature; class)) with feature = the binary "doc contains term"
    indicator and class = the doc's source — i.e. feature selection over
    a text corpus, which is what the reference's MI machinery is FOR,
    re-expressed against the documents table.

    Scale shape: one distinct over (doc, term) pairs (the only
    data-sized shuffle), then every aggregate is vocabulary-sized; the
    (term × source) grid is dense-completed with a LEFT JOIN so
    zero-count present-cells contribute their absent-cell mass (xlogx(0)
    = 0 cells are skipped, matching InfoTheory.scala:150-168's guard).
    ``min_df`` bounds the vocabulary at 100 TB exactly like the
    reference's distinct-value cap (A3) bounds feature arity.

    Float contract: MI is round-5 like every MI gate in the repo
    (identical integer counts on both engines; the rounded sum of ~40
    doubles is the established relevance_mi/lm_score pattern), and the
    top-k boundary is decided on the ROUNDED value with term as the
    tiebreak, so ranking can never diverge across engines.  Residual
    (accepted) risk of round-then-compare: if a raw MI sum lands within
    float-epsilon of a 0.5e-5 rounding boundary, summation-order
    differences could round it differently per engine and flip the
    top-k cut on OTHER data — the fully-robust alternative is shipping
    the exact integer counts (c1, c1tot, n_s, n) to the comparison
    layer and computing MI once there; not done because it would bypass
    the very float pipeline the gate exists to check.
    """
    words = _word_explode(duck)
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, term FROM ({words}) WHERE term IS NOT NULL),
    ns AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
    nn AS (SELECT count(*) AS n FROM documents),
    df AS (SELECT term, count(*) AS c1tot FROM toks
           GROUP BY term HAVING count(*) >= {min_df}),
    c1s AS (
      SELECT t.term, d.source, count(*) AS c1
      FROM toks t JOIN documents d USING (doc_id) JOIN df USING (term)
      GROUP BY t.term, d.source),
    grid AS (SELECT df.term, ns.source, ns.n_s, df.c1tot FROM df CROSS JOIN ns),
    cells AS (
      SELECT g.term, g.n_s, g.c1tot, coalesce(c1s.c1, 0) AS c1
      FROM grid g LEFT JOIN c1s ON g.term = c1s.term AND g.source = c1s.source),
    mi AS (
      SELECT term,
             round(sum(
               CASE WHEN c1 > 0
                    THEN (CAST(c1 AS DOUBLE) / n) *
                         log2(CAST(c1 AS DOUBLE) * n /
                              (CAST(c1tot AS DOUBLE) * n_s))
                    ELSE 0 END
             + CASE WHEN n_s - c1 > 0 AND n - c1tot > 0
                    THEN (CAST(n_s - c1 AS DOUBLE) / n) *
                         log2(CAST(n_s - c1 AS DOUBLE) * n /
                              (CAST(n - c1tot AS DOUBLE) * n_s))
                    ELSE 0 END), 5) AS mi
      FROM cells CROSS JOIN nn
      GROUP BY term)
    SELECT term, mi FROM mi ORDER BY mi DESC, term LIMIT {top}
    """


def token_mi_topk(
    spark: SparkSession, sf_dir: str, top: int = TOKEN_MI_TOP, min_df: int = TOKEN_MI_MIN_DF
) -> DataFrame:
    """Top-k tokens most informative about a doc's source, by MI."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_token_mi_sql(duck=False, top=top, min_df=min_df))


def token_mi_topk_oracle(top: int = TOKEN_MI_TOP, min_df: int = TOKEN_MI_MIN_DF) -> str:
    return _token_mi_sql(duck=True, top=top, min_df=min_df)


# ---------------------------------------------------------------------------
# Per-language quality-quantile filter
# ---------------------------------------------------------------------------
QUANTILE_KEEP = 0.5  # keep the top half of each language


def _quantile_filter_sql(duck: bool, keep: float = QUANTILE_KEEP) -> str:
    """Keep each language's top ``keep`` fraction by quality score.

    Absolute quality thresholds are the classic corpus-curation mistake
    — a cutoff tuned on English drops most of every lower-resource
    language.  Ranking WITHIN language and cutting at a per-language
    quantile is the standard fix, and it is one window over the scan:
    shuffle = one exchange on lang_pred (same skew class as any
    group-by; a corpus that is 90% one language is the sessionize_skew
    situation and the same bucket+stitch applies if a single language
    partition ever exceeds an executor).

    Determinism/hash-stability: quality is the shared round-5
    expression, the window order has a doc_id tiebreak (no rank ties →
    percent_rank is the exact rational (rank-1)/(n-1), bit-identical on
    both engines), and the keep boundary compares those exact doubles.
    """
    return f"""
    WITH scored AS (
      SELECT doc_id, {_lang_case(duck)} AS lang_pred, {_quality_expr(duck)} AS quality_score
      FROM documents),
    ranked AS (
      SELECT doc_id, lang_pred, quality_score,
             percent_rank() OVER (PARTITION BY lang_pred
                                  ORDER BY quality_score DESC, doc_id) AS pr
      FROM scored)
    SELECT doc_id, lang_pred, quality_score, round(pr, 5) AS pr
    FROM ranked WHERE pr <= {keep}
    """


def quality_quantile_filter(
    spark: SparkSession, sf_dir: str, keep: float = QUANTILE_KEEP
) -> DataFrame:
    """Per-language top-``keep``-fraction quality filter."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_quantile_filter_sql(duck=False, keep=keep))


def quality_quantile_filter_oracle(keep: float = QUANTILE_KEEP) -> str:
    return _quantile_filter_sql(duck=True, keep=keep)


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------
SPLIT_PCTS = {"train": 80, "val": 10}  # remainder = test


def split_case(bucket_col: str = "bucket") -> str:
    """The train/val/test CASE over a [0,100) hash bucket column —
    shared by the standalone split and the composed pipeline."""
    train, val = SPLIT_PCTS["train"], SPLIT_PCTS["val"]
    return (
        f"CASE WHEN {bucket_col} < {train} THEN 'train' "
        f"WHEN {bucket_col} < {train + val} THEN 'val' ELSE 'test' END"
    )


def _hash_split_sql(duck: bool) -> str:
    rh = (
        rolling_hash_expr_duckdb("lower(trim(text))")
        if duck
        else rolling_hash_expr_spark("lower(trim(text))")
    )
    return f"""
    SELECT doc_id,
           {split_case()} AS split
    FROM (SELECT doc_id, {rh} % 100 AS bucket FROM documents)
    """


def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val/test assignment (80/10/10).

    Content-keyed (not id-keyed) on purpose: re-ingesting the same
    document under a new doc_id lands in the SAME split, so eval can
    never silently leak into train across pipeline reruns — the
    property random or id-keyed splits lose.  Narrow per-row
    expression, zero shuffle, scan-speed at any scale.
    """
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_hash_split_sql(duck=False))


HASH_SPLIT_ORACLE = _hash_split_sql(duck=True)


def quality_threshold_filter(
    spark: SparkSession, sf_dir: str, keep: float = QUANTILE_KEEP, accuracy: int = 10_000
) -> DataFrame:
    """Sort-free variant of :func:`quality_quantile_filter`: compute
    each language's keep-threshold with ``percentile_approx`` (one
    streaming agg, Greenwald-Khanna sketch) and keep docs scoring at or
    above it — a broadcast join + narrow filter, approximate keep
    fraction (±~1/accuracy rank error).

    MEASURED tradeoff (BASELINE.md round-5): at sf0.1-and-10× the exact
    window path WINS (4.4 s vs 6-9 s at 10×) because the expensive
    quality/lang expressions are evaluated once there, while this path
    pays a second pass for the threshold agg — the per-language sort is
    NOT the bottleneck until a single language partition outgrows
    executor spill comfort.  Use this variant when that happens (the
    sort becomes a spill storm); until then prefer the exact one.  The
    exact variant remains the oracle-gated reference; the unit test
    pins this one within 2% of it.
    """
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    scored = spark.sql(
        f"SELECT doc_id, {_lang_case(duck=False)} AS lang_pred, "
        f"{_quality_expr(duck=False)} AS quality_score FROM documents"
    )
    # keep the TOP `keep` fraction == scores >= the (1-keep) quantile
    thresholds = scored.groupBy("lang_pred").agg(
        F.percentile_approx("quality_score", 1.0 - keep, accuracy).alias("__thr")
    )
    return (
        scored.join(F.broadcast(thresholds), "lang_pred")
        .filter(F.col("quality_score") >= F.col("__thr"))
        .select("doc_id", "lang_pred", "quality_score")
    )


# ---------------------------------------------------------------------------
# Per-source token-budget cap (domain caps)
# ---------------------------------------------------------------------------
SOURCE_TOKEN_BUDGET = 1_000  # tokens kept per source


def _cap_pr_body(duck: bool, with_counts: bool = False) -> str:
    """The ``pr`` stage of the source cap — (doc_id, source, n_tokens,
    prio, prio2) — shared by the plain windowed form, the skew form and
    the token_counts= variants so none can diverge on priorities or
    token counts (the r11-review dedup lesson, now applied to the HEAD
    of the query as well as the tail).

    Priority ties break on a SECOND independent content hash (base 131
    vs 31) before doc_id: base-31 collisions between distinct texts are
    birthday-expected above ~30k docs in the 1e9+7 space, and a
    same-source collision at the budget boundary resolved by doc_id
    would change survivors across a re-ingest (new ids, same content).
    Simultaneous collision under both bases is ~1e-18; doc_id remains
    only as the final tiebreak for byte-identical texts, where either
    survivor is the same content anyway.
    """
    expr = rolling_hash_expr_duckdb if duck else rolling_hash_expr_spark
    rh = expr("lower(trim(text))")
    rh2 = expr("lower(trim(text))", mult=131)
    if with_counts:
        if duck:
            raise ValueError("token_counts pr body is Spark-only")
        # LEFT join + raise_error coverage/uniqueness contract — see
        # pack_sequences (dup check windows the SMALL counts side)
        return f"""
      SELECT d.doc_id, d.source,
             CASE WHEN tc.n_tokens IS NULL THEN
                    CAST(raise_error('token_counts is missing doc_ids present in documents') AS BIGINT)
                  WHEN tc.__dup > 1 THEN
                    CAST(raise_error('token_counts has duplicate doc_ids') AS BIGINT)
                  ELSE CAST(tc.n_tokens AS BIGINT) END AS n_tokens,
             {rh} AS prio, {rh2} AS prio2
      FROM documents d LEFT JOIN (
        SELECT doc_id, n_tokens, count(*) OVER (PARTITION BY doc_id) AS __dup
        FROM __cap_token_counts) tc ON d.doc_id = tc.doc_id"""
    tokens = _TOKENS_DUCK if duck else _TOKENS
    size = "len" if duck else "size"
    return f"""
      SELECT doc_id, source, {size}({tokens}) AS n_tokens,
             {rh} AS prio, {rh2} AS prio2
      FROM documents"""


def _source_token_cap_sql(
    duck: bool, budget: int = SOURCE_TOKEN_BUDGET, pr_body: str | None = None
) -> str:
    """Cap each source's contribution at ``budget`` tokens.

    The over-represented-domain guard every web-corpus pipeline runs
    (RefinedWeb/Dolma-style domain caps): without it a handful of huge
    sources dominate the training mix no matter what the mixture weights
    say.  Docs compete WITHIN their source in content-hash priority
    order (no RNG, rerun- and reingest-stable, and unbiased w.r.t.
    ingest order — an id-ordered cap would keep whatever was crawled
    first), and a doc survives iff the running token total through it
    still fits the budget.

    Scale shape: one exchange on source + one window cumsum — the same
    plan class as pack_sequences, and the skew story is the same too: a
    corpus that is 90% one source makes that source's partition the
    straggler — :func:`source_token_cap_skew` is the bucketed
    distributed-prefix-sum twin for that regime (bit-equal output,
    unit-pinned).  The cumsum is exact integer
    arithmetic end to end, so the gate hash cannot float-drift.
    DuckDB's SUM(INTEGER) widens to HUGEINT where Spark stays BIGINT —
    both dialects cast the window sum explicitly (the events_props_agg
    r3 lesson).
    """
    pr_body = pr_body or _cap_pr_body(duck)
    # ONE copy of the window/budget tail (r11 review find: the
    # token_counts variant used to duplicate it verbatim, so an ordering
    # or cast fix could silently diverge the two forms)
    return f"""
    WITH pr AS ({pr_body}),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source
                  ORDER BY prio, prio2, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM pr)
    SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {budget}
    """


def source_token_cap(
    spark: SparkSession,
    sf_dir: str,
    budget: int = SOURCE_TOKEN_BUDGET,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Deterministic per-source token cap: the surviving docs and their
    position in the source's running token budget.

    ``token_counts`` (r11, same contract as :func:`pack_sequences`): a
    ``(doc_id, n_tokens)`` frame of EXACT tokenizer counts replaces the
    whitespace approximation — priority hashes and the cumsum rule are
    unchanged, so only which docs fit the budget can differ."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    if token_counts is None:
        return spark.sql(_source_token_cap_sql(duck=False, budget=budget))
    # same (doc_id, n_tokens) projection as pack_sequences (r11 advisor:
    # extra columns on the counts frame would make the unqualified
    # text/source references ambiguous)
    token_counts.select("doc_id", "n_tokens").createOrReplaceTempView(
        "__cap_token_counts"
    )
    return spark.sql(
        _source_token_cap_sql(
            duck=False, budget=budget, pr_body=_cap_pr_body(False, with_counts=True)
        )
    )


def source_token_cap_oracle(budget: int = SOURCE_TOKEN_BUDGET) -> str:
    return _source_token_cap_sql(duck=True, budget=budget)


def source_token_cap_skew(
    spark: SparkSession,
    sf_dir: str,
    budget: int = SOURCE_TOKEN_BUDGET,
    n_buckets: int = 64,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Skew-tolerant :func:`source_token_cap` — identical output
    (r12, VERDICT r11 ask #4).

    The plain form's per-source ordered cumsum serializes each source
    through ONE window partition; at 100 TB with a dominant source (the
    realistic CommonCrawl-style shape) that partition is the job.  This
    is the classic distributed prefix-sum, the sessionize_skew
    precedent applied to an ordered running total:

    - **phase 1**: bucket rows by RANGE of the primary sort key.  ``prio``
      is a content hash, uniform on [0, ROLLING_MOD) by construction, so
      fixed-width buckets are balanced with no sampling pass; bucket id
      is monotone in ``prio`` and equal-``prio`` rows share a bucket, so
      intra-bucket (prio, prio2, doc_id) order concatenated across
      buckets IS the global per-source order.
    - **phase 2**: per-(source, bucket) token totals — tiny (sources ×
      n_buckets rows) — prefix-summed into per-bucket offsets.
    - **phase 3**: buckets whose offset already exceeds the budget are
      pruned WHOLESALE before any row-level work (the broadcast inner
      join below): for a hot source only the ~``budget``-prefix buckets
      and the one straddling bucket ever run the window.  Offsets equal
      to the budget survive (an n_tokens=0 doc at the boundary still
      fits exactly).
    - **phase 4**: local cumsum per (source, bucket) + offset, filter.

    Cost shape: the totals pass and the survivor pass both consume the
    PRICED frame (doc_id, source, n_tokens, prio, prio2 — ~40 B/doc, no
    text), which is materialized ONCE via eager localCheckpoint so the
    raw-text scan and the per-char rolling hashes run a single time
    (measured r12: recomputing the hash for the second pass cost more
    than the one-task window it removed).  Same persist-vs-checkpoint
    reasoning as decontaminate_bloom: blocks are context-cleaned when
    the frame is dropped, nothing accumulates across looped calls.
    Exact integer arithmetic throughout, so the bit-equality unit
    against the plain form is strict.
    """
    from pyspark.sql import Window

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    if token_counts is None:
        pr = spark.sql(_cap_pr_body(duck=False))
    else:
        token_counts.select("doc_id", "n_tokens").createOrReplaceTempView(
            "__cap_token_counts"
        )
        pr = spark.sql(_cap_pr_body(duck=False, with_counts=True))
    width = (ROLLING_MOD + n_buckets - 1) // n_buckets
    b = pr.withColumn("bkt", F.expr(f"CAST(prio div {width} AS INT)")).localCheckpoint(
        eager=True
    )
    totals = b.groupBy("source", "bkt").agg(
        F.sum("n_tokens").cast("long").alias("bkt_tokens")
    )
    wo = Window.partitionBy("source").orderBy("bkt")
    offsets = (
        totals.withColumn(
            "offset",
            (F.sum("bkt_tokens").over(wo) - F.col("bkt_tokens")).cast("long"),
        )
        .where(F.col("offset") <= budget)
        .select("source", "bkt", "offset")
    )
    w = Window.partitionBy("source", "bkt").orderBy("prio", "prio2", "doc_id")
    # eqNullSafe on source (r12 review find): groupBy and the window both
    # treat NULL source as its own group, but a plain equi-join would
    # silently DROP every NULL-source doc the plain form keeps — the one
    # place the two forms could diverge on data shape
    off = offsets.select(
        F.col("source").alias("__osrc"),
        F.col("bkt").alias("__obkt"),
        "offset",
    )
    return (
        b.join(
            F.broadcast(off),
            b["source"].eqNullSafe(off["__osrc"]) & (b["bkt"] == off["__obkt"]),
        )
        .withColumn(
            "cum_tokens",
            (F.sum("n_tokens").over(w) + F.col("offset")).cast("long"),
        )
        .where(F.col("cum_tokens") <= budget)
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "cum_tokens",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic per-epoch corpus shuffle (training order)
# ---------------------------------------------------------------------------
EPOCH_SHUFFLE_SHARDS = 8


def _epoch_shuffle_sql(duck: bool, seed: int, shards: int = EPOCH_SHUFFLE_SHARDS) -> str:
    """Deterministic training-order assignment for one epoch.

    Training wants the corpus in a different order every epoch, but the
    order must be REPRODUCIBLE (resume a crashed run, compare two
    trainers bit-for-bit) — so no RNG: position derives from the content
    hash MIXED MULTIPLICATIVELY with the seed,
    ``oh = (h(content) * (2*h('epoch<seed>')+1) + h('epoch<seed>')) % MOD``.
    Appending/prepending a seed suffix to the hashed string does NOT
    work: a polynomial hash of ``content || suffix`` is
    ``h(content)*B^len(suffix) + h(suffix)``, so equal-length seed
    strings differ only by an additive constant — consecutive epochs
    would replay the SAME within-shard order with shard labels rotated
    (found by the round-5 review; pinned by
    test_epoch_shuffle_within_shard_order_changes).  A per-seed
    multiplier is a different bijection of the hash space each epoch, so
    both the shard assignment and the within-shard order genuinely
    reshuffle.  Each doc lands in shard ``oh % shards`` and at rank
    ``row_number`` by ``(oh, doc_id)`` within the shard.

    Scale shape: this is the anti-global-sort formulation — ORDER BY
    hash over the corpus would be a full range-partitioned sort of 100
    TB; sharding first makes it one hash exchange + an independent
    within-shard sort per shard, embarrassingly parallel and
    straggler-free because the hash balances shard sizes.  Content-keyed
    like hash_split, so re-ingested duplicates keep stable positions.
    """
    seed_h = rolling_hash_py(f"epoch{seed}")
    seed_mult = (2 * seed_h + 1) % ROLLING_MOD or 1
    rh = (
        rolling_hash_expr_duckdb("lower(trim(text))")
        if duck
        else rolling_hash_expr_spark("lower(trim(text))")
    )
    # both factors < MOD ~1e9+7 so the product stays < 1.1e18 < 2^63-1:
    # exact in BIGINT in both engines, no overflow wrap
    return f"""
    WITH h AS (SELECT doc_id, (({rh}) * {seed_mult} + {seed_h}) % {ROLLING_MOD} AS oh
               FROM documents)
    SELECT doc_id, CAST(oh % {shards} AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY oh % {shards}
                ORDER BY oh, doc_id) AS INT) AS pos
    FROM h
    """


def epoch_shuffle(
    spark: SparkSession, sf_dir: str, seed: int = 1, shards: int = EPOCH_SHUFFLE_SHARDS
) -> DataFrame:
    """Seeded deterministic corpus shuffle: (doc_id, shard, pos)."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_epoch_shuffle_sql(duck=False, seed=seed, shards=shards))


def epoch_shuffle_oracle(seed: int = 1, shards: int = EPOCH_SHUFFLE_SHARDS) -> str:
    return _epoch_shuffle_sql(duck=True, seed=seed, shards=shards)


# ---------------------------------------------------------------------------
# Exact BPE tokenizer over a FROZEN merges fixture (r11, VERDICT ask #3)
# ---------------------------------------------------------------------------
# pack_sequences / source_token_cap / mixture_sample budget on whitespace or
# pretoken counts — approximations.  A real pipeline packs on the counts of
# the tokenizer it will train with.  fixtures/bpe_merges.json freezes a tiny
# BPE merge table (tools/fit_bpe_merges.py, deterministic training on the
# sf0.01 corpus), and BOTH engines replay the same merges:
#
# - SQL route (gated): per pretoken, chars joined as ' c1. c2. ...' (each
#   token carries a LEADING space and a TRAILING '.' sentinel), then one
#   replace(' u. v.' -> ' uv.') per merge IN RANK ORDER.  The leading space
#   anchors the START of u (so ' s. t.' cannot match inside 'as'), the '.'
#   anchors the END of v (so ' a. s.' cannot match ' a. st.' — the bug a
#   leading-space-only encoding has), and because each token carries its
#   OWN boundary chars, replace's non-overlapping scan still merges
#   adjacent occurrences (' a. b. a. b.' -> ' ab. ab.').  '.' is safe:
#   multi-symbol tokens are letter-only (below), and a punctuation
#   pretoken is a single symbol that never appears inside a pattern.
#   Rank-order application is equivalent to the
#   canonical lowest-rank-first BPE loop: merging rank r can only create
#   pairs trained AFTER r (any pair containing the new symbol postdates it),
#   so no pair with rank < r ever appears once r is processed; and string
#   replace's left-to-right non-overlapping scan is exactly BPE's
#   leftmost-first merge of all occurrences.  The vectorized twin runs the
#   canonical iterative algorithm, so the parity unit re-proves the
#   equivalence on real data every run.
# - Learned merges are letter-only by construction (only `[a-z]+` pretokens
#   are multi-symbol), so the generated SQL never needs quote escaping.
#
# Scale: the SQL route is a narrow per-row map (no shuffle); the production
# path is tokenize_bpe_vectorized — Arrow-batched with a per-batch word
# cache (Zipf reuse makes cache hits the common case).

import functools


@functools.lru_cache(maxsize=4)
def _load_bpe_fixture(path: str | None = None) -> dict:
    # lru_cache: the gate runner builds both dialects per gate and each
    # build folds 64 merges — one JSON parse per process, not 2-4 per
    # gate evaluation (r11 review find).  ``path`` (r12) lets the
    # large-vocab units/tools load bpe_merges_4k.json through the same
    # cache; the default stays the gate's frozen 64-merge table.
    import json
    import os

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures",
            "bpe_merges.json",
        )
    with open(path) as f:
        return json.load(f)


def _bpe_word_encode_expr(
    duck: bool, var: str = "w", merges: tuple | None = None
) -> str:
    """Encoded-word expression: ``var`` (one pretoken) → ' t1 t2 ...'.
    ``merges`` overrides the frozen fixture table (r12: the route-boundary
    tool builds the chain at arbitrary depth to measure where the nested
    replace expression stops being compilable)."""
    if merges is None:
        merges = _load_bpe_fixture()["merges"]
    expr = (
        f"regexp_replace({var}, '(.)', ' \\1.', 'g')"
        if duck
        else f"regexp_replace({var}, '(.)', ' $1.')"
    )
    for u, v in merges:
        expr = f"replace({expr}, ' {u}. {v}.', ' {u}{v}.')"
    return expr


def _bpe_joined_expr(duck: bool) -> str:
    """Whole-document encoded token stream as ONE string (each token as
    ``' tok.'`` — leading space, trailing sentinel), in pretoken order.
    Exactly one space per token, and tokens never contain spaces, so the
    count is ``length - length(without spaces)`` regardless of what the
    tokens themselves are (a '.' punctuation token encodes as ' ..')."""
    # coalesce: a NULL text must tokenize as the empty stream in BOTH
    # engines (same reasoning as the rolling-hash NULL wrap above)
    words = _bpe_words_expr(duck, "lower(coalesce(text, ''))")
    enc = _bpe_word_encode_expr(duck)
    if duck:
        # coalesce: DuckDB's array_to_string is string_agg underneath, so
        # an EMPTY pretoken list (empty/whitespace-only text) folds to
        # NULL where Spark's array_join gives '' — found by the
        # adversarial boundary unit
        return f"coalesce(array_to_string(list_transform({words}, w -> {enc}), ''), '')"
    return f"array_join(transform({words}, w -> {enc}), '')"


def _tokenize_bpe_sql(duck: bool) -> str:
    # nested select so the merge chain evaluates ONCE per row: Spark's
    # CollapseProject declines to inline a non-cheap alias referenced
    # three times (verified: one regexp_extract_all in the final plan vs
    # three when the expression is written inline)
    j = _bpe_joined_expr(duck)
    return f"""
    SELECT doc_id,
           CAST(length(j) - length(replace(j, ' ', '')) AS INT)
             AS n_bpe_exact,
           md5(j) AS bpe_md5
    FROM (SELECT doc_id, {j} AS j FROM documents)
    """


def tokenize_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BPE token counts + token-stream fingerprint per document,
    against the frozen merges fixture.  Pure SQL both dialects — the
    value-gated source of truth for exact token budgets.

    r12 (guide §2.5): the scan is spread when parallelism-starved (a
    single-row-group file runs the whole 64-deep interpreted replace
    chain on ONE task — measured 1.78 → 1.01 s at sf0.1); identity at
    scale.  Output is per-doc row-local (counts + md5 of the doc's own
    stream), so partitioning cannot change it — re-pinned by the gate.
    """
    from flink_infotheoretic_feature_selection_spark.session import spread_starved_scan

    spread_starved_scan(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        cache_key=f"{sf_dir}/documents.parquet",
    ).createOrReplaceTempView("documents")
    return spark.sql(_tokenize_bpe_sql(duck=False))


def tokenize_bpe_oracle() -> str:
    return _tokenize_bpe_sql(duck=True)


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Canonical iterative BPE encode (lowest-rank pair first, all
    occurrences leftmost-first) — deliberately a DIFFERENT algorithm from
    the SQL route's rank-order replace chain, so their unit-pinned parity
    re-proves the equivalence on real data."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        u, v = best
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == u and syms[i + 1] == v:
                out.append(u + v)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def tokenize_bpe_vectorized(
    spark: SparkSession, sf_dir: str, fixture_path: str | None = None
) -> DataFrame:
    """Arrow-batched production twin of :func:`tokenize_bpe`.

    64 nested ``replace`` calls per pretoken is fine for a value gate but
    is interpreted expression evaluation; the production path tokenizes
    in Python over Arrow batches with a per-worker word→tokens cache
    (natural-language word reuse is Zipfian, so encode work amortizes to
    ~unique-words, not total words).  Output bit-identical to the SQL
    route (parity unit, both the count and the md5).

    ``fixture_path`` (r12, VERDICT r11 ask #3): a production merge table
    (fixtures/bpe_merges_4k.json) instead of the gate's 64-merge one —
    the SQL route cannot compile a 4k-deep replace chain (measured in
    tools/bpe_route_boundary.py / BASELINE.md), so above the boundary
    THIS is the only route, and tests/test_bpe_large_vocab.py pins it
    there against an independent rank-order replay."""
    import hashlib
    import re as _re

    fx = _load_bpe_fixture(fixture_path)
    pat = fx["pretoken_regex"]
    ranks = {tuple(m): i for i, m in enumerate(fx["merges"])}
    # starved-scan spread (r12, guide §2.5): one-row-group input would
    # run the whole Arrow tokenize kernel on one task; identity at scale.
    # Per-doc row-local output — partitioning cannot change it.
    from flink_infotheoretic_feature_selection_spark.session import spread_starved_scan

    docs = spread_starved_scan(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        cache_key=f"{sf_dir}/documents.parquet",
    ).select("doc_id", "text")

    def batches(it):
        import pyarrow as _pa

        # re.ASCII: Python's default \s is UNICODE (includes U+00A0 etc.)
        # where Spark's Java regex \s is ASCII — without the flag the two
        # routes pretokenize non-breaking-space text differently and the
        # "bit-identical" contract breaks (r11 review find).  Residual
        # cross-engine gap documented on the fixture regex: DuckDB's RE2
        # \s excludes \x0B which Java/Python-ASCII include — no route
        # here disagrees, only a \x0B-bearing corpus could show it
        # against the DuckDB oracle.
        rx = _re.compile(pat, _re.ASCII)
        cache: dict[str, str] = {}

        def enc(w: str) -> str:
            s = cache.get(w)
            if s is None:
                s = "".join(" " + t + "." for t in bpe_encode_word(w, ranks))
                cache[w] = s
            return s

        for b in it:
            ids = b.column(0).to_pylist()
            texts = b.column(1).to_pylist()
            ns, md5s = [], []
            for t in texts:
                joined = "".join(enc(w) for w in rx.findall((t or "").lower()))
                ns.append(joined.count(" "))
                md5s.append(hashlib.md5(joined.encode("utf-8")).hexdigest())
            yield _pa.RecordBatch.from_arrays(
                [
                    _pa.array(ids, _pa.int64()),
                    _pa.array(ns, _pa.int32()),
                    _pa.array(md5s, _pa.string()),
                ],
                names=["doc_id", "n_bpe_exact", "bpe_md5"],
            )

    return docs.mapInArrow(
        batches, "doc_id bigint, n_bpe_exact int, bpe_md5 string"
    )


def _pack_exact_sql(duck: bool, budget: int, shards: int) -> str:
    """pack_sequences on EXACT frozen-BPE counts — same shard hash, same
    pack_tail_sql rule, only the n_tokens definition changes."""
    j = _bpe_joined_expr(duck)
    rh = (
        rolling_hash_expr_duckdb("lower(trim(text))")
        if duck
        else rolling_hash_expr_spark("lower(trim(text))")
    )
    return f"""
    WITH t AS (
      SELECT doc_id,
             length(j) - length(replace(j, ' ', '')) AS n_tokens,
             shard
      FROM (SELECT doc_id, {j} AS j, {rh} % {shards} AS shard
            FROM documents)),
    {pack_tail_sql("t", budget)}
    """


def pack_sequences_exact(
    spark: SparkSession, sf_dir: str, budget: int = PACK_BUDGET, shards: int = PACK_SHARDS
) -> DataFrame:
    """:func:`pack_sequences` budgeted on exact frozen-BPE token counts
    (the form a real training pipeline packs with)."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_pack_exact_sql(duck=False, budget=budget, shards=shards))


def pack_sequences_exact_oracle(
    budget: int = PACK_BUDGET, shards: int = PACK_SHARDS
) -> str:
    return _pack_exact_sql(duck=True, budget=budget, shards=shards)
