"""Deduplication operators for LLM training-data pipelines (SURVEY.md §7.4/M7).

Five families, each Spark-first with a DuckDB-portable oracle twin:

- **exact**: hash-groupBy on md5(text); every doc labeled with its group's
  keeper id.  One shuffle on the 16-byte digest — optimal at any scale.
- **n-gram Jaccard**: word-trigram shingles → explode distinct → self-join
  on shingle → pair intersection counts → Jaccard filter.  The join is on
  the shingle key, so only docs sharing a shingle ever meet (never a
  cross-join); skewed ultra-common shingles can be frequency-capped.
- **MinHash**: portable polynomial rolling hash of each shingle feeds
  ``min((a_i·h + b_i) mod p)`` signatures — pure array expressions, no UDF.
- **MinHash-LSH banding**: signatures split into bands; candidate pairs =
  equi-join on (band, band-signature); verified with exact Jaccard.
  Scale path: the band join replaces the quadratic pair space with
  hash-bucket collisions only.
- **SimHash**: 28-bit signature by per-bit majority vote over token
  hashes — array expressions again.

A production deployment would swap the portable rolling hash for
xxhash/murmur (Spark's ``hash``/``xxhash64``); the algebra is identical —
the portable hash exists so DuckDB can verify every stage bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_infotheoretic_feature_selection_spark.operators.text import (
    ROLLING_MOD,
    ROLLING_MULT,
    rolling_hash_expr_duckdb,
    rolling_hash_expr_spark,
)

__all__ = [
    "exact_dedup",
    "shingle_jaccard_pairs",
    "minhash_signatures",
    "minhash_signatures_vectorized",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "simhash64",
    "simhash64_vectorized",
    "with_simhash64",
    "simhash64_pairs",
    "simhash64_components",
    "min_label_union_find",
    "neardup_components",
    "neardup_groups",
    "doc_shingles",
    "doc_shingle_arrays",
    "decontaminate",
    "decontaminate_bloom",
    "decontaminate_query",
    "EXACT_DEDUP_ORACLE",
    "jaccard_pairs_oracle",
    "minhash_signatures_oracle",
    "minhash_lsh_pairs_oracle",
    "simhash_oracle",
    "simhash_pairs_oracle",
    "simhash64_pairs_oracle",
    "simhash64_components_oracle",
    "neardup_groups_oracle",
    "decontaminate_oracle",
    "substring_dup_profile",
    "substring_dup_spans",
    "substring_dup_profile_oracle",
    "substring_dup_spans_oracle",
    "scrub_dup_spans",
    "scrub_dup_spans_oracle",
    "dedup_keep_best",
    "dedup_keep_best_oracle",
]

# MinHash parameters: h_i(x) = (A_i * x + B_i) mod P over the shingle's
# rolling hash. Deterministic, engine-portable.
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    """(a_i, b_i) for h_i(x) = (a_i·x + b_i) mod P — the same fixed
    family at any count, so the default 8 stay oracle-pinned."""
    return [(2 * i + 1, 7919 * (i + 1)) for i in range(n_hashes)]


MINHASH_PARAMS = minhash_params(8)
N_BANDS = 4  # 8 hashes / 4 bands = 2 rows per band
# Band-bucket skew cap: buckets above this are boilerplate-driven hash
# mass, dropped before the quadratic self-join (measured at the 100×
# fixture: ~1000-doc buckets → 63M false candidates; real buckets at
# the gate/bench scales top out at 5/20, so the default never bites
# there and gate outputs are bit-identical with or without it).
LSH_MAX_BUCKET = 256
# 28-bit SimHash: at 16 bits the signature space saturates on any real
# corpus (measured: 60% of ALL doc pairs within Hamming 3 at 5k docs →
# 7M meaningless "near-dup" pairs).  28 keeps Hamming ≤ 3 selective and
# every bit live — the rolling hash is mod 1e9+7 < 2^30, so bits ≥ 30
# of the token hashes are constant and 28 divides evenly into 4 chunks.
SIMHASH_BITS = 28


def _docs(spark: SparkSession, sf_dir: str) -> None:
    # r12 (guide §2.5): a single-row-group documents file scans as ONE
    # task, serializing every per-row signature/shingle expression fused
    # into the scan stage; spread it when starved (identity at scale —
    # see spread_starved_scan).  Safe for every consumer in this module:
    # signatures/shingles/anchors are row-local, aggregations are exact
    # integer merges, and rank windows break ties deterministically —
    # re-pinned by the full gate sweep at sf0.01 and sf0.1.
    from flink_infotheoretic_feature_selection_spark.session import spread_starved_scan

    spread_starved_scan(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        cache_key=f"{sf_dir}/documents.parquet",
    ).createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
_EXACT_SQL = """
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
       count(*) OVER (PARTITION BY md5(text)) AS group_size
FROM documents
"""


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy (window over md5 digest)."""
    _docs(spark, sf_dir)
    return spark.sql(_EXACT_SQL)


EXACT_DEDUP_ORACLE = _EXACT_SQL


# ---------------------------------------------------------------------------
# Word n-gram shingles (shared fragment)
# ---------------------------------------------------------------------------
SHINGLE_TOKENS_EXPR = r"split(trim(lower(text)), '\\s+')"


def shingle_grams_expr(n: int = 3, tokens_col: str = "ts") -> str:
    """Spark-dialect distinct word ``n``-gram array expression over a
    pre-split token array column — the one gram builder shared by
    :func:`_shingles_cte` and streaming callers that must carry extra
    columns (event time) through the shingle explode.  The CASE guard
    makes the expression total on short docs (see the dialect notes in
    :func:`_shingles_cte`).

    Built as ``n`` shifted O(len) slices zipped together, NOT a slice
    per gram position: ``transform(sequence(...), i -> slice(ts, i, n))``
    is O(len²) when the expression lands on a non-codegen path (Spark's
    interpreted ``slice`` walks the array from the start every call),
    and predicate pushdown routinely puts shingle expressions on exactly
    that path — measured 13.6 s for ONE 8k-token doc, quadrupling per
    doc-length doubling, vs milliseconds for this form."""
    m = f"(size({tokens_col}) - {n - 1})"
    grams = f"slice({tokens_col}, 1, {m})"
    for k in range(1, n):
        grams = (
            f"zip_with({grams}, slice({tokens_col}, {k + 1}, {m}), "
            f"(x, y) -> concat(x, ' ', y))"
        )
    return (
        f"CASE WHEN size({tokens_col}) >= {n} THEN "
        f"array_distinct({grams}) "
        f"ELSE array() END"
    )


def _shingles_cte(
    duck: bool, n: int = 3, table: str = "documents", prefix: str = ""
) -> str:
    """CTE `{prefix}sh(doc_id, shingle)` = distinct word n-grams per doc
    of ``table``; ``prefix`` disambiguates when one statement needs
    shingles of two doc sets."""
    if duck:
        tokens = r"string_split_regex(trim(lower(text)), '\s+')"
        return f"""
        {prefix}tok AS (SELECT doc_id, {tokens} AS ts FROM {table}),
        {prefix}sh_all AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ts) - {n - 2}),
                        i -> array_to_string(ts[i : i + {n - 1}], ' '))) AS shingle
          FROM {prefix}tok WHERE len(ts) >= {n}),
        {prefix}sh AS (SELECT DISTINCT doc_id, shingle FROM {prefix}sh_all)
        """
    # Spark dialect: per-doc dedup via array_distinct BEFORE the explode —
    # a narrow per-row expression, vs SELECT DISTINCT's full shuffle of
    # the exploded shingle set (identical result, one less exchange; at
    # corpus scale the exploded-distinct shuffle is the pipeline's
    # largest and this removes it).  The CASE guard makes the expression
    # total: Spark's InferFiltersFromGenerate hoists the generator expr
    # into a predicate evaluated on EVERY row, and on a doc shorter than
    # ``n`` tokens sequence() runs descending into slice(start=0), which
    # throws.  Conditional branches are exempt from that hoisting.
    tokens = SHINGLE_TOKENS_EXPR
    grams = shingle_grams_expr(n, "ts")
    # OUTER explode: InferFiltersFromGenerate only fires on inner
    # explode, and its inferred size(...)>0 predicate re-evaluates the
    # whole (non-codegen, higher-order) gram expression per row in an
    # interpreted Filter — measured 6× slower.  The gram array is never
    # empty after the size(ts) filter, so OUTER is semantically identical.
    return f"""
    {prefix}tok AS (SELECT doc_id, {tokens} AS ts FROM {table}),
    {prefix}sh AS (
      SELECT doc_id, shingle
      FROM {prefix}tok
      LATERAL VIEW OUTER explode({grams}) t AS shingle
      WHERE size(ts) >= {n})
    """


def _jaccard_sql(duck: bool, threshold: float, n: int, max_df: int | None = None) -> str:
    # Skew guard: a shingle appearing in > max_df docs contributes a
    # quadratic pair burst at the join — cap its doc-frequency before the
    # self-join (sizes stay uncapped so Jaccard denominators are exact;
    # intersections through ultra-common shingles are deliberately
    # dropped, the standard near-dup trade at scale).
    cap_cte = (
        f""",
    df_cap AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_df}),
    shj AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN df_cap USING (shingle))"""
        if max_df is not None
        else ",\n    shj AS (SELECT * FROM sh)"
    )
    return f"""
    WITH {_shingles_cte(duck, n)}{cap_cte},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM shj a JOIN shj b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 5) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= {threshold}
    """


def shingle_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.2,
    n: int = 3,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by word-trigram Jaccard ≥ threshold.

    ``max_shingle_df`` drops shingles shared by more than that many docs
    before the self-join — the skew guard for 100 TB corpora where a
    boilerplate trigram would otherwise join millions × millions of rows.
    ON BY DEFAULT (1000): the gated path is the scale-safe path; pass
    ``None`` to disable for exhaustive small-corpus runs.
    """
    _docs(spark, sf_dir)
    return spark.sql(
        _jaccard_sql(duck=False, threshold=threshold, n=n, max_df=max_shingle_df)
    )


def jaccard_pairs_oracle(
    threshold: float = 0.2, n: int = 3, max_shingle_df: int | None = 1000
) -> str:
    return _jaccard_sql(duck=True, threshold=threshold, n=n, max_df=max_shingle_df)


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------
def doc_shingle_arrays(docs: DataFrame, n: int = 3) -> DataFrame:
    """``(doc_id, shingles array<string>)``: the distinct word ``n``-gram
    set per doc as ONE array row, built by an Arrow-batched
    ``mapInArrow`` — one corpus scan, zero shuffle.

    Previously a split → transform → array_distinct expression chain;
    higher-order functions evaluate interpreted per element, and this
    build was the single largest CPU stage of the LSH pipeline (8.2 s of
    a 29 s run on a 50k-doc corpus; the Python loop with interned join
    is ~4×).  Tokenization mirrors the SQL twins EXACTLY (pinned by an
    empirical cross-engine unit test on tab/newline-edged docs):
    ``lower`` → SQL ``trim`` (strips the SPACE character only — NOT
    Java ``String.trim``'s ≤ U+0020 set, and not Python ``strip()``'s
    unicode set) → split on the Java/RE2 ``\\s`` class (not Python's
    unicode-wide ``\\s``) KEEPING leading/trailing empty tokens (Spark
    splits with limit -1, so ``'a b\\t'`` → ``['a','b','']``) →
    first-occurrence dedup (``array_distinct`` order).  Both downstream
    gates (``minhash_lsh_pairs``, ``decontaminate``) verify the values
    bit-exact against DuckDB's ``string_split_regex`` build.  The
    ``doc_id`` column passes through with its INPUT type (the old
    expression chain was type-agnostic; so is this)."""
    id_type = docs.schema["doc_id"].dataType.simpleString()

    def build(batches):
        import re

        import pyarrow as pa

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        for batch in batches:
            keep, arrs = [], []
            for row_i, t in enumerate(batch.column("text").to_pylist()):
                if t is None:
                    continue
                ts = ws.split(t.lower().strip(" "))
                if len(ts) < n:
                    continue
                keep.append(row_i)
                arrs.append(
                    list(
                        dict.fromkeys(
                            " ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)
                        )
                    )
                )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id").take(pa.array(keep, pa.int64())),
                    pa.array(arrs, pa.list_(pa.string())),
                ],
                names=["doc_id", "shingles"],
            )

    return docs.select("doc_id", "text").mapInArrow(
        build, f"doc_id {id_type}, shingles array<string>"
    )


def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word ``n``-gram shingles per doc, long format — the
    expression-form twin of :func:`_shingles_cte` for operators that take
    arbitrary DataFrames.  Per-doc dedup happens inside the array before
    the explode, so there is no DISTINCT shuffle.

    ``explode_outer`` on purpose: inner explode triggers
    InferFiltersFromGenerate, whose inferred predicate re-evaluates the
    whole higher-order gram expression per row in an interpreted Filter
    (measured 6×).  The array is never empty past the size filter, so
    outer ≡ inner here."""
    from pyspark.sql import functions as F

    return doc_shingle_arrays(docs, n).select(
        "doc_id", F.explode_outer("shingles").alias("shingle")
    )


# Default broadcast budget for the exact route's eval-shingle set: the
# same 10 MB order as Spark's own autoBroadcastJoinThreshold default.
# Above it the bloom route's ~2 B/key bitmap broadcast wins the
# cluster-side economics (BASELINE r11 regime table).
DECONTAMINATE_BROADCAST_THRESHOLD = 10 * 1024 * 1024


def choose_decontaminate_route(
    eval_docs: DataFrame,
    n: int = 3,
    threshold_bytes: int = DECONTAMINATE_BROADCAST_THRESHOLD,
) -> tuple[str, int]:
    """(route, estimated_bytes) for ``decontaminate(route="auto")``
    (r12, VERDICT r11 ask #6).

    The regime criterion measured in BASELINE r11: the exact route ships
    the DISTINCT eval-shingle strings to every executor, the bloom route
    a ~2 B/key bitmap — so the choice reduces to estimated distinct
    shingle bytes vs a broadcast budget.  Estimation is ONE cheap agg
    over the eval side only (benchmarks — bounded by construction):
    approx_count_distinct × (avg shingle length + ~48 B of broadcast
    hash-map overhead per entry).  Output equality of the two routes is
    unit-pinned, so this choice is purely a cost decision.
    """
    from pyspark.sql import functions as F

    # ADVICE r12: the estimate folds in exact int64 sum/count instead of
    # a float avg — float summation is fold-order-sensitive, so a
    # layout change (e.g. the starved-scan spread) could flip the route
    # near the threshold boundary; integer sums cannot.
    est = (
        doc_shingles(eval_docs, n)
        .agg(
            F.approx_count_distinct("shingle").alias("nd"),
            F.sum(F.length("shingle").cast("long")).alias("len_sum"),
            F.count("shingle").alias("cnt"),
        )
        .collect()[0]
    )
    avg_len = (est.len_sum or 0) / est.cnt if est.cnt else 0.0
    est_bytes = int((est.nd or 0) * (avg_len + 48.0))
    return ("bloom" if est_bytes > threshold_bytes else "exact", est_bytes)


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    mode: str = "drop",
    max_train_df: int | None = 1000,
    route: str = "exact",
    broadcast_threshold_bytes: int = DECONTAMINATE_BROADCAST_THRESHOLD,
) -> DataFrame:
    """Benchmark decontamination: remove (or flag) training docs sharing
    any word ``n``-gram shingle with an eval/benchmark doc.

    The canonical LLM-pipeline contamination check (n-gram overlap against
    held-out benchmarks).  No reference analogue — extension surface.

    Scale shape: the eval side is a benchmark (thousands of docs, not
    TBs), so its distinct shingle set is explicitly ``broadcast`` — the
    100 TB training corpus is scanned ONCE and never shuffled on text.
    ``max_train_df`` is the boilerplate/skew guard: an eval shingle found
    in more than that many training docs is treated as boilerplate (a
    common phrase, not contamination) and excluded — the same
    doc-frequency cap :func:`shingle_jaccard_pairs` uses.  The cap is
    measured AFTER the broadcast join (a window over the eval-matched
    rows only): the matched set contains every training doc per shared
    shingle, so the per-shingle row count IS its training doc-frequency,
    and the shuffle carries only eval-matching rows instead of the whole
    training shingle set.  Pass ``None`` to skip.

    - ``mode="drop"``: training docs with no contaminated shingle, all
      original columns (left_anti join on doc_id).
    - ``mode="flag"``: ``(doc_id, n_hits)`` for contaminated training
      docs — n_hits = distinct shingles shared with the eval set.

    ``route`` (r12, VERDICT r11 ask #6): ``"exact"`` (this broadcast
    join — the default and the gate's pinned path), ``"bloom"``
    (delegates to :func:`decontaminate_bloom`, bit-identical output), or
    ``"auto"`` — :func:`choose_decontaminate_route` picks by estimated
    distinct eval-shingle broadcast bytes vs
    ``broadcast_threshold_bytes``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    if route not in ("exact", "bloom", "auto"):
        raise ValueError(f"route must be 'exact'/'bloom'/'auto', got {route!r}")
    if route == "auto":
        route, _ = choose_decontaminate_route(
            eval_docs, n, threshold_bytes=broadcast_threshold_bytes
        )
    if route == "bloom":
        return decontaminate_bloom(
            train_docs, eval_docs, n=n, mode=mode, max_train_df=max_train_df
        )
    train_sh = doc_shingles(train_docs, n)
    eval_sh = doc_shingles(eval_docs, n).select("shingle").distinct()
    matched = train_sh.join(F.broadcast(eval_sh), "shingle")
    if max_train_df is not None:
        matched = matched.withColumn(
            "__df", F.count("*").over(Window.partitionBy("shingle"))
        ).where(F.col("__df") <= max_train_df)
    hits = matched.groupBy("doc_id").agg(F.count("*").alias("n_hits"))
    if mode == "flag":
        return hits
    return train_docs.join(hits, "doc_id", "left_anti")


# Gate fixture: eval set = every 20th doc (deterministic 5% split of the
# documents table), train = the rest; flag-mode output.
DECONTAMINATE_EVAL_PRED = "doc_id % 20 = 0"


def decontaminate_bloom(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    mode: str = "drop",
    max_train_df: int | None = 1000,
    bits_per_key: int = 16,
    n_hashes: int = 7,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom-filter pre-filter on the train
    side — IDENTICAL output (false positives die in the exact join that
    follows), different plan for when the eval shingle set is too large
    to broadcast-hash-join raw.

    The pattern Spark's own runtime row-group filters use, done at the
    operator level: the eval shingles reduce to a ~``bits_per_key`` bits/
    key bitmap (16 bits/key + 7 probes ≈ 0.04% FP rate) that broadcasts
    in MBs where the raw shingle strings would be 10-100× that; the
    100 TB train side is scanned once, each shingle pays two codegen
    ``xxhash64`` calls (JVM side) plus ``n_hashes`` vectorized bitmap
    probes in one Arrow batch UDF, and only survivors (true matches +
    the FP trickle) reach the exact join/cap/aggregate — which stays
    bit-identical to :func:`decontaminate` because the join removes FPs
    and the df-cap window runs on the same matched set.

    Build side: eval shingle (h1, h2) = (xxhash64(s), xxhash64(s, '2'))
    pairs collect to the driver (16 B per DISTINCT eval shingle — eval
    sets are benchmarks, bounded by construction; at 10M shingles that
    is 160 MB, still driver-feasible, and the bitmap itself stays
    ``m/8`` bytes).  Double hashing ``h1 + i*h2`` over a power-of-two
    ``m`` (Kirsch-Mitzenmacher) gives the ``n_hashes`` probe positions;
    uint64 wraparound is identical in the NumPy build and probe kernels
    by construction (both ``view(uint64)`` the JVM's signed hashes).
    """
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    train_sh = doc_shingles(train_docs, n)
    # eager localCheckpoint, not persist: the eval shingle pipeline feeds
    # BOTH the bitmap build (toPandas below) and the exact-verify join —
    # without materialization the explode+distinct runs twice (r11 review
    # find).  A persist() here leaked (r11 advisor): nothing unpersisted
    # it, so looped callers (bench min-of-3, pipelines) accumulated cached
    # RDDs for the session lifetime — cache-manager entries are keyed on
    # the plan and never GC-reclaimed.  localCheckpoint blocks ARE
    # context-cleaned when the returned frame is collected and dropped,
    # and the eval side is bounded by construction (benchmarks).
    eval_sh = (
        doc_shingles(eval_docs, n)
        .select("shingle")
        .distinct()
        .localCheckpoint(eager=True)
    )

    h_exprs = [
        F.xxhash64(F.col("shingle")).alias("h1"),
        F.xxhash64(F.col("shingle"), F.lit("2")).alias("h2"),
    ]
    # Arrow collect, not Row collect: at millions of eval shingles the
    # py4j Row path costs 10+ s where toPandas moves the two int64
    # columns in one Arrow batch (measured r11, 2.8M keys)
    pairs = eval_sh.select(*h_exprs).toPandas()
    n_keys = max(len(pairs), 1)
    m = 1 << max(int(n_keys * bits_per_key - 1).bit_length(), 6)
    mask = np.uint64(m - 1)
    h1 = pairs["h1"].to_numpy(dtype=np.int64).view(np.uint64)
    h2 = pairs["h2"].to_numpy(dtype=np.int64).view(np.uint64)
    bitmap = np.zeros(m >> 3, dtype=np.uint8)
    for i in range(n_hashes):
        idx = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(
            bitmap,
            (idx >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
        )

    spark = train_docs.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)
    k = n_hashes

    @pandas_udf("boolean")
    def might_contain(s1, s2):
        import numpy as _np
        import pandas as _pd

        bm = bc.value
        a = s1.to_numpy(dtype=_np.int64).view(_np.uint64)
        b = s2.to_numpy(dtype=_np.int64).view(_np.uint64)
        ok = _np.ones(len(a), dtype=bool)
        for i in range(k):
            idx = (a + _np.uint64(i) * b) & mask
            ok &= (
                (bm[(idx >> _np.uint64(3)).astype(_np.int64)]
                 >> (idx & _np.uint64(7)).astype(_np.uint8))
                & _np.uint8(1)
            ).astype(bool)
        return _pd.Series(ok)

    candidates = (
        train_sh.select("*", *h_exprs)
        .where(might_contain(F.col("h1"), F.col("h2")))
        .drop("h1", "h2")
    )
    # exact tail — same join/cap/agg as decontaminate(), FPs die here.
    # NO broadcast hint (r11 review find: forcing it would re-ship the
    # raw eval strings this operator exists to avoid shipping): after
    # the bloom filter the candidate side is ~matches + the FP trickle,
    # so AQE picks a broadcast only when the eval side is genuinely
    # small and a shuffle join of two pruned sides otherwise.
    matched = candidates.join(eval_sh, "shingle")
    if max_train_df is not None:
        matched = matched.withColumn(
            "__df", F.count("*").over(Window.partitionBy("shingle"))
        ).where(F.col("__df") <= max_train_df)
    hits = matched.groupBy("doc_id").agg(F.count("*").alias("n_hits"))
    if mode == "flag":
        return hits
    return train_docs.join(hits, "doc_id", "left_anti")


def decontaminate_query(
    spark: SparkSession, sf_dir: str, n: int = 3, max_train_df: int | None = 1000
) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    eval_docs = docs.where(F.expr(DECONTAMINATE_EVAL_PRED))
    train_docs = docs.where(~F.expr(DECONTAMINATE_EVAL_PRED))
    return decontaminate(train_docs, eval_docs, n=n, mode="flag", max_train_df=max_train_df)


def decontaminate_oracle(n: int = 3, max_train_df: int | None = 1000) -> str:
    cap = (
        f""",
    df_ok AS (SELECT shingle FROM train_sh GROUP BY shingle
              HAVING count(*) <= {max_train_df}),
    eval_sh AS (SELECT shingle FROM eval_sh0 JOIN df_ok USING (shingle))"""
        if max_train_df is not None
        else ",\n    eval_sh AS (SELECT shingle FROM eval_sh0)"
    )
    return f"""
    WITH {_shingles_cte(duck=True, n=n)},
    train_sh AS (SELECT * FROM sh WHERE NOT ({DECONTAMINATE_EVAL_PRED})),
    eval_sh0 AS (SELECT DISTINCT shingle FROM sh WHERE {DECONTAMINATE_EVAL_PRED}){cap}
    SELECT doc_id, count(*) AS n_hits
    FROM train_sh JOIN eval_sh USING (shingle)
    GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------
def _minhash_sql(duck: bool, n: int = 3) -> str:
    rh = rolling_hash_expr_duckdb("s") if duck else rolling_hash_expr_spark("s")
    xform = "list_transform" if duck else "transform"
    lmin = "list_min" if duck else "array_min"
    collect = "list(shingle)" if duck else "collect_list(shingle)"
    mh_cols = ",\n           ".join(
        f"{lmin}({xform}(hs, h -> ({a} * h + {b}) % {MINHASH_P})) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    )
    return f"""
    WITH {_shingles_cte(duck, n)},
    hs AS (
      SELECT doc_id, {xform}({collect}, s -> {rh}) AS hs
      FROM sh GROUP BY doc_id)
    SELECT doc_id,
           {mh_cols}
    FROM hs
    """


def minhash_signatures(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """8-hash MinHash signature per document (pure array expressions)."""
    _docs(spark, sf_dir)
    return spark.sql(_minhash_sql(duck=False, n=n))


def minhash_signatures_oracle(n: int = 3) -> str:
    return _minhash_sql(duck=True, n=n)


def _minhash_arrow_kernel(params: list[tuple[int, int]]):
    """mapInPandas kernel ``(doc_id, shingles)`` → ``(doc_id, mh0..)``.

    The expression route's per-shingle rolling hash is an ``aggregate``
    fold over characters INSIDE a ``transform`` — interpreted per char
    per shingle, the same CodegenFallback class as the SimHash64
    majority fold (measured 59.6 s for the signature pass at 500k
    docs).  Here the whole batch's shingles concatenate into ONE
    codepoint vector (utf-32 decode — codepoints, matching Spark's
    ``ascii``), the rolling fold runs column-wise across character
    positions (max-shingle-length vectorized steps, masked by per-
    shingle length), and each of the 8 min-hashes is one
    ``np.minimum.reduceat`` over doc offsets.  Integer-only math —
    bit-identical to the SQL route (unit-pinned).
    """
    import pandas as pd

    def kernel(batches):
        import numpy as np

        mh_names = [f"mh{i}" for i in range(len(params))]
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64")}
                    | {c: pd.Series([], dtype="int64") for c in mh_names}
                )
                continue
            sh_counts = pdf["shingles"].map(len).to_numpy()
            all_sh = [s for lst in pdf["shingles"] for s in lst]
            char_lens = np.fromiter(
                (len(s) for s in all_sh), dtype=np.int64, count=len(all_sh)
            )
            codes = np.frombuffer(
                "".join(all_sh).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            starts = np.zeros(len(all_sh), dtype=np.int64)
            np.cumsum(char_lens[:-1], out=starts[1:])
            h = np.zeros(len(all_sh), dtype=np.int64)
            for p in range(int(char_lens.max(initial=0))):
                act = char_lens > p
                h[act] = (h[act] * ROLLING_MULT + codes[starts[act] + p]) % ROLLING_MOD
            doc_offsets = np.zeros(len(sh_counts), dtype=np.int64)
            np.cumsum(sh_counts[:-1], out=doc_offsets[1:])
            out = {"doc_id": pdf["doc_id"].to_numpy()}
            for name, (a, b) in zip(mh_names, params):
                out[name] = np.minimum.reduceat((a * h + b) % MINHASH_P, doc_offsets)
            yield pd.DataFrame(out)

    return kernel


def minhash_signatures_vectorized(
    spark: SparkSession, sf_dir: str, n: int = 3, n_hashes: int = 8
) -> DataFrame:
    """Arrow-vectorized twin of :func:`minhash_signatures` — identical
    signatures, FUSED into one kernel: tokenize (the
    :func:`doc_shingle_arrays` rules exactly), build shingles, hash and
    take minima all inside a single ``mapInPandas``, so the
    corpus-sized shingle-string array never crosses an Arrow boundary.
    Measured at 500k docs on a realistically-partitioned corpus
    (32 files): SQL route 23.2 s → 3.0 s (7.7×; BASELINE, incl. the
    single-file-layout caveat).  Two deliberate deviations from the
    array builder, both invisible in the output: shingles are NOT
    deduped (min over a multiset equals min over its set) and never
    materialized as Python strings (the rolling hash composes:
    H(a||b) = H(a)·31^|b| + H(b) mod p, so a shingle's hash derives
    from its tokens' hashes, each char touched once).  The SQL route
    stays the gated form; equality is unit-pinned."""
    import pandas as pd

    params = minhash_params(n_hashes)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mh_names = [f"mh{i}" for i in range(len(params))]
    schema = "doc_id long, " + ", ".join(f"{c} long" for c in mh_names)

    def kernel(batches):
        import re

        import numpy as np

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        for pdf in batches:
            doc_ids, tok_lists = [], []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                if t is None:
                    continue
                ts = ws.split(t.lower().strip(" "))
                if len(ts) < n:
                    continue
                doc_ids.append(did)
                tok_lists.append(ts)
            if not doc_ids:
                yield pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64")}
                    | {c: pd.Series([], dtype="int64") for c in mh_names}
                )
                continue
            # per-token rolling hash + 31^len, columnwise over characters
            all_toks = [t for ts in tok_lists for t in ts]
            char_lens = np.fromiter(
                (len(t) for t in all_toks), dtype=np.int64, count=len(all_toks)
            )
            codes = np.frombuffer(
                "".join(all_toks).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            starts = np.zeros(len(all_toks), dtype=np.int64)
            np.cumsum(char_lens[:-1], out=starts[1:])
            th = np.zeros(len(all_toks), dtype=np.int64)
            p31 = np.ones(len(all_toks), dtype=np.int64)
            for p in range(int(char_lens.max(initial=0))):
                act = char_lens > p
                th[act] = (th[act] * ROLLING_MULT + codes[starts[act] + p]) % ROLLING_MOD
                p31[act] = (p31[act] * ROLLING_MULT) % ROLLING_MOD
            # shingle hash by composition: fold token hashes with the
            # joining space (code 32) — H(a ' ' b) = (H(a)*31 + 32)*31^|b| + H(b)
            tok_counts = np.fromiter(
                (len(ts) for ts in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            tok_offsets = np.zeros(len(tok_counts), dtype=np.int64)
            np.cumsum(tok_counts[:-1], out=tok_offsets[1:])
            n_sh = tok_counts - (n - 1)  # ≥1 by the len(ts) >= n filter
            # shingle s of doc d uses tokens tok_offsets[d]+s .. +s+n-1;
            # flatten all shingles via a doc-relative index grid
            sh_doc = np.repeat(np.arange(len(tok_counts)), n_sh)
            sh_first = (
                np.arange(len(sh_doc)) - np.repeat(np.cumsum(n_sh) - n_sh, n_sh)
            ) + tok_offsets[sh_doc]
            h = th[sh_first]
            for j in range(1, n):
                tj = sh_first + j
                h = ((h * ROLLING_MULT + 32) % ROLLING_MOD * p31[tj] + th[tj]) % ROLLING_MOD
            sh_offsets = np.zeros(len(n_sh), dtype=np.int64)
            np.cumsum(n_sh[:-1], out=sh_offsets[1:])
            out = {"doc_id": np.asarray(doc_ids, dtype=np.int64)}
            for name, (a, b) in zip(mh_names, params):
                out[name] = np.minimum.reduceat((a * h + b) % MINHASH_P, sh_offsets)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(kernel, schema)


def _lsh_sql(
    duck: bool, threshold: float, n: int, max_bucket: int | None = None
) -> str:
    rows_per_band = len(MINHASH_PARAMS) // N_BANDS
    band_keys = []
    for band in range(N_BANDS):
        cols = [f"mh{band * rows_per_band + r}" for r in range(rows_per_band)]
        band_keys.append(f"concat_ws(',', {', '.join(cols)})")
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS bkey, {i} AS band FROM sig" for i, b in enumerate(band_keys)
    )
    # band-bucket skew cap (same role as the jaccard max_df guard): a
    # band key shared by more than max_bucket docs is boilerplate-driven
    # hash mass, not similarity signal — drop the bucket before the
    # quadratic self-join
    cap = (
        f""",
    bucket_ok AS (SELECT band, bkey FROM bands
                  GROUP BY band, bkey HAVING count(*) <= {max_bucket}),
    bands_ok AS (SELECT bands.* FROM bands JOIN bucket_ok USING (band, bkey))"""
        if max_bucket is not None
        else ",\n    bands_ok AS (SELECT * FROM bands)"
    )
    return f"""
    WITH {_shingles_cte(duck, n)},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    sig AS ({_minhash_sql(duck, n).strip()}),
    bands AS ({band_union}){cap},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands_ok a JOIN bands_ok b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
    inter AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_inter
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      JOIN cand c ON c.doc_a = x.doc_id AND c.doc_b = y.doc_id
      GROUP BY x.doc_id, y.doc_id)
    SELECT doc_a, doc_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 5) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= {threshold}
    """


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.2,
    n: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
    vectorized: bool = True,
    max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """LSH-banded candidate pairs verified by exact Jaccard.

    Scale path: candidates come from the band-bucket equi-join, so the
    pair space is hash collisions, not n².

    ``n_hashes``/``n_bands`` are the precision/recall dial for corpora
    where the default 4×2 banding over-generates candidates (candidate
    probability per band ≈ J^(rows_per_band)): more rows per band cuts
    false candidates ~J² per extra row at the cost of recall on
    borderline pairs; bands of 1 row maximize recall.  With the same
    hash family, 1-row bands admit a SUPERSET of any wider banding's
    candidates (a k-row band match implies k single-row matches) —
    pinned by test.  Only the 8×4 default has a DuckDB oracle twin.

    DataFrame pipeline rather than one SQL statement on purpose: Spark
    inlines CTEs, so the SQL form recomputes the shingle build four
    times (sizes, signatures, both sides of the verify join).  Here the
    per-doc shingle array is built ONCE — as a narrow per-row
    ``array_distinct(transform(...))`` chain with ZERO shuffle
    (:func:`doc_shingle_arrays`; the explode → DISTINCT → collect_list
    route would shuffle the full shingle set twice) — and persisted;
    signatures and bands derive from it, and verification is
    `array_intersect` on the two arrays (order-independent, exact)
    instead of a second self-join on the exploded shingle table.  AQE
    picks broadcast vs shuffle for the verify join from the (small)
    array table's stats.
    """
    from pyspark.sql import functions as F

    if n_hashes % n_bands != 0:
        raise ValueError(f"n_bands={n_bands} must divide n_hashes={n_hashes}")
    params = minhash_params(n_hashes)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Checkpoint the LINEAR per-doc array table (reused by the
    # signature build and both verify sides) and return the pair
    # listing LAZILY — materializing a family-quadratic output is the
    # failure mode the 100× fixture exposed on simhash64_pairs
    # (BASELINE round-5 continuation).
    docs_arr = doc_shingle_arrays(docs, n).localCheckpoint(eager=True)

    if vectorized:
        # Arrow kernel over the SAME persisted shingle-array table —
        # identical integers (unit-pinned).  r9: DEFAULT now that
        # bit-equality is pinned (2-8x on multi-file corpora); the gate
        # wrappers pass vectorized=False so the driver keeps verifying
        # the expression route (the single oracle-checked source of
        # truth), with parity units bridging the two.
        schema = "doc_id long, " + ", ".join(f"mh{i} long" for i in range(n_hashes))
        sig = docs_arr.select("doc_id", "shingles").mapInPandas(
            _minhash_arrow_kernel(params), schema
        )
    else:
        rh = rolling_hash_expr_spark("s")
        sig = docs_arr.select(
            "doc_id", F.expr(f"transform(shingles, s -> {rh})").alias("hs")
        ).select(
            "doc_id",
            *[
                F.expr(
                    f"array_min(transform(hs, h -> ({a} * h + {b}) % {MINHASH_P}))"
                ).alias(f"mh{i}")
                for i, (a, b) in enumerate(params)
            ],
        )

    rows_per_band = n_hashes // n_bands
    band_structs = ", ".join(
        "struct({band} AS band, concat_ws(',', {cols}) AS bkey)".format(
            band=band,
            cols=", ".join(f"mh{band * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for band in range(n_bands)
    )
    bands = sig.select(
        "doc_id", F.explode(F.expr(f"array({band_structs})")).alias("bb")
    ).select("doc_id", "bb.band", "bb.bkey")
    if max_bucket is not None:
        # band-bucket skew cap: a band key shared by more than
        # max_bucket docs is boilerplate-driven hash mass (common
        # low-hash shingles pin the min for whole corpus swathes — the
        # 100× fixture produced ~1000-doc buckets → 63M false
        # candidates), not similarity signal.  The window shuffles on
        # the SAME (band, bkey) key the self-join needs, so the cap
        # costs no extra exchange pattern; a genuinely similar pair
        # loses only buckets BOTH its docs share with > max_bucket
        # others and keeps its other bands.
        from pyspark.sql import Window

        bands = bands.withColumn(
            "__bn", F.count("*").over(Window.partitionBy("band", "bkey"))
        ).where(F.col("__bn") <= max_bucket).drop("__bn")

    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    arr_a = docs_arr.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    arr_b = docs_arr.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - n_inter)
    # Size-ratio prefilter before the O(|A|+|B|) intersect: J(A,B) ≤
    # min(|A|,|B|)/max(|A|,|B|) always (the intersection can't exceed the
    # smaller set, the union can't undercut the larger), so a pair whose
    # set sizes are too lopsided can NEVER reach the threshold — dropped
    # by two int comparisons, semantics untouched.  Conjunct order
    # matters: Spark evaluates And left-to-right, so the cheap test must
    # come first to short-circuit the array intersect.
    size_ok = (
        F.least(F.size("sh_a"), F.size("sh_b"))
        >= threshold * F.greatest(F.size("sh_a"), F.size("sh_b"))
    )
    pairs = (
        cand.join(arr_a, "doc_a")
        .join(arr_b, "doc_b")
        .filter(size_ok & (jac >= threshold))
        .select("doc_a", "doc_b", F.round(jac, 5).alias("jaccard"))
    )
    return pairs


def minhash_lsh_pairs_oracle(
    threshold: float = 0.2, n: int = 3, max_bucket: int | None = LSH_MAX_BUCKET
) -> str:
    return _lsh_sql(duck=True, threshold=threshold, n=n, max_bucket=max_bucket)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def _simhash_sql(duck: bool) -> str:
    rh = rolling_hash_expr_duckdb("t") if duck else rolling_hash_expr_spark("t")
    xform = "list_transform" if duck else "transform"
    flt = "list_filter" if duck else "filter"
    size = "len" if duck else "size"
    tokens = (
        r"string_split_regex(trim(lower(text)), '\s+')"
        if duck
        else r"split(trim(lower(text)), '\\s+')"
    )
    dedupe = "list_distinct" if duck else "array_distinct"
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * {size}({flt}(hs, h -> (h >> {b}) & 1 = 1)) >= {size}(hs) "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
    WITH hs AS (
      SELECT doc_id, {xform}({dedupe}({tokens}), t -> {rh}) AS hs
      FROM documents)
    SELECT doc_id, {bit_terms} AS simhash
    FROM hs
    """


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """28-bit SimHash per document (per-bit majority over token hashes)."""
    _docs(spark, sf_dir)
    return spark.sql(_simhash_sql(duck=False))


def simhash_oracle() -> str:
    return _simhash_sql(duck=True)


# SimHash Hamming pairs: 28-bit signatures split into 4 chunks of 7 bits;
# by pigeonhole any pair within Hamming distance 3 agrees on >= 1 chunk,
# so the candidate join on (chunk_idx, chunk_value) is exact for k <= 3.
SIMHASH_CHUNKS = 4
SIMHASH_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS


def _simhash_pairs_sql(duck: bool, max_hamming: int = 3) -> str:
    if max_hamming >= SIMHASH_CHUNKS:
        raise ValueError(
            f"chunk banding is only exact for max_hamming < {SIMHASH_CHUNKS}"
        )
    mask = (1 << SIMHASH_CHUNK_BITS) - 1
    if duck:
        chunk_src = f"SELECT unnest(range(0, {SIMHASH_CHUNKS})) AS c"
        chunk_val = f"(simhash >> (c * {SIMHASH_CHUNK_BITS})) & {mask}"
        ham = "bit_count(xor(CAST(sim_a AS BIGINT), CAST(sim_b AS BIGINT)))"
        # Oracle keeps the straightforward DISTINCT dedup — simpler to
        # audit, identical values.
        dedup_cand = f"""
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sim_a, b.simhash AS sim_b
      FROM chunks a JOIN chunks b
        ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST({ham} AS INT) AS hamming
    FROM cand
    WHERE {ham} <= {max_hamming}
    """
        return f"""
    WITH sig AS ({_simhash_sql(duck).strip()}),
    chunk_ids AS ({chunk_src}),
    chunks AS (
      SELECT doc_id, simhash, c AS chunk_idx, {chunk_val} AS chunk_val
      FROM sig CROSS JOIN chunk_ids),{dedup_cand}"""
    chunk_src = f"SELECT explode(sequence(0, {SIMHASH_CHUNKS - 1})) AS c"
    chunk_val = f"shiftright(simhash, c * {SIMHASH_CHUNK_BITS}) & {mask}"
    ham = "bit_count(CAST(sim_a AS BIGINT) ^ CAST(sim_b AS BIGINT))"
    # First-match banding instead of DISTINCT (see simhash64_pairs): a
    # pair matching on k chunks leaves the join k times; keeping it only
    # from its lowest matching chunk is a codegen-friendly CASE chain of
    # bit tests, so the duplicate volume never reaches a dedup exchange.
    xor = "CAST(sim_a AS BIGINT) ^ CAST(sim_b AS BIGINT)"
    first_chunk = (
        "CASE "
        + " ".join(
            f"WHEN (shiftright({xor}, {c * SIMHASH_CHUNK_BITS}) & {mask}) = 0 THEN {c}"
            for c in range(SIMHASH_CHUNKS - 1)
        )
        + f" ELSE {SIMHASH_CHUNKS - 1} END"
    )
    return f"""
    WITH sig AS ({_simhash_sql(duck).strip()}),
    chunk_ids AS ({chunk_src}),
    chunks AS (
      SELECT doc_id, simhash, c AS chunk_idx, {chunk_val} AS chunk_val
      FROM sig CROSS JOIN chunk_ids),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sim_a, b.simhash AS sim_b, a.chunk_idx AS chunk_idx
      FROM chunks a JOIN chunks b
        ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST({ham} AS INT) AS hamming
    FROM cand
    WHERE chunk_idx = {first_chunk} AND {ham} <= {max_hamming}
    """


def simhash_pairs(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Scale shape: candidates come from the 7-bit-chunk equi-join
    (pigeonhole guarantees exactness for ``max_hamming`` < 4), so the
    pair space is bucket collisions, never n² — the same banding idea as
    MinHash-LSH but over the 28-bit fingerprint.  No reference analogue
    (extension mandate).

    DataFrame pipeline rather than the one-statement SQL form (which the
    oracle uses) because Spark inlines CTEs: the SQL form computes the
    corpus signature pass twice, once per self-join side.  Here the tiny
    LINEAR ``(doc_id, simhash)`` table is computed ONCE and
    checkpointed; the pair listing returns LAZILY (materializing a
    family-quadratic output is the 100×-fixture failure mode BASELINE
    records for simhash64_pairs).

    r12: the chunk join now runs at the DISTINCT-SIGNATURE level with
    first-match banding — :func:`simhash64_chunk_index`'s SCALE RULE,
    previously applied only to the 64-bit production form.  The 28-bit
    signature SATURATES on template-heavy corpora (identical-signature
    families), which made the old doc-level join + DISTINCT dedup
    family-quadratic *inside the exchange*: every duplicate candidate
    (a pair matching k chunks exits the join k times, identical
    signatures all 4) was shuffled just to be discarded.  Signatures
    are joined once, verified once, and only TRUE near-signature pairs
    pay the doc expansion — identical output rows (the same unordered
    pair set, pinned by the value gate).
    """
    if max_hamming >= SIMHASH_CHUNKS:
        raise ValueError(
            f"chunk banding is only exact for max_hamming < {SIMHASH_CHUNKS}"
        )
    from pyspark.sql import functions as F

    _docs(spark, sf_dir)
    sig = spark.sql(_simhash_sql(duck=False)).localCheckpoint(eager=True)
    mask = (1 << SIMHASH_CHUNK_BITS) - 1

    def chunk_index(df, sig_alias):
        # simhash is a non-negative 28-bit INT: plain shiftright is the
        # unsigned shift here
        return df.select(
            F.col("simhash").alias(sig_alias),
            F.explode(
                F.expr(
                    f"transform(sequence(0, {SIMHASH_CHUNKS - 1}), c -> struct("
                    f"c AS chunk_idx, "
                    f"shiftright(simhash, c * {SIMHASH_CHUNK_BITS}) & {mask}"
                    f" AS chunk_val))"
                )
            ).alias("cc"),
        ).select(sig_alias, "cc.chunk_idx", "cc.chunk_val")

    dsig = sig.select("simhash").distinct()
    cand = (
        chunk_index(dsig, "sim_a")
        .alias("a")
        .join(
            chunk_index(dsig, "sim_b").alias("b"),
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("sim_a") <= F.col("sim_b")),
        )
        .select("sim_a", "sim_b", F.col("a.chunk_idx").alias("chunk_idx"))
    )
    # First-match banding (see simhash64_first_match_verify): keep a
    # signature pair only from its LOWEST matching chunk — a narrow
    # codegen CASE of bit tests, so duplicate candidates never reach an
    # exchange where the old DISTINCT shuffled them all.
    xor = "CAST(sim_a AS BIGINT) ^ CAST(sim_b AS BIGINT)"
    first_chunk = F.expr(
        "CASE "
        + " ".join(
            f"WHEN (shiftright({xor}, {c * SIMHASH_CHUNK_BITS}) & {mask}) = 0 THEN {c}"
            for c in range(SIMHASH_CHUNKS - 1)
        )
        + f" ELSE {SIMHASH_CHUNKS - 1} END"
    )
    ham = F.expr(f"bit_count({xor})")
    spairs = (
        cand.filter(F.col("chunk_idx") == first_chunk)
        .filter(ham <= max_hamming)
        .select("sim_a", "sim_b", ham.cast("int").alias("hamming"))
    )
    docs_a = sig.select(F.col("doc_id").alias("ida"), F.col("simhash").alias("sim_a"))
    docs_b = sig.select(F.col("doc_id").alias("idb"), F.col("simhash").alias("sim_b"))
    return (
        spairs.join(docs_a, "sim_a")
        .join(docs_b, "sim_b")
        # equal-signature self-pairs expand to intra-family pairs once
        # via the id order; cross-signature pairs are unordered-unique
        # already (sim_a < sim_b), so any id orientation appears once
        .where((F.col("sim_a") != F.col("sim_b")) | (F.col("ida") < F.col("idb")))
        .select(
            F.least("ida", "idb").alias("doc_a"),
            F.greatest("ida", "idb").alias("doc_b"),
            "hamming",
        )
    )


def simhash_pairs_oracle(max_hamming: int = 3) -> str:
    return _simhash_pairs_sql(duck=True, max_hamming=max_hamming)


# ---------------------------------------------------------------------------
# Production-scale 64-bit SimHash (xxhash64 token hashes)
# ---------------------------------------------------------------------------
# The 28-bit portable signature above exists for the DuckDB oracle; on a
# template-heavy corpus it SATURATES — measured at sf0.1 (5k docs): 374k
# docs pairs share an identical 28-bit signature, so the intra-bucket
# pair space goes quadratic (the one latent scale-killer flagged in the
# round-3 plan audit).  Production path: 64-bit signatures from
# xxhash64 token hashes.  No DuckDB twin (xxhash64 is Spark-native), so
# this variant is pinned by unit tests (determinism, 28↔64 saturation
# ratio) and a rows-only gate entry instead of a value oracle.
SIMHASH64_BITS = 64
SIMHASH64_CHUNKS = 8  # 8 chunks × 8 bits: pigeonhole-exact for hamming ≤ 7
SIMHASH64_CHUNK_BITS = SIMHASH64_BITS // SIMHASH64_CHUNKS

# Token-hash functions for the 64-bit signature.  The HASH is the only
# engine-specific piece of the whole 64-bit pipeline — everything
# downstream (per-bit majority fold, chunk banding, components) consumes
# a plain BIGINT array and is hash-agnostic:
#   - "xxhash64": Spark-native codegen hash, the production default.  No
#     DuckDB analogue, so paths built on it are pinned by unit tests and
#     a frozen golden-signature fixture instead of a SQL oracle.
#   - "md5": portable twin — the top/bottom 8 hex chars of md5(token)
#     parsed as two 32-bit halves and recombined into the same signed
#     64-bit bit pattern in BOTH engines (Spark: conv(...,16,10) halves
#     + shiftleft|or, which is pure bit assembly and never
#     overflow-checks; DuckDB: ('0x'||substr)::BIGINT halves kept
#     SEPARATE because DuckDB's << overflow-checks — Hamming distance
#     over halves is identical to Hamming over the combined word).  The
#     driver gate runs the md5 variant so the banding/majority/component
#     machinery gets a full cross-engine value check; a unit test pins
#     both variants' pair geometry on the same fixture.
SIMHASH64_HASH_FNS = ("xxhash64", "md5")


def _simhash64_hash_expr(hash_fn: str, token: str = "t") -> str:
    """Spark SQL expression hashing one token to a signed 64-bit BIGINT."""
    if hash_fn == "xxhash64":
        return f"xxhash64({token})"
    if hash_fn == "md5":
        return (
            f"shiftleft(CAST(conv(substr(md5({token}), 1, 8), 16, 10) AS BIGINT), 32)"
            f" | CAST(conv(substr(md5({token}), 9, 8), 16, 10) AS BIGINT)"
        )
    raise ValueError(f"hash_fn must be one of {SIMHASH64_HASH_FNS}, got {hash_fn!r}")


def _simhash64_sql(hash_fn: str = "xxhash64") -> str:
    """Signature build as one Spark SQL statement.

    TEST ORACLE ONLY: production paths (:func:`simhash64` and
    everything built on it) derive signatures from
    :func:`with_simhash64`, the single source of truth; this
    independent SQL formulation exists so a unit test can pin the two
    bit-equal and catch drift in either.

    Per-bit majority in a SINGLE ``aggregate`` pass over the token-hash
    array (the 28-bit build's 28 separate filter() scans would be 64
    here — same asymptotics, 64× the expression-tree size and codegen
    pressure).  ANSI-safe assembly: Spark 4 defaults
    spark.sql.ansi.enabled=true, where a signed acc*2 fold through bit
    63 would overflow-THROW, so the word is built as two 32-bit halves
    (each < 2^32, no overflow possible) recombined with bitwise
    shiftleft|or — bit ops never overflow-check.
    """
    maj = "IF(2 * element_at(cnts, i + 1) >= n, 1, 0)"
    hash_expr = _simhash64_hash_expr(hash_fn)
    return rf"""
    WITH hs AS (
      SELECT doc_id,
             transform(array_distinct(split(trim(lower(text)), '\\s+')),
                       t -> {hash_expr}) AS hs
      FROM documents),
    cnt AS (
      SELECT doc_id, size(hs) AS n,
             aggregate(hs, array_repeat(CAST(0 AS BIGINT), {SIMHASH64_BITS}),
               (acc, h) -> zip_with(acc, sequence(0, {SIMHASH64_BITS - 1}),
                 (a, i) -> a + (shiftrightunsigned(h, CAST(i AS INT)) & 1))) AS cnts
      FROM hs),
    sig AS (
      SELECT doc_id,
             aggregate(sequence(63, 32, -1), CAST(0 AS BIGINT),
               (acc, i) -> acc * 2 + {maj}) AS hi,
             aggregate(sequence(31, 0, -1), CAST(0 AS BIGINT),
               (acc, i) -> acc * 2 + {maj}) AS lo
      FROM cnt)
    SELECT doc_id, shiftleft(hi, 32) | lo AS simhash64 FROM sig
    """


def simhash64(
    spark: SparkSession, sf_dir: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """64-bit SimHash per document (production default: xxhash64 token
    hashes; ``hash_fn="md5"`` is the engine-portable oracle twin)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_simhash64(docs, hash_fn=hash_fn).select("doc_id", "simhash64")


def with_simhash64(
    docs: DataFrame, out_col: str = "simhash64", hash_fn: str = "xxhash64"
) -> DataFrame:
    """Append the 64-bit SimHash as a COLUMN — the expression form of
    :func:`_simhash64_sql`'s CTE stages, so it composes with arbitrary
    DataFrames including Structured Streaming ones (pure stateless
    projections; a unit test pins bit-equality with the SQL route)."""
    from pyspark.sql import functions as F

    maj = "IF(2 * element_at(__cnts, i + 1) >= __n, 1, 0)"
    hash_expr = _simhash64_hash_expr(hash_fn)
    out = (
        docs.withColumn(
            "__hs",
            F.expr(
                r"transform(array_distinct(split(trim(lower(text)), '\\s+')), "
                f"t -> {hash_expr})"
            ),
        )
        .withColumn("__n", F.expr("size(__hs)"))
        .withColumn(
            "__cnts",
            F.expr(
                f"aggregate(__hs, array_repeat(CAST(0 AS BIGINT), {SIMHASH64_BITS}), "
                f"(acc, h) -> zip_with(acc, sequence(0, {SIMHASH64_BITS - 1}), "
                f"(a, i) -> a + (shiftrightunsigned(h, CAST(i AS INT)) & 1)))"
            ),
        )
        .withColumn(
            out_col,
            F.expr(
                f"shiftleft(aggregate(sequence(63, 32, -1), CAST(0 AS BIGINT), "
                f"(acc, i) -> acc * 2 + {maj}), 32) | "
                f"aggregate(sequence(31, 0, -1), CAST(0 AS BIGINT), "
                f"(acc, i) -> acc * 2 + {maj})"
            ),
        )
    )
    return out.drop("__hs", "__n", "__cnts")


def simhash64_vectorized(
    spark: SparkSession, sf_dir: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Arrow-vectorized twin of :func:`simhash64` — identical signatures,
    different kernel for the majority fold.

    The expression route's per-bit majority is a 64-counter
    ``aggregate``/``zip_with`` fold — a higher-order expression Spark
    evaluates INTERPRETED (CodegenFallback), measured at ~8.6k docs/s on
    a 500k-doc corpus (58 of the 63 s of the whole components run).
    Here the JVM still computes the token-hash ARRAY per doc (codegen
    ``transform(..., xxhash64)`` — the hash stays engine-native), and an
    Arrow-batched ``mapInPandas`` does the counting: per batch, all
    docs' hashes concatenate into one uint64 vector, shift-and-mask
    yields a uint8 (tokens × 64) bit matrix (chunked to bound peak
    allocation — the stage is memory-bandwidth-bound), and
    ``np.add.reduceat`` over doc offsets produces every doc's 64
    counters at once — no per-token Python.  Measured at 500k docs:
    6.3× on a single-file corpus (58.4 → 9.2 s, where the one input
    split serializes everything); 1.8× on a realistically-partitioned
    32-file corpus (15.4 → 8.5 s, near the hash+Arrow-transfer floor) —
    see BASELINE's layout caveat.  Bit-identical output (unit-pinned
    against the expression route, both hash_fns).

    Integer-only math end to end, so unlike the vectorized-cosine
    kernels this CAN safely feed the gated paths; the expression route
    stays the gate default anyway (one source of truth for the
    oracle-checked plan), and callers opt in via
    ``simhash64_components(..., vectorized=True)``.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    hash_expr = _simhash64_hash_expr(hash_fn)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hs = docs.select(
        "doc_id",
        F.expr(
            r"transform(array_distinct(split(trim(lower(text)), '\\s+')), "
            f"t -> {hash_expr}) AS hs"
        ),
    )

    def batch_sig(batches):
        import numpy as np

        for pdf in batches:
            # NULL text -> NULL hs array.  The expression route emits
            # signature 0 for such rows (the null majority condition
            # falls through IF's 0-branch at every bit), so emit 0 here
            # too — a len(None) crash would break the bit-identical
            # contract on any corpus with nulls.
            null_mask = pdf["hs"].isna().to_numpy()
            null_rows = pdf.loc[null_mask, ["doc_id"]].assign(simhash64=0)
            pdf = pdf.loc[~null_mask]
            if pdf.empty:
                yield pd.DataFrame(
                    {"doc_id": null_rows["doc_id"], "simhash64": null_rows["simhash64"]}
                )
                continue
            lens = pdf["hs"].map(len).to_numpy()
            flat = np.concatenate(pdf["hs"].to_numpy()).astype(np.int64)
            hu = flat.view(np.uint64)
            offsets = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            # (tokens, 64) bit matrix in uint8 (8x smaller than a naive
            # int64 matrix — this stage is memory-bandwidth-bound), with
            # the uint64 shift intermediate chunked 16 bit-lanes at a
            # time to cap peak allocation; reduceat accumulates the
            # per-doc counters straight into int64.
            cnts = np.empty((len(lens), 64), dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for j in range(0, 64, 16):
                bits = (
                    (hu[:, None] >> shifts[None, j : j + 16]) & np.uint64(1)
                ).astype(np.uint8)
                cnts[:, j : j + 16] = np.add.reduceat(
                    bits, offsets, axis=0, dtype=np.int64
                )
            maj = (2 * cnts >= lens[:, None]).astype(np.uint64)
            sig = (maj << np.arange(64, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "simhash64": sig.view(np.int64),
                }
            )
            yield pd.concat([out, null_rows], ignore_index=True) if len(
                null_rows
            ) else out

    return hs.mapInPandas(batch_sig, "doc_id long, simhash64 long")


def simhash64_chunk_index(sig: DataFrame) -> DataFrame:
    """Exploded 8×8-bit banding index over any frame carrying a
    ``simhash64`` column: every input column passes through, plus
    ``(chunk_idx, chunk_val)`` — 8 small-int rows per input row.  This
    is the compact static side a deployment PERSISTS
    (partitioned/bucketed by ``(chunk_idx, chunk_val)``) so every later
    probe — batch :func:`simhash64_incremental`, streaming
    ``stream_neardup_candidates`` — is a plain equi-join against it.

    SCALE RULE (the 100×-corpus lesson, BASELINE round-5 tables): the
    chunk key space is only 8 × 256 = 2048 values, so a chunk join
    between frames that are linear in DOC count goes quadratic —
    ~(n/2048)² false candidates per key.  Build the index over DISTINCT
    signatures (signature count saturates; doc count doesn't), join at
    the signature level, and expand back to docs through a plain
    ``simhash64`` equi-join afterwards — only TRUE near-signatures pay
    the expansion.  :func:`simhash64_components` pioneered this shape;
    the incremental/streaming probes follow it."""
    from pyspark.sql import functions as F

    mask = (1 << SIMHASH64_CHUNK_BITS) - 1
    cols = list(sig.columns)
    return sig.select(
        *cols,
        F.explode(
            F.expr(
                f"transform(sequence(0, {SIMHASH64_CHUNKS - 1}), c -> struct("
                f"c AS chunk_idx, "
                f"shiftrightunsigned(simhash64, c * {SIMHASH64_CHUNK_BITS}) & {mask}"
                f" AS chunk_val))"
            )
        ).alias("cc"),
    ).select(*cols, "cc.chunk_idx", "cc.chunk_val")


def simhash64_first_match_verify(
    cand: DataFrame, sig_a: str, sig_b: str, max_hamming: int
):
    """First-match banding dedup + exact Hamming verify over a joined
    candidate frame carrying both signatures and the matching
    ``chunk_idx``; returns ``(filtered_df, hamming_int_col)``.

    First-match banding instead of DISTINCT: a pair whose signatures
    agree on k chunks comes out of the join k times (an IDENTICAL-
    signature pair 8 times — and identical signatures are exactly what
    template-heavy corpora mass-produce, measured 8× candidate volume
    on a 50k-doc shuffled-copy corpus).  Keeping a pair only from its
    LOWEST matching chunk (derivable from the XOR, no extra state)
    yields exactly one row per qualifying pair through a NARROW filter
    — the duplicate volume never reaches an exchange, where DISTINCT
    would shuffle it all.  CASE chain of plain bit tests, NOT
    array_min(filter(...)): a higher-order expression here is
    CodegenFallback evaluated interpreted on EVERY joined row (measured
    6× slower than the DISTINCT it replaces); the flat comparison chain
    stays inside whole-stage codegen."""
    from pyspark.sql import functions as F

    mask = (1 << SIMHASH64_CHUNK_BITS) - 1
    zero_block = (
        lambda c: f"(shiftrightunsigned({sig_a} ^ {sig_b}, "
        f"{c * SIMHASH64_CHUNK_BITS}) & {mask}) = 0"
    )
    first_chunk = F.expr(
        "CASE "
        + " ".join(
            f"WHEN {zero_block(c)} THEN {c}" for c in range(SIMHASH64_CHUNKS - 1)
        )
        + f" ELSE {SIMHASH64_CHUNKS - 1} END"
    )
    ham = F.expr(f"bit_count({sig_a} ^ {sig_b})")
    out = cand.filter(F.col("chunk_idx") == first_chunk).filter(ham <= max_hamming)
    return out, ham.cast("int")


def _simhash64_signature_pairs(dsig: DataFrame, max_hamming: int) -> DataFrame:
    """``(sim_a, sim_b, hamming)`` for every unordered pair of DISTINCT
    signatures within Hamming ≤ ``max_hamming``, INCLUDING the ``(s,
    s)`` self-pair (hamming 0) that identical-signature families expand
    from; oriented ``sim_a <= sim_b``.  This is the only place the
    chunk-band join runs — over signatures, never docs, per
    :func:`simhash64_chunk_index`'s SCALE RULE."""
    if max_hamming >= SIMHASH64_CHUNKS:
        raise ValueError(
            f"chunk banding is only exact for max_hamming < {SIMHASH64_CHUNKS}"
        )
    from pyspark.sql import functions as F

    a = simhash64_chunk_index(dsig).withColumnRenamed("simhash64", "sim_a")
    b = simhash64_chunk_index(dsig).withColumnRenamed("simhash64", "sim_b")
    cand = (
        a.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("sim_a") <= F.col("sim_b")),
        )
        .select("sim_a", "sim_b", F.col("a.chunk_idx").alias("chunk_idx"))
    )
    verified, ham = simhash64_first_match_verify(cand, "sim_a", "sim_b", max_hamming)
    return verified.select("sim_a", "sim_b", ham.alias("hamming"))


def _simhash64_hamming_pairs(sig: DataFrame, max_hamming: int) -> DataFrame:
    """(doc_a, doc_b, hamming) for every pair of ``sig`` rows whose
    64-bit signatures differ by ≤ ``max_hamming`` bits, ``doc_a <
    doc_b``.

    Mines Hamming edges between DISTINCT signatures
    (:func:`_simhash64_signature_pairs`) and expands matched signatures
    back to docs through plain equi-joins — only TRUE near-signature
    pairs pay the expansion, so the chunk join's cost is bounded by
    signature counts while the (inherently family-quadratic) pair
    listing is produced entirely by the output-bound expansion.  An
    input whose signatures are already distinct (the components rep
    set) expands 1:1."""
    from pyspark.sql import functions as F

    spairs = _simhash64_signature_pairs(
        sig.select("simhash64").distinct(), max_hamming
    )
    docs_a = sig.select(
        F.col("doc_id").alias("ida"), F.col("simhash64").alias("sim_a")
    )
    docs_b = sig.select(
        F.col("doc_id").alias("idb"), F.col("simhash64").alias("sim_b")
    )
    return (
        spairs.join(docs_a, "sim_a")
        .join(docs_b, "sim_b")
        # equal-signature self-pairs expand to intra-family pairs once
        # via the id order; cross-signature pairs are unordered-unique
        # already (sim_a < sim_b), so any id orientation appears once
        .where((F.col("sim_a") != F.col("sim_b")) | (F.col("ida") < F.col("idb")))
        .select(
            F.least("ida", "idb").alias("doc_a"),
            F.greatest("ida", "idb").alias("doc_b"),
            "hamming",
        )
    )


def simhash64_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash Hamming distance ≤ ``max_hamming``.

    Signature pass computed once and persisted; candidates from the
    (chunk_idx, chunk_val) equi-join over DISTINCT signatures (8×8-bit
    chunks: pigeonhole-exact for ``max_hamming`` < 8 — and see
    :func:`simhash64_chunk_index`'s SCALE RULE for why the join must
    never run at the doc level), verified by exact ``bit_count`` on the
    XOR, expanded back to doc pairs output-bound, result materialized
    so the cache never outlives the call.

    NOTE the output itself is quadratic when the corpus has large
    identical-signature families (k docs sharing a signature ⇒ k·(k-1)/2
    rows); when the downstream need is dedup GROUPS rather than explicit
    pairs, :func:`simhash64_components` is the linear-output form.
    """
    if max_hamming >= SIMHASH64_CHUNKS:  # fail before the signature pass
        raise ValueError(
            f"chunk banding is only exact for max_hamming < {SIMHASH64_CHUNKS}"
        )
    # Checkpoint the LINEAR signature table (computed once, reused by
    # the distinct miner and both expansion sides), never the pair
    # listing: materializing the family-quadratic output froze the 100×
    # fixture (933M pairs) where the lazy expansion counts it in 34 s —
    # BASELINE round-5 continuation tables.
    sig = simhash64(spark, sf_dir, hash_fn=hash_fn).localCheckpoint(eager=True)
    return _simhash64_hamming_pairs(sig, max_hamming)


def _simhash64_md5_duck_sig_ctes() -> str:
    """DuckDB CTEs building the md5-variant 64-bit signature as TWO
    32-bit halves ``(doc_id, sig_hi, sig_lo)``.

    Independent formulation on purpose: where Spark folds a 64-counter
    array in one ``aggregate`` pass, this counts each bit with its own
    ``list_filter`` scan (the 28-bit oracle's style), and the halves stay
    separate because DuckDB's ``<<`` overflow-checks where Spark's
    ``shiftleft`` is pure bit assembly.  Hamming over (hi, lo) halves is
    identical to Hamming over the combined 64-bit word, so the two
    engines compare the same distances without ever agreeing on an
    intermediate representation.

    Known cross-engine tokenizer boundary (shared with every ``\\s+``
    dual-dialect gate in this repo since r2): Java regex ``\\s`` includes
    vertical tab (``\\x0B``) but DuckDB's RE2 ``\\s`` does not, so a
    document containing ``\\x0B`` would tokenize differently per engine
    and hash-fail the gate.  The synthetic corpus contains none
    (verified); production callers normalizing unicode whitespace
    upstream are unaffected.
    """

    def majority_terms(col: str) -> str:
        return " + ".join(
            f"(CASE WHEN 2 * len(list_filter({col}, h -> (h >> {b}) & 1 = 1))"
            f" >= len({col}) THEN {1 << b} ELSE 0 END)"
            for b in range(32)
        )

    return rf"""
    toks AS (
      SELECT doc_id,
             list_transform(
               list_distinct(string_split_regex(trim(lower(text)), '\s+')),
               t -> md5(t)) AS ms
      FROM documents),
    halves AS (
      SELECT doc_id,
             list_transform(ms, m -> ('0x' || substr(m, 1, 8))::BIGINT) AS hhi,
             list_transform(ms, m -> ('0x' || substr(m, 9, 8))::BIGINT) AS hlo
      FROM toks),
    sig AS (
      SELECT doc_id,
             {majority_terms("hhi")} AS sig_hi,
             {majority_terms("hlo")} AS sig_lo
      FROM halves)
    """


_SIMHASH64_DUCK_HAM = (
    "bit_count(xor(a.sig_hi, b.sig_hi)) + bit_count(xor(a.sig_lo, b.sig_lo))"
)


def _simhash64_fixture_duck_sig_cte() -> str:
    """DuckDB CTE resolving each document's PRODUCTION xxhash64 64-bit
    signature from the frozen golden fixture
    (``fixtures/simhash64_xxhash64_sigs.parquet``, written by
    ``tools/freeze_simhash64_sigs.py`` — the kmeans-centroid / PQ-codebook
    fixture lifecycle), as the same two 32-bit halves the md5-variant
    CTEs emit.

    DuckDB has no xxhash64-compatible hash, so the signature math cannot
    be re-derived oracle-side; instead the oracle joins ``documents`` to
    the fixture on an exact content key (md5 of the text bytes — id-
    rekey-proof) and mines brute-force Hamming from the FROZEN values.
    That checks two things at once: the live Spark signature expression
    still reproduces the frozen signatures (drift flips downstream pair
    values or drops join rows -> loud gate fail), and the banding /
    components / incremental machinery is exact vs an oracle with no
    banding at all.  The fixture covers the union of sf0.001/0.01/0.1
    texts; a doc whose text is missing from it vanishes from ``sig`` and
    fails the row-count compare (never a silent pass)."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "simhash64_xxhash64_sigs.parquet",
    )
    return f"""
    sig AS (
      SELECT d.doc_id, s.sig_hi, s.sig_lo
      FROM (SELECT doc_id, md5(coalesce(text, '')) AS fp FROM documents) d
      JOIN '{path}' s USING (fp))
    """


def _simhash64_duck_sig_ctes(hash_fn: str) -> str:
    if hash_fn == "md5":
        return _simhash64_md5_duck_sig_ctes()
    if hash_fn == "xxhash64":
        return _simhash64_fixture_duck_sig_cte()
    raise ValueError(f"no DuckDB signature source for hash_fn={hash_fn!r}")


def simhash64_pairs_oracle(max_hamming: int = 3, hash_fn: str = "xxhash64") -> str:
    """DuckDB oracle for :func:`simhash64_pairs` — BRUTE-FORCE all-pairs
    Hamming scan, no banding: a genuinely independent check that the
    8×8-bit chunk candidate join is exact (pigeonhole), not just that two
    copies of the same plan agree.  ``hash_fn="xxhash64"`` (the
    production default) resolves signatures from the frozen golden
    fixture; ``"md5"`` recomputes them engine-portably (the pre-r6 gate
    twin, kept for units)."""
    return f"""
    WITH {_simhash64_duck_sig_ctes(hash_fn).strip()}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({_SIMHASH64_DUCK_HAM} AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE {_SIMHASH64_DUCK_HAM} <= {max_hamming}
    """


def simhash64_components_oracle(max_hamming: int = 3, hash_fn: str = "xxhash64") -> str:
    """DuckDB oracle for :func:`simhash64_components` — transitive
    closure by recursive CTE (labels flood along brute-force Hamming
    edges until fixpoint; min label per doc is the component id).
    Independent of the Spark side's distinct-signature graph + union-find
    on every axis: no banding, no signature grouping, no driver step.
    Signature source per ``hash_fn`` as in :func:`simhash64_pairs_oracle`."""
    return f"""
    WITH RECURSIVE {_simhash64_duck_sig_ctes(hash_fn).strip()},
    edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM sig a JOIN sig b ON a.doc_id <> b.doc_id
      WHERE {_SIMHASH64_DUCK_HAM} <= {max_hamming}),
    reach(doc, lbl) AS (
      SELECT doc_id, doc_id FROM sig
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.doc)
    SELECT doc AS doc_id, MIN(lbl) AS component FROM reach GROUP BY doc
    """


def simhash64_incremental(
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
    batch_pred: str = "doc_id % 10 = 0",
    vectorized: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """Incremental near-dup check — the daily-ingest production shape:
    docs matching ``batch_pred`` are the INCOMING batch, the rest the
    EXISTING corpus.  One row per incoming doc: ``(doc_id, dup_of,
    hamming)`` where ``dup_of`` is the minimal-id near-duplicate among
    (a) any corpus doc and (b) earlier (smaller-id) batch docs — so a
    burst of mutual dups keeps exactly its first member — and NULL when
    the doc is novel.

    Scale shape (see :func:`simhash64_chunk_index`'s SCALE RULE): the
    chunk join runs over DISTINCT signatures per side — never over
    docs, whose count the 2048-value chunk key space cannot desaturate
    (at a 500k-doc 100× fixture the doc-level join produced hundreds of
    millions of false candidates; the signature-level join is
    measured flat).  The argmin pre-aggregates per signature first:
    within one signature family only the MINIMAL doc id can ever win
    ``dup_of`` (for earlier-batch candidates, the family minimum either
    precedes the probe doc or no family member does), so one
    ``groupBy(simhash64, is_new).min(doc_id)`` replaces the whole
    doc-level candidate set, and matched signatures map back to batch
    docs through a plain ``simhash64`` equi-join.  Output stays linear
    in the batch; the min-id pick is a map-side-combined min() keyed by
    batch doc, not a window.  In production the per-signature min table
    is the PERSISTED index — here it is recomputed from the one table
    for the gate's sake.
    """
    if max_hamming >= SIMHASH64_CHUNKS:
        raise ValueError(
            f"chunk banding is only exact for max_hamming < {SIMHASH64_CHUNKS}"
        )
    from pyspark.sql import functions as F

    # vectorized: Arrow signature kernel (bit-identical, unit-pinned) —
    # r9: the production DEFAULT; gates pass False to keep verifying the
    # expression route (parity units bridge the two)
    sig_fn = simhash64_vectorized if vectorized else simhash64
    sig = sig_fn(spark, sf_dir, hash_fn=hash_fn).persist()
    try:
        new_sig = sig.where(F.expr(batch_pred))
        # per-(signature, side) argmin: the only doc that can win
        tgt_min = sig.groupBy(
            "simhash64", F.expr(batch_pred).alias("is_new")
        ).agg(F.min("doc_id").alias("tid"))
        return _simhash64_incremental_mine(
            new_sig, tgt_min, max_hamming, checkpoint=checkpoint
        )
    finally:
        sig.unpersist()


def _simhash64_incremental_mine(
    new_sig: DataFrame, tgt_min: DataFrame, max_hamming: int,
    checkpoint: bool = True,
) -> DataFrame:
    """Shared mining stage of the incremental check: probe the
    per-(signature, side) argmin table ``tgt_min`` (simhash64, is_new,
    tid) with the batch signatures ``new_sig`` (doc_id, simhash64) and
    emit (doc_id, dup_of, hamming) per batch doc.  One implementation
    for both the self-computed (:func:`simhash64_incremental`) and the
    persisted-bucketed-index (:func:`simhash64_incremental_vs_index`)
    corpus sides, so the two physically cannot drift."""
    from pyspark.sql import functions as F

    new_ids = new_sig.select("doc_id")
    probe = new_sig.select("simhash64").distinct()
    cand = (
        simhash64_chunk_index(probe)
        .withColumnRenamed("simhash64", "sim_n")
        .alias("n")
        .join(
            simhash64_chunk_index(tgt_min)
            .withColumnRenamed("simhash64", "sim_t")
            .alias("t"),
            (F.col("n.chunk_idx") == F.col("t.chunk_idx"))
            & (F.col("n.chunk_val") == F.col("t.chunk_val")),
        )
        .select(
            "sim_n",
            "sim_t",
            "tid",
            "is_new",
            F.col("n.chunk_idx").alias("chunk_idx"),
        )
    )
    kept, ham = simhash64_first_match_verify(cand, "sim_n", "sim_t", max_hamming)
    near_sigs = kept.select("sim_n", "tid", "is_new", ham.alias("h"))
    # expand back to batch docs: only TRUE near-signatures pay this
    # join; the earlier-batch rule (family min precedes the probe)
    # and the self-pair both reduce to tid < doc_id
    verified = (
        new_sig.join(near_sigs, new_sig["simhash64"] == near_sigs["sim_n"])
        .where(~F.col("is_new") | (F.col("tid") < F.col("doc_id")))
        .select("doc_id", "tid", "h")
    )
    # argmin by tid packed into one integer min (hamming ≤ 7 fits 3
    # bits; tid*8 + h keeps (min tid, its hamming) in a single agg)
    best = verified.groupBy("doc_id").agg(
        F.min(F.expr("tid * 8 + h")).alias("packed")
    )
    out = new_ids.join(best, "doc_id", "left").select(
        "doc_id",
        F.expr("CAST(packed div 8 AS BIGINT)").alias("dup_of"),
        F.expr("CAST(packed % 8 AS INT)").alias("hamming"),
    )
    # checkpoint=False keeps the LAZY plan (plan tests inspect it); the
    # default eager checkpoint lets callers release caches / drop the
    # index table before the result is consumed
    return out.localCheckpoint(eager=True) if checkpoint else out


SIMHASH64_INDEX_BUCKETS = 16


def build_simhash64_index(
    spark: SparkSession,
    sf_dir: str,
    table: str = "simhash64_corpus_index",
    corpus_pred: str = "doc_id % 10 != 0",
    hash_fn: str = "xxhash64",
    n_buckets: int = SIMHASH64_INDEX_BUCKETS,
    path: str | None = None,
) -> None:
    """Persist the corpus signature table BUCKETED on ``simhash64`` —
    the production index :func:`simhash64_incremental_vs_index` probes.

    Paying the signature pass + one shuffle at index-build time is the
    whole point: every subsequent ingest batch aggregates and joins
    against the corpus on ``simhash64`` with ZERO corpus-side exchange
    (the catalog carries the bucketing; plan-pinned in
    test_plans.py::test_incremental_vs_index_corpus_side_no_exchange).
    At 100 TB the corpus-side shuffle dominates every
    join-against-corpus op, and it re-runs per batch unless persisted
    co-located — this is the bucketed-table story of
    sinks.write_bucketed applied to the dedup index."""
    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.operators.sinks import write_bucketed

    sig = simhash64(spark, sf_dir, hash_fn=hash_fn).where(F.expr(corpus_pred))
    write_bucketed(sig, table, "simhash64", n_buckets=n_buckets, path=path)


def simhash64_incremental_vs_index(
    spark: SparkSession,
    sf_dir: str,
    index_table: str = "simhash64_corpus_index",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
    batch_pred: str = "doc_id % 10 = 0",
    checkpoint: bool = True,
) -> DataFrame:
    """:func:`simhash64_incremental` with the corpus side read from the
    PERSISTED bucketed signature index instead of recomputed — the
    actual daily-ingest shape (the self-computing variant rebuilds the
    corpus signatures per call, which only a gate can afford).

    Output contract and oracle are identical to
    :func:`simhash64_incremental`; only the batch docs' signatures are
    computed live.  The corpus-side min aggregate reads the bucketed
    table exchange-free, and within one signature family only the
    minimal doc id can ever win ``dup_of``, so the persisted index stays
    correct under appends by re-aggregating (min is idempotent /
    associative — a new day's index build can fold yesterday's index
    with the new batch instead of rescanning the corpus)."""
    if max_hamming >= SIMHASH64_CHUNKS:
        raise ValueError(
            f"chunk banding is only exact for max_hamming < {SIMHASH64_CHUNKS}"
        )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new_sig = (
        with_simhash64(docs.where(F.expr(batch_pred)), hash_fn=hash_fn)
        .select("doc_id", "simhash64")
        .persist()
    )
    try:
        # corpus side: bucketed on simhash64 => this aggregate needs NO
        # exchange (HashPartitioning(simhash64) satisfies the grouping)
        corpus_min = (
            spark.table(index_table)
            .groupBy("simhash64")
            .agg(F.min("doc_id").alias("tid"))
            .withColumn("is_new", F.lit(False))
        )
        new_min = (
            new_sig.groupBy("simhash64")
            .agg(F.min("doc_id").alias("tid"))
            .withColumn("is_new", F.lit(True))
        )
        tgt_min = corpus_min.unionByName(new_min).select(
            "simhash64", "is_new", "tid"
        )
        return _simhash64_incremental_mine(
            new_sig, tgt_min, max_hamming, checkpoint=checkpoint
        )
    finally:
        new_sig.unpersist()


def simhash64_incremental_oracle(
    max_hamming: int = 3,
    batch_pred: str = "doc_id % 10 = 0",
    hash_fn: str = "xxhash64",
) -> str:
    """DuckDB oracle for :func:`simhash64_incremental` — brute-force
    all-pairs Hamming against both candidate classes, window argmin by
    target id: fully independent of the banding, the first-match dedup
    and the packed integer argmin the Spark side uses.  Signature source
    per ``hash_fn`` as in :func:`simhash64_pairs_oracle`."""
    return f"""
    WITH {_simhash64_duck_sig_ctes(hash_fn).strip()},
    newdocs AS (SELECT * FROM sig WHERE {batch_pred}),
    tgt AS (SELECT *, ({batch_pred}) AS is_new FROM sig),
    cand AS (
      SELECT n.doc_id, t.doc_id AS tid,
             CAST({_SIMHASH64_DUCK_HAM.replace('a.', 'n.').replace('b.', 't.')} AS INT) AS h
      FROM newdocs n JOIN tgt t
        ON t.doc_id != n.doc_id AND (NOT t.is_new OR t.doc_id < n.doc_id)
      WHERE {_SIMHASH64_DUCK_HAM.replace('a.', 'n.').replace('b.', 't.')} <= {max_hamming}),
    best AS (
      SELECT doc_id, tid, h,
             row_number() OVER (PARTITION BY doc_id ORDER BY tid) AS rn
      FROM cand)
    SELECT n.doc_id, b.tid AS dup_of, b.h AS hamming
    FROM newdocs n LEFT JOIN best b ON b.doc_id = n.doc_id AND b.rn = 1
    """


def stream_neardup_candidates_oracle(
    max_hamming: int = 3,
    batch_pred: str = "doc_id % 10 = 0",
    hash_fn: str = "xxhash64",
) -> str:
    """DuckDB oracle for the streaming near-dup gate — brute-force
    batch × corpus Hamming scan (no banding, no chunk index): every
    ``(doc_id, dup_of, hamming)`` candidate the stream must emit against
    a corpus-only static index.  Signature source per ``hash_fn`` as in
    :func:`simhash64_pairs_oracle`."""
    ham = _SIMHASH64_DUCK_HAM.replace("a.", "n.").replace("b.", "t.")
    return f"""
    WITH {_simhash64_duck_sig_ctes(hash_fn).strip()},
    newdocs AS (SELECT * FROM sig WHERE {batch_pred}),
    corpus AS (SELECT * FROM sig WHERE NOT ({batch_pred}))
    SELECT n.doc_id, t.doc_id AS dup_of, CAST({ham} AS INT) AS hamming
    FROM newdocs n JOIN corpus t ON {ham} <= {max_hamming}
    """


def stream_decontaminate_oracle(
    n: int = 3, eval_pred: str = DECONTAMINATE_EVAL_PRED
) -> str:
    """DuckDB oracle for the streaming decontamination flag set: the
    distinct contaminated train doc_ids (shingle overlap with the eval
    split, no doc-frequency cap — the streaming op's contract)."""
    return f"""
    WITH {_shingles_cte(duck=True, n=n)},
    train_sh AS (SELECT * FROM sh WHERE NOT ({eval_pred})),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE {eval_pred})
    SELECT DISTINCT doc_id FROM train_sh JOIN eval_sh USING (shingle)
    """


def min_label_union_find(edges) -> dict[int, int]:
    """{node: min node id of its connected component} over an edge list —
    the driver-side twin of :func:`neardup_components`'s distributed
    min-label propagation (identical labels by construction: keeping the
    smaller id as root at every union makes each root the minimum of the
    merged set, inductively).  Path-halving keeps it near-linear."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def simhash64_components(
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = 3,
    driver_edge_limit: int = 1 << 20,
    hash_fn: str = "xxhash64",
    vectorized: bool = True,
) -> DataFrame:
    """Near-dup components by 64-bit SimHash, with OUTPUT LINEAR in docs
    — the 100 TB form of :func:`simhash64_pairs`.

    Template-heavy corpora mass-produce identical signatures, and any
    pair listing is then inherently quadratic (measured: 9.3M pairs from
    50k docs).  Instead: (1) group docs by exact signature — one shuffle,
    linear; (2) mine Hamming-≤k edges between DISTINCT signatures only
    (the chunk join runs on one representative per signature, collapsing
    every identical family to a single node); (3) connected components
    over that signature graph; (4) map every doc to its component
    through its signature.  Returns (doc_id, component) for EVERY doc —
    singleton docs are their own component.

    Component strategy: the signature graph is the one structure this op
    makes SMALL by construction, so up to ``driver_edge_limit`` edges it
    is solved by driver-side union-find (microseconds; the distributed
    min-label loop pays ~2 Spark jobs PER DIAMETER HOP, measured 112 s
    on a 600-edge chain-heavy graph).  Above the bound — a corpus whose
    distinct-signature graph alone exceeds ~1M edges — it falls back to
    the same :func:`neardup_components` propagation every other group op
    uses.  The collect is bounded by the parameter, never by corpus
    size.
    """
    from pyspark.sql import functions as F

    sig_fn = simhash64_vectorized if vectorized else simhash64
    sig = sig_fn(spark, sf_dir, hash_fn=hash_fn).persist()
    try:
        reps = (
            sig.groupBy("simhash64")
            .agg(F.min("doc_id").alias("doc_id"))
            .persist()
        )
        try:
            # Persisted so the bounded collect below and a possible
            # distributed fallback share one chunk-join computation.
            rep_pairs = _simhash64_hamming_pairs(reps, max_hamming).persist()
            fallback_labels = None
            edges = rep_pairs.select("doc_a", "doc_b").limit(driver_edge_limit + 1).collect()
            if len(edges) > driver_edge_limit:
                labels = fallback_labels = neardup_components(rep_pairs)
            else:
                comp = min_label_union_find((e["doc_a"], e["doc_b"]) for e in edges)
                labels = spark.createDataFrame(
                    list(comp.items()), "doc_id long, component long"
                )
            comp = (
                reps.join(
                    labels.withColumnRenamed("doc_id", "rep_id"),
                    reps["doc_id"] == F.col("rep_id"),
                    "left",
                )
                .select(
                    "simhash64",
                    F.coalesce("component", reps["doc_id"]).alias("component"),
                )
            )
            out = (
                sig.join(comp, "simhash64")
                .select("doc_id", "component")
                .localCheckpoint(eager=True)
            )
            if fallback_labels is not None:
                # neardup_components returns its labels persisted (its
                # callers usually return them directly); here they are
                # consumed into the checkpoint, so release the cache.
                fallback_labels.unpersist()
            return out
        finally:
            rep_pairs.unpersist()
            reps.unpersist()
    finally:
        sig.unpersist()


# ---------------------------------------------------------------------------
# Near-dup groups: connected components over the LSH pair graph
# ---------------------------------------------------------------------------
def neardup_components(
    pairs: DataFrame, max_iter: int = 25, checkpoint_every: int = 5
) -> DataFrame:
    """Connected components of the near-dup pair graph → dedup groups.

    Returns ``(doc_id, component)`` for every doc in ≥1 pair, where
    ``component`` is the minimum doc_id of its group (the keeper).

    Distributed min-label propagation: each pass every node adopts the
    minimum label among itself and its neighbors, until a pass changes
    nothing.  Converges in graph-diameter passes — near-dup components
    are tiny/star-shaped, so a handful.  Each pass is one equi-join +
    hash agg over the EDGE list (never the corpus); all driver-side
    state is the single `changed` count.

    Deep graphs: the label lineage grows one join per pass, so every
    ``checkpoint_every`` passes the labels are ``localCheckpoint``-ed to
    keep plan depth bounded.  If the loop exhausts ``max_iter`` without
    converging, a RuntimeError is raised — unconverged labels are wrong
    group assignments, never returned silently.
    """
    from pyspark.sql import functions as F

    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .persist()
    )
    try:
        converged = False
        for it in range(1, max_iter + 1):
            nbr = (
                edges.join(
                    labels.select(
                        F.col("doc_id").alias("dst"), F.col("component").alias("nbr_comp")
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("nbr_comp").alias("nbr_min"))
            )
            new_labels = labels.join(nbr, labels["doc_id"] == nbr["src"], "left").select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            if it % checkpoint_every == 0:
                # truncate lineage: the plan would otherwise be `it` joins deep
                new_labels = new_labels.localCheckpoint(eager=True)
            else:
                new_labels = new_labels.persist()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            labels.unpersist()  # never returned — don't pin its cache
            raise RuntimeError(
                f"neardup_components did not converge in {max_iter} passes; "
                "the pair graph's diameter exceeds max_iter — raise max_iter"
            )
        return labels
    finally:
        edges.unpersist()


def neardup_groups(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.2,
    n: int = 3,
    vectorized: bool = True,
) -> DataFrame:
    """LSH pairs → connected near-dup groups, one row per grouped doc."""
    return neardup_components(
        minhash_lsh_pairs(spark, sf_dir, threshold, n, vectorized=vectorized)
    )


# ---------------------------------------------------------------------------
# Exact substring-span dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the character-level exact-substring pass
# that MinHash/SimHash document-level dedup cannot express)
# ---------------------------------------------------------------------------
SUBSTR_L = 30  # window length (chars); spans shorter than L are invisible
SUBSTR_ANCHOR = 8  # anchor length the position selector hashes
SUBSTR_MOD = 7  # anchor-hash modulus → expected 1-in-7 position density


def _substring_cte(duck: bool, L: int, mod: int) -> str:
    """CTEs ``w(doc_id, pos, gram)`` = L-char windows at content-defined
    anchor positions, and ``g(gram)`` = windows verbatim-repeated across
    ≥ 2 distinct docs.

    Position selection is CONTENT-DEFINED (winnowing-style, Schleimer et
    al. 2003): position p is sampled iff the rolling hash of the
    ``SUBSTR_ANCHOR``-char prefix at p is ≡ 0 mod ``mod``.  Fixed-stride
    sampling (pos ≡ 1 mod stride) would be alignment-SENSITIVE: the same
    shared substring at offsets with different residues mod stride in two
    docs samples disjoint window sets and the duplicate is invisible.
    Anchors depend only on the local text, so a shared region selects the
    same relative positions in every doc containing it — detection is
    invariant to where the region sits.  Expected density 1/mod; a
    duplicated region is detected iff it contains ≥ 1 anchored window
    (probability ≈ 1 - (1-1/mod)^(len-L) — the exhaustive-recall
    alternative is Lee et al. 2022's suffix array, which has no bounded
    shuffle form).

    Scale shape: position selection and the window explode are narrow
    maps fused into the scan (the anchor hash is O(ANCHOR) per position;
    a production build computes it incrementally in one pass); the ONLY
    shuffle is the group-by on ``gram`` (volume ≈ corpus_bytes / mod × L).
    A production deployment keys that exchange on ``xxhash64(gram)``
    (8 bytes instead of L chars); the raw-gram key here exists so DuckDB
    can verify bit-for-bit.
    """
    A = SUBSTR_ANCHOR
    if duck:
        anchor = rolling_hash_expr_duckdb(f"substr(text, CAST(p AS INTEGER), {A})")
        # generate_series is inclusive and returns BIGINT — cast the
        # surviving positions to INT to match Spark's sequence() elements.
        return f"""
        wpos AS (
          SELECT doc_id, text,
                 CAST(unnest(list_filter(generate_series(1, length(text) - {L} + 1),
                      p -> ({anchor}) % {mod} = 0)) AS INTEGER) AS pos
          FROM documents WHERE length(text) >= {L}),
        w AS (SELECT doc_id, pos, substr(text, pos, {L}) AS gram FROM wpos),
        g AS (SELECT gram FROM w GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)
        """
    # Spark: CASE guard + OUTER explode for the same InferFiltersFromGenerate
    # reasons as _shingles_cte (see that docstring).  Unlike the shingle
    # CTE, the anchor filter CAN legitimately leave the position array
    # EMPTY (a doc ≥ L chars where no position hashes to the residue —
    # 4/5000 docs at sf0.1), and OUTER explode emits one NULL-pos row
    # for an empty array; the `pos IS NOT NULL` guard drops that phantom
    # window (a plain null check on the generator OUTPUT column — it
    # does not re-embed the anchor expression, so the 6× interpreted-
    # Filter trap stays avoided).
    anchor = rolling_hash_expr_spark(f"substr(text, p, {A})")
    positions = (
        f"CASE WHEN length(text) >= {L} THEN "
        f"filter(sequence(1, length(text) - {L} + 1), p -> ({anchor}) % {mod} = 0) "
        f"ELSE array() END"
    )
    return f"""
    w AS (
      SELECT doc_id, pos, substr(text, pos, {L}) AS gram
      FROM documents
      LATERAL VIEW OUTER explode({positions}) t AS pos
      WHERE length(text) >= {L} AND pos IS NOT NULL),
    g AS (SELECT gram FROM w GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)
    """


# Final-select tails shared VERBATIM by the SQL twins (CTE-based) and the
# Arrow engine path (temp-view-based) — one definition, zero drift.
def _profile_tail(w: str = "w", g: str = "g") -> str:
    return f"""
    SELECT {w}.doc_id,
           count(*) AS n_windows,
           count({g}.gram) AS n_dup_windows,
           CAST(count({g}.gram) AS DOUBLE) / count(*) AS dup_frac
    FROM {w} LEFT JOIN {g} ON {w}.gram = {g}.gram
    GROUP BY {w}.doc_id
    """


def _spans_body(L: int, w: str = "w", g: str = "g") -> str:
    # Merged duplicated regions per doc via island detection: a window
    # starts a new span iff it begins past the running max end of all
    # earlier windows (+1 so adjacent windows fuse).  ROWS frames and the
    # running-max/running-sum semantics are identical in Spark and DuckDB;
    # the island counter is CAST to BIGINT because DuckDB sums INTEGER
    # into HUGEINT (decimal128) — the exact cross-engine hash trap the
    # r3 gate caught on corpus_rollup.
    return f"""
    d AS (SELECT {w}.doc_id, {w}.pos FROM {w} JOIN {g} ON {w}.gram = {g}.gram),
    b AS (
      SELECT doc_id, pos,
             CASE WHEN pos <= coalesce(max(pos + {L} - 1) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -{L}) + 1
                  THEN 0 ELSE 1 END AS is_start
      FROM d),
    isl AS (
      SELECT doc_id, pos,
             CAST(sum(is_start) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS span_id
      FROM b)
    SELECT doc_id, span_id,
           min(pos) AS span_start,
           max(pos) + {L} - 1 AS span_end,
           count(*) AS n_windows
    FROM isl GROUP BY doc_id, span_id
    """


def _substring_profile_sql(duck: bool, L: int, mod: int) -> str:
    # dup_frac: one IEEE division of two exact BIGINTs — bit-identical
    # across engines by construction (no round(), no decimal).
    return f"WITH {_substring_cte(duck, L, mod)} {_profile_tail()}"


def _substring_spans_sql(duck: bool, L: int, mod: int) -> str:
    return f"WITH {_substring_cte(duck, L, mod)}, {_spans_body(L)}"


def _windows_arrow(spark: SparkSession, sf_dir: str, L: int, mod: int) -> DataFrame:
    """Engine-path ``w(doc_id, pos, gram)``: one corpus scan through an
    Arrow-batched ``mapInArrow`` that vectorizes the anchor selection.

    The anchor hash is a left fold ``h = (h*31 + code) % (1e9+7)`` over
    ``SUBSTR_ANCHOR`` char codes; with no negative intermediates that
    equals ``(Σ code_i · 31^(A-1-i)) mod M``, so ALL positions of a doc
    compute as one NumPy sliding-window dot product (max value
    8·1114111·31⁷ ≈ 2.4e17 < 2⁶³ — no overflow, exact int64) — the same
    integers as the SQL twin's per-position interpreted fold, measured
    ~10× cheaper.  Char codes via ``ord`` (code POINTS, matching both
    engines' ``ascii()``), never utf-8 bytes.
    """
    import numpy as np
    import pyarrow as pa

    A = SUBSTR_ANCHOR
    pows = np.array([31 ** (A - 1 - i) for i in range(A)], dtype=np.int64)

    def build(batches):
        schema = pa.schema(
            [("doc_id", pa.int64()), ("pos", pa.int32()), ("gram", pa.string())]
        )
        for batch in batches:
            od, op, og = [], [], []
            for d, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                if t is None or len(t) < L:
                    continue
                n = len(t) - L + 1
                codes = np.fromiter((ord(c) for c in t), dtype=np.int64, count=len(t))
                # Positions whose anchor fits fully vectorize as one dot;
                # when L < ANCHOR the tail positions' anchors are
                # truncated by the doc end (the SQL twin's substr caps at
                # the string), so fold those few explicitly.
                lim = min(n, len(t) - A + 1)
                sel = []
                if lim > 0:
                    anchors = (
                        np.lib.stride_tricks.sliding_window_view(codes, A)[:lim] @ pows
                    ) % ROLLING_MOD
                    sel = [int(i) for i in np.nonzero(anchors % mod == 0)[0]]
                for p0 in range(max(lim, 0), n):
                    h = 0
                    for cc in codes[p0 : p0 + A]:
                        h = (h * 31 + int(cc)) % ROLLING_MOD
                    if h % mod == 0:
                        sel.append(p0)
                for i in sel:
                    od.append(d)
                    op.append(i + 1)
                    og.append(t[i : i + L])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(od, pa.int64()),
                    pa.array(op, pa.int32()),
                    pa.array(og, pa.string()),
                ],
                schema=schema,
            )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return docs.mapInArrow(build, "doc_id long, pos int, gram string")


def _run_on_windows(
    spark: SparkSession, sf_dir: str, L: int, mod: int, tail: str
) -> DataFrame:
    """Build ``w`` ONCE (Arrow path, persisted), derive ``g``, run
    ``tail`` over them as temp views, checkpoint the (small) result and
    release the cache — Spark inlines CTEs, so the pure-SQL form would
    recompute the whole window build for each of its two references
    (same lifecycle pattern as :func:`minhash_lsh_pairs`)."""
    from pyspark.sql import functions as F

    w = _windows_arrow(spark, sf_dir, L, mod).persist()
    try:
        # Prefixed names: these are session-global temp views, and bare
        # "w"/"g" could clobber a user's own views (the SQL twins keep
        # those names as CTE-local, which is safe).
        w.createOrReplaceTempView("__substr_w")
        (
            w.groupBy("gram")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter("nd >= 2")
            .select("gram")
            .createOrReplaceTempView("__substr_g")
        )
        return spark.sql(tail).localCheckpoint(eager=True)
    finally:
        w.unpersist()
        spark.catalog.dropTempView("__substr_w")
        spark.catalog.dropTempView("__substr_g")


def substring_dup_profile(
    spark: SparkSession, sf_dir: str, L: int = SUBSTR_L, mod: int = SUBSTR_MOD
) -> DataFrame:
    """Per-doc census of verbatim cross-document substrings: how many
    sampled L-char windows of each doc occur verbatim in ≥ 1 other doc."""
    return _run_on_windows(spark, sf_dir, L, mod, _profile_tail("__substr_w", "__substr_g"))


def substring_dup_profile_oracle(L: int = SUBSTR_L, mod: int = SUBSTR_MOD) -> str:
    return _substring_profile_sql(duck=True, L=L, mod=mod)


def substring_dup_spans(
    spark: SparkSession, sf_dir: str, L: int = SUBSTR_L, mod: int = SUBSTR_MOD
) -> DataFrame:
    """Merged character ranges of cross-document verbatim duplication —
    the actionable output of the exact-substring pass (cut these spans,
    keep the rest of the doc, per Lee et al. §4)."""
    return _run_on_windows(
        spark, sf_dir, L, mod, f"WITH {_spans_body(L, '__substr_w', '__substr_g')}"
    )


def substring_dup_spans_oracle(L: int = SUBSTR_L, mod: int = SUBSTR_MOD) -> str:
    return _substring_spans_sql(duck=True, L=L, mod=mod)


def _scrub_spans_sql(duck: bool, L: int, mod: int) -> str:
    """Rebuild each doc's text with its duplicated spans cut out.

    Kept text = the segments BETWEEN a doc's (disjoint, sorted) spans:
    each span contributes the gap since the previous span's end (via
    ``lag``), plus one tail after the last span.  Pure string/int ops —
    bit-exact across engines by construction.  Spark has no ordered
    ``string_agg``, so the segment concat is ``array_sort(collect_list)``
    + ``array_join`` there; span_start is unique per doc, so both
    orderings are the same total order.

    Scale shape: the span table is tiny next to the corpus; the rebuild
    is one equi-join on doc_id + one doc_id agg.
    """
    if duck:
        kept = (
            "string_agg(substr(text, prev_end + 1, span_start - prev_end - 1), "
            "'' ORDER BY span_start)"
        )
    else:
        kept = _SCRUB_KEPT_SPARK
    sp_cte = f"sp AS (SELECT * FROM ({_substring_spans_sql(duck, L, mod)}) spq),"
    return f"""
    WITH {sp_cte}
    {_scrub_tail(kept)}
    """


def _scrub_tail(kept: str, sp: str = "sp") -> str:
    # References ``sp`` (the spans) and ``documents``; shared by the SQL
    # twin (sp = CTE) and the engine path (sp = temp view of the
    # checkpointed spans DataFrame).
    return f"""
    seg AS (
      SELECT s.doc_id, d.text,
             lag(s.span_end, 1, 0) OVER (PARTITION BY s.doc_id
                                         ORDER BY s.span_start) AS prev_end,
             s.span_start, s.span_end
      FROM {sp} s JOIN documents d ON s.doc_id = d.doc_id),
    agg AS (
      SELECT doc_id, {kept} AS kept_head, max(span_end) AS last_end,
             CAST(sum(span_end - span_start + 1) AS BIGINT) AS n_cut
      FROM seg GROUP BY doc_id)
    SELECT d.doc_id,
           CASE WHEN a.doc_id IS NULL THEN d.text
                ELSE concat(a.kept_head, substr(d.text, a.last_end + 1)) END AS clean_text,
           coalesce(a.n_cut, CAST(0 AS BIGINT)) AS n_cut_chars
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """


_SCRUB_KEPT_SPARK = (
    "array_join(transform(array_sort(collect_list(named_struct("
    "'s', span_start, "
    "'piece', substr(text, prev_end + 1, span_start - prev_end - 1)))), "
    "x -> x.piece), '')"
)


def scrub_dup_spans(
    spark: SparkSession, sf_dir: str, L: int = SUBSTR_L, mod: int = SUBSTR_MOD
) -> DataFrame:
    """Cut every cross-document duplicated span out of every doc (the
    Lee et al. §4 action): keep unique text, count removed chars.

    Engine path: the (tiny, already-checkpointed) spans result feeds the
    rebuild as a temp view, so the window build runs ONCE — the pure-SQL
    twin would inline it twice more through the spans CTE."""
    _docs(spark, sf_dir)
    substring_dup_spans(spark, sf_dir, L, mod).createOrReplaceTempView("__substr_sp")
    try:
        return spark.sql(f"WITH {_scrub_tail(_SCRUB_KEPT_SPARK, '__substr_sp')}")
    finally:
        spark.catalog.dropTempView("__substr_sp")


def scrub_dup_spans_oracle(L: int = SUBSTR_L, mod: int = SUBSTR_MOD) -> str:
    return _scrub_spans_sql(duck=True, L=L, mod=mod)


def neardup_groups_oracle(threshold: float = 0.2, n: int = 3) -> str:
    # transitive closure via the shared recursive-CTE chain (ONE
    # definition; dedup_keep_best_oracle composes the same chain)
    return f"""
    WITH RECURSIVE {_components_ctes(threshold, n)}
    SELECT doc_id, component FROM comp
    """


def _components_ctes(threshold: float, n: int) -> str:
    """Shared recursive-CTE chain computing (doc_id, component) — the
    DuckDB twin of :func:`neardup_groups`, reused by every oracle that
    composes on top of near-dup components.  Carries the op-default
    band-bucket cap so composed oracles match the engine pipeline."""
    return f"""pairs AS ({_lsh_sql(duck=True, threshold=threshold, n=n, max_bucket=LSH_MAX_BUCKET)}),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
    ),
    comp AS (
      SELECT a AS doc_id, least(a, min(b)) AS component
      FROM reach GROUP BY a
    )"""


def dedup_keep_best(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.2,
    n: int = 3,
    vectorized: bool = True,
) -> DataFrame:
    """Full-corpus keep/drop decision: one representative per near-dup
    group, everything ungrouped kept.

    The representative is the LONGEST doc of its group (``n_chars``
    desc), ties to the lowest ``doc_id`` — i.e. "keep the highest-
    quality copy", the policy production dedup pipelines actually want
    (vs :func:`neardup_groups`' min-id label, which is a group NAME,
    not a quality choice).

    Output: ``(doc_id, component, keep)`` for EVERY document —
    ``component`` NULL for ungrouped docs (always kept).

    Scale shape: ``groups`` is bounded by the number of near-duplicate
    docs (tiny vs the corpus), and the eager localCheckpoint below gives
    the planner its TRUE materialized size — so Spark auto-broadcasts it
    for both corpus-side joins (two narrow scans of ``documents``, zero
    corpus shuffle) while a pathological dup-rate above the broadcast
    threshold gracefully degrades to a shuffle join over the dup subset.
    Deliberately NO explicit ``F.broadcast`` hint here: a hint FORCES the
    broadcast regardless of size (autoBroadcastJoinThreshold only governs
    automatic selection), which at a pathological dup-rate would fail the
    job on the 8 GB broadcast / driver-memory limit instead of shuffling.
    The ``row_number`` window shuffles only the grouped subset.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    # eager lineage-free materialization: groups feeds TWO joins below;
    # without it the whole LSH+components pipeline would execute twice
    # (same lifecycle pattern as minhash_lsh_pairs' shingle cache)
    groups = neardup_groups(
        spark, sf_dir, threshold, n, vectorized=vectorized
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("component").orderBy(F.col("n_chars").desc(), "doc_id")
    grouped = (
        docs.join(groups, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", "component", (F.col("rn") == 1).alias("keep"))
    )
    ungrouped = docs.join(groups, "doc_id", "left_anti").select(
        "doc_id",
        F.lit(None).cast("long").alias("component"),
        F.lit(True).alias("keep"),
    )
    return grouped.unionByName(ungrouped)


def dedup_keep_best_oracle(threshold: float = 0.2, n: int = 3) -> str:
    return f"""
    WITH RECURSIVE {_components_ctes(threshold, n)},
    grouped AS (
      SELECT d.doc_id, c.component,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, d.doc_id) AS rn
      FROM documents d JOIN comp c ON d.doc_id = c.doc_id)
    SELECT doc_id, component, rn = 1 AS keep FROM grouped
    UNION ALL
    SELECT d.doc_id, CAST(NULL AS BIGINT) AS component, TRUE AS keep
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM comp)
    """
