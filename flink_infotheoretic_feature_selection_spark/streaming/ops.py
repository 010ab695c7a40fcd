"""Structured Streaming operators.

The reference is batch-only (Flink 1.0 ``DataSet``, ``InfoSelector.
scala:30`` — SURVEY.md §2.8 lists streaming as ABSENT), so this module is
part of the driver-mandated extension surface: the streaming shapes a
training-data pipeline needs, expressed as ``readStream`` →
transformation → ``writeStream`` with event-time watermarks.

Every transformation here is the SAME function that serves the batch
path where one exists (text stats, histograms) — Structured Streaming's
unified DataFrame API means narrow ops and hash aggregations carry over
verbatim; only watermarks and output modes are stream-specific.

Scale notes:
- windowed aggs keep state bounded by the watermark horizon; state is
  per (window, key) — no per-row state.
- streaming dedup uses ``dropDuplicatesWithinWatermark`` so the key
  store is purged past the horizon (unbounded-state dedup is a known
  production foot-gun at 100 TB/day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from flink_infotheoretic_feature_selection_spark.datasets import events_read_plan

__all__ = [
    "read_events_stream",
    "windowed_event_agg",
    "streaming_dedup",
    "streaming_neardup",
    "stream_range_join",
    "sessionize_stream",
    "stateful_user_stats",
    "stream_text_stats",
    "stream_tokenize_bpe",
    "stream_ann_candidates",
    "stream_neardup_candidates",
    "stream_decontaminate",
    "read_documents_jsonl_stream",
    "stream_feature_histogram",
]

def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet directory.

    File sources need an explicit schema (no inference mid-stream); new
    files under ``path`` become micro-batches.  The schema is probed from
    the existing files' footer (``datasets.events_read_plan``): a
    timestamp ``ts`` streams as-is, the long-nanos layout gets a narrow
    JVM-side nanos → micros conversion.

    ``max_files_per_trigger`` caps files per micro-batch — with
    ``Trigger.AvailableNow`` the drain then executes MULTIPLE
    micro-batches (state carryover + watermark advance across batch
    boundaries), which one unbounded availableNow batch never
    exercises.
    """
    schema, ts_is_nanos = events_read_plan(path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if ts_is_nanos:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def windowed_event_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed count/sum per event_type with late-data bound.

    Tumbling when ``slide`` is None, else sliding.  State per
    (window, event_type) only; the watermark lets the store evict closed
    windows, so state size is O(types × windows-in-horizon).
    """
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Exact streaming dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` purges seen-keys past the
    watermark horizon — the only dedup shape that survives an unbounded
    stream.  Default key: event_id.
    """
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_text_stats(docs: DataFrame) -> DataFrame:
    """The batch text-stats transformation applied to a document stream —
    narrow per-row expressions carry to streaming unchanged
    (operators/text.py::_stats_select is the shared core)."""
    from flink_infotheoretic_feature_selection_spark.operators.text import _stats_select

    return docs.selectExpr(*[
        e.strip() for e in _split_select(_stats_select(duck=False))
    ])


def stream_tokenize_bpe(docs: DataFrame) -> DataFrame:
    """Exact frozen-BPE tokenization over a document stream (r11) — the
    merge chain is a stateless per-row expression, so the batch operator
    (operators/text.py::_bpe_joined_expr, the SAME generated SQL the
    gate verifies) carries to streaming unchanged: no state, no
    watermark, scan-speed.  Stream-equals-batch pinned in
    test_streaming.py."""
    from flink_infotheoretic_feature_selection_spark.operators.text import _bpe_joined_expr

    j = _bpe_joined_expr(duck=False)
    return docs.selectExpr("doc_id", f"{j} AS __j").selectExpr(
        "doc_id",
        "CAST(length(__j) - length(replace(__j, ' ', '')) AS INT) AS n_bpe_exact",
        "md5(__j) AS bpe_md5",
    )


def _split_select(select_list: str) -> list[str]:
    """Split a SELECT list on top-level commas (expressions contain
    nested commas inside parens/quotes)."""
    parts, depth, quote, cur = [], 0, None, []
    for ch in select_list:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p for p in (s.strip() for s in parts) if p]


def stream_feature_histogram(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming analogue of the engine's 2-D histogram build (A4):
    running contingency counts of (event_type, value-bucket) per window.

    Shows the selector's core aggregation shape under incremental
    maintenance — counts arrive monotonically per (window, x, y) key in
    update mode.
    """
    return (
        events.withWatermark("ts", watermark)
        .select(
            F.window("ts", "6 hours").alias("w"),
            F.col("event_type").alias("x"),
            # clamp BOTH ends: a negative value would produce a negative
            # bucket id, which histogram consumers reject (or worse, wrap)
            F.greatest(
                F.lit(0), F.least(F.lit(9), (F.col("value") / 10).cast("int"))
            ).alias("y"),
        )
        .groupBy("w", "x", "y")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "x", "y", "cnt")
    )


def sessionize_stream(
    events: DataFrame, gap: str = "12 hours", watermark: str = "0 seconds"
) -> DataFrame:
    """Streaming gap-based sessionization via native ``session_window``.

    Built-in beats custom state here: the session-window operator merges
    overlapping [ts, ts+gap) ranges JVM-side and evicts closed sessions
    past the watermark — state is O(open sessions), not O(events).

    Watermark choice matters in EVERY output mode: unlike plain
    time-window aggregation, session_window late-filters and evicts by
    the watermark even under ``complete`` output (measured: a 0-second
    watermark over a multi-micro-batch drain with cross-batch disorder
    split/dropped a third of the sessions; the single-batch drain of the
    same files matched batch exactly —
    tests/test_random_streaming_sweep.py).  Keep the default 0 s only
    for ordered feeds or single-drain backfills; size it to the expected
    disorder horizon otherwise.

    Emitted ``session_end_us`` is ``last_event + gap`` (the window end);
    the batch twin (``operators/sessions.py::sessionize``) emits the last
    event itself — callers reconcile by subtracting ``gap``.  The merge
    rule (new session iff ``ts - prev >= gap``) is identical.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-user event count / value sum / last-seen, emitted every batch.

    This is the escape hatch for stateful logic the built-in windowed
    operators cannot express (arbitrary per-key accumulators, custom
    eviction).  State is one fixed-width row per user — bounded by key
    cardinality, never by stream length; Arrow batches keep the Python
    hop vectorized.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
            StructField("last_ts_us", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", DoubleType()),
            StructField("last", LongType()),
        ]
    )

    def update(key: tuple, pdfs, state: GroupState):
        n, s, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            last = max(last, int(pdf["ts_us"].max()))
        state.update((n, s, last))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s], "last_ts_us": [last]}
        )

    return (
        events.select("user_id", F.unix_micros("ts").alias("ts_us"), "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_neardup(
    docs: DataFrame, watermark: str = "2 hours", ts_col: str = "ts"
) -> DataFrame:
    """Streaming NEAR-dup: drop documents whose 64-bit SimHash signature
    was already seen within the watermark horizon.

    Exact streaming dedup (md5/event_id keys) misses reorderings and
    bag-of-words duplicates; keying ``dropDuplicatesWithinWatermark`` on
    the SimHash signature catches them with the SAME bounded-state
    guarantee — one seen-key entry per distinct signature, purged past
    the watermark.  The signature itself is a stateless projection
    (:func:`~..operators.dedup.with_simhash64`), so this composes with
    any streaming source.  Hamming>0 tolerance needs cross-key lookups
    that keyed streaming state cannot express — for that, run the batch
    :func:`~..operators.dedup.simhash64_components` over closed
    micro-batch outputs.
    """
    from flink_infotheoretic_feature_selection_spark.operators.dedup import with_simhash64

    return (
        with_simhash64(docs)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["simhash64"])
    )


def stream_range_join(
    intervals: DataFrame,
    probe: DataFrame,
    window_sec: int = 120,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream point-in-interval join with watermark-bounded state.

    The streaming twin of :func:`~..operators.temporal.range_join`:
    every probe row joins each interval whose ``[start, start +
    window_sec)`` contains its event time.

    Spark ACCEPTS an inner stream-stream join on an arbitrary
    condition, but without an equi-key every buffered left row must be
    compared against every buffered right row (all-pairs state
    matching), and state eviction needs the watermark + time-range
    bounds to be derivable from the condition.  The batch operator's
    max-width time-bucket trick supplies exactly that equi-key: the
    interval side explodes onto the ≤2 buckets it covers, the probe
    side computes its single floor bucket, and the join is
    ``bucket = bucket AND ts ∈ [start, start+w)``.  Both sides carry
    watermarks and the bucket+range condition bounds each side's match
    horizon, so both join buffers evict by watermark — state is O(rows
    in one horizon), never unbounded.  Late data beyond the watermark
    is dropped, matching every other streaming op in this module.
    """
    from pyspark.sql import functions as F

    w_us = int(window_sec) * 1_000_000
    iv = (
        intervals.withWatermark("start", watermark)
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros(start) div {w_us}"),
                    F.expr(f"(unix_micros(start) + {w_us} - 1) div {w_us}"),
                )
            ),
        )
    )
    pb = probe.withWatermark("ts", watermark).withColumn(
        "__bucket", F.expr(f"unix_micros(ts) div {w_us}")
    )
    cond = (
        (pb["__bucket"] == iv["__bucket"])
        & (pb["ts"] >= iv["start"])
        & (pb["ts"] < iv["start"] + F.expr(f"interval {int(window_sec)} seconds"))
    )
    return pb.join(iv, cond, "inner").drop("__bucket")


def stream_ann_candidates(queries: DataFrame, corpus_index: DataFrame) -> DataFrame:
    """Streaming ANN: score arriving query vectors against a STATIC
    IVF-PQ corpus index — (query_id, neighbor_id, iscore, approx_cos)
    per candidate.

    The streaming face of :func:`~..operators.similarity.ann_ivf_pq_topk`:
    ``corpus_index`` is the compact static side a deployment persists
    (:func:`~..operators.similarity.pq_corpus_index` — sign-grid bucket
    + PQ codes, no floats), and each arriving query explodes onto its
    multiprobe buckets and equi-joins it.  Stream-static inner joins are
    stateless on the stream side (no watermark needed — the static side
    is re-read per micro-batch), and every scoring expression is a
    stateless projection, so this runs in append mode.

    Scores are the SAME 5-decimal fixed-point integers the batch gate
    computes (``pq_adc_score_terms``), so per-query top-k over any set
    of closed micro-batches equals the batch answer on the same rows —
    pinned by unit test.  The final rank is left to the consumer: a
    global per-query row_number is not expressible in append mode
    (non-time window over a stream), and candidates-per-query is
    bounded by probes x bucket population anyway.
    """
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        N_SIGN_BITS,
        _bucket_expr,
        _norm_expr_spark,
        _probe_list,
        pq_adc_score_terms,
    )

    bucket = _bucket_expr("embedding", duck=False)
    probe = _probe_list(f"({bucket})", N_SIGN_BITS, duck=False)
    q = queries.selectExpr(
        "vec_id AS query_id",
        "embedding AS q_emb",
        f"{_norm_expr_spark('embedding')} AS q_nrm",
        f"{probe} AS bucket",
    )
    iscore, scale = pq_adc_score_terms()
    scored = (
        q.join(corpus_index, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(iscore).alias("iscore"),
        )
    )
    # approx_cos derives from the iscore COLUMN (chained select), not a
    # second copy of the 8-subspace expression tree — single evaluation
    # by construction, the two outputs can never diverge
    return scored.withColumn(
        "approx_cos", F.col("iscore").cast("double") / scale
    )


def stream_neardup_candidates(
    docs: DataFrame, corpus_sig: DataFrame, max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Streaming near-dup ingest check: score arriving documents against
    a STATIC 64-bit SimHash signature table — one ``(doc_id, dup_of,
    hamming)`` row per (incoming doc, corpus near-duplicate) pair.

    The streaming face of :func:`~..operators.dedup.simhash64_incremental`:
    ``corpus_sig`` is the persisted ``(doc_id, simhash64)`` corpus
    signature table, and each arriving doc computes its signature
    statelessly (:func:`~..operators.dedup.with_simhash64`), explodes
    onto its 8 chunks and equi-joins the banding index of the corpus's
    DISTINCT signatures, per :func:`~..operators.dedup
    .simhash64_chunk_index`'s SCALE RULE — the 2048-value chunk key
    space only desaturates signature counts, never doc counts, so the
    chunk join must run at the signature level and expand matched
    signatures back to doc ids through a plain ``simhash64`` equi-join
    (only TRUE near-signatures pay it).  A deployment persists both
    derived frames materialized; built here from the one argument, the
    planner re-derives them per micro-batch — correct, just not cached.
    Pass the PERSISTED bucketed index
    (:func:`~..operators.dedup.build_simhash64_index`;
    ``spark.table("simhash64_corpus_index")``) as ``corpus_sig`` and the
    catalog's HashPartitioning(simhash64) drops the corpus-side
    exchanges of BOTH derived frames — the signature DISTINCT and the
    doc-id expansion join — from every micro-batch (plan-pinned in
    test_plans.py::test_stream_neardup_over_bucketed_index).
    Stream-static inner joins are stateless on the stream side and
    every filter is narrow, so this runs in append mode with NO
    watermark and NO state store.

    The batch twin's per-doc min-id pick is left to the consumer: a
    per-doc argmin over a stream is an aggregation (update mode /
    watermark state), while candidates-per-doc is already bounded by
    the near-signature family sizes — same contract as
    :func:`stream_ann_candidates` leaving final top-k to the consumer.
    Docs whose signature matches nothing emit nothing (novel docs are
    the silent common case; the batch twin's NULL row exists for its
    one-row-per-batch-doc gate shape, not for production need).
    """
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        simhash64_chunk_index,
        simhash64_first_match_verify,
        with_simhash64,
    )

    if max_hamming >= 8:
        raise ValueError("chunk banding is only exact for max_hamming < 8")
    sig_index = simhash64_chunk_index(
        corpus_sig.select("simhash64").distinct()
    ).withColumnRenamed("simhash64", "sim_t")
    new_chunks = simhash64_chunk_index(
        with_simhash64(docs, hash_fn=hash_fn).select("doc_id", "simhash64")
    ).withColumnRenamed("simhash64", "sim_n")
    cand = (
        new_chunks.alias("n")
        .join(
            sig_index.alias("t"),
            (F.col("n.chunk_idx") == F.col("t.chunk_idx"))
            & (F.col("n.chunk_val") == F.col("t.chunk_val")),
        )
        .select("doc_id", "sim_n", "sim_t", F.col("n.chunk_idx").alias("chunk_idx"))
    )
    kept, ham = simhash64_first_match_verify(cand, "sim_n", "sim_t", max_hamming)
    near = kept.select("doc_id", "sim_t", ham.alias("hamming"))
    return (
        near.join(
            corpus_sig.select(
                F.col("doc_id").alias("dup_of"), F.col("simhash64").alias("sim_t")
            ),
            "sim_t",
        )
        .where(F.col("dup_of") != F.col("doc_id"))
        .select("doc_id", "dup_of", "hamming")
    )


def stream_decontaminate(
    docs: DataFrame,
    eval_shingles: DataFrame,
    n: int = 3,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming benchmark decontamination: flag arriving training docs
    that share any word ``n``-gram shingle with a STATIC eval/benchmark
    shingle set — ``(doc_id, ts)`` per contaminated doc, append mode.

    The streaming face of :func:`~..operators.dedup.decontaminate`
    (flag mode): ``eval_shingles`` is the distinct eval shingle set the
    deployment persists (single ``shingle`` column; benchmarks are
    thousands of docs, so Spark auto-broadcasts it per micro-batch).
    Arriving docs shingle statelessly, the LEFT SEMI stream-static join
    keeps rows with at least one eval match, and
    ``dropDuplicatesWithinWatermark`` on ``doc_id`` collapses a doc's k
    matching shingles to one flag row with watermark-bounded key state
    (all of a doc's shingle rows share its micro-batch and event time,
    so the horizon only needs to cover late re-deliveries of the doc
    itself, never cross-doc coordination).

    Two deliberate deltas vs the batch twin, both inherent to streaming:
    ``n_hits`` is not emitted (a per-doc count is an aggregation —
    update mode + state; the flag is the production decision point), and
    there is no ``max_train_df`` boilerplate cap (training-side shingle
    doc-frequency is a property of the WHOLE corpus, not computable
    inside a micro-batch — compute the cap offline into
    ``eval_shingles`` instead: drop high-df shingles from the persisted
    set, which is where that knob belongs operationally anyway).
    """
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        SHINGLE_TOKENS_EXPR,
        shingle_grams_expr,
    )

    # Inline shingle explode (not doc_shingles: that projects ts away;
    # the Arrow doc_shingle_arrays kernel is a batch-throughput
    # optimization — per-micro-batch volumes don't amortize it).  Same
    # tokenizer/gram expressions, OUTER explode per the house rationale;
    # a short doc's NULL shingle can never match an eval shingle, so the
    # semi join subsumes the null filter.
    sh = docs.select(
        "doc_id", ts_col, F.expr(SHINGLE_TOKENS_EXPR).alias("__ts")
    ).select(
        "doc_id",
        ts_col,
        F.explode_outer(F.expr(shingle_grams_expr(n, "__ts"))).alias("shingle"),
    )
    flagged = sh.join(eval_shingles.select("shingle"), "shingle", "left_semi")
    return (
        flagged.select("doc_id", ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["doc_id"])
    )


def read_documents_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Streaming twin of :func:`~..operators.sinks.read_documents_jsonl`
    — the landing-directory ingest shape: producers drop JSONL (often
    gzip) files into ``path``, each new file becomes a micro-batch.
    Same explicit-schema and corrupt-line-quarantine contract as the
    batch reader (file streams REQUIRE an explicit schema anyway —
    inference mid-stream is not a thing), so the whole streaming ingest
    surface (:func:`stream_text_stats`, :func:`stream_decontaminate`,
    :func:`stream_neardup_candidates`) composes directly on top.
    """
    from flink_infotheoretic_feature_selection_spark.operators.sinks import (
        DOCUMENTS_JSONL_SCHEMA,
    )

    schema = DOCUMENTS_JSONL_SCHEMA if schema is None else schema
    reader = spark.readStream
    if corrupt_col is not None:
        return (
            reader.schema(f"{schema}, {corrupt_col} string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .json(path)
        )
    return reader.schema(schema).json(path)
