"""Randomized stream-equals-batch sweep — the streaming twin of the
random corpus/events sweeps.

The five streaming gates drain FIXED fixtures; this sweep re-verifies
the streaming operators on random adversarial inputs drained through
REAL multi-batch runs (``maxFilesPerTrigger=1`` over 3 staged files, so
state carryover / watermark advance across batch boundaries is always
in play).  Each property is constructed so stream output must equal the
batch twin EXACTLY — divergence is a bug, never "streaming semantics":

- windowed agg + sessionize run in COMPLETE mode (state never evicted,
  so arbitrary cross-file disorder and late rows are still aggregated —
  the property holds on ANY input, while cross-batch session merges and
  window updates are genuinely exercised);
- streaming dedup runs in append mode with every timestamp inside ONE
  hour (< the 2 h watermark horizon), so no row is ever late and every
  cross-file duplicate MUST be caught by retained state — the sharpest
  multi-batch property: batch-1 keys re-arriving in batch 3 have to hit
  state, not a fresh batch-local hash;
- stream_decontaminate (stream-static semi join + within-watermark flag
  dedup) is compared against the batch ``decontaminate`` operator on
  the identical corpus (itself randomized-swept vs DuckDB elsewhere).

Watermark DROP semantics (genuinely stream-only behavior) are pinned by
the deterministic tests in test_streaming.py — this file only asserts
equalities that hold exactly.
"""

from __future__ import annotations

import datetime as dt
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

TYPES = ["click", "purchase", "error", "signup", "view"]


def _write_files(d, tables):
    d.mkdir(parents=True, exist_ok=True)
    for i, t in enumerate(tables):
        pq.write_table(pa.table(t), f"{d}/part-{i}.parquet")


def _events_cols(rows):
    return {
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([None for _ in rows], pa.string()),
    }


def _random_event_files(seed: int, span_seconds: int, n: int = 90):
    """3 file-batches of random events; timestamps are drawn over
    ``span_seconds`` INDEPENDENTLY per file, so later batches freely
    contain earlier event times (cross-batch disorder)."""
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    files, eid = [], 0
    for _ in range(3):
        rows = []
        for _ in range(n // 3):
            ts = base + dt.timedelta(seconds=rng.randint(0, span_seconds))
            rows.append(
                (
                    eid,
                    ts,
                    rng.randint(0, 4),
                    rng.choice(TYPES),
                    rng.randint(0, 99999) / 100.0,
                )
            )
            eid += 1
        files.append(_events_cols(rows))
    return files


def _drain(stream_df, name: str, mode: str, min_batches: int = 3):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise RuntimeError(f"{name} did not finish in budget")
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= min_batches, (
        f"{name}: {n_batches} non-empty micro-batches; multi-batch sweep "
        f"requires >= {min_batches}"
    )
    return stream_df.sparkSession.table(name)


def _rows(df, float_round: int = 9):
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    return sorted(
        (
            tuple(
                round(v, float_round) if isinstance(v, float) else v
                for v in r
            )
            for r in df.select(*sorted(df.columns)).collect()
        ),
        key=nullsafe,
    )


@pytest.mark.parametrize("seed", [7, 23])
def test_windowed_agg_complete_mode_equals_batch_on_disorder(
    spark, tmp_path, seed
):
    from flink_infotheoretic_feature_selection_spark.streaming import (
        read_events_stream,
        windowed_event_agg,
    )

    d = tmp_path / f"win{seed}"
    _write_files(d, _random_event_files(seed, span_seconds=72 * 3600))

    got = _drain(
        windowed_event_agg(
            read_events_stream(spark, str(d), max_files_per_trigger=1),
            window="1 day",
        ),
        f"rsw_win_{seed}",
        "complete",
    )
    # batch twin rebuilt without withWatermark (stream-only plumbing);
    # the aggregation body is windowed_event_agg's verbatim
    expect = (
        spark.read.parquet(str(d))
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    got = got.select(*expect.columns)
    assert _rows(got) == _rows(expect)


@pytest.mark.parametrize("seed", [11, 29])
def test_streaming_dedup_catches_cross_batch_duplicates(spark, tmp_path, seed):
    from flink_infotheoretic_feature_selection_spark.streaming import (
        read_events_stream,
        streaming_dedup,
    )

    rng = random.Random(seed)
    # one-hour event-time span << the 2 h watermark horizon: NOTHING is
    # ever late, so append-mode dedup must equal batch DISTINCT exactly
    files = _random_event_files(seed, span_seconds=3600)
    # re-deliver ~1/3 of file-1/2 event_ids in LATER files (fresh
    # payloads, same key) — these can only be dropped via carried state
    earlier_ids = [v.as_py() for f in files[:2] for v in f["event_id"]]
    for fi in (1, 2):
        dups = rng.sample(
            [i for i in earlier_ids if i < fi * 30], k=10
        )
        rows = [
            (
                i,
                dt.datetime(2024, 1, 1)
                + dt.timedelta(seconds=rng.randint(0, 3600)),
                rng.randint(0, 4),
                rng.choice(TYPES),
                rng.randint(0, 99999) / 100.0,
            )
            for i in dups
        ]
        old = files[fi]
        new = _events_cols(rows)
        files[fi] = {k: pa.concat_arrays([old[k], new[k]]) for k in old}
    d = tmp_path / f"dd{seed}"
    _write_files(d, files)

    got = _drain(
        streaming_dedup(
            read_events_stream(spark, str(d), max_files_per_trigger=1)
        ).select("event_id"),
        f"rsw_dedup_{seed}",
        "append",
    )
    expect = spark.read.parquet(str(d)).select("event_id").distinct()
    assert _rows(got) == _rows(expect)
    # the re-deliveries must actually have been present in the input
    assert spark.read.parquet(str(d)).count() == got.count() + 20


@pytest.mark.parametrize("seed", [13, 37])
def test_sessionize_complete_mode_merges_sessions_across_batches(
    spark, tmp_path, seed
):
    from flink_infotheoretic_feature_selection_spark.operators.sessions import (
        duration_us,
        sessionize,
    )
    from flink_infotheoretic_feature_selection_spark.streaming import (
        read_events_stream,
        sessionize_stream,
    )

    gap = "2 hours"
    d = tmp_path / f"sess{seed}"
    # 72 h span over 5 users with per-file independent draws: later
    # batches regularly land events BETWEEN two already-open sessions,
    # forcing JVM session-window state merges across batch boundaries
    _write_files(d, _random_event_files(seed, span_seconds=72 * 3600))

    # Unlike plain time-window aggregation (test above), session_window
    # applies watermark late-filtering/eviction across micro-batches EVEN
    # in complete mode (measured on this exact generator: the op's default
    # "0 seconds" watermark dropped 15 of 54 sessions once disorder
    # crossed batch boundaries, while the single-batch drain matched batch
    # exactly).  A watermark wider than the 72 h event-time span makes no
    # row late, so complete-mode equality must hold — cross-batch session
    # merges still run for real.
    s = sessionize_stream(
        read_events_stream(spark, str(d), max_files_per_trigger=1),
        gap=gap,
        watermark="96 hours",
    )
    got = _drain(s, f"rsw_sess_{seed}", "complete").select(
        "user_id",
        "session_start_us",
        # stream emits window end = last event + gap; batch twin emits
        # the last event itself (the gate's reconciliation)
        (F.col("session_end_us") - F.lit(duration_us(gap))).alias(
            "session_end_us"
        ),
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )
    # the raw staged files read back as TIMESTAMP_NTZ; the batch op (like
    # the production loader) works on session-zone TIMESTAMP
    batch = spark.read.parquet(str(d)).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    expect = sessionize(batch, gap=gap).select(
        "user_id",
        "session_start_us",
        "session_end_us",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )
    assert _rows(got) == _rows(expect)


WORDS = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge",
    "part", "window", "small", "hash", "join", "batch", "stream",
    "spark", "dup", "é", "中", "0", "a,b", "x;y", "-",
]


@pytest.mark.parametrize("seed", [19, 43])
def test_stream_neardup_candidates_equals_brute_force(spark, tmp_path, seed):
    """Banding-mined streaming candidates == brute-force Hamming scan.

    Pigeonhole makes the equality exact for ANY input: hamming <= 3 over
    8 signature chunks leaves >= 5 chunks identical, so every true pair
    survives the chunk equi-join; the verify filter then drops every
    false candidate.  The brute-force twin never sees the banding code.
    """
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        with_simhash64,
    )
    from flink_infotheoretic_feature_selection_spark.streaming import (
        stream_neardup_candidates,
    )

    rng = random.Random(seed)
    corpus_rows, stream_rows = [], []
    for i in range(60):
        roll = rng.random()
        if roll < 0.06:
            t = None
        elif roll < 0.1:
            t = ""
        else:
            t = " ".join(rng.choices(WORDS, k=rng.randint(1, 40)))
        (stream_rows if i % 3 == 0 else corpus_rows).append((i, t))
    # seed guaranteed hits (exact copy -> hamming 0) and likely hits
    # (one word swapped in a long doc)
    long_corpus = [r for r in corpus_rows if r[1] and len(r[1].split()) >= 20]
    for j, (cid, ct) in enumerate(long_corpus[:6]):
        sid, _ = stream_rows[j]
        if j % 2 == 0:
            stream_rows[j] = (sid, ct)
        else:
            w = ct.split()
            w[rng.randrange(len(w))] = rng.choice(WORDS)
            stream_rows[j] = (sid, " ".join(w))

    files = []
    for k in range(3):
        chunk = stream_rows[k::3]
        files.append(
            {
                "doc_id": pa.array([r[0] for r in chunk], pa.int64()),
                "text": pa.array([r[1] for r in chunk], pa.string()),
            }
        )
    d = tmp_path / f"nd{seed}"
    _write_files(d, files)

    corpus_df = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    corpus_sig = (
        with_simhash64(corpus_df)
        .select("doc_id", "simhash64")
        .localCheckpoint(eager=True)
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    got = _drain(
        stream_neardup_candidates(stream, corpus_sig),
        f"rsw_nd_{seed}",
        "append",
    )

    batch_sigs = with_simhash64(spark.read.parquet(str(d))).select(
        "doc_id", "simhash64"
    )
    expect = (
        batch_sigs.alias("a")
        .crossJoin(
            corpus_sig.select(
                F.col("doc_id").alias("dup_of"),
                F.col("simhash64").alias("sig_t"),
            ).alias("b")
        )
        .withColumn(
            "hamming",
            F.bit_count(F.col("simhash64").bitwiseXOR(F.col("sig_t"))).cast(
                "int"
            ),
        )
        .where((F.col("hamming") <= 3) & (F.col("dup_of") != F.col("doc_id")))
        .select("doc_id", "dup_of", "hamming")
    )
    assert _rows(got) == _rows(expect)
    assert got.count() >= 3  # the seeded exact copies must have matched


@pytest.mark.parametrize("seed", [17, 41])
def test_stream_decontaminate_equals_batch_flags(spark, tmp_path, seed):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        decontaminate,
    )
    from flink_infotheoretic_feature_selection_spark.streaming import (
        stream_decontaminate,
    )

    rng = random.Random(seed)
    texts = []
    for _ in range(60):
        roll = rng.random()
        if roll < 0.07:
            texts.append(None)
        elif roll < 0.12:
            texts.append("")
        elif roll < 0.2:
            texts.append(" ".join(rng.choices(WORDS, k=2)))  # < n tokens
        else:
            texts.append(" ".join(rng.choices(WORDS, k=rng.randint(3, 30))))
    docs = [(i, t) for i, t in enumerate(texts)]
    eval_rows = [r for r in docs if r[0] % 7 == 0]
    train_rows = [r for r in docs if r[0] % 7 != 0]
    # guarantee contamination: splice an eval phrase into some train docs
    eval_texts = [t for _, t in eval_rows if t and len(t.split()) >= 3]
    for i in range(0, len(train_rows), 9):
        if eval_texts:
            src = rng.choice(eval_texts).split()
            j = rng.randrange(max(1, len(src) - 2))
            did, t = train_rows[i]
            train_rows[i] = (did, ((t or "") + " " + " ".join(src[j:j + 3])).strip())

    ts = dt.datetime(2024, 1, 1)
    files = []
    for k in range(3):
        chunk = train_rows[k::3]
        files.append(
            {
                "doc_id": pa.array([r[0] for r in chunk], pa.int64()),
                "text": pa.array([r[1] for r in chunk], pa.string()),
                "ts": pa.array([ts] * len(chunk), pa.timestamp("us")),
            }
        )
    d = tmp_path / f"dec{seed}"
    _write_files(d, files)

    eval_df = spark.createDataFrame(eval_rows, "doc_id long, text string")
    train_df = spark.read.parquet(str(d)).select("doc_id", "text")

    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        doc_shingles,
    )

    eval_sh = doc_shingles(eval_df).select("shingle").distinct().localCheckpoint(
        eager=True
    )
    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(str(d))
    got = _drain(
        stream_decontaminate(stream, eval_sh).select("doc_id"),
        f"rsw_dec_{seed}",
        "append",
    )
    # stream face has no training-df cap (the knob lives in the persisted
    # eval shingle set) — compare against the uncapped batch twin
    expect = decontaminate(
        train_df, eval_df, mode="flag", max_train_df=None
    ).select("doc_id")
    assert _rows(got) == _rows(expect)
    assert got.count() > 0  # the spliced phrases must have flagged docs
