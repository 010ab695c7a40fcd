"""Structured Streaming operators: stream results must equal batch results.

Pattern: copy testdata into a tmp dir (file-source streams need a
directory), run with trigger(availableNow=True) into a memory sink, and
compare against the identical batch aggregation.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from flink_infotheoretic_feature_selection_spark.datasets import load_events
from flink_infotheoretic_feature_selection_spark.streaming import (
    read_events_stream,
    stream_feature_histogram,
    stream_text_stats,
    streaming_dedup,
    windowed_event_agg,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return str(d)


def run_to_memory(stream_df, name, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return stream_df.sparkSession.table(name)


def test_read_events_stream_accepts_empty_landing_dir(spark, tmp_path):
    # A stream usually starts on an EMPTY landing directory with files
    # arriving later; the footer probe must fall back to the current
    # timestamp layout instead of raising (review finding).
    d = tmp_path / "landing"
    d.mkdir()
    df = read_events_stream(spark, str(d))
    assert df.isStreaming
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_loaded_events_absolute_time_range(spark, sf_dir):
    # Absolute-truth pin (round-2 lesson): stream-equals-batch checks both
    # sides of a shared loader, so a decode error (e.g. the 1000×-off
    # nanos-vs-micros bug) passes them clean.  The generator writes ~30
    # days of 2024 events — assert the loaded range matches that fact, and
    # that a 12h-gap sessionization yields strictly more sessions than
    # users (a 1000×-shrunk timeline collapses to one session per user).
    import datetime

    from flink_infotheoretic_feature_selection_spark.operators.sessions import sessionize

    ev = load_events(spark, sf_dir)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert lo >= datetime.datetime(2024, 1, 1)
    assert hi <= datetime.datetime(2024, 12, 31)
    span_days = (hi - lo).total_seconds() / 86400
    assert 20 <= span_days <= 40, f"events span {span_days:.1f} days, expected ~30"

    n_users = ev.select("user_id").distinct().count()
    n_sessions = sessionize(ev).count()
    assert n_sessions > n_users


def test_windowed_event_agg_matches_batch(spark, sf_dir, events_dir):
    # update mode: append would (correctly) withhold windows still inside
    # the watermark horizon at end-of-input; update emits every window.
    stream = windowed_event_agg(read_events_stream(spark, events_dir), window="1 day")
    got = run_to_memory(stream, "win_agg", output_mode="update").collect()

    batch = (
        load_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
        .collect()
    )
    got_map = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"]) for r in got}
    exp_map = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"]) for r in batch}
    assert set(got_map) == set(exp_map)
    for k, (n, s) in exp_map.items():
        assert got_map[k][0] == n
        assert got_map[k][1] == pytest.approx(s, rel=1e-9)


def test_streaming_dedup_removes_duplicates(spark, events_dir, tmp_path):
    # duplicate the input file → every event_id appears twice across files
    dup_dir = tmp_path / "dup"
    dup_dir.mkdir()
    shutil.copy(f"{events_dir}/part-0.parquet", dup_dir / "a.parquet")
    shutil.copy(f"{events_dir}/part-0.parquet", dup_dir / "b.parquet")
    stream = streaming_dedup(read_events_stream(spark, str(dup_dir)))
    got = run_to_memory(stream, "dedup_stream")
    n_unique = spark.read.parquet(f"{events_dir}/part-0.parquet").count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_stream_text_stats_matches_batch(spark, sf_dir, tmp_path):
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", docs_dir / "part-0.parquet")
    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream_docs = spark.readStream.schema(batch_docs.schema).parquet(str(docs_dir))

    got = run_to_memory(stream_text_stats(stream_docs), "txt_stream").collect()
    expect = stream_text_stats.__wrapped__(batch_docs).collect() if hasattr(
        stream_text_stats, "__wrapped__"
    ) else stream_text_stats(batch_docs).collect()

    gm = {r["doc_id"]: r for r in got}
    em = {r["doc_id"]: r for r in expect}
    assert set(gm) == set(em)
    sample = list(em)[:20]
    for d in sample:
        assert gm[d]["n_tokens"] == em[d]["n_tokens"]
        assert gm[d]["quality_score"] == pytest.approx(em[d]["quality_score"])


def test_stream_feature_histogram_counts(spark, sf_dir, events_dir):
    stream = stream_feature_histogram(read_events_stream(spark, events_dir))
    got = run_to_memory(stream, "hist_stream", output_mode="update")
    total = got.agg(F.sum("cnt")).collect()[0][0]
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # y buckets bounded to 0..9 by construction
    ys = {r["y"] for r in got.select("y").distinct().collect()}
    assert ys <= set(range(10))


def test_sessionize_stream_matches_batch(spark, sf_dir, events_dir):
    from flink_infotheoretic_feature_selection_spark.operators.sessions import duration_us, sessionize
    from flink_infotheoretic_feature_selection_spark.streaming import sessionize_stream

    gap = "12 hours"
    # session_window aggs support append/complete only; complete emits every
    # session regardless of watermark, which is what the batch-parity check needs
    stream = sessionize_stream(read_events_stream(spark, events_dir), gap=gap)
    got = run_to_memory(stream, "sess_stream", output_mode="complete").collect()
    exp = sessionize(load_events(spark, sf_dir), gap=gap).collect()

    gap_us = duration_us(gap)
    got_map = {
        (r["user_id"], r["session_start_us"]): (r["n_events"], r["session_end_us"])
        for r in got
    }
    # stream window end = last event + gap; batch emits the last event
    exp_map = {
        (r["user_id"], r["session_start_us"]): (r["n_events"], r["session_end_us"] + gap_us)
        for r in exp
    }
    assert got_map == exp_map


def test_stateful_user_stats_carries_state_across_batches(spark, sf_dir, tmp_path):
    # two identical files + maxFilesPerTrigger=1 → two micro-batches; the
    # final emitted totals per user must cover BOTH batches (state carried),
    # i.e. equal 2× the batch aggregation of one file.
    from flink_infotheoretic_feature_selection_spark.datasets import events_read_plan
    from flink_infotheoretic_feature_selection_spark.streaming import stateful_user_stats

    d = tmp_path / "two_batches"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", d / "b.parquet")
    schema, ts_is_nanos = events_read_plan(str(d))
    stream_src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    if ts_is_nanos:
        stream_src = stream_src.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    got = run_to_memory(stateful_user_stats(stream_src), "user_stats", output_mode="update")
    rows = got.collect()
    # update mode appends one row per user per batch → users seen in both
    # batches appear twice; keep the max-count (final) row per user
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
            final[r["user_id"]] = r

    exp = {
        r["user_id"]: r
        for r in load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            (F.count("*") * 2).alias("n_events"),
            (F.sum("value") * 2).alias("sum_value"),
            F.max(F.unix_micros("ts")).alias("last_ts_us"),
        )
        .collect()
    }
    assert set(final) == set(exp)
    n_twice = 0
    for uid, r in exp.items():
        assert final[uid]["n_events"] == r["n_events"]
        assert final[uid]["sum_value"] == pytest.approx(r["sum_value"], rel=1e-9)
        assert final[uid]["last_ts_us"] == r["last_ts_us"]
        n_twice += 1
    assert n_twice > 0


def test_sessionize_stream_append_emits_only_watermark_closed(spark, tmp_path):
    # Controlled two-batch fixture: batch A has a tight burst per user,
    # batch B arrives 10 days later.  With gap=12h and watermark 0s, after
    # both batches the watermark sits at B's max event time, so A's
    # sessions (ended long before) MUST be emitted in append mode, while
    # B's still-open sessions are withheld — the state-eviction contract
    # that makes session state O(open sessions) at scale.
    import time as _time

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from flink_infotheoretic_feature_selection_spark.streaming import sessionize_stream

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    d = tmp_path / "sessions_append"
    d.mkdir()
    t0 = 1_700_000_000  # epoch seconds
    batch_a = [
        (1, t0, 1.0),
        (1, t0 + 600, 2.0),
        (2, t0 + 60, 5.0),
    ]
    batch_b = [(1, t0 + 10 * 86400, 7.0), (2, t0 + 10 * 86400 + 30, 9.0)]

    def write(rows, path):
        spark.createDataFrame(
            [(u, __import__("datetime").datetime.utcfromtimestamp(s), v) for u, s, v in rows],
            schema,
        ).coalesce(1).write.mode("overwrite").parquet(path)

    write(batch_a, str(d / "a"))
    _time.sleep(1.1)  # distinct mtimes => file source processes A before B
    write(batch_b, str(d / "b"))

    stream_src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "*"))
    )
    out = run_to_memory(
        sessionize_stream(stream_src, gap="12 hours", watermark="0 seconds"),
        "sess_append",
        output_mode="append",
    ).collect()

    got = {(r["user_id"], r["session_start_us"]): r["n_events"] for r in out}
    # exactly batch A's sessions: user 1 (2 events), user 2 (1 event)
    assert got == {
        (1, t0 * 1_000_000): 2,
        (2, (t0 + 60) * 1_000_000): 1,
    }, out


def test_sessionize_skew_equals_plain(spark, sf_dir):
    # the skew-tolerant two-phase path must be value-identical to the
    # single-window path, even with buckets small enough to force many
    # boundary stitches
    from flink_infotheoretic_feature_selection_spark.operators.sessions import (
        sessionize,
        sessionize_skew,
    )

    ev = load_events(spark, sf_dir)
    key = lambda r: (r["user_id"], r["sess_seq"])
    val = lambda r: (
        r["session_start_us"],
        r["session_end_us"],
        r["n_events"],
        r["sum_value"],
    )
    a = {key(r): val(r) for r in sessionize(ev).collect()}
    b = {key(r): val(r) for r in sessionize_skew(ev, bucket="2 days").collect()}
    assert a == b


def test_events_read_plan_probes_file_uri(tmp_path):
    # URI paths go through pyarrow.fs; file:// is always available, so a
    # real footer (not the assumed fallback layout) must be probed —
    # including directory listing through the filesystem API.
    import shutil
    import warnings

    from flink_infotheoretic_feature_selection_spark.datasets import events_read_plan

    d = tmp_path / "landing"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "part-0.parquet")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the fallback warns; a probe must not
        schema_dir, _ = events_read_plan(f"file://{d}")
        schema_file, _ = events_read_plan(f"file://{d}/part-0.parquet")
    local_schema, _ = events_read_plan(str(d))
    assert schema_dir == local_schema == schema_file


def test_events_read_plan_unknown_scheme_falls_back(tmp_path):
    from flink_infotheoretic_feature_selection_spark.datasets import events_read_plan

    with pytest.warns(UserWarning, match="could not probe"):
        schema, ts_is_nanos = events_read_plan("definitely-not-a-scheme://bucket/x")
    assert ts_is_nanos is False


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_with_simhash64_column_equals_sql_route(spark, hash_fn):
    # The column-expression signature build (streaming-composable) must
    # be bit-identical to the SQL CTE route the batch ops use — for the
    # xxhash64 production hash AND the md5 oracle-portable hash.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        _simhash64_sql,
        with_simhash64,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents")
    try:
        via_sql = {
            r["doc_id"]: r["simhash64"]
            for r in spark.sql(_simhash64_sql(hash_fn)).collect()
        }
        via_col = {
            r["doc_id"]: r["simhash64"]
            for r in with_simhash64(docs, hash_fn=hash_fn)
            .select("doc_id", "simhash64")
            .collect()
        }
        assert via_col == via_sql
    finally:
        spark.catalog.dropTempView("documents")


def test_streaming_neardup_drops_bag_of_words_dups(spark, tmp_path):
    # A shuffled-word copy of a doc has a different md5 (exact dedup
    # keeps it) but the same bag-of-words SimHash — the streaming
    # near-dup must emit only one doc per signature.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_infotheoretic_feature_selection_spark.streaming.ops import (
        streaming_neardup,
    )

    base = "the quick brown fox jumps over the lazy dog tonight again"
    shuffled = "dog lazy the over jumps fox brown quick the again tonight"
    unique = "an entirely different document about spark structured streaming state"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([base, shuffled, unique], pa.string()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(3)], pa.timestamp("us")),
        }
    )
    land = tmp_path / "docs_landing"
    land.mkdir()
    pq.write_table(tbl, land / "part-0.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(str(land))
    )
    out_dir = tmp_path / "sink"
    q = (
        streaming_neardup(stream, watermark="1 hour")
        .select("doc_id", "simhash64")
        .writeStream.format("memory")
        .queryName("neardup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM neardup_sink").collect()
    kept_ids = {r["doc_id"] for r in rows}
    # docs 1 and 2 share a signature -> exactly one of them survives;
    # doc 3 always survives.
    assert 3 in kept_ids
    assert len(kept_ids) == 2
    assert len(kept_ids & {1, 2}) == 1


def test_stream_range_join_matches_batch(spark, sf_dir, events_dir):
    # stream-stream interval join == the batch bucketed range join on
    # the same data (both sides read the same landing dir, filtered by
    # type inside the stream).
    from flink_infotheoretic_feature_selection_spark.operators.temporal import (
        range_join_query,
    )
    from flink_infotheoretic_feature_selection_spark.streaming.ops import (
        read_events_stream,
        stream_range_join,
    )

    intervals = (
        read_events_stream(spark, events_dir)
        .filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("interval_id"), F.col("ts").alias("start"))
    )
    probe = (
        read_events_stream(spark, events_dir)
        .filter(F.col("event_type") == "view")
        .select("ts", "value")
    )
    joined = stream_range_join(intervals, probe, window_sec=120)
    got = (
        run_to_memory(joined, "range_join_stream")
        .groupBy("interval_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
        )
        .collect()
    )
    exp = range_join_query(spark, sf_dir).collect()
    got_map = {r["interval_id"]: (r["n_hits"], r["sum_cents"]) for r in got}
    exp_map = {r["interval_id"]: (r["n_hits"], r["sum_cents"]) for r in exp}
    assert got_map == exp_map


def test_stream_range_join_state_is_watermark_bounded(spark, events_dir):
    # the physical streaming plan must contain a stream-stream join with
    # watermarks on BOTH sides (the bounded-state contract); an
    # un-range-bound condition would reject or buffer forever.
    from flink_infotheoretic_feature_selection_spark.streaming.ops import (
        read_events_stream,
        stream_range_join,
    )

    intervals = (
        read_events_stream(spark, events_dir)
        .filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("interval_id"), F.col("ts").alias("start"))
    )
    probe = (
        read_events_stream(spark, events_dir)
        .filter(F.col("event_type") == "view")
        .select("ts", "value")
    )
    joined = stream_range_join(intervals, probe, window_sec=120)
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2


def test_stream_ann_candidates_topk_equals_batch_gate(spark, tmp_path):
    # Arriving query vectors scored against the static IVF-PQ corpus
    # index must reproduce the batch gate bit-for-bit: rank the stream's
    # candidate scores per query and compare to ann_ivf_pq_topk.
    import shutil

    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        PQ_SCORE_SCALE,
        ann_ivf_pq_topk,
        pq_corpus_index,
    )
    from flink_infotheoretic_feature_selection_spark.streaming.ops import (
        stream_ann_candidates,
    )

    sf = "/root/testdata/sf0.001"
    land = tmp_path / "queries_landing"
    land.mkdir()
    shutil.copy(f"{sf}/embeddings.parquet", land / "part-0.parquet")

    corpus = pq_corpus_index(spark.read.parquet(f"{sf}/embeddings.parquet"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .parquet(str(land))
        .filter("vec_id < 200")
    )
    q = (
        stream_ann_candidates(stream, corpus)
        .writeStream.format("memory")
        .queryName("ann_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    cand = {}
    for r in spark.sql("SELECT * FROM ann_sink").collect():
        cand.setdefault(r.query_id, []).append((r.neighbor_id, r.iscore))
        # approx_cos must be the fixed-point rescale of the same integer
        assert round(r.approx_cos * PQ_SCORE_SCALE) == r.iscore
    got = {}
    for qid, rows in cand.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        got[qid] = [(n, s) for n, s in rows[:3]]
    expect = {}
    for r in ann_ivf_pq_topk(spark, sf, k=3).collect():
        expect.setdefault(r.query_id, []).append(
            (r.rank, r.neighbor_id, round(r.approx_cos * PQ_SCORE_SCALE))
        )
    expect = {
        qid: [(n, s) for _, n, s in sorted(rows)] for qid, rows in expect.items()
    }
    assert got == expect


def test_stream_neardup_candidates_equals_bruteforce(spark, sf_dir, tmp_path):
    # Streaming ingest twin of simhash64_incremental: stream the batch
    # docs against a static chunk index of the corpus docs; candidate
    # rows must equal the brute-force (batch doc x corpus doc, ham<=3)
    # set computed from the signatures directly.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_infotheoretic_feature_selection_spark.operators.dedup import simhash64
    from flink_infotheoretic_feature_selection_spark.streaming import (
        stream_neardup_candidates,
    )

    sigs = {
        r["doc_id"]: r["simhash64"] for r in simhash64(spark, sf_dir).collect()
    }
    batch = {d for d in sigs if d % 10 == 0}
    corpus = set(sigs) - batch
    mask = (1 << 64) - 1

    def ham(a, b):
        return bin((sigs[a] ^ sigs[b]) & mask).count("1")

    expect = {
        (n, t, ham(n, t)) for n in batch for t in corpus if ham(n, t) <= 3
    }

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
        if r["doc_id"] in batch
    }
    land = tmp_path / "ingest"
    land.mkdir()
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
            }
        ),
        land / "part-0.parquet",
    )

    corpus_sig = (
        simhash64(spark, sf_dir)
        .where("doc_id % 10 != 0")
        .localCheckpoint(eager=True)
    )

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(land))
    out = run_to_memory(
        stream_neardup_candidates(stream, corpus_sig), "neardup_cand_sink"
    )
    got = {(r["doc_id"], r["dup_of"], r["hamming"]) for r in out.collect()}
    assert got == expect
    assert len(got) > 0


def test_stream_decontaminate_flags_equal_batch(spark, sf_dir, tmp_path):
    # Streaming flag set == batch decontaminate(flag mode, no df cap) on
    # the same train/eval split; one row per contaminated doc.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        decontaminate,
        doc_shingles,
    )
    from flink_infotheoretic_feature_selection_spark.streaming import (
        stream_decontaminate,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_docs = docs.where("doc_id % 20 = 0")
    train_docs = docs.where("doc_id % 20 != 0")
    expect = {
        r["doc_id"]
        for r in decontaminate(
            train_docs, eval_docs, mode="flag", max_train_df=None
        ).collect()
    }

    rows = train_docs.select("doc_id", "text").collect()
    land = tmp_path / "train_landing"
    land.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
                "ts": pa.array(
                    [1_700_000_000_000_000] * len(rows), pa.timestamp("us")
                ),
            }
        ),
        land / "part-0.parquet",
    )
    eval_sh = (
        doc_shingles(eval_docs).select("shingle").distinct().localCheckpoint(eager=True)
    )
    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(str(land))
    out = run_to_memory(
        stream_decontaminate(stream, eval_sh), "decontam_sink"
    )
    got = {r["doc_id"] for r in out.collect()}
    assert got == expect
    assert len(got) > 0


def test_jsonl_landing_dir_ingest_composes_end_to_end(spark, sf_dir, tmp_path):
    # The production ingest shape: producers drop (gzip) JSONL into a
    # landing dir; the stream reader + decontamination flag compose and
    # must equal the batch answer on the same files.  A malformed line
    # in the landing dir must not kill the stream.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        decontaminate,
        doc_shingles,
    )
    from flink_infotheoretic_feature_selection_spark.operators.sinks import (
        write_documents_jsonl,
    )
    from flink_infotheoretic_feature_selection_spark.streaming import (
        read_documents_jsonl_stream,
        stream_decontaminate,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_docs = docs.where("doc_id % 20 = 0")
    train_docs = docs.where("doc_id % 20 != 0")
    land = str(tmp_path / "landing")
    write_documents_jsonl(
        train_docs.selectExpr(
            "doc_id", "text", "lang", "source", "n_chars",
            "timestamp_micros(1700000000000000) AS ts",
        ),
        land,
        key_col="doc_id",
        n_shards=3,
        compression="gzip",
    )
    # drop one junk line into the landing dir alongside the shards
    import gzip
    import pathlib

    junk = pathlib.Path(land) / "shard=0" / "zz-junk.json.gz"
    with gzip.open(junk, "wt") as f:
        f.write("definitely not a json document\n")

    eval_sh = (
        doc_shingles(eval_docs).select("shingle").distinct().localCheckpoint(eager=True)
    )
    stream = read_documents_jsonl_stream(
        spark,
        land,
        schema="doc_id long, text string, lang string, source string, "
        "n_chars long, ts timestamp",
    )
    out = run_to_memory(
        stream_decontaminate(stream, eval_sh), "jsonl_ingest_sink"
    )
    expect = {
        r["doc_id"]
        for r in decontaminate(
            train_docs, eval_docs, mode="flag", max_train_df=None
        ).collect()
    }
    got = {r["doc_id"] for r in out.collect()}
    assert got == expect and len(got) > 0


def test_stream_tokenize_bpe_matches_batch_gate(spark, sf_dir, tmp_path):
    # r11: the streamed merge chain must equal the GATE's batch output
    # exactly (count + md5 per doc) — stateless expression, same SQL
    import shutil as _sh

    from flink_infotheoretic_feature_selection_spark.operators.text import tokenize_bpe
    from flink_infotheoretic_feature_selection_spark.streaming.ops import (
        stream_tokenize_bpe,
    )

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    _sh.copy(f"{sf_dir}/documents.parquet", docs_dir / "part-0.parquet")
    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream_docs = spark.readStream.schema(batch_docs.schema).parquet(str(docs_dir))

    got = {
        r.doc_id: (r.n_bpe_exact, r.bpe_md5)
        for r in run_to_memory(stream_tokenize_bpe(stream_docs), "bpe_stream").collect()
    }
    expect = {
        r.doc_id: (r.n_bpe_exact, r.bpe_md5) for r in tokenize_bpe(spark, sf_dir).collect()
    }
    assert got == expect and len(got) > 0
