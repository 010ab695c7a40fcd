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
