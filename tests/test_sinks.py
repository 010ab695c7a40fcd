"""Shard-sink determinism, file-size control, and partition pruning."""

import glob
import os

import pytest

from flink_infotheoretic_feature_selection_spark.operators.sinks import (
    read_corpus_shards,
    write_corpus_shards,
)


def test_shard_membership_is_deterministic_and_complete(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_corpus_shards(docs, p1, key_col="doc_id", n_shards=8)
    # different input partitioning, same shard membership
    write_corpus_shards(docs.repartition(13), p2, key_col="doc_id", n_shards=8)
    a = {(r["doc_id"], r["shard"]) for r in read_corpus_shards(spark, p1).collect()}
    b = {(r["doc_id"], r["shard"]) for r in read_corpus_shards(spark, p2).collect()}
    assert a == b
    assert len(a) == docs.count()
    assert {s for _, s in a} == set(range(8))  # 500 docs cover all 8 shards


def test_max_records_per_file_bounds_files(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = str(tmp_path / "capped")
    write_corpus_shards(docs, p, key_col="doc_id", n_shards=4, max_records_per_file=20)
    files = glob.glob(os.path.join(p, "shard=*", "*.parquet"))
    assert files
    import pyarrow.parquet as pq

    for f in files:
        assert pq.read_metadata(f).num_rows <= 20, f
    # one directory per shard, several capped files inside
    assert len(glob.glob(os.path.join(p, "shard=*"))) == 4


def test_shard_subset_read_prunes_partitions(spark, tmp_path):
    from flink_infotheoretic_feature_selection_spark.plans.inspect import formatted_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = str(tmp_path / "pruned")
    write_corpus_shards(docs, p, key_col="doc_id", n_shards=8)
    sub = read_corpus_shards(spark, p, shards=[0, 3])
    assert set(r["shard"] for r in sub.select("shard").distinct().collect()) == {0, 3}
    # the shard filter must reach the scan as partition pruning
    assert "PartitionFilters" in formatted_plan(sub)


def test_invalid_shard_count_raises(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="n_shards"):
        write_corpus_shards(docs, "/tmp/never", key_col="doc_id", n_shards=0)


def test_jsonl_roundtrip_preserves_documents(spark, tmp_path):
    # write (sharded, gzip) -> read (explicit schema) must reproduce the
    # table exactly; shard membership content-hashed like the parquet sink.
    from flink_infotheoretic_feature_selection_spark.operators.sinks import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "corpus_jsonl")
    write_documents_jsonl(docs, out, key_col="doc_id", n_shards=4)
    back = read_documents_jsonl(spark, out)
    a = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in docs.collect()
    )
    b = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in back.collect()
    )
    assert a == b

    # deterministic shard layout: re-write produces the same membership
    # (shard is a partition DIRECTORY, recovered by the schemaless read)
    out2 = str(tmp_path / "corpus_jsonl2")
    write_documents_jsonl(docs, out2, key_col="doc_id", n_shards=4)
    s1 = sorted((r["doc_id"], r["shard"]) for r in spark.read.json(out).collect())
    s2 = sorted((r["doc_id"], r["shard"]) for r in spark.read.json(out2).collect())
    assert s1 == s2
    assert len({s for _, s in s1}) >= 2


def test_jsonl_corrupt_lines_quarantine(spark, tmp_path):
    # A malformed producer line must land whole in the corrupt column
    # (schema columns NULL), never kill the read or poison good rows.
    from flink_infotheoretic_feature_selection_spark.operators.sinks import (
        read_documents_jsonl,
    )

    p = tmp_path / "dirty"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "good one", "lang": "en", "source": "web", "n_chars": 8}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also good", "lang": "en", "source": "web", "n_chars": 9}\n'
    )
    df = read_documents_jsonl(spark, str(p), corrupt_col="_bad")
    rows = df.collect()
    good = {r["doc_id"]: r["text"] for r in rows if r["_bad"] is None}
    bad = [r for r in rows if r["_bad"] is not None]
    assert good == {1: "good one", 2: "also good"}
    assert len(bad) == 1 and "not json" in bad[0]["_bad"]
    assert bad[0]["doc_id"] is None

    # without the opt-in column the same file reads clean rows + null row
    plain = read_documents_jsonl(spark, str(p))
    assert sorted(
        r["doc_id"] for r in plain.collect() if r["doc_id"] is not None
    ) == [1, 2]


def test_jsonl_permissive_semantics_pin(spark, tmp_path):
    # Pins the Spark-only PERMISSIVE behaviors the jsonl_read gate's
    # oracle deliberately leaves OUT of its cross-engine contract (see
    # __spark_entry__._jsonl_read_oracle): partial results on corrupt
    # records, number->string coercion, and top-level array explode.
    # If a Spark upgrade shifts any of these, this test names the break
    # before the landing-dir gate fixture has to.
    from flink_infotheoretic_feature_selection_spark.operators.sinks import (
        read_documents_jsonl,
    )

    p = tmp_path / "semantics"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        # long-field coercion failure mid-record: fields before AND
        # after the failing one keep their values, line is quarantined
        '{"doc_id": 8, "n_chars": "x", "lang": "de"}\n'
        # number -> string field coerces (NOT corrupt)
        '{"doc_id": 9, "text": 5, "lang": "en"}\n'
        # float / bool -> long both corrupt the record
        '{"doc_id": 1.5, "text": "frac"}\n'
        '{"doc_id": true, "text": "bool"}\n'
        # top-level array of objects explodes into one row per element
        '[{"doc_id": 20, "text": "a"}, {"doc_id": 21, "text": "b"}]\n'
    )
    rows = read_documents_jsonl(spark, str(p), corrupt_col="_bad").collect()
    by_bad = {r["_bad"]: r for r in rows if r["_bad"] is not None}

    partial = by_bad['{"doc_id": 8, "n_chars": "x", "lang": "de"}']
    assert (partial["doc_id"], partial["n_chars"], partial["lang"]) == (8, None, "de")

    coerced = next(r for r in rows if r["doc_id"] == 9)
    assert coerced["text"] == "5" and coerced["_bad"] is None

    assert {b for b in by_bad if '"frac"' in b or '"bool"' in b} == {
        '{"doc_id": 1.5, "text": "frac"}',
        '{"doc_id": true, "text": "bool"}',
    }

    exploded = sorted(r["doc_id"] for r in rows if r["doc_id"] in (20, 21))
    assert exploded == [20, 21]
    assert len(rows) == 6  # 4 single-line rows + 2 array elements
