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
