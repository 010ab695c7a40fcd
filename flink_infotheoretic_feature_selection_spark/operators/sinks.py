"""Training-data sinks: deterministic, size-controlled corpus shards.

A training pipeline's last hop is rarely one parquet directory with
whatever file layout the final stage's partitioning produced — trainers
want shards of a KNOWN size (dataloader parallelism, resumable epochs),
deterministically assigned (re-running the export reproduces the same
shard membership), and without a driver-side bottleneck.

``write_corpus_shards`` does that with plain Spark machinery:

- shard id = content hash mod n_shards (``xxhash64`` of a caller-chosen
  key column) — deterministic under re-partitioning and re-runs, unlike
  ``monotonically_increasing_id``/``spark_partition_id`` layouts;
- one shuffle: ``repartition(n_shards, shard)`` co-locates each shard
  into exactly one task, so ``partitionBy`` writes one directory per
  shard without small-file spray (the naive ``df.write.partitionBy``
  over an unrelated partitioning writes up to tasks x shards files);
- ``maxRecordsPerFile`` caps file size inside a shard, the Spark-native
  knob for bounded files at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_corpus_shards",
    "read_corpus_shards",
    "read_documents_jsonl",
    "write_documents_jsonl",
    "DOCUMENTS_JSONL_SCHEMA",
    "write_bucketed",
]


def write_corpus_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ``path/shard=N/*.parquet`` with content-hashed,
    deterministic shard membership.

    ``key_col`` should be a stable identity column (doc_id, content
    digest): rows keep their shard across re-runs and re-partitionings,
    so downstream incremental consumers see stable shard contents.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
    )
    writer = (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_corpus_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read the sharded corpus back; ``shards`` prunes to a subset via
    partition pruning (the filter never scans the other directories)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.filter(F.col("shard").isin(shards))
    return df


DOCUMENTS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_JSONL_SCHEMA,
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSONL corpus reader — the de-facto LLM-training-data interchange
    format (one JSON object per line, usually gzip shards).

    Explicit schema ON PURPOSE: schema inference scans the data an
    extra time (a full pass at 100 TB), and one malformed producer can
    silently widen a column corpus-wide for every consumer.  Spark's
    native JSON source handles gzip/zstd shards, predicate pushdown on
    the parsed columns, and distributed line splitting — nothing
    driver-side.

    ``corrupt_col``: set to a column name to QUARANTINE instead of
    silently nulling — unparseable lines land whole in that extra
    string column (Spark's PERMISSIVE mode) with every schema column
    NULL, so the caller can split clean/dirty in one pass.  Corrupt
    capture requires the column to be part of the read schema, which is
    why it is opt-in rather than always-on.
    """
    if corrupt_col is not None:
        return (
            spark.read.schema(f"{schema}, {corrupt_col} string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .json(path)
        )
    return spark.read.schema(schema).json(path)


def write_documents_jsonl(
    df: DataFrame,
    path: str,
    key_col: str | None = None,
    n_shards: int = 16,
    compression: str | None = "gzip",
    max_records_per_file: int | None = None,
) -> None:
    """JSONL corpus writer.  With ``key_col`` set, shard membership is
    content-hashed and deterministic — the same
    ``xxhash64(key) % n_shards`` layout as :func:`write_corpus_shards`,
    re-run-stable for incremental consumers; without it, the current
    partitioning writes as-is (one file per task)."""
    writer = df
    if key_col is not None:
        if n_shards < 1:
            raise ValueError(f"n_shards must be >= 1, got {n_shards}")
        writer = df.withColumn(
            "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
        ).repartition(n_shards, "shard")
    out = writer.write.mode("overwrite")
    if key_col is not None:
        out = out.partitionBy("shard")
    if compression is not None:
        out = out.option("compression", compression)
    if max_records_per_file is not None:
        out = out.option("maxRecordsPerFile", max_records_per_file)
    out.json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key_col: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted parquet table.

    Bucketing is the cross-JOB co-location tool shuffling can't be: a
    ``repartition`` dies with the job, but a table written with
    ``bucketBy(n, key)`` carries its partitioning in the catalog, so
    EVERY future equi-join or aggregation on ``key`` against it — other
    pipelines, incremental ingest runs, the next day's dedup pass —
    skips its exchange entirely (plan-pinned in
    test_plans.py::test_bucketed_join_skips_both_exchanges).  At 100 TB
    the corpus-side shuffle is the dominant cost of every
    join-against-corpus op in this repo; paying it ONCE at write time
    amortizes it across every subsequent consumer.

    The usual caveats are real and intentional here: both join sides
    must agree on bucket count (use one corpus-wide constant), and
    bucket files per task multiply without the ``repartition`` below —
    we repartition on the bucket hash first so each bucket is one
    task's output (same small-file rationale as write_corpus_shards).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    writer = (
        df.repartition(n_buckets, F.col(key_col))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key_col)
        .sortBy(key_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
