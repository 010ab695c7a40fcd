"""Freeze the PRODUCTION xxhash64 64-bit SimHash signatures as a golden
parquet fixture the DuckDB oracles can read.

Same fixture lifecycle as tools/fit_kmeans_centroids.py /
fit_pq_codebooks.py: run once offline, commit the artifact, and the
correctness gate replays against the frozen values.  DuckDB has no
xxhash64-compatible function, so the signature MATH cannot be
re-derived oracle-side; freezing the per-document signatures lets the
driver gate verify (a) the live Spark signature expression still
produces the frozen values (any drift => join produces rows whose
downstream pairs mismatch, or a row-count mismatch when a fingerprint
stops matching) and (b) the banding / components / incremental mining
machinery against BRUTE-FORCE Hamming over those signatures — fully
independent of the chunk join being checked.

Keying: md5 of the EXACT text bytes (coalesce(text, '')) — a content
key both engines compute identically, so the fixture survives doc_id
re-keying and covers every scale factor whose texts it contains (the
union of sf0.001/sf0.01/sf0.1 here).  If the driver's testdata
generator ever changes document texts, the oracle join loses rows and
the gate fails LOUDLY (row-count mismatch) — rerun this tool.

Usage: python tools/freeze_simhash64_sigs.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = [f"/root/testdata/sf{sf}" for sf in ("0.001", "0.01", "0.1")]
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "flink_infotheoretic_feature_selection_spark",
    "fixtures",
    "simhash64_xxhash64_sigs.parquet",
)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.operators.dedup import with_simhash64

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    docs = None
    for d in SF_DIRS:
        t = spark.read.parquet(f"{d}/documents.parquet").select("doc_id", "text")
        docs = t if docs is None else docs.unionByName(t)
    sigs = (
        with_simhash64(docs, hash_fn="xxhash64")
        .select(
            F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp"),
            F.expr("shiftrightunsigned(simhash64, 32)").alias("sig_hi"),
            F.expr("simhash64 & 4294967295").alias("sig_lo"),
        )
        .dropDuplicates(["fp"])
    )
    pdf = sigs.toPandas().sort_values("fp")  # deterministic file bytes
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), OUT)
    print(f"wrote {len(pdf)} signatures -> {OUT}")


if __name__ == "__main__":
    main()
