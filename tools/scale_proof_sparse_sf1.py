"""Order-of-magnitude scale proof for the SPARSE selector (round 6).

The dense flagship has its sf1 row (tools/scale_proof_sf1.py, 6M rows,
row-linear, bit-identical selection); this is the sparse path's twin:
build a 10x replica of sf0.1 lineitem (~6M rows => ~48M nonzero cells
over the first 8 features), run SparseInfoThSelector mRMR k=3, and
record:

- wall time for the one-time co-partitioned cache build and for the
  full fit, vs the sf0.1 record (BASELINE.md b13);
- selection-path invariance: duplicating rows scales every contingency
  count uniformly, so MI/CMI and the greedy path must be IDENTICAL to
  the sf0.1 run — correctness at scale for free;
- WHICH join strategy AQE actually executes for the per-iteration
  (remaining cells x selected column) join: the merge hint pins the
  label attach, but the per-iteration left join is free to elect
  broadcast (nz_best is one feature's column) — the proof records the
  final adaptive plan's join node types from a representative
  iteration query.

Multi-file layout on purpose: the round-5 audit found single-file
100x fixtures serialize every Python stage behind ONE input split —
one file per copy keeps the scan parallel (the corrected-table
lesson in BASELINE.md).

Usage: python tools/scale_proof_sparse_sf1.py [src_sf_dir] [out_dir] [copies]
       (defaults: /root/testdata/sf0.1 /tmp/sf1_sparse 10)
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_multifile(src: str, out: str, copies: int) -> int:
    import pyarrow.parquet as pq

    d = f"{out}/lineitem.parquet"
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(f"{src}/lineitem.parquet")
    for i in range(copies):
        pq.write_table(t, f"{d}/copy{i:02d}.parquet")
    return t.num_rows * copies


def fit_once(spark, sf_dir: str, label: str):
    from flink_infotheoretic_feature_selection_spark.datasets import FEATURE_NAMES, features_dense
    from flink_infotheoretic_feature_selection_spark.operators.sparse import matrix_to_sparse_long
    from flink_infotheoretic_feature_selection_spark.selector import SparseInfoThSelector

    nf = 8
    t0 = time.time()
    base, nz, labels = matrix_to_sparse_long(features_dense(spark, sf_dir), FEATURE_NAMES[:nf])
    try:
        model = SparseInfoThSelector(n_features=nf, n_to_select=3).fit(nz, labels)
        wall = time.time() - t0
        print(f"{label}: fit wall {wall:.1f}s path={model.selection_path}", flush=True)
        return model.selection_path, wall
    finally:
        base.unpersist()


def joined_plan_join_nodes(spark, sf_dir: str) -> list[str]:
    """Execute one representative per-iteration join shape at the target
    scale and return the FINAL adaptive plan's join node types."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.datasets import FEATURE_NAMES, features_dense
    from flink_infotheoretic_feature_selection_spark.operators.sparse import matrix_to_sparse_long

    base, nz, labels = matrix_to_sparse_long(features_dense(spark, sf_dir), FEATURE_NAMES[:8])
    try:
        nzy = (
            nz.join(labels.hint("merge"), "row_id")
            .select("row_id", "feat", "x", "y")
            .sortWithinPartitions("row_id")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        nz_best = nzy.filter(F.col("feat") == 0).select("row_id", F.col("x").alias("z"))
        h3 = (
            nzy.filter(F.col("feat").isin(list(range(1, 8))))
            .join(nz_best, "row_id", "left")
            .groupBy("feat", "x", "y", F.coalesce("z", F.lit(0)).alias("z"))
            .agg(F.count("*").alias("cnt"))
        )
        h3.count()  # execute so AQE finalizes
        plan = h3._jdf.queryExecution().explainString(
            h3.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        nzy.unpersist()
        return sorted(set(re.findall(r"(\w*Join\w*)", plan)))
    finally:
        base.unpersist()


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_sparse"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    n_rows = build_multifile(src, out, copies)
    print(f"built {out}/lineitem.parquet ({copies} files) rows={n_rows}", flush=True)

    from flink_infotheoretic_feature_selection_spark.session import get_spark

    spark = get_spark("sparse-sf1-proof")
    path01, w01 = fit_once(spark, src, "sf0.1")
    path10, w10 = fit_once(spark, out, f"sf1({copies}x)")
    assert path01 == path10, f"selection diverged: {path01} vs {path10}"
    print(f"selection invariant under {copies}x duplication: OK", flush=True)
    print(f"scaling: {w10 / w01:.2f}x wall for {copies}x rows", flush=True)
    joins = joined_plan_join_nodes(spark, out)
    print(f"per-iteration join nodes in final adaptive plan at sf1: {joins}", flush=True)


if __name__ == "__main__":
    main()
