"""Measured scale proof for the similarity-search surface.

Builds deterministic Nx replicas of the sf0.1 embeddings table (each
copy jittered with a seeded gaussian so vectors are distinct but keep
the corpus distribution — bucket populations scale naturally) and
measures the exact and ANN paths at 1x / 10x / 100x corpus size with
the SAME bounded query side (vec_id < 200, the original vectors).

What it demonstrates, with numbers instead of argument:

- brute-force cosine_topk cost grows with the corpus (one full scan per
  query batch — the exactness baseline, linear by design);
- the IVF variants' candidate-generation stays a bucket equi-join, so
  their cost grows with bucket population (corpus/n_buckets), and the
  q8 variant reads 4x-smaller vectors on the same plan;
- the frozen k-means quantizer (fixtures/ivf_centroids.json, trained on
  the sf0.01 SAMPLE) keeps assigning an arbitrarily larger corpus —
  the fit-on-sample/assign-the-corpus lifecycle at work.

Usage: python tools/scale_proof_ann.py [src_dir] [out_root] [copies...]
       (defaults: /root/testdata/sf0.1 /tmp/ann_scale 10 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JITTER = 0.05


def build(src: str, out: str, copies: int) -> int:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    # one parquet FILE per copy under an embeddings.parquet directory —
    # a single concatenated file reads as ONE input split and serializes
    # every Python stage (the layout pathology measured in BASELINE's
    # 100×-dedup correction); a real corpus is always many files
    dst = f"{out}/embeddings.parquet"
    os.makedirs(dst, exist_ok=True)
    t = pq.read_table(f"{src}/embeddings.parquet")
    base = np.stack([np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()])
    vec_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    labels = np.asarray(t.column("label").to_pylist(), dtype=np.int32)
    for copy in range(copies):
        if copy == 0:
            pq.write_table(t, f"{dst}/part-00000.parquet")
            continue
        rng = np.random.default_rng(1_000_003 * copy)
        jit = (base + JITTER * rng.standard_normal(base.shape)).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(vec_ids + copy * 1_000_000, pa.int64()),
                "embedding": pa.array(list(jit), pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            },
            schema=t.schema,
        )
        pq.write_table(tbl, f"{dst}/part-{copy:05d}.parquet")
    return t.num_rows * copies


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_scale"
    copies = [int(a) for a in sys.argv[3:]] or [10, 100]

    from flink_infotheoretic_feature_selection_spark.operators import similarity
    from flink_infotheoretic_feature_selection_spark.session import get_spark

    spark = get_spark("ann_scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    ops = {
        "cosine_topk_exact": lambda d: similarity.cosine_topk(spark, d),
        "ivf_topk": lambda d: similarity.ivf_topk(spark, d),
        "ivf_multiprobe": lambda d: similarity.ivf_multiprobe_topk(spark, d),
        "ivf_q8": lambda d: similarity.ivf_topk_q8(spark, d),
        "ivf_kmeans_frozen": lambda d: similarity.ivf_kmeans_fixture_topk(spark, d),
        "ivf_multiprobe_vec": lambda d: similarity.ivf_multiprobe_vectorized(spark, d),
        "ivf_pq": lambda d: similarity.ann_ivf_pq_topk(spark, d),
    }

    def measure(d: str) -> dict:
        row = {}
        for name, fn in ops.items():
            best = float("inf")
            for _ in range(2):  # min-of-2 (BASELINE bench protocol)
                t0 = time.perf_counter()
                fn(d).count()
                best = min(best, time.perf_counter() - t0)
            row[name] = round(best, 2)
        return row

    results = {"1x": measure(src)}
    for n in copies:
        d = f"{out_root}/x{n}"
        rows = build(src, d, n)
        print(f"built {d} rows={rows}", flush=True)
        results[f"{n}x"] = measure(d)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
