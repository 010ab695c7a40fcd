"""Offline coarse-quantizer training for the IVF-k-means ANN gate.

Fits seeded k-means|| (`pyspark.ml`) on the L2-NORMALIZED embeddings of a
training sample (default sf0.01 — the gate's scale factor), rounds each
centroid coordinate to 6 decimals, and freezes the result into
``flink_infotheoretic_feature_selection_spark/fixtures/ivf_centroids.json``.

This is the production IVF lifecycle: the quantizer is trained ONCE on a
corpus sample, then broadcast/frozen for assignment of the full corpus —
the gate query (`similarity.ivf_kmeans_topk` gate path) replays
assignment + probing + exact-cosine ranking against these literal
centroids, which is what makes the gate DuckDB-value-checkable even
though the iterative fit itself has no SQL analogue (the fit stays
covered by `test_kmeans_ivf_recall_beats_sign_grid`).

Usage:  python tools/fit_kmeans_centroids.py [sf_dir] [n_centroids]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 42
MAX_ITER = 20


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_centroids = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        _norm_expr_spark,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nrm = _norm_expr_spark("embedding")
    vec = emb.select(
        array_to_vector(
            F.expr(f"transform(embedding, x -> CAST(x AS DOUBLE) / {nrm})")
        ).alias("features")
    )
    model = KMeans(k=n_centroids, seed=SEED, maxIter=MAX_ITER).fit(vec)
    centers = [
        [round(float(x), 6) for x in np.asarray(c)] for c in model.clusterCenters()
    ]
    out = {
        "trained_on": sf_dir,
        "seed": SEED,
        "max_iter": MAX_ITER,
        "n_centroids": n_centroids,
        "dim": len(centers[0]),
        "centroids": centers,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "flink_infotheoretic_feature_selection_spark",
        "fixtures",
        "ivf_centroids.json",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {n_centroids}x{out['dim']} centroids -> {path}")


if __name__ == "__main__":
    main()
