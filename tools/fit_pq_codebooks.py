"""Fit and FREEZE product-quantization codebooks for the IVF-PQ gate.

Offline quantizer-training step of the production PQ lifecycle (same
pattern as tools/fit_kmeans_centroids.py): train once on a corpus
sample, freeze the codebooks as literals, and every later encode/query
run — Spark or DuckDB — replays assignment against the SAME frozen
floats, making the whole IVF-PQ query value-checkable end-to-end.

Deterministic by construction: seeded NumPy Lloyd iterations per
subspace over the L2-NORMALIZED sf0.01 embeddings (PQ approximates the
cosine dot, so the codebooks must live on the unit sphere's subspace
projections, matching the encode/LUT math in operators/similarity.py).

Usage:  python tools/fit_pq_codebooks.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np

M = 8  # subspaces
SUB_DIM = 8  # dims per subspace (M * SUB_DIM must equal the embedding dim)
K = 16  # codes per subspace -> 4 bits/subspace, 4 bytes per vector total
SEED = 42
N_ITER = 30


def lloyd(x: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Plain seeded Lloyd k-means (k-means++ init) in float64."""
    rng = np.random.RandomState(seed)
    # k-means++ seeding
    centers = [x[rng.randint(len(x))]]
    for _ in range(k - 1):
        d2 = np.min(
            ((x[:, None, :] - np.stack(centers)[None, :, :]) ** 2).sum(-1), axis=1
        )
        p = d2 / d2.sum() if d2.sum() > 0 else None
        centers.append(x[rng.choice(len(x), p=p)])
    c = np.stack(centers)
    for _ in range(N_ITER):
        assign = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(axis=1)
        for j in range(k):
            sel = x[assign == j]
            if len(sel):
                c[j] = sel.mean(axis=0)
            else:  # re-seed empty cluster deterministically
                c[j] = x[rng.randint(len(x))]
    return c


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "flink_infotheoretic_feature_selection_spark/fixtures/pq_codebooks.json"
    )
    emb = (
        duckdb.sql(
            f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
        )
        .df()["embedding"]
        .tolist()
    )
    x = np.asarray(emb, dtype=np.float64)
    assert x.shape[1] == M * SUB_DIM, x.shape
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    books = []
    for m in range(M):
        sub = x[:, m * SUB_DIM : (m + 1) * SUB_DIM]
        c = lloyd(sub, K, SEED + m)
        books.append([[float(v) for v in row] for row in c])
    with open(out, "w") as f:
        json.dump(
            {
                "m": M,
                "sub_dim": SUB_DIM,
                "k": K,
                "seed": SEED,
                "n_iter": N_ITER,
                "source_sf_dir": sf_dir,
                "codebooks": books,
            },
            f,
        )
    print(f"wrote {out}: {M} subspaces x {K} codes x {SUB_DIM} dims")


if __name__ == "__main__":
    main()
