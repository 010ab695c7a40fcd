"""Randomized cross-engine sweep for the EMBEDDINGS-table gates — the
similarity twin of test_random_corpus_gate_sweep.

Adversarial structure the fixed generator never produces: exact
duplicate vectors (cos = 1 pairs for the near-dup path), negated
vectors (cos = -1, sign-grid antipodes), near-zero magnitudes
(quantize scale ~0 without crossing the documented all-zero special
case), axis-aligned unit vectors (bucket boundary sign bits), and a
duplicate-heavy label layout for the centroid op.

The frozen-fixture oracles (k-means centroids, PQ codebooks) replay
LITERAL per-subspace constants, so they work on ANY 64-dim vectors —
random corpora exercise the assignment/ADC math, not just the corpus
they were fitted on.  Exact-zero vectors stay out: cosine of a
zero-norm vector is NaN-territory both engines order differently, and
no gate op promises it (embedding_quantize's all-zero path has its own
unit).
"""

from __future__ import annotations

import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod

EMB_GATES = [
    "cosine_topk",
    "ann_ivf_variants",
    "embedding_neardup",
    "embedding_quantize",
    "label_centroids",
    "ann_ivf_kmeans",
    "pq_encode",
    "ann_ivf_pq",
    "semantic_decontaminate",
]

DIM = 64


def _random_embeddings(seed: int, n: int = 120) -> dict:
    rng = random.Random(seed)
    vecs: list[list[float]] = []
    for i in range(n):
        roll = rng.random()
        if vecs and roll < 0.10:
            vecs.append(list(vecs[rng.randrange(len(vecs))]))  # exact dup
        elif vecs and roll < 0.18:
            vecs.append([-x for x in vecs[rng.randrange(len(vecs))]])  # antipode
        elif roll < 0.24:
            v = [0.0] * DIM
            v[rng.randrange(DIM)] = rng.choice([1.0, -1.0])  # axis unit
            vecs.append(v)
        elif roll < 0.30:
            vecs.append([rng.gauss(0, 1e-4) or 1e-6 for _ in range(DIM)])  # tiny
        else:
            vecs.append([round(rng.gauss(0, 1), 4) for _ in range(DIM)])
    return {
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(
            [[float(x) for x in v] for v in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array([rng.randrange(4) for _ in range(n)], pa.int32()),
    }


@pytest.mark.parametrize("seed", [7, 29, 53])
def test_embeddings_gates_cross_engine_on_random_vectors(spark, tmp_path, seed):
    d = tmp_path / f"rv{seed}"
    d.mkdir()
    pq.write_table(pa.table(_random_embeddings(seed)), f"{d}/embeddings.parquet")
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    for name in EMB_GATES:
        sdf = queries[name](spark, str(d))
        got = sorted(
            (
                tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            ),
            key=nullsafe,
        )
        cols = ", ".join(f'"{c}"' for c in sorted(sdf.columns))
        exp = sorted(
            (
                tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in duck.execute(
                    f"SELECT {cols} FROM ({oracles[name]})"
                ).fetchall()
            ),
            key=nullsafe,
        )
        if got != exp:
            only_s = [r for r in got if r not in exp][:3]
            only_d = [r for r in exp if r not in got][:3]
            failures.append(f"{name}: spark_only={only_s} duck_only={only_d}")
    duck.close()
    assert not failures, f"seed {seed}:\n" + "\n".join(failures)


def _exact_truth(d: str, k: int, limit: int) -> dict:
    import numpy as np
    import pyarrow.parquet as _pq

    pdf = _pq.read_table(f"{d}/embeddings.parquet").to_pandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    truth = {}
    for qi in np.where(ids < limit)[0]:
        s = np.round(mat[qi] @ mat.T, 5)
        s[ids == ids[qi]] = -np.inf
        order = np.lexsort((ids, -s))[:k]
        truth[int(ids[qi])] = {int(ids[j]) for j in order}
    return truth


def _recall_of(rows, truth, k) -> float:
    got: dict = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hits / (len(truth) * k)


@pytest.mark.parametrize("seed", [7, 29, 53])
def test_live_kmeans_fit_beats_sign_grid_on_random_vectors(spark, tmp_path, seed):
    # r7 verdict ask: the driver gate (ann_ivf_kmeans) pins FROZEN
    # centroids, so a rot in the LIVE distributed k-means|| fit path
    # could hide behind the fixture.  This keeps the live fit under the
    # randomized sweep each round: on every swept corpus its recall must
    # beat the sign-grid single-bucket floor (learned buckets follow the
    # data; the sign grid doesn't) and clear an absolute floor.
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        ivf_kmeans_topk,
        ivf_topk,
    )

    d = tmp_path / f"lk{seed}"
    d.mkdir()
    pq.write_table(pa.table(_random_embeddings(seed)), f"{d}/embeddings.parquet")
    k, limit = 3, 40
    truth = _exact_truth(str(d), k, limit)
    grid = _recall_of(ivf_topk(spark, str(d), k=k, query_limit=limit).collect(), truth, k)
    km = _recall_of(
        ivf_kmeans_topk(spark, str(d), k=k, query_limit=limit).collect(), truth, k
    )
    assert km >= grid, (seed, km, grid)
    assert km >= 0.25, (seed, km, grid)


def test_embeddings_gates_on_identical_vector_clique(spark, tmp_path):
    # Degenerate-geometry axis (r8): 100 byte-identical vectors (one hot
    # IVF/LSH bucket, cosine ties everywhere — rank tiebreaks must be
    # deterministic on BOTH engines), plus its antipode family and a few
    # normal vectors.  The random generator produces ~10% dups, never a
    # dominant clique.
    rng = random.Random(31)
    v = [round(rng.gauss(0, 1), 4) for _ in range(DIM)]
    vecs = [list(v) for _ in range(100)]
    vecs += [[-x for x in v]] * 5
    vecs += [[round(rng.gauss(0, 1), 4) for _ in range(DIM)] for _ in range(15)]
    n = len(vecs)
    tbl = {
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(
            [[float(x) for x in w] for w in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array([rng.randrange(4) for _ in range(n)], pa.int32()),
    }
    d = tmp_path / "vclique"
    d.mkdir()
    pq.write_table(pa.table(tbl), f"{d}/embeddings.parquet")
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    for name in EMB_GATES:
        sdf = queries[name](spark, str(d))
        got = sorted(
            (
                tuple(round(v_, 9) if isinstance(v_, float) else v_ for v_ in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            ),
            key=nullsafe,
        )
        cols = ", ".join(f'"{c}"' for c in sorted(sdf.columns))
        exp = sorted(
            (
                tuple(round(v_, 9) if isinstance(v_, float) else v_ for v_ in r)
                for r in duck.execute(
                    f"SELECT {cols} FROM ({oracles[name]})"
                ).fetchall()
            ),
            key=nullsafe,
        )
        if got != exp:
            only_s = [r for r in got if r not in exp][:3]
            only_d = [r for r in exp if r not in got][:3]
            failures.append(f"{name}: spark_only={only_s} duck_only={only_d}")
    duck.close()
    assert not failures, "\n".join(failures)
