"""Wide-SPARSE scale proof — 631 features at a1a-like density (round 9).

The sparse ladder (tools/scale_proof_sparse_sf1.py, BASELINE b13 rows)
proved row scaling at 16 features / up to 480M cells; this proof pins
the OTHER axis: the reference's own default attribute count
(``InfoSelectorTest.scala:102-105``, 631 attributes) at LibSVM-a1a-like
density (~4% nonzero, binary values — a1a is 123 binary features with
~11 nonzeros/row), confirming the per-feature dims/histogram structures
stay executor-friendly when the feature count is two decades above the
ladder's.

Protocol (the sparse-sf1 duplication trick): fit at 1x, duplicate rows
10x (multi-file so the scan stays parallel), fit again — every
contingency count scales uniformly so MI/CMI and the greedy path must
be IDENTICAL; wall scaling and the invariance check come out of the
same pair of runs.

Usage: python tools/scale_proof_sparse_wide.py [out_dir] [n_rows] [copies] [k]
       (defaults: /tmp/sparse_wide 100000 10 5)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FEATS = 631
NNZ_MEAN = 25  # ~4% density: 631 * 0.04 ≈ a1a's 11/123 regime
SEED = 20632


def build(out: str, n_rows: int, copies: int) -> tuple[str, str, int]:
    """Generate (row_id, feat, x) nonzeros + (row_id, y) labels, 1x and
    a `copies`x row-duplicated replica (fresh row_ids per copy, one file
    per copy so the scan parallelizes — the round-5 single-split lesson).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    y = rng.integers(0, 2, size=n_rows).astype(np.int32)

    # per-row nonzero count ~ Poisson(NNZ_MEAN) clipped to [1, 64]
    nnz = np.clip(rng.poisson(NNZ_MEAN, size=n_rows), 1, 64)
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), nnz)
    total = int(nnz.sum())
    feats = rng.integers(0, N_FEATS, size=total).astype(np.int32)
    # every 8th feature leaks the label: its presence probability depends
    # on y, making relevances (and the greedy path) non-degenerate
    leak = feats % 8 == 0
    flip = rng.random(total) < 0.35
    drop = leak & flip & (np.repeat(y, nnz)[: len(feats)] == 0)
    feats = feats[~drop]
    row_ids = row_ids[~drop]
    # binary values (a1a-style); duplicates within a row collapse via
    # the (row_id, feat) distinct below
    agg = (
        pa.table({"row_id": row_ids, "feat": feats, "x": np.ones(len(feats), np.int32)})
        .group_by(["row_id", "feat"])
        .aggregate([("x", "max")])
    )
    # select BY NAME: pyarrow's key-vs-aggregate column order is not
    # contractual across versions; a positional rename could silently
    # relabel x-values as row_ids (r9 review find)
    tbl = pa.table(
        {"row_id": agg["row_id"], "feat": agg["feat"], "x": agg["x_max"]}
    )
    base = f"{out}/nz_1x.parquet"
    os.makedirs(base, exist_ok=True)
    pq.write_table(tbl, f"{base}/part0.parquet")
    lab = pa.table({"row_id": np.arange(n_rows, dtype=np.int64), "y": y})
    lab_d = f"{out}/labels_1x.parquet"
    os.makedirs(lab_d, exist_ok=True)
    pq.write_table(lab, f"{lab_d}/part0.parquet")

    big_nz = f"{out}/nz_{copies}x.parquet"
    big_lab = f"{out}/labels_{copies}x.parquet"
    os.makedirs(big_nz, exist_ok=True)
    os.makedirs(big_lab, exist_ok=True)
    import pyarrow.compute as pc

    for c in range(copies):
        off = c * n_rows
        pq.write_table(
            tbl.set_column(0, "row_id", pc.add(tbl["row_id"], off)),
            f"{big_nz}/copy{c:02d}.parquet",
        )
        pq.write_table(
            lab.set_column(0, "row_id", pc.add(lab["row_id"], off)),
            f"{big_lab}/copy{c:02d}.parquet",
        )
    return base, big_nz, tbl.num_rows


def fit_once(spark, nz_path: str, lab_path: str, k: int, label: str):
    from flink_infotheoretic_feature_selection_spark.selector import SparseInfoThSelector

    nz = spark.read.parquet(nz_path)
    labels = spark.read.parquet(lab_path)
    t0 = time.time()
    model = SparseInfoThSelector(n_features=N_FEATS, n_to_select=k).fit(nz, labels)
    wall = time.time() - t0
    print(f"{label}: fit wall {wall:.1f}s path={model.selection_path}", flush=True)
    return model.selection_path, wall


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparse_wide"
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    base_nz, big_nz, cells = build(out, n_rows, copies)
    print(
        f"built {n_rows} rows x {N_FEATS} feats, {cells} nonzero cells"
        f" (density {cells / (n_rows * N_FEATS):.3%}), {copies}x replica",
        flush=True,
    )

    from flink_infotheoretic_feature_selection_spark.session import get_spark

    spark = get_spark("sparse-wide-proof")
    p1, w1 = fit_once(spark, base_nz, f"{out}/labels_1x.parquet", k, "1x")
    pN, wN = fit_once(spark, big_nz, f"{out}/labels_{copies}x.parquet", k, f"{copies}x")
    assert p1 == pN, f"selection diverged under duplication: {p1} vs {pN}"
    print(f"selection invariant under {copies}x duplication: OK", flush=True)
    print(f"scaling: {wN / w1:.2f}x wall for {copies}x rows at {N_FEATS} features", flush=True)


if __name__ == "__main__":
    main()
