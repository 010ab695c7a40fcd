"""ANN quality properties (value-level parity rides the DuckDB gate)."""

import numpy as np

from flink_infotheoretic_feature_selection_spark.operators.similarity import (
    ivf_multiprobe_topk,
    ivf_topk,
)


def _exact_topk(sf_dir, k, limit):
    import pandas as pd
    import pyarrow.parquet as pq

    pdf = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
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


def _recall(result_rows, truth, k):
    got = {}
    for r in result_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hits / (len(truth) * k)


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    k, limit = 3, 100
    truth = _exact_topk(sf_dir, k, limit)
    single = _recall(ivf_topk(spark, sf_dir, k=k, query_limit=limit).collect(), truth, k)
    multi = _recall(
        ivf_multiprobe_topk(spark, sf_dir, k=k, query_limit=limit).collect(), truth, k
    )
    # Hamming-1 probing strictly widens the candidate set, so recall can
    # only improve; on this corpus it improves several-fold (measured:
    # ~0.05 single vs ~0.26 multi at sf0.001 — sign-LSH buckets are
    # coarse by design; probes are the recall lever).
    assert multi >= single
    assert multi >= 2 * single, (single, multi)
    assert multi > 0.15, (single, multi)
