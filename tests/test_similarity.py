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


def test_quantize_error_bound_and_code_range(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        embedding_quantize,
    )

    rows = embedding_quantize(spark, sf_dir).collect()
    assert len(rows) > 0
    # long shape (vec_id, pos, qv, scale): scalar columns only — the
    # driver canonicalizer cannot sort array columns (round-4 lesson);
    # reassemble per-vector codes from (pos, qv) for the error check
    assert set(rows[0].asDict()) == {"vec_id", "pos", "qv", "scale"}
    import pyarrow.parquet as pq

    orig = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for r in pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    }
    by_vec: dict[int, dict] = {}
    for r in rows:
        e = by_vec.setdefault(int(r["vec_id"]), {"scale": r["scale"], "codes": {}})
        assert e["scale"] == r["scale"]  # one scale per vector
        e["codes"][int(r["pos"])] = int(r["qv"])
    assert set(by_vec) == set(orig)
    for vec_id, e in by_vec.items():
        v = orig[vec_id]
        assert sorted(e["codes"]) == list(range(1, len(v) + 1))  # 1-based, dense
        q = np.asarray([e["codes"][p] for p in range(1, len(v) + 1)], dtype=np.int64)
        assert np.abs(q).max() <= 127
        if e["scale"] == 0.0:
            assert (q == 0).all() and (v == 0).all()
            continue
        # symmetric round-half-up quantization ⇒ per-coordinate
        # reconstruction error is at most half a quantization step
        err = np.abs(q * e["scale"] - v).max()
        assert err <= e["scale"] / 2 + 1e-12, (vec_id, err, e["scale"])


def test_q8_topk_matches_exact_ivf_closely(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        ivf_topk_q8,
    )

    k, limit = 3, 100
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(spark, sf_dir, k=k, query_limit=limit).collect()
    }
    q8 = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_q8(spark, sf_dir, k=k, query_limit=limit).collect()
    }
    # int8 error (≤ scale/2 per coord) barely perturbs cosines, so the
    # quantized ranking agrees with the float ranking almost everywhere.
    overlap = len(exact & q8) / max(len(exact), 1)
    assert overlap >= 0.9, overlap


def test_parse_props_overflow_payload_is_null_on_both_engines(spark):
    # Review finding: an unbounded [0-9]+ guard let a >int32 payload
    # return NULL from Spark's cast while DuckDB's CAST raised, aborting
    # the oracle.  The digit bound + BIGINT cast keeps both engines in
    # the same (value or NULL) lattice for any payload.
    import duckdb

    from flink_infotheoretic_feature_selection_spark.operators.events import parse_props

    payloads = [
        '{"k": "9999999999"}',      # > int32, fits bigint: value on both
        '{"k": "' + "9" * 19 + '"}',  # 19 digits > the 18 bound: NULL on both
        '{"k": " 5"}',              # trimmed then cast: 5 on both
        '{"k": "+5"}',              # sign prefix: NULL on both
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "props string")
    got = [r["k"] for r in parse_props(df).select("k").collect()]
    duck = duckdb.connect()
    expected = [
        duck.execute(
            """SELECT CASE WHEN regexp_matches(trim(json_extract_string(?, '$.k')), '^-?[0-9]{1,18}$')
                    THEN CAST(trim(json_extract_string(?, '$.k')) AS BIGINT) END""",
            [p, p],
        ).fetchone()[0]
        for p in payloads
    ]
    assert got == expected == [9999999999, None, 5, None]


def test_parse_props_strictness_matches_duckdb_json_valid(spark):
    # r6 advisor finding: Spark's get_json_object leniently parses
    # single-quoted JSON ({'k': 7} -> 7) while DuckDB's json_valid is
    # false, so the oracle NULLs k and the gate diverges.  parse_props's
    # strict-JSON probe (from_json, allowSingleQuotes=false, corrupt
    # column) must land every payload in the same (value | NULL) cell as
    # the oracle's json_valid-guarded extraction.
    import duckdb

    from flink_infotheoretic_feature_selection_spark.operators.events import parse_props

    payloads = [
        "{'k': 7}",        # single quotes: Spark-lenient, strict-invalid
        "{k: 11}",         # unquoted key: strict-invalid
        '{"k": 07}',       # leading zero: strict-invalid on both parsers
        "5",               # bare scalar: json_valid true, $.k NULL on both
        "[1, 2]",          # array: json_valid true, $.k NULL on both
        '{"k": 7}',        # control: strict-valid, 7 on both
        '{"x": 1}',        # valid object, missing k: NULL on both
        None,              # NULL payload: NULL on both
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "props string")
    got = [r["k"] for r in parse_props(df).select("k").collect()]
    duck = duckdb.connect()
    expected = [
        duck.execute(
            """SELECT CASE WHEN regexp_matches(trim(kx), '^-?[0-9]{1,18}$')
                       THEN CAST(trim(kx) AS BIGINT) END
               FROM (SELECT CASE WHEN json_valid(?)
                            THEN json_extract_string(?, '$.k') END AS kx)""",
            [p, p],
        ).fetchone()[0]
        for p in payloads
    ]
    assert got == expected == [None, None, None, None, None, 7, None, None]


def test_cosine_topk_empty_query_set_returns_empty(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        cosine_topk,
    )

    out = cosine_topk(spark, sf_dir, k=3, query_limit=0)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cos", "rank"]


def test_kmeans_ivf_recall_beats_sign_grid(spark, sf_dir):
    # Learned centroids follow the embedding distribution; with 2 probes
    # over 16 buckets the recall should be well above the 6-bit
    # sign-grid's single-bucket recall on the same corpus.
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        ivf_kmeans_topk,
    )

    k, limit = 3, 100
    truth = _exact_topk(sf_dir, k, limit)
    grid = _recall(ivf_topk(spark, sf_dir, k=k, query_limit=limit).collect(), truth, k)
    km = _recall(
        ivf_kmeans_topk(spark, sf_dir, k=k, query_limit=limit).collect(), truth, k
    )
    assert km > grid, (km, grid)
    assert km >= 0.3, (km, grid)


def test_kmeans_fixture_gate_recall(spark, sf_dir):
    # The FROZEN quantizer (fit on the sf0.01 sample, fixtures/
    # ivf_centroids.json) applied to this corpus — the production
    # fit-on-sample/assign-the-corpus lifecycle.  Recall with 2 probes
    # over 16 learned buckets must beat the single-bucket sign grid.
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        ivf_kmeans_fixture_topk,
    )

    k, limit = 3, 100
    truth = _exact_topk(sf_dir, k, limit)
    grid = _recall(ivf_topk(spark, sf_dir, k=k, query_limit=limit).collect(), truth, k)
    km = _recall(
        ivf_kmeans_fixture_topk(spark, sf_dir, k=k, query_limit=limit).collect(),
        truth,
        k,
    )
    assert km > grid, (km, grid)
    assert km >= 0.3, (km, grid)


def test_multiprobe_vectorized_matches_sql_variant(spark, sf_dir):
    # Same bucket/probe geometry, different kernel (per-bucket matmul vs
    # per-pair SQL fold): pair sets must agree except at round-5
    # boundaries (sum-order epsilon), and matched cosines must be equal
    # to within one rounding step.
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        ivf_multiprobe_topk,
        ivf_multiprobe_vectorized,
    )

    sql_rows = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in ivf_multiprobe_topk(spark, sf_dir).collect()
    }
    vec_rows = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in ivf_multiprobe_vectorized(spark, sf_dir).collect()
    }
    assert sql_rows and vec_rows
    common = set(sql_rows) & set(vec_rows)
    overlap = len(common) / max(len(sql_rows), len(vec_rows))
    assert overlap >= 0.98, (overlap, len(sql_rows), len(vec_rows))
    for pair in common:
        assert abs(sql_rows[pair] - vec_rows[pair]) <= 2e-5, (
            pair,
            sql_rows[pair],
            vec_rows[pair],
        )


def _pq_reference(sf_dir, query_limit=200):
    """NumPy reference for the frozen-codebook PQ pipeline, replicating
    the SQL's round(d, 5)+code tiebreak encode contract and the integer
    fixed-point ADC LUT exactly."""
    import pyarrow.parquet as pq

    import flink_infotheoretic_feature_selection_spark.operators.similarity as sim

    # the module's own loader — test and production can't silently point
    # at different fixture paths
    fx = sim._load_pq_fixture()
    books = [np.array(b, dtype=np.float64) for b in fx["codebooks"]]
    sd = fx["sub_dim"]
    pdf = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    codes = {}
    for vid, v, n in zip(ids, mat, nrm):
        per_m = []
        for m, book in enumerate(books):
            sub = v[m * sd : (m + 1) * sd]
            cn2 = (book**2).sum(axis=1)
            d = np.round(cn2 - 2.0 * (book @ sub) / n[0], 5)
            per_m.append(int(np.lexsort((np.arange(len(book)), d))[0]))
        codes[int(vid)] = per_m
    luts = {}
    for vid, v, n in zip(ids, mat, nrm):
        if vid >= query_limit:
            continue
        lut = np.stack(
            [
                np.round(
                    np.round((book @ v[m * sd : (m + 1) * sd]) / n[0], 5) * 100_000, 0
                ).astype(np.int64)
                for m, book in enumerate(books)
            ]
        )
        luts[int(vid)] = lut
    return codes, luts


def test_pq_encode_matches_numpy_reference(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.similarity import pq_encode

    codes, _ = _pq_reference(sf_dir)
    got = {}
    for r in pq_encode(spark, sf_dir).collect():
        got.setdefault(r.vec_id, {})[r.m] = r.code
    assert set(got) == set(codes)
    for vid, per_m in codes.items():
        assert [got[vid][m] for m in range(len(per_m))] == per_m, vid


def test_ann_ivf_pq_scores_match_numpy_adc(spark, sf_dir):
    # The integer fixed-point ADC sum is exactly reproducible: for every
    # (query, neighbor) row the approx_cos must equal the NumPy LUT sum
    # to the last fixed-point digit — no float tolerance.
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        PQ_SCORE_SCALE,
        ann_ivf_pq_topk,
    )

    codes, luts = _pq_reference(sf_dir)
    rows = ann_ivf_pq_topk(spark, sf_dir, k=3).collect()
    assert rows, "gate produced no rows"
    for r in rows:
        expect = sum(
            luts[r.query_id][m][c] for m, c in enumerate(codes[r.neighbor_id])
        )
        assert round(r.approx_cos * PQ_SCORE_SCALE) == expect, (
            r.query_id,
            r.neighbor_id,
        )


def test_ann_ivf_pq_ranks_are_dense_and_bounded(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        ann_ivf_pq_topk,
    )

    per_q = {}
    for r in ann_ivf_pq_topk(spark, sf_dir, k=3).collect():
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        assert len(ranks) <= 3


def test_with_pq_codes_column_route_equals_sql_route(spark, sf_dir):
    # The stateless column-expression encoder (streaming-composable: no
    # join, no aggregation) must be bit-identical to the SQL CTE route
    # the batch gate uses.
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        pq_encode,
        with_pq_codes,
    )

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    col = {
        (r.vec_id, m): getattr(r, f"c{m}")
        for r in with_pq_codes(df).collect()
        for m in range(8)
    }
    sql = {(r.vec_id, r.m): r.code for r in pq_encode(spark, sf_dir).collect()}
    assert col == sql


def test_embedding_neardup_vectorized_matches_sql_route(spark, sf_dir):
    # Perf-kernel equivalence pin (multiprobe precedent): identical
    # bucket geometry, matmul kernel — pair sets must agree except
    # possibly at round-5 boundaries (none on this fixture: exact match
    # required, plus an explicit cos-delta bound on the intersection).
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        embedding_neardup_pairs,
        embedding_neardup_vectorized,
    )

    sql_pairs = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in embedding_neardup_pairs(spark, sf_dir).collect()
    }
    vec_pairs = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in embedding_neardup_vectorized(spark, sf_dir).collect()
    }
    assert set(vec_pairs) == set(sql_pairs)
    assert len(sql_pairs) > 0
    for k in sql_pairs:
        assert abs(sql_pairs[k] - vec_pairs[k]) <= 2e-5, k


def test_embedding_neardup_finer_grid_refines(spark, sf_dir):
    # Raising n_bits must only ever SHRINK the pair set (bucket
    # refinement): agreement on 12 sign bits implies agreement on the
    # first 6, never the other way around.
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    coarse = {
        (r["vec_a"], r["vec_b"]) for r in embedding_neardup_pairs(spark, sf_dir).collect()
    }
    fine = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs(spark, sf_dir, n_bits=8).collect()
    }
    assert fine <= coarse
    assert len(fine) > 0
    assert len(fine) < len(coarse)


def test_ann_ivf_pq_vectorized_bit_identical_to_gate(spark, sf_dir):
    # Unlike the float matmul twins, the PQ ADC is integer arithmetic —
    # the Arrow gather must reproduce the gated SQL route EXACTLY, every
    # row, every score.
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        ann_ivf_pq_topk,
        ann_ivf_pq_vectorized,
    )

    a = sorted(tuple(r) for r in ann_ivf_pq_topk(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in ann_ivf_pq_vectorized(spark, sf_dir).collect())
    assert a == b
    assert len(a) > 0


def test_semantic_decontaminate_matches_bruteforce(spark, sf_dir):
    # Exact replay of the contract: a (train, eval) pair flags iff the
    # train vector's sign-grid bucket is among the eval vector's
    # Hamming-1 probes AND the round-5 cosine clears the threshold.
    import pyarrow.parquet as pq

    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        N_SIGN_BITS,
        semantic_decontaminate,
    )

    pdf = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(mat, axis=1)

    def bucket(v):
        return sum((1 << i) for i in range(N_SIGN_BITS) if v[i] > 0)

    buckets = {int(i): bucket(mat[r]) for r, i in enumerate(ids)}
    idx = {int(i): r for r, i in enumerate(ids)}
    evals = [int(i) for i in ids if i % 20 == 0]
    trains = [int(i) for i in ids if i % 20 != 0]
    expect = set()
    for e in evals:
        probes = {buckets[e]} | {buckets[e] ^ (1 << i) for i in range(N_SIGN_BITS)}
        for t in trains:
            if buckets[t] not in probes:
                continue
            c = round(
                float(mat[idx[t]] @ mat[idx[e]]) / (nrm[idx[t]] * nrm[idx[e]]), 5
            )
            if c >= 0.35:
                expect.add((t, e))
    got = {
        (r["vec_id"], r["eval_id"])
        for r in semantic_decontaminate(spark, sf_dir).collect()
    }
    assert got == expect
    assert len(got) > 0


def test_semantic_decontaminate_vectorized_matches_sql_route(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        semantic_decontaminate,
        semantic_decontaminate_vectorized,
    )

    a = {
        (r["vec_id"], r["eval_id"]): r["cos"]
        for r in semantic_decontaminate(spark, sf_dir).collect()
    }
    b = {
        (r["vec_id"], r["eval_id"]): r["cos"]
        for r in semantic_decontaminate_vectorized(spark, sf_dir).collect()
    }
    assert set(a) == set(b)
    assert len(a) > 0
    for kk in a:
        assert abs(a[kk] - b[kk]) <= 2e-5, kk


def test_semantic_decontaminate_vectorized_survives_bare_count(spark, sf_dir):
    # Regression pin for the self-cogroup pruning hazard: with nothing
    # downstream reading the UDF output, the optimizer used to conflate
    # the two children's identically-numbered `embedding` attributes and
    # prune it off the corpus side, crashing the kernel.  count() is
    # exactly the exposure.
    from flink_infotheoretic_feature_selection_spark.operators.similarity import (
        semantic_decontaminate,
        semantic_decontaminate_vectorized,
    )

    n = semantic_decontaminate_vectorized(spark, sf_dir).count()
    assert n == semantic_decontaminate(spark, sf_dir).count()
    assert n > 0


def test_pq_codes_inline_route_bit_equal(spark, sf_dir, monkeypatch):
    """r13 auto-route: forcing the inline-constant codes route must give
    EXACTLY the SQL CTE route's rows for both pq_encode and ann_ivf_pq
    (the routing threshold is a pure cost decision)."""
    import flink_infotheoretic_feature_selection_spark.operators.similarity as sim

    base_pq = sorted(map(tuple, sim.pq_encode(spark, sf_dir).collect()))
    base_ann = sorted(map(tuple, sim.ann_ivf_pq_topk(spark, sf_dir).collect()))
    monkeypatch.setattr(sim, "PQ_CODES_INLINE_MIN_ROWS", 0)
    got_pq = sorted(map(tuple, sim.pq_encode(spark, sf_dir).collect()))
    got_ann = sorted(map(tuple, sim.ann_ivf_pq_topk(spark, sf_dir).collect()))
    assert got_pq == base_pq
    assert got_ann == base_ann
