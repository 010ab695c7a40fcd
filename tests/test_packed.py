"""PackedMatrix (operators/packed.py) — bit-equality against the
DataFrame histogram routes, both merge regimes, and fit parity between
``loop_engine="packed"`` and ``loop_engine="arrow"``.

The packed substrate replaces the per-iteration mapInArrow pass of the
greedy loop; these tests pin that the replacement changes NOTHING about
the numbers — same int64 partition accumulators, same exact integer
merges, same MI/CMI floats, same selection paths.
"""

from __future__ import annotations

import pytest

from flink_infotheoretic_feature_selection_spark import InfoThSelector
from flink_infotheoretic_feature_selection_spark.datasets import features_dense
from flink_infotheoretic_feature_selection_spark.operators import histogram
from flink_infotheoretic_feature_selection_spark.operators.histogram import (
    collect_hist2d,
    feature_dims_and_count,
    hist2d,
    hist3d_mi_cmi,
)
from flink_infotheoretic_feature_selection_spark.operators.packed import PackedMatrix
from flink_infotheoretic_feature_selection_spark.functions.infotheory import mutual_info

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def matrix(spark):
    df = features_dense(spark, SF_DIR).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def packed(matrix):
    feats = [c for c in matrix.columns if c != "label"]
    pm = PackedMatrix.pack(matrix, feats + ["label"], n_partitions=4)
    yield pm
    pm.unpersist()


def _dims_n(matrix):
    cols = list(matrix.columns)
    return feature_dims_and_count(matrix, cols)


def test_relevances_bit_equal_hist2d_route(matrix, packed):
    feats = [c for c in matrix.columns if c != "label"]
    dims, n = _dims_n(matrix)
    y_dim = dims["label"]
    h2 = collect_hist2d(hist2d(matrix, feats, "label", dims, y_dim), feats, dims, y_dim)
    want = {c: mutual_info(h2[c], n, emit_f32=True) for c in feats}
    got = packed.relevances(feats, "label", dims, n, emit_f32=True)
    assert got == want  # exact float equality, not approx


@pytest.mark.parametrize("forced_regime", ["driver", "distributed"])
def test_hist3d_mi_cmi_bit_equal_both_regimes(matrix, packed, forced_regime, monkeypatch):
    feats = [c for c in matrix.columns if c != "label"]
    dims, n = _dims_n(matrix)
    best, remaining = feats[3], [c for c in feats if c != feats[3]]
    if forced_regime == "distributed":
        # force the combineByKey/executor-side-MI path on tiny data
        monkeypatch.setattr(histogram, "BLOB_DRIVER_MERGE_MAX_BYTES", 0)
    want = hist3d_mi_cmi(
        matrix, remaining, best, "label", dims, dims[best], dims["label"], n,
        emit_f32=True,
    )
    got = packed.hist3d_mi_cmi(remaining, best, "label", dims, n, emit_f32=True)
    assert got == want  # exact float equality in BOTH regimes


@pytest.mark.parametrize("criterion", ["mrmr", "cmim", "mim"])
def test_fit_identical_packed_vs_arrow(matrix, criterion):
    a = InfoThSelector(n_to_select=6, criterion=criterion, loop_engine="arrow").fit(matrix)
    p = InfoThSelector(n_to_select=6, criterion=criterion, loop_engine="packed").fit(matrix)
    assert p.selection_path == a.selection_path
    assert p.relevances == a.relevances
    assert p.selected_cols == a.selected_cols


def test_loop_engine_validated():
    with pytest.raises(ValueError, match="loop_engine"):
        InfoThSelector(loop_engine="flink")


def test_dims_and_count_matches_catalyst_route(matrix, packed):
    want = feature_dims_and_count(matrix, list(matrix.columns))
    assert packed.dims_and_count() == want


def test_dims_and_count_raises_on_empty(spark, matrix):
    empty = matrix.limit(0)
    pm = PackedMatrix.pack(empty, list(matrix.columns))
    try:
        with pytest.raises(ValueError, match="empty or .*all-NULL"):
            pm.dims_and_count()
    finally:
        pm.unpersist()


def test_validate_byte_range_flags_null_and_range(spark):
    rows = [(1, None, 300, 2), (0, 3, 1, 2)]
    df = spark.createDataFrame(rows, "f0 int, f1 int, f2 int, label int")
    pm = PackedMatrix.pack(df, ["f0", "f1", "f2", "label"])
    try:
        assert pm.validate_byte_range(["f0", "f1", "f2"]) == ["f1", "f2"]
    finally:
        pm.unpersist()


def test_rebalance_preserves_histograms(matrix, packed):
    feats = [c for c in matrix.columns if c != "label"]
    dims, n = _dims_n(matrix)
    best, remaining = feats[0], feats[1:6]
    want = packed.hist3d_mi_cmi(remaining, best, "label", dims, n)
    pm2 = PackedMatrix.pack(matrix, feats + ["label"], n_partitions=2)
    try:
        pm3 = pm2.rebalance(6, rows_per_partition=max(1, n // 6))
        assert pm3.n_partitions >= 2  # actually re-laid-out
        assert pm3.dims_and_count() == (dims, n)
        assert pm3.hist3d_mi_cmi(remaining, best, "label", dims, n) == want
        pm3.unpersist()
    finally:
        pm2.unpersist()


@pytest.mark.parametrize("criterion", ["mrmr", "cmim"])
def test_sparse_fit_identical_packed_vs_sql(matrix, criterion):
    from flink_infotheoretic_feature_selection_spark.operators.sparse import matrix_to_sparse_long
    from flink_infotheoretic_feature_selection_spark.selector import SparseInfoThSelector

    feats = [c for c in matrix.columns if c != "label"][:8]
    base, nz, labels = matrix_to_sparse_long(matrix, feats)
    try:
        a = SparseInfoThSelector(
            n_features=8, n_to_select=4, criterion=criterion, loop_engine="sql"
        ).fit(nz, labels)
        p = SparseInfoThSelector(
            n_features=8, n_to_select=4, criterion=criterion, loop_engine="packed"
        ).fit(nz, labels)
        assert p.selection_path == a.selection_path
        assert p.relevances == a.relevances
    finally:
        base.unpersist()


def test_sparse_packed_distributed_merge_regime(matrix, monkeypatch):
    from flink_infotheoretic_feature_selection_spark.operators.sparse import matrix_to_sparse_long
    from flink_infotheoretic_feature_selection_spark.selector import SparseInfoThSelector

    feats = [c for c in matrix.columns if c != "label"][:8]
    base, nz, labels = matrix_to_sparse_long(matrix, feats)
    try:
        want = SparseInfoThSelector(
            n_features=8, n_to_select=4, loop_engine="sql"
        ).fit(nz, labels)
        # force every per-iteration merge through combineByKey
        monkeypatch.setattr(histogram, "BLOB_DRIVER_MERGE_MAX_BYTES", 0)
        got = SparseInfoThSelector(
            n_features=8, n_to_select=4, loop_engine="packed"
        ).fit(nz, labels)
        assert got.selection_path == want.selection_path
        assert got.relevances == want.relevances
    finally:
        base.unpersist()


def test_sparse_packed_rejects_negative_indices(spark):
    from flink_infotheoretic_feature_selection_spark.selector import SparseInfoThSelector

    nz = spark.createDataFrame([(0, 1, -2)], "row_id long, feat int, x int")
    labels = spark.createDataFrame([(0, 1)], "row_id long, y int")
    with pytest.raises(Exception, match=">= 0|negative"):
        SparseInfoThSelector(n_features=2, n_to_select=1, loop_engine="packed").fit(
            nz, labels
        )


def test_pack_keeps_layout_when_target_none(matrix):
    feats = [c for c in matrix.columns if c != "label"]
    pm = PackedMatrix.pack(matrix, feats + ["label"], n_partitions=None)
    try:
        assert pm.n_partitions == matrix.rdd.getNumPartitions()
        blocks = pm.rdd.collect()
        assert sum(len(b["label"]) for b in blocks) == matrix.count()
        assert list(blocks[0].keys()) == feats + ["label"]
    finally:
        pm.unpersist()


def test_relevances_bit_equal_distributed_regime(matrix, packed, monkeypatch):
    # r8 advisor fix: relevances used to collect un-merged per-partition
    # partials unconditionally (n_partitions × Σxd × y_dim driver bytes,
    # unbounded in partition count); it now shares hist3d_mi_cmi's
    # two-regime merge. Forcing the combineByKey regime must change
    # NOTHING about the floats.
    feats = [c for c in matrix.columns if c != "label"]
    dims, n = _dims_n(matrix)
    want = packed.relevances(feats, "label", dims, n, emit_f32=True)
    monkeypatch.setattr(histogram, "BLOB_DRIVER_MERGE_MAX_BYTES", 0)
    got = packed.relevances(feats, "label", dims, n, emit_f32=True)
    assert got == want


def test_dims_and_count_raises_on_partial_nulls(spark):
    # A column NULL in only SOME partitions arrives as float-with-NaN via
    # Arrow; folding partials with Python max() was order-dependent
    # (max(1.0, nan)=1.0 but max(nan, 1.0)=nan). Any NaN partial is a
    # contract violation and must error deterministically.
    clean = [(i % 3, 1) for i in range(8)]
    dirty = [(None, 1)] + [(i % 3, 1) for i in range(7)]
    df = (
        spark.createDataFrame(clean, "f0 int, label int")
        .repartition(1)
        .unionAll(spark.createDataFrame(dirty, "f0 int, label int").repartition(1))
    )
    pm = PackedMatrix.pack(df, ["f0", "label"])
    try:
        with pytest.raises(ValueError, match="NULL"):
            pm.dims_and_count()
    finally:
        pm.unpersist()


def test_sparse_packed_oversized_dim_errors_before_alloc(spark):
    # r8 advisor fix: a corrupt cell (x=1e6, int32-representable) used to
    # size the executor-side bincount BEFORE the caller's dim>256 check —
    # ~x·y_dim·8 bytes per partition. The guard now raises the same
    # contract error from the scalar per-feature max, allocating nothing.
    from flink_infotheoretic_feature_selection_spark.selector import SparseInfoThSelector

    labels = spark.createDataFrame([(r, r % 2) for r in range(4)], "row_id long, y int")
    huge = spark.createDataFrame(
        [(0, 0, 1_000_000), (1, 1, 2), (2, 0, 1)], "row_id long, feat int, x int"
    )
    with pytest.raises(Exception, match="dim>256"):
        SparseInfoThSelector(n_features=2, n_to_select=1, loop_engine="packed").fit(
            huge, labels
        )


def test_sparse_pack_colocation_check(spark, matrix):
    # The packed histograms silently depend on every row's cells landing
    # in ONE partition. pack(expected_distinct_rows=...) must catch a
    # split layout (here: partitioned by feat, so each row spans
    # partitions) and pass a co-located one.
    from flink_infotheoretic_feature_selection_spark.operators.packed import PackedSparse
    from flink_infotheoretic_feature_selection_spark.operators.sparse import matrix_to_sparse_long

    feats = [c for c in matrix.columns if c != "label"][:4]
    base, nz, labels = matrix_to_sparse_long(matrix, feats)
    try:
        nzy = nz.join(labels, "row_id").select("row_id", "feat", "x", "y")
        n_distinct = nzy.select("row_id").distinct().count()

        split = nzy.repartition(4, "feat")
        with pytest.raises(ValueError, match="co-location"):
            PackedSparse.pack(split, 4, expected_distinct_rows=n_distinct)

        ok = nzy.repartition(4, "row_id")
        ps = PackedSparse.pack(ok, 4, expected_distinct_rows=n_distinct)
        assert ps.total_local_rows == n_distinct
        ps.unpersist()
    finally:
        base.unpersist()


def test_sparse_dims_and_hist2d_bit_equal_both_regimes(matrix, monkeypatch):
    # r8: the init histogram pass gained the same two-regime merge as the
    # loop (collected partials were unbounded in partition count).
    # Forcing the combineByKey pad-to-max route must change nothing.
    from flink_infotheoretic_feature_selection_spark.operators.packed import PackedSparse
    from flink_infotheoretic_feature_selection_spark.operators.sparse import matrix_to_sparse_long

    feats = [c for c in matrix.columns if c != "label"][:6]
    base, nz, labels = matrix_to_sparse_long(matrix, feats)
    try:
        nzy = nz.join(labels, "row_id").select("row_id", "feat", "x", "y")
        ps = PackedSparse.pack(nzy.repartition(4, "row_id"), 6)
        y_dim = int(labels.agg({"y": "max"}).collect()[0][0]) + 1
        dims_a, h2_a = ps.dims_and_hist2d(y_dim)
        monkeypatch.setattr(histogram, "BLOB_DRIVER_MERGE_MAX_BYTES", 0)
        dims_b, h2_b = ps.dims_and_hist2d(y_dim)
        assert dims_a == dims_b
        assert set(h2_a) == set(h2_b)
        for f in h2_a:
            assert (h2_a[f] == h2_b[f]).all(), f
        ps.unpersist()
    finally:
        base.unpersist()


def test_pack_rejects_duplicate_column_names(spark):
    # the wide-schema fast path must NOT engage on duplicate names —
    # name-keyed block resolution would silently read the last
    # occurrence for both; Catalyst's ambiguity error must surface
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 2, 0)], "f0 int, f1 int, label int").select(
        F.col("f0").alias("a"), F.col("f1").alias("a"), "label"
    )
    with pytest.raises(Exception, match="AMBIGUOUS|ambiguous"):
        PackedMatrix.pack(df, ["a", "label"])


def test_rebalance_cost_gate(spark, matrix, monkeypatch):
    """r12: the parallelism-starved re-layout fires only when a partition
    holds >= REBALANCE_MIN_CELLS_PER_PART cells; the selection is
    identical with and without it (partition-agnostic integer merges)."""
    from flink_infotheoretic_feature_selection_spark.selector import InfoThSelector as Sel

    few = matrix.coalesce(1)

    # small data: starved layout (1 partition) must NOT re-layout
    m_skip = Sel(n_to_select=3, criterion="mrmr").fit(few)
    assert "rebalance_sec" not in m_skip.fit_timings
    assert m_skip.fit_timings["loop_partitions"] == 1

    # forcing the threshold to zero re-enables the starved re-layout
    # (when the row count clears the 2x LOOP_ROWS_PER_PARTITION band it
    # splits; at sf0.001 it stays under the band, so instead pin that
    # the gate itself is the only thing that changed) and the selection
    # is bit-identical either way
    monkeypatch.setattr(Sel, "REBALANCE_MIN_CELLS_PER_PART", 0)
    monkeypatch.setattr(Sel, "LOOP_ROWS_PER_PARTITION", 64)
    m_reb = Sel(n_to_select=3, criterion="mrmr").fit(few)
    assert "rebalance_sec" in m_reb.fit_timings
    assert m_reb.fit_timings["loop_partitions"] > 1
    assert m_reb.selection_path == m_skip.selection_path
    assert m_reb.relevances == m_skip.relevances


def test_dims_count_hist2d_fused_matches_separate_passes(spark, matrix, packed):
    """r12: the fused dims+hist2d pass returns the same dims/count as
    dims_and_count and bit-identical tables to the hist2d route."""
    feats = [c for c in matrix.columns if c != "label"]
    dims, n = packed.dims_and_count()
    fdims, fn, h2 = packed.dims_count_hist2d("label")
    assert (fdims, fn) == (dims, n)
    assert h2 is not None
    want = collect_hist2d(
        hist2d(matrix, feats, "label", dims, dims["label"]),
        feats, dims, dims["label"],
    )
    for c in feats:
        assert (h2[c] == want[c]).all()
        assert h2[c].dtype == want[c].dtype


def test_dims_count_hist2d_budget_fallback_and_errors(spark, matrix, packed, monkeypatch):
    # shrinking the driver-merge budget makes every block decline to
    # histogram -> h2 None, dims/count still exact (the caller's
    # fallback contract)
    import flink_infotheoretic_feature_selection_spark.operators.packed as packed_mod
    monkeypatch.setattr(histogram, "BLOB_DRIVER_MERGE_MAX_BYTES", 0)
    dims, n = packed.dims_and_count()
    fdims, fn, h2 = packed.dims_count_hist2d("label")
    assert (fdims, fn, h2) == (dims, n, None)
    monkeypatch.undo()

    # out-of-contract values raise the dims_and_count error text, never
    # a raw bincount failure
    import numpy as np
    wild = spark.createDataFrame(
        [(0, 300), (1, 0)], "label int, f0 int"
    )
    pm = PackedMatrix.pack(wild, ["f0", "label"])
    try:
        with pytest.raises(ValueError, match="exceed the byte range"):
            pm.dims_count_hist2d("label")
    finally:
        pm.unpersist()


@pytest.mark.parametrize("forced_regime", ["driver", "distributed"])
def test_hist3d_mi_cmi_multi_bit_equal_single(matrix, packed, forced_regime, monkeypatch):
    """r13: the speculative batch pass returns, for every conditioning
    column, exactly the pairs a dedicated single-cond pass returns —
    in BOTH merge regimes."""
    feats = [c for c in matrix.columns if c != "label"]
    dims, n = _dims_n(matrix)
    conds = [feats[3], feats[0], feats[5]]
    if forced_regime == "distributed":
        monkeypatch.setattr(histogram, "BLOB_DRIVER_MERGE_MAX_BYTES", 0)
    remaining = [c for c in feats if c != feats[3]]
    got = packed.hist3d_mi_cmi_multi(remaining, conds, "label", dims, n, emit_f32=True)
    assert sorted(got) == sorted(conds)
    for s in conds:
        want = packed.hist3d_mi_cmi(remaining, s, "label", dims, n, emit_f32=True)
        assert got[s] == want  # exact float equality


@pytest.mark.parametrize("criterion", ["mrmr", "jmi", "cmim", "icap", "mifs"])
def test_fit_identical_across_speculation_widths(matrix, criterion):
    """r13: speculation is a pure prefetch — selection path, scores and
    relevances are bit-identical at every width (updates replay in
    selection order from the same integer-merged histograms)."""
    base = InfoThSelector(
        n_to_select=6, criterion=criterion, speculation=0
    ).fit(matrix)
    assert base.fit_timings["loop_jobs"] == 5
    assert base.fit_timings["speculation_hits"] == 0
    for spec in (2, "auto", 16):
        m = InfoThSelector(
            n_to_select=6, criterion=criterion, speculation=spec
        ).fit(matrix)
        assert m.selection_path == base.selection_path
        assert m.relevances == base.relevances
        assert m.selected_cols == base.selected_cols
        assert m.fit_timings["loop_jobs"] + m.fit_timings["speculation_hits"] == 5


def test_speculation_param_validated():
    with pytest.raises(ValueError, match="speculation"):
        InfoThSelector(speculation=-1)
    with pytest.raises(ValueError, match="speculation"):
        InfoThSelector(speculation="always")


def test_fusion_skipped_when_rebalance_will_fire(spark, matrix, monkeypatch):
    """ADVICE r12 (medium): a starved input that the re-layout is about
    to split must NOT take the fused dims+hist2d pass (it would run the
    stage-2 histograms serially in the starved partitions); the fit
    falls back to stats -> rebalance -> parallel relevances, with a
    bit-identical selection."""
    from flink_infotheoretic_feature_selection_spark.selector import InfoThSelector as Sel

    few = matrix.coalesce(1)
    m_fused = Sel(n_to_select=3, criterion="mrmr").fit(few)

    # force the starved-rebalance prediction true on the tiny fixture
    monkeypatch.setattr(Sel, "REBALANCE_MIN_CELLS_PER_PART", 0)
    monkeypatch.setattr(Sel, "LOOP_ROWS_PER_PARTITION", 64)

    def boom(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("dims_count_hist2d must not run before a rebalance")

    monkeypatch.setattr(PackedMatrix, "dims_count_hist2d", boom)
    m = Sel(n_to_select=3, criterion="mrmr").fit(few)
    assert "rebalance_sec" in m.fit_timings
    assert m.selection_path == m_fused.selection_path
    assert m.relevances == m_fused.relevances


def test_pack_records_n_rows(matrix, packed):
    assert packed.n_rows == matrix.count()
    # rebalance must carry the count through (it unpersists its input,
    # so use a private pack)
    own = PackedMatrix.pack(matrix, list(matrix.columns), n_partitions=4)
    re = own.rebalance(2, 1 << 16)
    try:
        assert re.n_rows == packed.n_rows
    finally:
        re.unpersist()
