"""Direct parquet pack (r9) — `PackedMatrix.pack_parquet` +
`InfoThSelector.fit_parquet`.

The direct route reads row groups with pyarrow straight into NumPy
blocks, skipping the DataFrame scan's JVM row round-trip (the dominant
cost on wide matrices — BASELINE r9).  These tests pin the contract
that makes it safe: bit-identical selection vs `fit` on the same file,
identical dims/NULL/missing-column failure modes, and row-group
chunking that preserves totals across multi-file, multi-group layouts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flink_infotheoretic_feature_selection_spark.operators.packed import PackedMatrix
from flink_infotheoretic_feature_selection_spark.selector import InfoThSelector


def _write_matrix(path, n=5000, nf=12, seed=7, row_group_size=900, with_null=False):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 3, size=n)
    cols = {}
    for j in range(nf):
        dim = 2 + j % 6
        vals = np.where(rng.random(n) < 0.5, y % dim, rng.integers(0, dim, n))
        cols[f"f{j}"] = pa.array(vals.astype(np.int32))
    if with_null:
        a = vals.astype(np.int32).tolist()
        a[3] = None
        cols[f"f{nf - 1}"] = pa.array(a, pa.int32())
    cols["label"] = pa.array(y.astype(np.int32))
    pq.write_table(pa.table(cols), str(path), row_group_size=row_group_size)
    return [f"f{j}" for j in range(nf)]


def test_fit_parquet_selection_bit_identical_to_fit(spark, tmp_path):
    p = tmp_path / "m.parquet"
    feats = _write_matrix(p)
    sel = lambda: InfoThSelector(n_to_select=4, criterion="mrmr", emit_f32=False)  # noqa: E731
    via_df = sel().fit(spark.read.parquet(str(p)))
    via_direct = sel().fit_parquet(spark, str(p))
    assert via_direct.selection_path == via_df.selection_path
    assert via_direct.relevances == via_df.relevances
    assert via_direct.feature_cols == feats  # schema-order default


def test_pack_parquet_chunks_row_groups_and_matches_totals(spark, tmp_path):
    # 5000 rows in 900-row groups chained into >=2000-row chunks: the
    # greedy chaining must cover every row exactly once
    p = tmp_path / "m.parquet"
    _write_matrix(p)
    packed = PackedMatrix.pack_parquet(
        spark, str(p), ["f0", "f1", "label"], rows_per_partition=2000
    )
    try:
        dims, n = packed.dims_and_count()
        assert n == 5000
        # 900-row groups chain to >=2000: (900+900+900), (900+900+500)
        assert packed.n_partitions == 2
        df = spark.read.parquet(str(p))
        assert dims["f0"] == df.selectExpr("max(f0)").collect()[0][0] + 1
    finally:
        packed.unpersist()


def test_pack_parquet_multifile_dir(spark, tmp_path):
    d = tmp_path / "dir"
    d.mkdir()
    _write_matrix(d / "a.parquet", n=1200, seed=1)
    _write_matrix(d / "b.parquet", n=800, seed=2)
    packed = PackedMatrix.pack_parquet(spark, str(d), ["f0", "label"])
    try:
        _, n = packed.dims_and_count()
        assert n == 2000
    finally:
        packed.unpersist()


def test_pack_parquet_missing_column_raises(spark, tmp_path):
    p = tmp_path / "m.parquet"
    _write_matrix(p, nf=3)
    with pytest.raises(ValueError, match="missing pack columns.*f9"):
        PackedMatrix.pack_parquet(spark, str(p), ["f0", "f9", "label"])


def test_fit_parquet_null_column_fails_like_fit(spark, tmp_path):
    # NULL-bearing ints promote to NaN floats through the SAME pyarrow
    # to_numpy conversion on both routes -> same dims contract error
    p = tmp_path / "m.parquet"
    _write_matrix(p, with_null=True)
    with pytest.raises(ValueError, match="all-NULL or NULL-bearing"):
        InfoThSelector(n_to_select=2).fit_parquet(spark, str(p))
    with pytest.raises(ValueError, match="all-NULL or NULL-bearing"):
        InfoThSelector(n_to_select=2).fit(spark.read.parquet(str(p)))


def test_fit_parquet_rejects_arrow_engine(spark, tmp_path):
    p = tmp_path / "m.parquet"
    _write_matrix(p)
    with pytest.raises(ValueError, match="loop_engine"):
        InfoThSelector(n_to_select=2, loop_engine="arrow").fit_parquet(spark, str(p))
