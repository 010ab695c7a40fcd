"""LibSVM source + vector bridges (SURVEY.md §2.1 S3, §2.2 P1)."""

import pytest
from pyspark.ml.linalg import SparseVector

from flink_infotheoretic_feature_selection_spark.selector import InfoThSelector, SparseInfoThSelector
from flink_infotheoretic_feature_selection_spark.sources.libsvm import (
    read_libsvm,
    slice_vectors,
    vectors_to_long,
    vectors_to_wide,
)

# 8 rows, 5 features, values 0..3, labels -1/+1 (LibSVM 1-based indices)
LIBSVM_TEXT = """\
+1 1:2 3:1 5:3
-1 2:1 4:2
+1 1:1 2:3 5:1
-1 3:2 4:1
+1 1:3 5:2
-1 2:2 3:1
+1 1:2 2:1 5:3
-1 4:3
"""


@pytest.fixture(scope="module")
def libsvm_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("libsvm") / "toy.libsvm"
    p.write_text(LIBSVM_TEXT)
    return read_libsvm(spark, str(p), num_features=5)


def test_read_libsvm_shape(libsvm_df):
    assert libsvm_df.count() == 8
    row = libsvm_df.head()
    assert len(row["features"]) == 5
    labels = {r["label"] for r in libsvm_df.select("label").collect()}
    assert labels == {-1.0, 1.0}


def test_vectors_to_wide(libsvm_df):
    wide = vectors_to_wide(libsvm_df)
    assert wide.columns == [f"f{i}" for i in range(5)] + ["label"]
    # labels normalized to 0..C-1 ascending: -1→0, +1→1
    assert {r["label"] for r in wide.select("label").collect()} == {0, 1}
    # spot-check first row: +1 1:2 3:1 5:3 → f0=2, f2=1, f4=3
    r = wide.filter("f0 = 2 AND f4 = 3 AND f1 = 0").head()
    assert (r["f0"], r["f1"], r["f2"], r["f3"], r["f4"], r["label"]) == (2, 0, 1, 0, 3, 1)


def test_wide_and_long_selection_agree(libsvm_df):
    wide = vectors_to_wide(libsvm_df)
    nonzeros, labels, nf, base = vectors_to_long(libsvm_df)
    dm = InfoThSelector(n_to_select=2, criterion="mrmr", emit_f32=False).fit(wide)
    sm = SparseInfoThSelector(
        n_features=nf, n_to_select=2, criterion="mrmr", emit_f32=False
    ).fit(nonzeros, labels)
    base.unpersist()
    assert [c for c, _ in sm.selection_path] == [c for c, _ in dm.selection_path]


def test_selector_accepts_vector_input_directly(libsvm_df):
    # reference API shape: fit straight on (label, features: Vector) rows
    model = InfoThSelector(n_to_select=2, criterion="mrmr", emit_f32=False).fit(libsvm_df)
    wide_model = InfoThSelector(n_to_select=2, criterion="mrmr", emit_f32=False).fit(
        vectors_to_wide(libsvm_df)
    )
    assert model.selection_path == wide_model.selection_path


def test_slice_vectors_rebases_sparse(spark):
    df = spark.createDataFrame(
        [(SparseVector(6, {1: 5.0, 3: 7.0, 5: 9.0}),)], ["features"]
    )
    out = slice_vectors(df, [3, 5, 0]).head()["selected"]
    # selection sorted → [0, 3, 5]; kept nonzeros {3:7, 5:9} re-based to
    # positions 1, 2 (InfoSelector.scala:242-257 sorted-merge semantics)
    assert list(out) == [0.0, 7.0, 9.0]
