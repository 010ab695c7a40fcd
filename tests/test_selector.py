"""End-to-end selector tests vs an exact NumPy oracle (SURVEY.md §5 item 3)."""

import numpy as np
import pytest

from flink_infotheoretic_feature_selection_spark.datasets import FEATURE_NAMES, features_dense
from flink_infotheoretic_feature_selection_spark.selector import InfoThSelector


# ---------------------------------------------------------------------------
# Exact NumPy oracle: same algorithm, independently implemented over the
# full (small) dataset.
# ---------------------------------------------------------------------------
def np_mi(x, y):
    xs, ys = x.max() + 1, y.max() + 1
    joint = np.zeros((xs, ys))
    np.add.at(joint, (x, y), 1)
    p = joint / len(x)
    px = p.sum(1, keepdims=True)
    py = p.sum(0, keepdims=True)
    mask = p > 0
    return (p[mask] * np.log2(p[mask] / (px * py)[mask])).sum()


def np_cmi(x, y, z):
    """CMI(X;Y|Z)"""
    xs, ys, zs = x.max() + 1, y.max() + 1, z.max() + 1
    joint = np.zeros((xs, ys, zs))
    np.add.at(joint, (x, y, z), 1)
    c = joint / len(x)
    pz = c.sum((0, 1))
    pxz = c.sum(1)
    pyz = c.sum(0)
    total = 0.0
    for zi in range(zs):
        for xi in range(xs):
            for yi in range(ys):
                pxyz = c[xi, yi, zi]
                if pxyz > 0 and pxz[xi, zi] > 0 and pyz[yi, zi] > 0:
                    total += pxyz * np.log2(pz[zi] * pxyz / (pxz[xi, zi] * pyz[yi, zi]))
    return total


def np_greedy(X, y, k, criterion):
    nf = X.shape[1]
    rel = [np_mi(X[:, i], y) for i in range(nf)]
    if criterion == "mim":
        return sorted(range(nf), key=lambda i: (-rel[i], i))[:k]
    red = np.zeros(nf)
    cred = np.zeros(nf)
    mod = np.zeros(nf)
    cnt = 0
    selected = []
    remaining = list(range(nf))
    while len(selected) < k:
        if criterion == "mrmr":
            scores = {i: rel[i] - (red[i] / cnt if cnt else 0.0) for i in remaining}
        elif criterion == "jmi":
            scores = {
                i: rel[i] - (red[i] / cnt if cnt else 0.0) + (cred[i] / cnt if cnt else 0.0)
                for i in remaining
            }
        elif criterion in ("cmim", "if", "icap"):
            scores = {i: rel[i] - mod[i] for i in remaining}
        elif criterion == "mifs":
            scores = {i: rel[i] - red[i] for i in remaining}
        best = max(remaining, key=lambda i: (scores[i], -i))
        selected.append(best)
        remaining.remove(best)
        if len(selected) >= k or not remaining:
            break
        cnt += 1
        for i in remaining:
            mi = np_mi(X[:, i], X[:, best])
            cmi = np_cmi(X[:, i], X[:, best], y)
            red[i] += mi
            cred[i] += cmi
            if criterion in ("cmim", "if"):
                mod[i] = max(mod[i], mi - cmi)
            elif criterion == "icap":
                mod[i] += max(0.0, mi - cmi)
    return selected


@pytest.fixture(scope="module")
def data(spark, sf_dir):
    df = features_dense(spark, sf_dir)
    pdf = df.toPandas()
    X = pdf[FEATURE_NAMES].to_numpy(dtype=np.int64)
    y = pdf["label"].to_numpy(dtype=np.int64)
    return df, X, y


@pytest.mark.parametrize("criterion", ["mim", "mrmr", "jmi", "cmim", "icap", "mifs"])
def test_selection_matches_numpy_oracle(data, criterion):
    df, X, y = data
    k = 4
    model = InfoThSelector(n_to_select=k, criterion=criterion, emit_f32=False).fit(df)
    got = [FEATURE_NAMES.index(c) for c, _ in model.selection_path]
    expect = np_greedy(X, y, k, criterion)
    assert got == expect, f"{criterion}: {got} != {expect}"


def test_relevances_match_numpy(data):
    df, X, y = data
    model = InfoThSelector(n_to_select=2, criterion="mim", emit_f32=False).fit(df)
    for i, c in enumerate(FEATURE_NAMES):
        assert model.relevances[c] == pytest.approx(np_mi(X[:, i], y), rel=1e-9)


def test_mim_equals_topk_by_mi(data):
    df, X, y = data
    model = InfoThSelector(n_to_select=5, criterion="mim", emit_f32=False).fit(df)
    ranked = sorted(FEATURE_NAMES, key=lambda c: (-model.relevances[c], FEATURE_NAMES.index(c)))
    assert [c for c, _ in model.selection_path] == ranked[:5]


def test_transform_projects_selected(data):
    df, _, _ = data
    model = InfoThSelector(n_to_select=3, criterion="mrmr").fit(df)
    out = model.transform(df)
    assert out.columns == model.selected_cols + ["label"]
    assert out.count() == df.count()
    assert len(model.selected_cols) == 3
    # ascending order like the reference (InfoSelector.scala:491)
    idx = [FEATURE_NAMES.index(c) for c in model.selected_cols]
    assert idx == sorted(idx)


def test_tie_key_quantization_is_engine_identical():
    # r6 advisor finding: Python round() (half-to-even on the binary
    # double) and DuckDB round() (half-away-from-zero on the decimal
    # rendering) disagree near x.xxxxx5 boundaries — round(0.123455, 5)
    # is 0.12345 in Python, 0.12346 in DuckDB.  The floor-quantization
    # must agree with DuckDB's spelling on exactly those inputs.
    import duckdb

    from flink_infotheoretic_feature_selection_spark.selector import _tie_key

    duck = duckdb.connect()
    boundary = [0.123455, 0.123465, -0.123455, 0.999995, 1e-06, 0.0,
                0.5 / 1e5, 1.5 / 1e5, 0.728115, -0.000005]
    for x in boundary:
        d = duck.execute(
            "SELECT CAST(floor(CAST(? AS DOUBLE) * 100000.0 + 0.5) AS BIGINT)",
            [x],
        ).fetchone()[0]
        assert _tie_key(x, 5) == d, x
    # sanity: the engines' own round() DOES diverge on the motivating
    # input, which is why round() is not the quantizer.
    assert round(0.123455, 5) != duck.execute(
        "SELECT round(CAST(0.123455 AS DOUBLE), 5)"
    ).fetchone()[0]
    # precision=None passes the raw score through.
    assert _tie_key(0.123455, None) == 0.123455


def test_tie_precision_full_mode_still_deterministic(spark):
    # tie_precision=None → full-precision argmax.  f0 and f1 are exact
    # duplicates so every criterion scores them bit-identically at any
    # precision; the id tiebreak must pick the lower index first.  f2 is
    # noise orthogonal to the label.
    rows = [(i % 3, i % 3, (i * 7) % 4, i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "f0 int, f1 int, f2 int, label int")
    for tp in (None, 5):
        model = InfoThSelector(
            n_to_select=2,
            criterion="mrmr",
            feature_cols=["f0", "f1", "f2"],
            emit_f32=False,
            tie_precision=tp,
        ).fit(df)
        assert [c for c, _ in model.selection_path] == ["f0", "f1"], tp


def test_n_to_select_too_large_raises(data):
    df, _, _ = data
    with pytest.raises(ValueError):
        InfoThSelector(n_to_select=99).fit(df)


def test_validate_rejects_null_features(spark):
    from flink_infotheoretic_feature_selection_spark.selector import InfoThSelector
    import pytest

    df = spark.createDataFrame(
        [(1, 0, 0), (None, 1, 1), (2, 0, 1)], "f0 int, f1 int, label int"
    )
    with pytest.raises(ValueError, match="non-null integers"):
        InfoThSelector(
            n_to_select=1, feature_cols=["f0", "f1"], validate=True
        ).fit(df)


def test_sparse_fit_rejects_negative_values_and_oversized_dims(spark):
    # numpy fancy indexing would silently WRAP a negative x to the end of
    # the histogram; and an uncapped dim would size driver ndarrays by a
    # single corrupt cell. Both must be loud errors like the dense path.
    import pytest
    from flink_infotheoretic_feature_selection_spark.selector import SparseInfoThSelector

    labels = spark.createDataFrame(
        [(r, r % 2) for r in range(6)], "row_id long, y int"
    )
    neg = spark.createDataFrame(
        [(0, 0, -1), (1, 1, 2), (2, 0, 1)], "row_id long, feat int, x int"
    )
    with pytest.raises(ValueError, match=">= 0"):
        SparseInfoThSelector(n_features=2, n_to_select=1).fit(neg, labels)

    huge = spark.createDataFrame(
        [(0, 0, 1_000_000), (1, 1, 2)], "row_id long, feat int, x int"
    )
    with pytest.raises(ValueError, match="dim>256"):
        SparseInfoThSelector(n_features=2, n_to_select=1).fit(huge, labels)


def test_empty_input_raises_clear_error(spark):
    import pytest
    from flink_infotheoretic_feature_selection_spark.operators.histogram import (
        feature_dims_and_count,
    )

    empty = spark.createDataFrame([], "f0 int, label int")
    with pytest.raises(ValueError, match="empty or columns are all-NULL"):
        feature_dims_and_count(empty, ["f0"])


# ---- r8 review hardening ---------------------------------------------------


def test_feature_dims_raises_instead_of_clamping(spark):
    # silent clamping let out-of-range values ALIAS into neighboring
    # histogram cells in the Arrow bincount routes — over-cap must error
    import pytest
    from flink_infotheoretic_feature_selection_spark.operators.histogram import (
        feature_dims_and_count,
    )

    df = spark.createDataFrame([(300, 0), (1, 1)], "f0 int, label int")
    with pytest.raises(ValueError, match="byte range"):
        feature_dims_and_count(df, ["f0", "label"])


def test_int32_exact_guards_partial_overflow():
    import numpy as np
    import pytest
    from flink_infotheoretic_feature_selection_spark.operators.histogram import int32_exact

    ok = np.array([0, 2**31 - 1], dtype=np.int64)
    assert int32_exact(ok).dtype == np.int32
    with pytest.raises(ValueError, match="int32"):
        int32_exact(np.array([2**31], dtype=np.int64))


def test_check_int32_rows_proof():
    # r9: the hot-path guard is an O(1) row-count proof — a bincount
    # cell can never exceed the number of rows counted, so n_rows at
    # the int32 boundary passes and one past it raises
    import pytest
    from flink_infotheoretic_feature_selection_spark.operators.histogram import (
        check_int32_rows,
    )

    check_int32_rows(0)
    check_int32_rows(2**31 - 1)
    with pytest.raises(ValueError, match="int32"):
        check_int32_rows(2**31)


def test_transform_raises_on_missing_selected_column(spark):
    import pytest
    from flink_infotheoretic_feature_selection_spark.selector import InfoThSelectorModel

    m = InfoThSelectorModel(
        feature_cols=["f0", "f1"], label_col="label",
        selected_cols=["f0", "f1"], selection_path=[], relevances={},
    )
    df = spark.createDataFrame([(1, 0)], "f0 int, label int")  # f1 missing
    with pytest.raises(ValueError, match="f1"):
        m.transform(df)
    # missing LABEL stays fine (serving data is unlabeled)
    unlabeled = spark.createDataFrame([(1, 2)], "f0 int, f1 int")
    assert m.transform(unlabeled).columns == ["f0", "f1"]


def test_validate_rejects_null_label(spark):
    import pytest
    from flink_infotheoretic_feature_selection_spark.selector import InfoThSelector

    df = spark.createDataFrame(
        [(1, 0, 0), (2, 1, None), (2, 0, 1)], "f0 int, f1 int, label int"
    )
    for engine in ("packed", "arrow"):
        with pytest.raises(ValueError, match="non-null integers"):
            InfoThSelector(
                n_to_select=1, feature_cols=["f0", "f1"], validate=True,
                loop_engine=engine,
            ).fit(df)


def test_sparse_fit_clear_errors_on_bad_labels(spark):
    import pytest
    from flink_infotheoretic_feature_selection_spark.selector import SparseInfoThSelector

    nz = spark.createDataFrame([(0, 0, 1), (1, 1, 2)], "row_id long, feat int, x int")
    empty = spark.createDataFrame([], "row_id long, y int")
    with pytest.raises(ValueError, match="empty"):
        SparseInfoThSelector(n_features=2, n_to_select=1).fit(nz, empty)

    nully = spark.createDataFrame([(0, None), (1, 1)], "row_id long, y int")
    with pytest.raises(ValueError, match="NULL"):
        SparseInfoThSelector(n_features=2, n_to_select=1).fit(nz, nully)

    bigy = spark.createDataFrame([(0, 1), (1, 50_000_000)], "row_id long, y int")
    with pytest.raises(ValueError, match="byte range"):
        SparseInfoThSelector(n_features=2, n_to_select=1).fit(nz, bigy)


def test_sparse_fit_rejects_duplicate_cells(spark):
    # duplicate (row_id, feat) cells over-count nonzeros past the label
    # totals; the credited-zeros row would go NEGATIVE and mutual_info's
    # p>0 mask would silently skip it — must be a loud error
    import pytest
    from flink_infotheoretic_feature_selection_spark.selector import SparseInfoThSelector

    labels = spark.createDataFrame([(r, r % 2) for r in range(3)], "row_id long, y int")
    # row 0 duplicated 3x: its (x=2, y=0) cell counts 3 > n_y[0]=2, so
    # the credited x=0 row goes negative (2 copies would tie at zero and
    # slip through — the guard fires when counts EXCEED the class total)
    dup = spark.createDataFrame(
        [(0, 0, 2)] * 3 + [(1, 1, 1)], "row_id long, feat int, x int"
    )
    for engine in ("sql", "packed"):
        with pytest.raises(ValueError, match="duplicate"):
            SparseInfoThSelector(
                n_features=2, n_to_select=1, loop_engine=engine
            ).fit(dup, labels)


def test_mim_reports_zero_iterations(spark):
    from flink_infotheoretic_feature_selection_spark.datasets import features_dense
    from flink_infotheoretic_feature_selection_spark.selector import InfoThSelector

    df = features_dense(spark, "/root/testdata/sf0.001")
    m = InfoThSelector(n_to_select=4, criterion="mim").fit(df)
    assert m.fit_timings["iterations"] == 0
