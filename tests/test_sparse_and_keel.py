"""Sparse path (implicit-zero semantics) and KEEL reader tests.

Sparse selection must agree exactly with the dense selector on the same
data — the reference intended this equivalence but its sparse path is
broken (``InfoSelector.scala:378-386``); ours is the fixed design.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_infotheoretic_feature_selection_spark.operators.sparse import sparse_hist2d, sparse_hist3d
from flink_infotheoretic_feature_selection_spark.selector import (
    InfoThSelector,
    SparseInfoThSelector,
)
from flink_infotheoretic_feature_selection_spark.sources.keel import parse_keel_header, read_keel

NF = 6
N_ROWS = 400


@pytest.fixture(scope="module")
def mats(spark):
    """Dense matrix + its sparse long-format twin (zeros dropped)."""
    rng = np.random.default_rng(7)
    X = rng.integers(0, 5, size=(N_ROWS, NF))
    X[rng.random(X.shape) < 0.6] = 0  # make it genuinely sparse
    y = (X[:, 0] + X[:, 2] > 3).astype(int)

    dense = spark.createDataFrame(
        [tuple(int(v) for v in row) + (int(lab),) for row, lab in zip(X, y)],
        ", ".join(f"f{i} int" for i in range(NF)) + ", label int",
    )
    nonzeros = spark.createDataFrame(
        [
            (r, f, int(X[r, f]))
            for r in range(N_ROWS)
            for f in range(NF)
            if X[r, f] != 0
        ],
        "row_id long, feat int, x int",
    )
    labels = spark.createDataFrame(
        [(r, int(y[r])) for r in range(N_ROWS)], "row_id long, y int"
    )
    return X, y, dense, nonzeros, labels


def test_sparse_hist2d_matches_exact_counts(mats):
    X, y, _, nonzeros, labels = mats
    got = {
        (r["feat"], r["x"], r["y"]): r["cnt"]
        for r in sparse_hist2d(nonzeros, labels, NF).collect()
    }
    for f in range(NF):
        for xv in range(int(X[:, f].max()) + 1):
            for yv in (0, 1):
                expect = int(((X[:, f] == xv) & (y == yv)).sum())
                assert got.get((f, xv, yv), 0) == expect, (f, xv, yv)


def test_sparse_hist3d_matches_exact_counts(mats):
    X, y, _, nonzeros, labels = mats
    zf = 1  # condition on feature 1's value
    z_col = labels.sparkSession.createDataFrame(
        [(r, int(X[r, zf])) for r in range(N_ROWS)], "row_id long, z int"
    )
    got = {
        (r["feat"], r["x"], r["y"], r["z"]): r["cnt"]
        for r in sparse_hist3d(nonzeros, labels, z_col, NF).collect()
    }
    f = 3
    for xv in range(int(X[:, f].max()) + 1):
        for yv in (0, 1):
            for zv in range(int(X[:, zf].max()) + 1):
                expect = int(((X[:, f] == xv) & (y == yv) & (X[:, zf] == zv)).sum())
                assert got.get((f, xv, yv, zv), 0) == expect, (xv, yv, zv)


@pytest.mark.parametrize("criterion", ["mim", "mrmr", "jmi"])
def test_sparse_selection_equals_dense(mats, criterion):
    _, _, dense, nonzeros, labels = mats
    k = 3
    dm = InfoThSelector(
        n_to_select=k, criterion=criterion, emit_f32=False,
        feature_cols=[f"f{i}" for i in range(NF)], label_col="label",
    ).fit(dense)
    sm = SparseInfoThSelector(
        n_features=NF, n_to_select=k, criterion=criterion, emit_f32=False
    ).fit(nonzeros, labels)
    assert [c for c, _ in sm.selection_path] == [c for c, _ in dm.selection_path]
    for (_, s1), (_, s2) in zip(sm.selection_path, dm.selection_path):
        assert s1 == pytest.approx(s2, rel=1e-9)


KEEL_TEXT = """\
@relation toy
@attribute a1 {red, green, blue}
@attribute a2 integer [0, 10]
@attribute a3 real [0.0, 1.0]
@attribute class {yes, no}
@inputs a1, a2, a3
@outputs class
@data
red, 3, 0.5, yes
blue, 7, 0.25, no
green, 0, 1.0, yes
"""


def test_parse_keel_header():
    h = parse_keel_header(KEEL_TEXT.splitlines())
    assert h.relation == "toy"
    assert [a.name for a in h.attributes] == ["a1", "a2", "a3", "class"]
    assert h.attributes[0].kind == "nominal"
    assert h.attributes[0].values == ["red", "green", "blue"]
    assert h.attributes[1].kind == "integer"
    assert h.attributes[2].kind == "real"
    assert h.label == "class"


def test_read_keel(spark, tmp_path):
    p = tmp_path / "toy.dat"
    p.write_text(KEEL_TEXT)
    df = read_keel(spark, str(p)).orderBy("a2")
    assert df.columns == ["a1", "a2", "a3", "label"]
    rows = df.collect()
    # nominal → declared-order index (KeelParser.scala:27-32)
    assert [r["a1"] for r in rows] == [1, 0, 2]  # green, red, blue by a2 order
    assert [r["a2"] for r in rows] == [0.0, 3.0, 7.0]
    assert [r["label"] for r in rows] == [0, 0, 1]


KEEL_SPARSE_TEXT = """\
@relation toysparse
@attribute a1 {red, green, blue}
@attribute a2 integer [0, 10]
@attribute a3 real [0.0, 1.0]
@attribute class {yes, no}
@inputs a1, a2, a3
@outputs class
@data
{0 blue, 1 7, 3 no}
{1 3, 2 0.5}
red, 9, 0.25, no
"""


KEEL_REORDERED_TEXT = """\
@relation realworld
@attribute class {yes, no}
@attribute a2 integer [2, 12]
@attribute a1 {red, green, blue}
@attribute a3 real [0.0, 2.0]
@inputs a3, a1, a2
@outputs class
@data
yes, 3, red, 0.5
no, 7, blue, 1.5
"""


def test_read_keel_inputs_reordering(spark, tmp_path):
    # Real KEEL files declare @inputs in an order different from the
    # attribute declarations (and the label first!); feature columns must
    # follow @inputs order, label always last, body parsed by declaration
    # position.
    p = tmp_path / "reorder.dat"
    p.write_text(KEEL_REORDERED_TEXT)
    df = read_keel(spark, str(p)).orderBy("a2")
    assert df.columns == ["a3", "a1", "a2", "label"]
    rows = df.collect()
    assert [r["a2"] for r in rows] == [3.0, 7.0]
    assert [(r["a1"], r["a3"], r["label"]) for r in rows] == [(0, 0.5, 0), (2, 1.5, 1)]


def test_read_keel_normalize_declared_bounds(spark, tmp_path):
    # Attribute.java:600-606: nominal unchanged, integer val-min,
    # real (val-min)/(max-min) — bounds from the header declarations.
    p = tmp_path / "norm.dat"
    p.write_text(KEEL_REORDERED_TEXT)
    rows = read_keel(spark, str(p), normalize=True).orderBy("a2").collect()
    assert [r["a2"] for r in rows] == [1.0, 5.0]  # val - 2
    assert [r["a3"] for r in rows] == [0.25, 0.75]  # (val - 0)/2
    assert [r["a1"] for r in rows] == [0, 2]  # nominal untouched
    assert [r["label"] for r in rows] == [0, 1]


def test_read_keel_normalize_leaves_numeric_label_raw(spark, tmp_path):
    # normalizeValue applies to INPUT attributes; a numeric regression
    # target must come out untouched (review finding: the label was
    # being min-max rescaled along with the features).
    text = """\
@relation regress
@attribute a1 real [0.0, 4.0]
@attribute out real [0, 100]
@inputs a1
@outputs out
@data
1.0, 50
3.0, 75
"""
    p = tmp_path / "regress.dat"
    p.write_text(text)
    rows = read_keel(spark, str(p), normalize=True).orderBy("a1").collect()
    assert [r["a1"] for r in rows] == [0.25, 0.75]
    assert [r["label"] for r in rows] == [50.0, 75.0]  # raw, not /100


def test_read_keel_normalize_empty_body_raises(spark, tmp_path):
    text = """\
@relation empty
@attribute a1 integer
@attribute class {yes, no}
@data
"""
    p = tmp_path / "empty.dat"
    p.write_text(text)
    with pytest.raises(ValueError, match="cannot normalize"):
        read_keel(spark, str(p), normalize=True).collect()


def test_read_keel_normalize_data_derived_bounds(spark, tmp_path):
    # No [lo, hi] in the header → bounds grown from the data, like the
    # reference's parse-time enlargeBounds.
    text = """\
@relation nobounds
@attribute a1 integer
@attribute a2 real
@attribute class {yes, no}
@data
2, 1.0, yes
6, 3.0, no
4, 2.0, yes
"""
    p = tmp_path / "nobounds.dat"
    p.write_text(text)
    rows = read_keel(spark, str(p), normalize=True).orderBy("a1").collect()
    assert [r["a1"] for r in rows] == [0.0, 2.0, 4.0]  # val - min(2)
    assert [r["a2"] for r in rows] == [0.0, 0.5, 1.0]  # (val-1)/(3-1)


def test_read_keel_sparse_body(spark, tmp_path):
    # ARFF-style sparse rows: omitted attributes default to 0 (numeric) /
    # first declared value (nominal); dense and sparse rows can mix.
    p = tmp_path / "toysparse.dat"
    p.write_text(KEEL_SPARSE_TEXT)
    df = read_keel(spark, str(p)).orderBy("a2")
    rows = df.collect()
    assert [r["a2"] for r in rows] == [3.0, 7.0, 9.0]
    # row with a2=3: a1 omitted -> 'red' (index 0), a3 given, class omitted -> 'yes' (0)
    assert (rows[0]["a1"], rows[0]["a3"], rows[0]["label"]) == (0, 0.5, 0)
    # row with a2=7: a1='blue' (2), a3 omitted -> 0.0, class='no' (1)
    assert (rows[1]["a1"], rows[1]["a3"], rows[1]["label"]) == (2, 0.0, 1)
    # dense row unchanged
    assert (rows[2]["a1"], rows[2]["a3"], rows[2]["label"]) == (0, 0.25, 1)


def test_read_keel_missing_value_tokens(spark, tmp_path):
    # Real-world KEEL bodies carry '?' (KEEL/ARFF missing convention) and
    # some exports '<null>'; both must become SQL NULL on every attribute
    # kind.  Under Spark 4's default ANSI mode an unhandled '?' would
    # THROW at scan time inside CAST — this test is the regression pin.
    text = """\
@relation missing
@attribute a1 {red, green, blue}
@attribute a2 integer [0, 10]
@attribute a3 real [0.0, 1.0]
@attribute class {yes, no}
@data
?, 3, 0.5, yes
green, ?, <null>, no
blue, 7, 0.25, ?
"""
    p = tmp_path / "missing.dat"
    p.write_text(text)
    rows = read_keel(spark, str(p)).orderBy("a2", "a1").collect()
    by_a1 = {r["a1"]: r for r in rows}
    assert by_a1[None]["a2"] == 3.0 and by_a1[None]["label"] == 0
    assert by_a1[1]["a2"] is None and by_a1[1]["a3"] is None
    assert by_a1[2]["label"] is None and by_a1[2]["a2"] == 7.0


def test_read_keel_missing_values_normalize_uses_present_bounds(spark, tmp_path):
    # min/max for data-derived bounds ignore NULLs; NULL inputs stay NULL
    # through the normalization arithmetic.
    text = """\
@relation missnorm
@attribute a1 real
@attribute class {yes, no}
@data
1.0, yes
?, no
3.0, yes
"""
    p = tmp_path / "missnorm.dat"
    p.write_text(text)
    rows = read_keel(spark, str(p), normalize=True).orderBy("label", "a1").collect()
    vals = sorted((r["a1"] for r in rows if r["a1"] is not None))
    assert vals == [0.0, 1.0]  # (1-1)/2, (3-1)/2
    assert any(r["a1"] is None for r in rows)


def test_keel_malformed_sparse_rows_raise_readable_errors(spark, tmp_path):
    from flink_infotheoretic_feature_selection_spark.sources.keel import read_keel

    header = (
        "@relation t\n@attribute a0 integer [0, 9]\n@attribute a1 integer [0, 9]\n"
        "@attribute klass {0, 1}\n@data\n"
    )
    bad_index = tmp_path / "bad_index.dat"
    bad_index.write_text(header + "{x 1, 2 0}\n")
    with pytest.raises(Exception, match="malformed sparse KEEL entry"):
        read_keel(spark, str(bad_index)).collect()

    dup_index = tmp_path / "dup_index.dat"
    dup_index.write_text(header + "{0 1, 0 2, 2 0}\n")
    with pytest.raises(Exception, match="duplicate sparse index"):
        read_keel(spark, str(dup_index)).collect()

    # r12: index-only entry — used to surface as a deep ANSI
    # INVALID_ARRAY_INDEX from element_at(.., 2) instead of a readable
    # message naming the row
    no_value = tmp_path / "no_value.dat"
    no_value.write_text(header + "{0 1, 2}\n")
    with pytest.raises(Exception, match="index without value"):
        read_keel(spark, str(no_value)).collect()


def test_keel_unknown_inputs_name_raises(spark, tmp_path):
    from flink_infotheoretic_feature_selection_spark.sources.keel import read_keel

    f = tmp_path / "typo.dat"
    f.write_text(
        "@relation t\n@attribute Att1 integer [0, 9]\n@attribute klass {0, 1}\n"
        "@inputs att1\n@outputs klass\n@data\n1, 0\n"
    )
    with pytest.raises(ValueError, match="not declared as @attribute"):
        read_keel(spark, str(f))


def test_keel_bare_inputs_directive_raises():
    from flink_infotheoretic_feature_selection_spark.sources.keel import parse_keel_header

    with pytest.raises(ValueError, match="@inputs directive with no names"):
        parse_keel_header(
            ["@relation t", "@attribute a integer", "@inputs", "@data"]
        )


# --- write_keel (r12: the reference's InstanceSet write-back path) ------


def _roundtrip(spark, tmp_path, text, normalize=False):
    from flink_infotheoretic_feature_selection_spark.sources.keel import write_keel

    src = tmp_path / "src.dat"
    src.write_text(text)
    header = parse_keel_header(text.splitlines())
    df = read_keel(spark, str(src), normalize=normalize)
    out = str(tmp_path / "export")
    write_keel(df, out, header)
    back = read_keel(spark, f"{out}/body", header_path=f"{out}/header.dat")
    key = lambda t: tuple((v is None, v) for v in t)
    assert sorted(map(tuple, back.collect()), key=key) == sorted(
        map(tuple, df.collect()), key=key
    )
    return out, header


def test_write_keel_roundtrip_dense(spark, tmp_path):
    _roundtrip(spark, tmp_path, KEEL_TEXT)


def test_write_keel_roundtrip_sparse_and_missing(spark, tmp_path):
    # sparse rows densify on write (the writer emits the dense dialect);
    # '?' NULLs survive the roundtrip
    text = KEEL_SPARSE_TEXT + "?, 5, <null>, yes\n"
    out, header = _roundtrip(spark, tmp_path, text)
    body = ""
    import os

    for part in sorted(os.listdir(f"{out}/body")):
        if part.endswith(".txt"):
            body += open(f"{out}/body/{part}").read()
    assert "?" in body  # NULLs wrote as the KEEL missing token
    assert "{" not in body  # dense dialect only


def test_write_keel_single_file_is_classic_shape(spark, tmp_path):
    from flink_infotheoretic_feature_selection_spark.sources.keel import write_keel

    src = tmp_path / "src.dat"
    src.write_text(KEEL_TEXT)
    header = parse_keel_header(KEEL_TEXT.splitlines())
    df = read_keel(spark, str(src))
    out = str(tmp_path / "export1")
    write_keel(df, out, header, single_file=True)
    data = open(f"{out}/data.dat").read()
    assert data.startswith("@relation ")
    assert "@data\n" in data
    # the classic single file reads back through the normal entry point
    back = read_keel(spark, f"{out}/data.dat")
    key = lambda t: tuple((v is None, v) for v in t)
    assert sorted(map(tuple, back.collect()), key=key) == sorted(
        map(tuple, df.collect()), key=key
    )


def test_write_keel_rejects_unsafe_nominals_and_missing_cols(spark, tmp_path):
    from flink_infotheoretic_feature_selection_spark.sources.keel import (
        KeelAttribute,
        KeelHeader,
        write_keel,
    )

    df = spark.createDataFrame([(0, 0)], "a int, label int")
    bad = KeelHeader(
        "t",
        [
            KeelAttribute("a", "nominal", ["x,y", "z"]),
            KeelAttribute("c", "nominal", ["p", "q"]),
        ],
        ["a"],
        ["c"],
    )
    with pytest.raises(ValueError, match="not dense-dialect-safe"):
        write_keel(df, str(tmp_path / "e1"), bad)
    lacking = KeelHeader(
        "t",
        [
            KeelAttribute("zz", "integer"),
            KeelAttribute("c", "nominal", ["p", "q"]),
        ],
        ["zz"],
        ["c"],
    )
    with pytest.raises(ValueError, match="frame lacks header attributes"):
        write_keel(df, str(tmp_path / "e2"), lacking)
