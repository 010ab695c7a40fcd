"""EqualFrequencyDiscretizer unit tests (SURVEY.md §3.3, FreqDisc semantics)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_infotheoretic_feature_selection_spark.discretizer import (
    EqualFrequencyDiscretizer,
    _find_split_candidates,
    _finish_splits,
    check_all_splits,
)


def test_stride_walk_hand_computed():
    # 12 values, 3 splits → stride = ceil(12/4) = 3.  The reference appends
    # a (Float.MaxValue, 1) sentinel (FreqDisc:192) which makes the LAST
    # real value emittable too — so the walk yields 4 candidates here, a
    # documented reference quirk we reproduce exactly.
    vals = np.array([1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4], dtype=float)
    got = _find_split_candidates(vals, num_splits=3)
    assert list(got) == [1.0, 2.0, 3.0, 4.0]


def test_stride_walk_few_uniques_returns_all():
    vals = np.array([5.0, 5.0, 9.0, 9.0])
    # possible_splits (=1) ≤ num_splits → every unique value except the
    # sentinel is a candidate (FreqDisc:199-201).
    got = _find_split_candidates(vals, num_splits=3)
    assert list(got) == [5.0, 9.0]


def test_finish_splits_sentinels_and_degenerate():
    assert _finish_splits(np.array([1.0, 2.0])) == [-math.inf, 1.0, 2.0, math.inf]
    # degenerate default [-inf, 0, +inf]  (FreqDisc:244-249)
    assert _finish_splits(np.array([])) == [-math.inf, 0.0, math.inf]


def test_check_all_splits():
    assert check_all_splits({"a": [-math.inf, 1.0, math.inf]})
    assert not check_all_splits({"a": [-math.inf, math.inf]})  # too short
    assert not check_all_splits({"a": [-math.inf, 2.0, 2.0, math.inf]})  # not strict


def test_fit_transform_equal_frequency(spark):
    n = 1000
    df = spark.createDataFrame([(float(i),) for i in range(n)], "x double")
    model = EqualFrequencyDiscretizer(["x"], num_buckets=4).fit(df)
    s = model.splits["x"]
    assert s[0] == -math.inf and s[-1] == math.inf
    assert all(a < b for a, b in zip(s, s[1:]))
    out = model.transform(df)
    counts = {
        r["x_bucket"]: r["cnt"]
        for r in out.groupBy("x_bucket").agg(F.count("*").alias("cnt")).collect()
    }
    # Reference quirk: the MaxValue sentinel emits the max value as a split
    # too, so an extra last bucket holds only the max row(s).
    assert set(counts) == {0.0, 1.0, 2.0, 3.0, 4.0}
    assert counts[4.0] <= 2
    # equal-frequency: the real buckets within 2× of the ideal quarter
    for b in (0.0, 1.0, 2.0, 3.0):
        assert n / 8 <= counts[b] <= n / 2


def test_transform_as_bytes(spark):
    df = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    model = EqualFrequencyDiscretizer(["x"], num_buckets=5, as_bytes=True).fit(df)
    out = model.transform(df)
    assert dict(out.dtypes)["x_bucket"] == "tinyint"
    # ≤ num_buckets (not num_buckets−1): sentinel quirk adds one bucket
    assert out.agg({"x_bucket": "max"}).collect()[0][0] <= 5


def test_constant_column_single_split(spark):
    # one unique value → it becomes the only split (FreqDisc:199-201);
    # the [−∞,0,∞] default fires only on an EMPTY candidate set.
    df = spark.createDataFrame([(3.0,)] * 50, "x double")
    model = EqualFrequencyDiscretizer(["x"], num_buckets=4).fit(df)
    assert model.splits["x"] == [-math.inf, 3.0, math.inf]
    # every value sits exactly on the split → right bucket
    vals = {r["x_bucket"] for r in model.transform(df).collect()}
    assert vals == {1.0}


def test_num_buckets_validation():
    with pytest.raises(ValueError):
        EqualFrequencyDiscretizer(["x"], num_buckets=1)


def test_equal_width_splits_and_transform(spark):
    from flink_infotheoretic_feature_selection_spark.discretizer import EqualWidthDiscretizer

    df = spark.createDataFrame([(float(v),) for v in range(0, 101)], "x double")
    model = EqualWidthDiscretizer(["x"], num_buckets=4).fit(df)
    # boundaries at 25, 50, 75 with ±inf sentinels
    assert model.splits["x"] == [float("-inf"), 25.0, 50.0, 75.0, float("inf")]
    out = {r["x"]: r["x_bucket"] for r in model.transform(df).collect()}
    assert out[0.0] == 0 and out[24.0] == 0
    assert out[25.0] == 1 and out[49.0] == 1  # left-closed boundaries
    assert out[75.0] == 3 and out[100.0] == 3


def test_equal_width_degenerate_column(spark):
    from flink_infotheoretic_feature_selection_spark.discretizer import EqualWidthDiscretizer

    df = spark.createDataFrame([(7.0,)] * 5, "x double")
    model = EqualWidthDiscretizer(["x"], num_buckets=4).fit(df)
    assert model.splits["x"] == [float("-inf"), 7.0, float("inf")]
    assert {r["x_bucket"] for r in model.transform(df).collect()} == {1}


def test_check_all_splits_rejects_nan():
    # every comparison against NaN is False, so without the explicit
    # isnan check a NaN split list passed "strictly increasing"
    import math

    from flink_infotheoretic_feature_selection_spark.discretizer import check_all_splits

    assert not check_all_splits({"c": [-math.inf, math.nan, math.inf]})
    assert check_all_splits({"c": [-math.inf, 0.0, math.inf]})
