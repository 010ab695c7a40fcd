"""Model save/load round-trips + CLI harness + property tests."""

import math

import pytest

from flink_infotheoretic_feature_selection_spark.cli import main as cli_main
from flink_infotheoretic_feature_selection_spark.datasets import features_dense
from flink_infotheoretic_feature_selection_spark.discretizer import (
    EqualFrequencyDiscretizer,
    EqualFrequencyDiscretizerModel,
)
from flink_infotheoretic_feature_selection_spark.selector import InfoThSelector, InfoThSelectorModel


def test_selector_model_roundtrip(spark, sf_dir, tmp_path):
    df = features_dense(spark, sf_dir)
    model = InfoThSelector(n_to_select=3, criterion="mrmr").fit(df)
    p = str(tmp_path / "model.json")
    model.save(p)
    loaded = InfoThSelectorModel.load(p)
    assert loaded.selected_cols == model.selected_cols
    assert loaded.selection_path == model.selection_path
    assert loaded.relevances == model.relevances
    assert loaded.transform(df).columns == model.transform(df).columns


def test_discretizer_model_roundtrip(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    model = EqualFrequencyDiscretizer(["l_quantity"], num_buckets=8).fit(li)
    p = str(tmp_path / "disc.json")
    model.save(p)
    loaded = EqualFrequencyDiscretizerModel.load(p)
    assert loaded.splits == model.splits
    assert math.isinf(loaded.splits["l_quantity"][0])
    a = model.transform(li).groupBy("l_quantity_bucket").count().collect()
    b = loaded.transform(li).groupBy("l_quantity_bucket").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cli_end_to_end_libsvm(tmp_path, capsys, spark):
    p = tmp_path / "toy.libsvm"
    p.write_text(
        "+1 1:2 3:1 5:3\n-1 2:1 4:2\n+1 1:1 2:3 5:1\n-1 3:2 4:1\n"
        "+1 1:3 5:2\n-1 2:2 3:1\n+1 1:2 2:1 5:3\n-1 4:3\n"
    )
    mp = tmp_path / "m.json"
    rc = cli_main(
        ["--input", str(p), "--type", "libsvm", "--nfeat", "2",
         "--crit", "mrmr", "--save-model", str(mp), "--show", "2"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "*** Selected features ***" in out
    assert "FS time:" in out
    assert mp.exists()
    assert len(InfoThSelectorModel.load(str(mp)).selected_cols) == 2


def test_selection_invariant_under_row_permutation(spark, sf_dir):
    # SURVEY.md §5 property (5): row order must not change the selection.
    df = features_dense(spark, sf_dir)
    base = InfoThSelector(n_to_select=4, criterion="jmi", emit_f32=False).fit(df)
    shuffled = df.orderBy((df["f0"] * 31 + df["f7"] * 7 + df["label"]).desc())
    perm = InfoThSelector(n_to_select=4, criterion="jmi", emit_f32=False).fit(shuffled)
    assert base.selection_path == perm.selection_path


def test_mrmr_first_pick_is_argmax_mi(spark, sf_dir):
    # SURVEY.md §5 property (5): step 1 of any criterion = max relevance.
    df = features_dense(spark, sf_dir)
    model = InfoThSelector(n_to_select=2, criterion="mrmr", emit_f32=False).fit(df)
    first = model.selection_path[0][0]
    assert model.relevances[first] == max(model.relevances.values())
