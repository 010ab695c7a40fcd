"""Dedup operator unit tests (value-level checks ride the DuckDB gate in
test_entry_oracle.py; these pin behaviors the gate can't see)."""

import pytest
from pyspark.sql import functions as F

from flink_infotheoretic_feature_selection_spark.operators.dedup import _jaccard_sql


@pytest.fixture()
def hot_shingle_docs(spark):
    # 50 docs that all share one boilerplate trigram; everything else unique.
    rows = [(i, f"aa bb cc u{i} v{i}") for i in range(50)]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "documents"
    )
    yield
    spark.catalog.dropTempView("documents")


def test_jaccard_skew_guard_drops_hot_shingle_pairs(spark, hot_shingle_docs):
    # Without the cap the shared trigram joins every doc with every other:
    # 50*49/2 pairs all clear the threshold through one hot key.
    uncapped = spark.sql(_jaccard_sql(duck=False, threshold=0.2, n=3, max_df=None))
    assert uncapped.count() == 50 * 49 // 2

    # With the doc-frequency cap below 50 the hot shingle never reaches
    # the self-join, so the quadratic burst vanishes entirely.
    capped = spark.sql(_jaccard_sql(duck=False, threshold=0.2, n=3, max_df=10))
    assert capped.count() == 0


def test_jaccard_cap_keeps_legitimate_pairs(spark):
    # Docs sharing *rare* shingles still pair up under the default cap.
    rows = [
        (1, "x1 x2 x3 x4"),
        (2, "x1 x2 x3 x9"),
        (3, "zz yy ww qq"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "documents"
    )
    try:
        out = spark.sql(
            _jaccard_sql(duck=False, threshold=0.2, n=3, max_df=1000)
        ).collect()
        pairs = {(r.doc_a, r.doc_b) for r in out}
        assert pairs == {(1, 2)}
    finally:
        spark.catalog.dropTempView("documents")


def test_neardup_components_deep_chain_converges(spark):
    # A 15-node path graph has diameter 14 — forces many propagation
    # passes and exercises the periodic localCheckpoint lineage cut.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import neardup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(14)], "doc_a long, doc_b long"
    )
    out = neardup_components(pairs, max_iter=25, checkpoint_every=3)
    rows = {(r.doc_id, r.component) for r in out.collect()}
    assert rows == {(i, 0) for i in range(15)}


def test_neardup_components_raises_when_unconverged(spark):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import neardup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(14)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_components(pairs, max_iter=2)
