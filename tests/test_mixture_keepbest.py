"""Mixture sampling + keep-best dedup representative selection."""

from collections import Counter

from flink_infotheoretic_feature_selection_spark.operators.dedup import dedup_keep_best
from flink_infotheoretic_feature_selection_spark.operators.text import (
    MIXTURE_DEFAULT_PCT,
    MIXTURE_WEIGHTS_PCT,
    mixture_sample,
)
from flink_infotheoretic_feature_selection_spark.plans import exchange_count


def test_mixture_sample_copy_semantics(spark, sf_dir):
    rows = mixture_sample(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault((r["doc_id"], r["source"]), []).append(r["copy"])
    for (doc, src), copies in by_doc.items():
        # copy indexes are contiguous 1..n
        assert sorted(copies) == list(range(1, len(copies) + 1))
        w = MIXTURE_WEIGHTS_PCT.get(src, MIXTURE_DEFAULT_PCT)
        assert w // 100 <= len(copies) <= w // 100 + 1
    # a zero-weight source is dropped entirely
    assert not any(src == "src17" for _, src in by_doc)
    # upsampled source emits more rows than docs; downsampled fewer
    n_docs = Counter(
        r["source"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    )
    n_rows = Counter(r["source"] for r in rows)
    assert n_rows["src0"] > n_docs["src0"]  # 2.5x
    assert n_rows["src4"] < n_docs["src4"]  # 0.4x default


def test_mixture_sample_deterministic_and_narrow(spark, sf_dir):
    a = sorted(map(tuple, mixture_sample(spark, sf_dir).collect()))
    b = sorted(map(tuple, mixture_sample(spark, sf_dir).collect()))
    assert a == b
    # scan-speed contract: no shuffle anywhere in the plan
    assert exchange_count(mixture_sample(spark, sf_dir)) == 0


def test_dedup_keep_best_invariants(spark, sf_dir):
    rows = dedup_keep_best(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    # every doc decided exactly once
    assert sorted(r["doc_id"] for r in rows) == sorted(docs)
    groups = {}
    for r in rows:
        if r["component"] is None:
            assert r["keep"] is True
        else:
            groups.setdefault(r["component"], []).append(r)
    assert groups, "fixture corpus has near-dup groups"
    for comp, members in groups.items():
        kept = [r for r in members if r["keep"]]
        assert len(kept) == 1
        # keeper = longest text, ties to lowest doc_id
        best = min(members, key=lambda r: (-docs[r["doc_id"]], r["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"]


def test_token_mi_topk_matches_brute_force(spark, sf_dir):
    import math
    import re

    from flink_infotheoretic_feature_selection_spark.operators.text import token_mi_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n = len(docs)
    n_s = {}
    present = {}
    for d in docs:
        n_s[d["source"]] = n_s.get(d["source"], 0) + 1
        for t in set(re.findall(r"[a-z]+", d["text"].lower())):
            present.setdefault(t, {}).setdefault(d["source"], 0)
            present[t][d["source"]] += 1
    expect = {}
    for t, by_src in present.items():
        c1tot = sum(by_src.values())
        if c1tot < 5:
            continue
        mi = 0.0
        for s, ns in n_s.items():
            c1 = by_src.get(s, 0)
            if c1 > 0:
                mi += (c1 / n) * math.log2(c1 * n / (c1tot * ns))
            c0 = ns - c1
            if c0 > 0 and n - c1tot > 0:
                mi += (c0 / n) * math.log2(c0 * n / ((n - c1tot) * ns))
        expect[t] = round(mi, 5)
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [(r["term"], r["mi"]) for r in token_mi_topk(spark, sf_dir).collect()]
    assert got == want


def test_quality_quantile_filter_matches_brute_force(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        lang_id,
        quality_quantile_filter,
        text_stats,
    )

    q = {r["doc_id"]: r["quality_score"] for r in text_stats(spark, sf_dir).collect()}
    lang = {r["doc_id"]: r["lang_pred"] for r in lang_id(spark, sf_dir).collect()}
    by_lang = {}
    for doc, lp in lang.items():
        by_lang.setdefault(lp, []).append(doc)
    expect = {}
    for lp, docs in by_lang.items():
        ordered = sorted(docs, key=lambda d: (-q[d], d))
        n = len(ordered)
        for rank, d in enumerate(ordered):  # no ties (doc_id tiebreak)
            pr = 0.0 if n == 1 else rank / (n - 1)
            if pr <= 0.5:
                expect[d] = (lp, q[d], round(pr, 5))
    got = {
        r["doc_id"]: (r["lang_pred"], r["quality_score"], r["pr"])
        for r in quality_quantile_filter(spark, sf_dir).collect()
    }
    assert got == expect


def test_hash_split_deterministic_and_content_keyed(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.text import hash_split

    rows = hash_split(spark, sf_dir).collect()
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    # content-keyed: identical text -> identical split, whatever the id
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    split = {r["doc_id"]: r["split"] for r in rows}
    by_text = {}
    for d in docs:
        by_text.setdefault(d["text"].strip().lower(), set()).add(split[d["doc_id"]])
    assert all(len(s) == 1 for s in by_text.values())
    # roughly 80/10/10 (content hash, so loose bounds)
    from collections import Counter

    c = Counter(r["split"] for r in rows)
    n = len(rows)
    assert 0.6 < c["train"] / n < 0.95
    assert exchange_count(hash_split(spark, sf_dir)) == 0


def test_key_skew_profile_hand_computed(spark):
    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.operators.profile import (
        key_skew_profile,
    )

    df = spark.range(100).select(
        F.when(F.col("id") < 60, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    rows = key_skew_profile(df, "k", top=3).collect()
    assert (rows[0]["key"], rows[0]["n"], rows[0]["share"]) == (7, 60, 0.6)
    # remaining keys all have n=1; ties resolve by key ascending
    assert [r["key"] for r in rows[1:]] == [60, 61]
    assert all(r["share"] == 0.01 for r in rows[1:])


def test_pipeline_curate_split_composes_stage_semantics(spark, sf_dir):
    from collections import Counter

    from flink_infotheoretic_feature_selection_spark.operators.pipeline import (
        pipeline_curate_split,
    )
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        MIXTURE_DEFAULT_PCT,
        MIXTURE_WEIGHTS_PCT,
        quality_quantile_filter,
    )

    rows = pipeline_curate_split(spark, sf_dir).collect()
    kept = {r["doc_id"] for r in quality_quantile_filter(spark, sf_dir).collect()}
    # every emitted doc survived the quantile stage; nothing else did
    assert {r["doc_id"] for r in rows} <= kept
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        splits = {r["split"] for r in rs}
        assert len(splits) == 1  # one split per doc
        copies = sorted(r["copy"] for r in rs)
        assert copies == list(range(1, len(copies) + 1))
        if splits != {"train"}:
            assert len(rs) == 1  # val/test never upsampled
        else:
            w = MIXTURE_WEIGHTS_PCT.get(rs[0]["source"], MIXTURE_DEFAULT_PCT)
            assert max(w // 100, 1) <= len(rs) <= w // 100 + 1
    # zero-weight source can still appear in val/test (mixture only
    # applies to train) but never with >0 train copies
    train_srcs = Counter(r["source"] for r in rows if r["split"] == "train")
    assert train_srcs.get("src17", 0) == 0


def test_quality_threshold_filter_tracks_exact_quantile(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        quality_quantile_filter,
        quality_threshold_filter,
    )

    exact = {r["doc_id"] for r in quality_quantile_filter(spark, sf_dir).collect()}
    approx = {r["doc_id"] for r in quality_threshold_filter(spark, sf_dir).collect()}
    # same top-half policy: heavy overlap, size within 2%+ties of exact.
    # (the approx set can only differ where scores tie at the threshold
    # or the sketch's rank error moves the cut by a hair)
    assert len(approx) >= 0.98 * len(exact)
    assert len(approx & exact) >= 0.98 * len(exact)


def test_quality_threshold_filter_sort_free(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        quality_threshold_filter,
    )
    from flink_infotheoretic_feature_selection_spark.plans import formatted_plan

    plan = formatted_plan(quality_threshold_filter(spark, sf_dir))
    assert "Window" not in plan  # no percent_rank, no per-lang total order
    assert "Sort" not in plan.split("== Physical Plan ==")[1].split("(1) Scan")[0]


def test_cross_source_overlap_hand_computed(spark):
    from flink_infotheoretic_feature_selection_spark.operators.profile import (
        _cross_source_overlap_sql,
    )

    # srcA and srcB share exactly the 3-gram "a b c"; srcC is disjoint;
    # srcD's only doc is shorter than n=3 tokens, so it has ZERO shingles
    # — it must still appear in the dense grid with n_sh 0 / jaccard 0.0
    # (the round-5 review finding: a sizes-derived grid dropped it).
    spark.createDataFrame(
        [
            (1, "a b c d", "srcA"),
            (2, "x a b c", "srcB"),
            (3, "p q r s", "srcC"),
            (4, "t u", "srcD"),
        ],
        "doc_id long, text string, source string",
    ).createOrReplaceTempView("documents")
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in spark.sql(_cross_source_overlap_sql(duck=False)).collect()
    }
    # dense grid: all 6 pairs present, zero-overlap pairs report 0.0
    assert set(rows) == {
        ("srcA", "srcB"),
        ("srcA", "srcC"),
        ("srcB", "srcC"),
        ("srcA", "srcD"),
        ("srcB", "srcD"),
        ("srcC", "srcD"),
    }
    ab = rows[("srcA", "srcB")]
    # srcA grams {a b c, b c d}, srcB grams {x a b, a b c}: |∩|=1, |∪|=3
    assert (ab["n_a"], ab["n_b"], ab["n_common"]) == (2, 2, 1)
    assert abs(ab["jaccard"] - 1 / 3) < 1e-5
    assert rows[("srcA", "srcC")]["n_common"] == 0
    assert rows[("srcA", "srcC")]["jaccard"] == 0.0
    ad = rows[("srcA", "srcD")]
    assert (ad["n_a"], ad["n_b"], ad["n_common"], ad["jaccard"]) == (2, 0, 0, 0.0)
