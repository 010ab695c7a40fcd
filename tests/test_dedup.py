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


def _persistent_rdd_ids(spark):
    return {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}


def test_minhash_lsh_pairs_releases_shingle_cache(spark, sf_dir):
    # Cache lifecycle: at most ONE checkpointed RDD may outlive the call
    # — the LINEAR per-doc shingle-array table the lazy pair listing
    # reads from (auto-cleaned when the returned DF is dropped).  The
    # pair OUTPUT must never be materialized (family-quadratic; the
    # 100x finding recorded in BASELINE).
    from flink_infotheoretic_feature_selection_spark.operators.dedup import minhash_lsh_pairs

    before = _persistent_rdd_ids(spark)
    pairs = minhash_lsh_pairs(spark, sf_dir)
    assert pairs.count() > 0
    new = _persistent_rdd_ids(spark) - before
    assert len(new) <= 1, f"stray cached RDDs beyond the result: {new}"


def test_simhash_pairs_banding_is_exact(spark, sf_dir):
    # Pigeonhole exactness: chunk-banded candidates + Hamming filter must
    # equal brute-force all-pairs Hamming <= 3 over the signatures.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import simhash, simhash_pairs

    sigs = {r["doc_id"]: r["simhash"] for r in simhash(spark, sf_dir).collect()}
    ids = sorted(sigs)
    expect = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in simhash_pairs(spark, sf_dir).collect()}
    assert got == expect
    assert len(got) > 0


def test_simhash_pairs_rejects_unbandable_threshold(spark):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import _simhash_pairs_sql

    with pytest.raises(ValueError, match="max_hamming"):
        _simhash_pairs_sql(duck=False, max_hamming=4)


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_simhash64_pairs_banding_is_exact(spark, sf_dir, hash_fn):
    # Same pigeonhole-exactness pin as the 28-bit test, for the 64-bit
    # variant — both token hashes (xxhash64 production default, md5
    # oracle twin) through the shared banding.  Signatures are signed
    # int64: mask the XOR to 64 bits before popcount (bin() of a
    # negative Python int would count sign-magnitude bits, not
    # two's-complement bits).
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        simhash64,
        simhash64_pairs,
    )

    sigs = {
        r["doc_id"]: r["simhash64"]
        for r in simhash64(spark, sf_dir, hash_fn=hash_fn).collect()
    }
    ids = sorted(sigs)
    mask = (1 << 64) - 1

    def ham(a, b):
        return bin((sigs[a] ^ sigs[b]) & mask).count("1")

    expect = {
        (a, b, ham(a, b))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(a, b) <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash64_pairs(spark, sf_dir, hash_fn=hash_fn).collect()
    }
    assert got == expect


def test_simhash64_golden_fixture_matches_live_signatures(spark, sf_dir):
    # The frozen fixture (fixtures/simhash64_xxhash64_sigs.parquet) is
    # the DuckDB oracles' signature source for the production xxhash64
    # gates; it must equal the LIVE signature expression for every
    # corpus doc, joined on the same exact-content key the oracle uses.
    # If the signature math drifts, this fails before the driver does.
    import os

    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.operators.dedup import with_simhash64

    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "flink_infotheoretic_feature_selection_spark",
        "fixtures",
        "simhash64_xxhash64_sigs.parquet",
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    live = with_simhash64(docs).select(
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp"),
        F.expr("shiftrightunsigned(simhash64, 32)").alias("hi"),
        F.expr("simhash64 & 4294967295").alias("lo"),
    )
    frozen = spark.read.parquet(fixture)
    joined = live.join(frozen, "fp", "left").collect()
    assert joined, "corpus empty?"
    for r in joined:
        assert r["sig_hi"] is not None, "doc text missing from golden fixture"
        assert (r["hi"], r["lo"]) == (r["sig_hi"], r["sig_lo"])


def test_simhash64_deterministic_and_64bit_wide(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import simhash64

    a = sorted(tuple(r) for r in simhash64(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in simhash64(spark, sf_dir).collect())
    assert a == b
    # bits above the 28-bit oracle range must actually be live
    assert any(sig < 0 or sig >= (1 << 28) for _, sig in a)


def test_simhash64_desaturates_template_corpus(spark):
    # The round-3 scale finding: 28-bit signatures saturate on the real
    # corpus (45% of ALL doc pairs at sf0.01 land within Hamming 3 —
    # quadratic intra-bucket pair blowup at 100 TB).  The 64-bit
    # xxhash64 variant must shrink the pair volume by >= 10x on the same
    # corpus (measured: ~52x).
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        simhash64_pairs,
        simhash_pairs,
    )
    from tests.conftest import SF_CORRECT

    p28 = simhash_pairs(spark, SF_CORRECT).count()
    p64 = simhash64_pairs(spark, SF_CORRECT).count()
    assert p64 > 0
    assert p28 >= 10 * p64, f"expected >=10x shrink, got {p28} -> {p64}"


def test_simhash64_pairs_rejects_unbandable_threshold(spark):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import simhash64_pairs

    with pytest.raises(ValueError, match="max_hamming"):
        simhash64_pairs(spark, "/root/testdata/sf0.001", max_hamming=8)


def test_dedup_star_import_matches_all(spark):
    # Round-2 regression: __all__ advertised names that didn't exist, so
    # `from ...dedup import *` raised ImportError. Pin that every __all__
    # entry resolves.
    ns = {}
    exec("from flink_infotheoretic_feature_selection_spark.operators.dedup import *", ns)
    import flink_infotheoretic_feature_selection_spark.operators.dedup as d

    missing = [n for n in d.__all__ if n not in ns]
    assert not missing, missing


def test_decontaminate_drop_and_flag(spark):
    # train doc 10 shares the trigram "alpha beta gamma" with eval doc 1;
    # train doc 11 shares nothing; train doc 12 is too short for trigrams.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (10, "the alpha beta gamma sequence appears here"),
            (11, "completely unrelated training content goes here"),
            (12, "too short"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, "benchmark question alpha beta gamma answer")],
        "doc_id long, text string",
    )

    flagged = {(r.doc_id, r.n_hits) for r in decontaminate(train, ev, mode="flag").collect()}
    assert flagged == {(10, 1)}

    kept = {r.doc_id for r in decontaminate(train, ev, mode="drop").collect()}
    assert kept == {11, 12}

    with pytest.raises(ValueError, match="mode"):
        decontaminate(train, ev, mode="bogus")


def test_decontaminate_boilerplate_cap(spark):
    # A shingle present in MANY training docs is boilerplate, not
    # contamination: with the cap below its train doc-frequency no doc is
    # flagged through it; without the cap all of them are.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import decontaminate

    train = spark.createDataFrame(
        [(i, f"click here now unique{i} tail{i}") for i in range(20)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, "eval doc also says click here now")], "doc_id long, text string"
    )
    capped = decontaminate(train, ev, mode="flag", max_train_df=10)
    assert capped.count() == 0
    uncapped = decontaminate(train, ev, mode="flag", max_train_df=None)
    assert uncapped.count() == 20


def test_sparse_hist_gate_queries_release_cache(spark, sf_dir):
    # Round-3 finding: the sparse-hist gate queries persisted their base
    # matrix and never released it — a leaked cache per gate sweep.  The
    # queries now materialize (dims-bounded) then unpersist; nothing may
    # stay cached after the call returns.
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    before = _persistent_rdd_ids(spark)
    qs = entry_mod.queries()
    assert qs["sparse_hist2d"](spark, sf_dir).count() > 0
    assert qs["sparse_hist3d"](spark, sf_dir).count() > 0
    assert _persistent_rdd_ids(spark) - before == set(), "leaked cached RDDs"


@pytest.fixture()
def shared_substring_docs(spark):
    # One 120-char region shared VERBATIM by docs 1 and 2, placed at
    # different character offsets whose difference (13) is coprime to the
    # anchor modulus 7 — under fixed-stride sampling the two copies would
    # sample disjoint window sets and the duplicate would be invisible.
    shared = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the late afternoon sun"
    )
    assert len(shared) >= 100
    rows = [
        (1, shared + " unique tail for document one goes here"),
        (2, "a prefix of 13c " + shared),
        (3, "entirely unrelated content that repeats nothing from the others at all"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "documents"
    )
    yield shared
    spark.catalog.dropTempView("documents")


def test_substring_profile_is_alignment_invariant(spark, shared_substring_docs):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        _substring_profile_sql,
    )

    rows = {
        r["doc_id"]: r
        for r in spark.sql(_substring_profile_sql(duck=False, L=30, mod=7)).collect()
    }
    # Both copies of the shared region are detected despite the 13-char
    # offset shift (13 % 7 != 0): content-defined anchors select the same
    # RELATIVE positions inside the region in both docs.
    assert rows[1]["n_dup_windows"] >= 1
    assert rows[2]["n_dup_windows"] >= 1
    assert rows[1]["n_dup_windows"] == rows[2]["n_dup_windows"] >= 1
    # The unique doc shares nothing.
    assert rows[3]["n_dup_windows"] == 0
    assert rows[3]["dup_frac"] == 0.0


def test_substring_spans_merge_and_cover_shared_region(spark, shared_substring_docs):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        _substring_spans_sql,
    )

    shared = shared_substring_docs
    spans = spark.sql(_substring_spans_sql(duck=False, L=30, mod=7)).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # One contiguous shared region → overlapping windows merge into ONE
    # span per doc (the whole point of the island pass).
    assert set(by_doc) == {1, 2}
    assert len(by_doc[1]) == 1 and len(by_doc[2]) == 1
    s1, s2 = by_doc[1][0], by_doc[2][0]
    # Spans sit inside the true shared range (1-based, inclusive).
    assert 1 <= s1["span_start"] <= s1["span_end"] <= len(shared)
    off = len("a prefix of 13c ")
    assert off + 1 <= s2["span_start"] <= s2["span_end"] <= off + len(shared)
    # Alignment invariance again: identical relative extents in both docs.
    assert s2["span_start"] - s1["span_start"] == off
    assert s2["span_end"] - s1["span_end"] == off


def test_scrub_dup_spans_cuts_exactly_the_spans(spark, shared_substring_docs):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        _scrub_spans_sql,
        _substring_spans_sql,
    )

    originals = {r["doc_id"]: r["text"] for r in spark.sql("SELECT * FROM documents").collect()}
    spans = spark.sql(_substring_spans_sql(duck=False, L=30, mod=7)).collect()
    scrubbed = {
        r["doc_id"]: r for r in spark.sql(_scrub_spans_sql(duck=False, L=30, mod=7)).collect()
    }
    # Doc without duplicated spans passes through untouched.
    assert scrubbed[3]["clean_text"] == originals[3]
    assert scrubbed[3]["n_cut_chars"] == 0
    # Docs with spans: the rebuilt text equals python-side surgery on the
    # same span list, and the cut count is the summed span lengths.
    by_doc = {}
    for s in spans:
        by_doc.setdefault(s["doc_id"], []).append((s["span_start"], s["span_end"]))
    for doc_id, cuts in by_doc.items():
        text = originals[doc_id]
        expect, pos = [], 1
        for a, b in sorted(cuts):
            expect.append(text[pos - 1 : a - 1])
            pos = b + 1
        expect.append(text[pos - 1 :])
        assert scrubbed[doc_id]["clean_text"] == "".join(expect), doc_id
        assert scrubbed[doc_id]["n_cut_chars"] == sum(b - a + 1 for a, b in cuts)
        assert len(scrubbed[doc_id]["clean_text"]) < len(text)


def test_substring_profile_skips_docs_with_zero_anchors(spark):
    # Regression: a doc >= L chars where NO position passes the anchor
    # filter leaves the position array EMPTY, and Spark's OUTER explode
    # then emits one NULL-pos row — which surfaced as a phantom window
    # (n_windows=1) for 4/5000 docs at sf0.1 while the DuckDB twin
    # (plain unnest of an empty list = no rows) skipped them.  This text
    # is one of those sf0.1 docs: both engines must now omit it.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        _substring_profile_sql,
    )

    zero_anchor = "the query the join query join big hash spark the scan"
    rows = [(1, zero_anchor), (2, "x" * 10)]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "documents"
    )
    try:
        out = spark.sql(_substring_profile_sql(duck=False, L=30, mod=7)).collect()
        assert out == [], out
    finally:
        spark.catalog.dropTempView("documents")


def test_substring_arrow_route_equals_sql_route(spark):
    # The engine path (vectorized mapInArrow windows + temp-view tails)
    # and the pure-SQL Spark dialect must produce IDENTICAL rows — same
    # anchors, same grams, same aggregates.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        _substring_profile_sql,
        _substring_spans_sql,
        substring_dup_profile,
        substring_dup_spans,
    )

    sf = "/root/testdata/sf0.001"
    spark.read.parquet(f"{sf}/documents.parquet").createOrReplaceTempView("documents")
    try:
        for engine_fn, sql_fn in (
            (substring_dup_profile, _substring_profile_sql),
            (substring_dup_spans, _substring_spans_sql),
        ):
            via_arrow = sorted(map(tuple, engine_fn(spark, sf).collect()))
            via_sql = sorted(
                map(tuple, spark.sql(sql_fn(duck=False, L=30, mod=7)).collect())
            )
            assert via_arrow == via_sql
    finally:
        spark.catalog.dropTempView("documents")


def test_simhash64_components_match_bruteforce_cc(spark, sf_dir):
    # The linear-output grouped form must induce EXACTLY the components
    # of the quadratic pair listing: union-find over simhash64_pairs
    # (plus singletons for unpaired docs) == simhash64_components.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        simhash64,
        simhash64_components,
        simhash64_pairs,
    )

    all_ids = [r["doc_id"] for r in simhash64(spark, sf_dir).collect()]
    parent = {d: d for d in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in simhash64_pairs(spark, sf_dir).collect():
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    expected = {d: find(d) for d in all_ids}

    got = {
        r["doc_id"]: r["component"]
        for r in simhash64_components(spark, sf_dir).collect()
    }
    assert got == expected


def test_shingle_arrays_match_sql_semantics_on_edge_whitespace(spark):
    # Review finding: SQL trim() strips ONLY the space character, and
    # Spark's split keeps leading/trailing empty tokens — docs edged
    # with tabs/newlines must tokenize identically in the Arrow build.
    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        doc_shingle_arrays,
    )

    rows = [
        (1, "\tword1 word2 word3"),
        (2, "a b\t"),
        (3, "  plain doc here  "),
        (4, "\nx y z\n"),
        (5, None),
        (6, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sql_route = (
        docs.select("doc_id", F.expr(r"split(trim(lower(text)), '\\s+')").alias("ts"))
        .where(F.size("ts") >= 3)
        .select(
            "doc_id",
            F.expr(
                "array_distinct(transform(sequence(1, size(ts) - 2),"
                " i -> concat_ws(' ', slice(ts, i, 3))))"
            ).alias("shingles"),
        )
    )
    expected = {r["doc_id"]: r["shingles"] for r in sql_route.collect()}
    got = {r["doc_id"]: r["shingles"] for r in doc_shingle_arrays(docs, 3).collect()}
    assert got == expected
    # the tab-edged docs must actually be present with the empty token
    assert expected[1][0].startswith(" word1")


def test_shingle_arrays_pass_through_string_doc_ids(spark):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        doc_shingle_arrays,
    )

    docs = spark.createDataFrame(
        [("docA", "one two three four")], "doc_id string, text string"
    )
    out = doc_shingle_arrays(docs, 3).collect()
    assert out[0]["doc_id"] == "docA"
    assert out[0]["shingles"] == ["one two three", "two three four"]


def test_substring_arrow_handles_L_shorter_than_anchor(spark):
    # Review finding: for L < SUBSTR_ANCHOR the tail positions' anchors
    # are truncated by the doc end; the Arrow route must match the SQL
    # twin instead of crashing or silently dropping positions.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        _substring_profile_sql,
        substring_dup_profile,
    )
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    rows = {
        "doc_id": [1, 2, 3],
        "text": ["abcdef", "abcdef", "zzzzz"],  # len 6 and 5, L=5 < A=8
    }
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"doc_id": pa.array(rows["doc_id"], pa.int64()),
                      "text": pa.array(rows["text"], pa.string())}),
            os.path.join(d, "documents.parquet"),
        )
        via_arrow = sorted(
            map(tuple, substring_dup_profile(spark, d, L=5, mod=2).collect())
        )
        spark.read.parquet(os.path.join(d, "documents.parquet")).createOrReplaceTempView("documents")
        try:
            via_sql = sorted(
                map(tuple, spark.sql(_substring_profile_sql(duck=False, L=5, mod=2)).collect())
            )
        finally:
            spark.catalog.dropTempView("documents")
    assert via_arrow == via_sql
    assert via_arrow  # the short docs must actually produce windows


def test_lsh_banding_knob_recall_ordering(spark, sf_dir):
    # Same hash family: a k-row band match implies k single-row matches,
    # so 1-row bands admit a superset of the default 2-row banding's
    # candidates — and therefore of its VERIFIED pairs.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    import pytest as _pytest

    default = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark, sf_dir).collect()
    }
    max_recall = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark, sf_dir, n_hashes=8, n_bands=8).collect()
    }
    assert default <= max_recall
    with _pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(spark, sf_dir, n_hashes=8, n_bands=3)


def test_simhash64_golden_values_sf001(spark):
    # The two xxhash64 gates are rows-only in the DuckDB gate (no
    # cross-engine analogue), so freeze a golden sample of the signature
    # function itself: any semantic drift in tokenization, weighting,
    # bit-fold, or the xxhash64 seed shows up here as a value diff, the
    # same protection a hash-green oracle row gives the other gates.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import simhash64

    golden = {
        0: -2692730926242927465, 1: -310405887639241071,
        2: -2314362724286284048, 3: -296747754157064464,
        4: -364455680774600016, 5: 4224716737545808401,
        6: -346438379421459276, 7: -4998655299308843503,
        8: -4922093006166517616, 9: -4998653100302356976,
        10: -292312599742005600, 11: -4998653100281320815,
        12: -1521875561782794064, 13: -382465955577812335,
        14: -386973678945718640, 15: -1521872263289520495,
        16: 4242740740112812208, 17: -2674791294507241808,
        18: -296897288342102863, 19: -3574382038180513648,
    }
    got = {
        r["doc_id"]: r["simhash64"]
        for r in simhash64(spark, "/root/testdata/sf0.01").collect()
        if r["doc_id"] in golden
    }
    assert got == golden


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_simhash64_vectorized_bit_equals_expression_route(spark, sf_dir, hash_fn):
    # The Arrow reduceat kernel must reproduce the expression route's
    # signatures EXACTLY (integer-only math end to end — unlike the
    # vectorized cosine kernels there is no float-order caveat).
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        simhash64,
        simhash64_vectorized,
    )

    a = sorted(tuple(r) for r in simhash64(spark, sf_dir, hash_fn=hash_fn).collect())
    b = sorted(
        tuple(r) for r in simhash64_vectorized(spark, sf_dir, hash_fn=hash_fn).collect()
    )
    assert a == b


def test_simhash64_components_vectorized_matches_expression(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        simhash64_components,
    )

    # r9: vectorized is the DEFAULT — compare both routes explicitly
    a = sorted(
        tuple(r)
        for r in simhash64_components(spark, sf_dir, vectorized=False).collect()
    )
    b = sorted(
        tuple(r) for r in simhash64_components(spark, sf_dir, vectorized=True).collect()
    )
    assert a == b


def test_simhash64_vectorized_null_text_matches_expression_route(spark, tmp_path):
    # The expression route emits signature 0 for a NULL text (the null
    # majority condition falls through IF's 0-branch at every bit); the
    # vectorized kernel must not crash on len(None) and must emit the
    # same 0.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        simhash64,
        simhash64_vectorized,
    )

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["hello world", None, "spark rocks"], pa.string()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    a = sorted((r.doc_id, r.simhash64) for r in simhash64(spark, str(tmp_path)).collect())
    b = sorted(
        (r.doc_id, r.simhash64)
        for r in simhash64_vectorized(spark, str(tmp_path)).collect()
    )
    assert a == b
    assert (2, 0) in b


def test_minhash_vectorized_bit_equals_sql_route(spark, sf_dir):
    # The Arrow rolling-hash/min-hash kernel must reproduce the SQL
    # route's signatures exactly (integer-only math end to end).
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_vectorized,
    )

    a = sorted(tuple(r) for r in minhash_signatures(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in minhash_signatures_vectorized(spark, sf_dir).collect())
    assert a == b
    assert len(a) > 0


def test_minhash_lsh_pairs_vectorized_matches_expression(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    # r9: vectorized is the DEFAULT — compare both routes explicitly
    a = sorted(
        tuple(r) for r in minhash_lsh_pairs(spark, sf_dir, vectorized=False).collect()
    )
    b = sorted(
        tuple(r) for r in minhash_lsh_pairs(spark, sf_dir, vectorized=True).collect()
    )
    assert a == b


@pytest.mark.parametrize("which", ["simhash64", "minhash"])
def test_signature_kernels_property_random_corpora(spark, tmp_path, which):
    # Property pin: on arbitrary text — unicode (incl. astral plane),
    # every Java-\s whitespace char, empty/short docs — the Arrow
    # kernels must stay bit-identical to the gated expression/SQL
    # routes.  One corpus of hypothesis-generated docs per variant
    # (single Spark round-trip keeps the property affordable).
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_vectorized,
        simhash64,
        simhash64_vectorized,
    )

    alphabet = st.sampled_from(
        list("ab \t\n\x0b\f\r") + ["é", "中", "\U0001d11e", "\U0001f600", "0", "."]
    )
    texts_strategy = st.lists(
        st.one_of(st.none(), st.text(alphabet, max_size=40)), min_size=1, max_size=25
    )
    case = [0]

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=texts_strategy)
    def check(texts):
        case[0] += 1
        d = tmp_path / f"{which}_{case[0]}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        if which == "simhash64":
            a = sorted(tuple(r) for r in simhash64(spark, str(d)).collect())
            b = sorted(tuple(r) for r in simhash64_vectorized(spark, str(d)).collect())
        else:
            a = sorted(tuple(r) for r in minhash_signatures(spark, str(d)).collect())
            b = sorted(
                tuple(r)
                for r in minhash_signatures_vectorized(spark, str(d)).collect()
            )
        assert a == b, texts

    check()


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_simhash64_incremental_matches_bruteforce(spark, sf_dir, hash_fn):
    # Incremental ingest semantics pinned against a brute-force replay:
    # for each batch doc, dup_of = the minimal-id near-duplicate among
    # corpus docs and EARLIER batch docs (so a burst of mutual dups
    # keeps exactly its first member), NULL when novel.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        simhash64,
        simhash64_incremental,
    )

    sigs = {
        r["doc_id"]: r["simhash64"]
        for r in simhash64(spark, sf_dir, hash_fn=hash_fn).collect()
    }
    mask = (1 << 64) - 1

    def ham(a, b):
        return bin((sigs[a] ^ sigs[b]) & mask).count("1")

    batch = sorted(d for d in sigs if d % 10 == 0)
    expect = {}
    for n in batch:
        cands = [
            t
            for t in sigs
            if t != n and (t % 10 != 0 or t < n) and ham(n, t) <= 3
        ]
        if cands:
            best = min(cands)
            expect[n] = (best, ham(n, best))
        else:
            expect[n] = (None, None)

    got = {
        r["doc_id"]: (r["dup_of"], r["hamming"])
        for r in simhash64_incremental(spark, sf_dir, hash_fn=hash_fn).collect()
    }
    assert got == expect
    # output is linear in the batch, never in the corpus
    assert set(got) == set(batch)
    # at least one dup and one novel doc, or the fixture checks nothing
    assert any(v[0] is not None for v in got.values())
    assert any(v[0] is None for v in got.values())


def test_simhash64_incremental_rejects_unbandable_threshold(spark):
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        simhash64_incremental,
    )

    with pytest.raises(ValueError, match="max_hamming"):
        simhash64_incremental(spark, "/root/testdata/sf0.001", max_hamming=8)


def test_lsh_bucket_cap_drops_hot_band_buckets(spark, tmp_path):
    # Mirror of the jaccard max_df guard at the band level: 40 docs
    # sharing one band bucket (identical text -> identical signatures)
    # explode quadratically without the cap and vanish with it, while
    # a small legitimate dup pair survives capping.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    hot = "alpha beta gamma delta epsilon zeta eta theta"
    legit_a = "unique tokens one two three four five six seven"
    legit_b = "unique tokens one two three four five six eight"
    rows = [(i, hot) for i in range(40)] + [(100, legit_a), (101, legit_b)]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    d = tmp_path / "hotlsh"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    uncapped = minhash_lsh_pairs(spark, str(d), max_bucket=None)
    got_uncapped = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    assert (100, 101) in got_uncapped
    assert len(got_uncapped) == 40 * 39 // 2 + 1

    capped = minhash_lsh_pairs(spark, str(d), max_bucket=10)
    got_capped = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert got_capped == {(100, 101)}


def test_simhash64_incremental_property_random_corpora(spark, tmp_path):
    # Property pin for the signature-level incremental redesign: on
    # arbitrary corpora — null/empty docs, identical-text bursts (the
    # small alphabet forces signature families, exercising the
    # per-(signature, side) argmin pre-agg) — the op must equal the
    # brute-force replay over its own signatures.
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        simhash64,
        simhash64_incremental,
    )

    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    doc = st.lists(word, min_size=0, max_size=6).map(" ".join)
    texts_strategy = st.lists(
        st.one_of(st.none(), doc), min_size=3, max_size=20
    )
    case = [0]
    mask = (1 << 64) - 1

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=texts_strategy)
    def check(texts):
        case[0] += 1
        d = tmp_path / f"incr_{case[0]}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        sigs = {
            r["doc_id"]: r["simhash64"] for r in simhash64(spark, str(d)).collect()
        }

        def ham(a, b):
            return bin((sigs[a] ^ sigs[b]) & mask).count("1")

        expect = {}
        for n in sigs:
            if n % 10 != 0:
                continue
            if sigs[n] is None:
                expect[n] = (None, None)
                continue
            cands = [
                t
                for t in sigs
                if t != n
                and sigs[t] is not None
                and (t % 10 != 0 or t < n)
                and ham(n, t) <= 3
            ]
            expect[n] = (
                (min(cands), ham(n, min(cands))) if cands else (None, None)
            )
        got = {
            r["doc_id"]: (r["dup_of"], r["hamming"])
            for r in simhash64_incremental(spark, str(d)).collect()
        }
        assert got == expect, texts

    check()


def test_simhash64_incremental_vectorized_matches_expression(spark):
    # The Arrow signature kernel slots into the incremental probe the
    # same way as components; outputs must be identical.
    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        simhash64_incremental,
    )
    from tests.conftest import SF_CORRECT

    # r9: vectorized is the DEFAULT — compare both routes explicitly
    a = sorted(
        tuple(r)
        for r in simhash64_incremental(spark, SF_CORRECT, vectorized=False).collect()
    )
    b = sorted(
        tuple(r)
        for r in simhash64_incremental(spark, SF_CORRECT, vectorized=True).collect()
    )
    assert a == b and len(a) > 0


def test_decontaminate_bloom_identical_to_exact(spark, sf_dir):
    # r11: the Bloom pre-filter must change the PLAN, never the answer —
    # both modes bit-equal to the exact operator, and the filter must
    # actually prune (survivor shingles well under the train total, but
    # a superset of the true matches by Bloom's no-false-negatives law)
    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        DECONTAMINATE_EVAL_PRED,
        decontaminate,
        decontaminate_bloom,
        doc_shingles,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.expr(DECONTAMINATE_EVAL_PRED))
    tr = docs.where(~F.expr(DECONTAMINATE_EVAL_PRED))

    exact_flag = {(r.doc_id, r.n_hits) for r in decontaminate(tr, ev, mode="flag").collect()}
    bloom_flag = {(r.doc_id, r.n_hits) for r in decontaminate_bloom(tr, ev, mode="flag").collect()}
    assert exact_flag == bloom_flag and exact_flag

    exact_drop = {r.doc_id for r in decontaminate(tr, ev, mode="drop").select("doc_id").collect()}
    bloom_drop = {r.doc_id for r in decontaminate_bloom(tr, ev, mode="drop").select("doc_id").collect()}
    assert exact_drop == bloom_drop

    # FP-rate sanity on DISJOINT shingle sets: the bitmap built from the
    # eval side must pass almost nothing from a train side that shares
    # no shingles (16 bits/key, 7 probes -> ~4e-4 expected)
    ev_sh = doc_shingles(ev).select("shingle").distinct()
    tr_sh = doc_shingles(tr).select("shingle").distinct().join(ev_sh, "shingle", "left_anti")
    n_disjoint = tr_sh.count()
    survivors = decontaminate_bloom(
        tr_sh.withColumnRenamed("shingle", "text").selectExpr(
            "monotonically_increasing_id() AS doc_id", "text"
        ),
        ev,
        n=3,
        mode="flag",
    )
    # the disjoint corpus re-shingles its shingle strings, so just bound
    # the flagged docs: with no true overlap everything flagged is FP
    assert survivors.count() <= max(10, n_disjoint // 100)


def test_decontaminate_route_auto_chooser(spark, sf_dir):
    # r12 (VERDICT r11 ask #6): route="auto" picks exact when the
    # estimated distinct eval-shingle broadcast is under the budget
    # (sf0.01/sf0.001 eval sets: a few KB) and bloom above it; output is
    # route-independent by the bit-equality contract, re-checked here
    # through the auto entry point.  The gate path (route default
    # "exact") is untouched.
    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.operators.dedup import (
        DECONTAMINATE_EVAL_PRED,
        choose_decontaminate_route,
        decontaminate,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.expr(DECONTAMINATE_EVAL_PRED))
    tr = docs.where(~F.expr(DECONTAMINATE_EVAL_PRED))

    route, est = choose_decontaminate_route(ev)
    assert route == "exact" and 0 < est < 10 * 1024 * 1024
    # the estimate must be the right order of magnitude: true distinct
    # shingle bytes within 3x either way (approx_count_distinct + the
    # +48B/entry map overhead make it an estimate, not a count)
    from flink_infotheoretic_feature_selection_spark.operators.dedup import doc_shingles

    true_bytes = (
        doc_shingles(ev)
        .select("shingle")
        .distinct()
        .agg(F.sum(F.length("shingle") + F.lit(48)))
        .collect()[0][0]
    )
    assert true_bytes / 3 <= est <= true_bytes * 3

    # a tiny budget must flip the choice to bloom — and the auto entry
    # point must return the same answer either way
    assert choose_decontaminate_route(ev, threshold_bytes=100)[0] == "bloom"
    exact_out = {
        (r.doc_id, r.n_hits) for r in decontaminate(tr, ev, mode="flag").collect()
    }
    auto_bloom = {
        (r.doc_id, r.n_hits)
        for r in decontaminate(
            tr, ev, mode="flag", route="auto", broadcast_threshold_bytes=100
        ).collect()
    }
    auto_exact = {
        (r.doc_id, r.n_hits)
        for r in decontaminate(tr, ev, mode="flag", route="auto").collect()
    }
    assert exact_out == auto_bloom == auto_exact and exact_out

    import pytest as _pytest

    with _pytest.raises(ValueError, match="route"):
        decontaminate(tr, ev, route="fast")
