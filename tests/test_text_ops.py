"""Unit tests for text operators whose behavior the DuckDB gate can't
fully pin: PII scrubbing (testdata has no PII — crafted fixture here) and
sequence-packing invariants."""

import pytest
from pyspark.sql import functions as F

from flink_infotheoretic_feature_selection_spark.operators.text import (
    PACK_BUDGET,
    pack_sequences,
    scrub_pii,
)


def test_scrub_pii_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact alice.smith+x@example.com or bob@sub.example.org today"),
            (2, "see https://example.com/a?b=1 and http://test.io/path now"),
            (3, "card 1234567890 pin 99 zip 12345 serial 000111222333"),
            (4, "nothing sensitive here at all"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    # NULL text: counts must be 0 (legacy size(NULL) is -1 — guarded)
    assert (rows[5]["n_email"], rows[5]["n_url"], rows[5]["n_longnum"]) == (0, 0, 0)
    assert rows[5]["text"] == ""
    assert rows[1]["n_email"] == 2
    assert rows[1]["text"] == "contact <EMAIL> or <EMAIL> today"
    assert rows[2]["n_url"] == 2
    assert rows[2]["text"] == "see <URL> and <URL> now"
    # 6+ digit runs only: 99 and 12345 survive
    assert rows[3]["n_longnum"] == 2
    assert rows[3]["text"] == "card <NUM> pin 99 zip 12345 serial <NUM>"
    assert rows[4]["text"] == "nothing sensitive here at all"
    assert (rows[4]["n_email"], rows[4]["n_url"], rows[4]["n_longnum"]) == (0, 0, 0)


def test_pack_sequences_invariants(spark, sf_dir):
    out = pack_sequences(spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # every doc assigned exactly once
    assert len(out) == docs_n
    assert len({r["doc_id"] for r in out}) == docs_n

    # within a (shard, seq), docs start below the budget (overflow allowed
    # only past the LAST doc's start — offset-based first-fit contract)
    for r in out:
        assert r["tok_before"] - r["seq_id"] * PACK_BUDGET < PACK_BUDGET
        assert r["tok_before"] >= 0

    # per-shard sequence ids are dense from 0
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], set()).add(r["seq_id"])
    for shard, seqs in by_shard.items():
        assert seqs == set(range(max(seqs) + 1)), shard

    # sequences are actually filled: average fill of non-final sequences
    # is near the budget
    tok_by_seq = {}
    for r in out:
        k = (r["shard"], r["seq_id"])
        tok_by_seq[k] = tok_by_seq.get(k, 0) + r["n_tokens"]
    non_final = [
        v
        for (sh, sq), v in tok_by_seq.items()
        if sq < max(q for s, q in tok_by_seq if s == sh)
    ]
    assert non_final and min(non_final) >= PACK_BUDGET * 0.9


def test_pack_sequences_deterministic_under_repartition(spark, sf_dir):
    # content-addressed sharding + doc_id ordering: the assignment must
    # not depend on the physical partitioning of the input
    a = {(r["doc_id"], r["shard"], r["seq_id"]) for r in pack_sequences(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(13)
    docs.createOrReplaceTempView("documents")
    from flink_infotheoretic_feature_selection_spark.operators.text import _pack_sql

    b = {
        (r["doc_id"], r["shard"], r["seq_id"])
        for r in spark.sql(_pack_sql(duck=False)).collect()
    }
    assert a == b


def test_lm_score_matches_hand_computation(spark):
    # tiny corpus where the Laplace bigram math is checkable by hand
    import math

    from flink_infotheoretic_feature_selection_spark.operators.text import _lm_score_sql

    rows = [(1, "a b a b"), (2, "a b"), (3, "c")]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "documents"
    )
    try:
        got = {
            r["doc_id"]: (r["n_bigrams"], r["lm_logprob"])
            for r in spark.sql(_lm_score_sql(duck=False)).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")
    # unigrams: a x3, b x3, c x1 -> V = 3
    # bigrams: "a b" x3, "b a" x1
    p_ab = (3 + 1) / (3 + 3)  # cb(a b)=3, cu(a)=3, V=3
    p_ba = (1 + 1) / (3 + 3)
    doc1 = (2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    doc2 = math.log2(p_ab)
    assert got[1] == (3, round(doc1, 5))
    assert got[2] == (1, round(doc2, 5))
    assert 3 not in got  # single-token doc has no bigrams
    # fluent (corpus-typical) text outscores the rare transition
    assert got[2][1] > got[1][1]


def test_source_token_cap_budget_and_priority(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.text import source_token_cap

    out = source_token_cap(spark, sf_dir, budget=200).collect()
    assert out, "budget 200 must keep at least the first doc per source"
    by_source = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        # running total never exceeds the budget, and cum_tokens is an
        # exact prefix sum of the kept docs' n_tokens (no doc skipped
        # mid-prefix: survivors are a PREFIX of the priority order)
        rows.sort(key=lambda r: r["cum_tokens"])
        run = 0
        for r in rows:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run
            assert run <= 200


def test_source_token_cap_deterministic_vs_ids(spark, sf_dir):
    # Re-keying every doc_id (new ingest ids, same content) must keep
    # the same TEXTS per source: priority is content-hashed, not id-ed.
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        _source_token_cap_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept1 = spark.sql(_source_token_cap_sql(duck=False, budget=500))
    docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).createOrReplaceTempView(
        "documents"
    )
    kept2 = spark.sql(_source_token_cap_sql(duck=False, budget=500))
    t1 = {(r["source"], r["cum_tokens"]) for r in kept1.collect()}
    t2 = {(r["source"], r["cum_tokens"]) for r in kept2.collect()}
    assert t1 == t2


def test_epoch_shuffle_is_permutation_and_seed_sensitive(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.text import epoch_shuffle

    e1 = epoch_shuffle(spark, sf_dir, seed=1).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(e1) == n_docs
    # (shard, pos) is a proper dense ranking: unique, 1..n_in_shard
    slots = {(r["shard"], r["pos"]) for r in e1}
    assert len(slots) == n_docs
    for shard in {s for s, _ in slots}:
        poss = sorted(p for s, p in slots if s == shard)
        assert poss == list(range(1, len(poss) + 1))
    # a different epoch seed produces a genuinely different order
    e2 = {r["doc_id"]: (r["shard"], r["pos"]) for r in epoch_shuffle(spark, sf_dir, seed=2).collect()}
    moved = sum(1 for r in e1 if e2[r["doc_id"]] != (r["shard"], r["pos"]))
    assert moved > n_docs // 2


def _shard_sequences(rows):
    """shard -> tuple of doc_ids ordered by pos."""
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["doc_id"]))
    return {s: tuple(d for _, d in sorted(v)) for s, v in by_shard.items()}


def test_epoch_shuffle_within_shard_order_changes(spark, sf_dir):
    # The slot-moved assertion above passes trivially under a pure shard
    # ROTATION (every doc changes shard label, training order unchanged)
    # — which is exactly what an additive seed suffix produced: for
    # equal-length seed strings the polynomial hash differs by a
    # constant, so seed k+1 was seed k with shards rotated and the
    # within-shard sequences bit-identical.  Pin the real property: the
    # ordered doc lists must not survive ANY shard relabeling, i.e. no
    # multi-doc shard sequence from seed 1 may reappear verbatim under
    # seed 2 or 3 (consecutive AND equal-length seeds).
    from flink_infotheoretic_feature_selection_spark.operators.text import epoch_shuffle

    seqs = {
        s: _shard_sequences(epoch_shuffle(spark, sf_dir, seed=s).collect())
        for s in (1, 2, 3)
    }
    for s_a, s_b in ((1, 2), (2, 3), (1, 3)):
        a = {q for q in seqs[s_a].values() if len(q) >= 2}
        b = {q for q in seqs[s_b].values() if len(q) >= 2}
        assert a, "fixture must fill multi-doc shards"
        assert not (a & b), (
            f"seeds {s_a}/{s_b} share a verbatim within-shard training "
            f"sequence — seed mixing is degenerate (rotation, not shuffle)"
        )


def test_curation_ops_cross_engine_on_random_corpora(spark, tmp_path):
    # Randomized extension of the driver gate: the fixed synthetic
    # corpus exercises one text distribution; here hypothesis-generated
    # corpora (duplicate texts, null/empty/whitespace-only docs, unicode,
    # single-source and many-source layouts) must still produce
    # IDENTICAL rows from the Spark dialect and the DuckDB oracle for
    # the three content-keyed curation ops.  Alphabet excludes \x0B —
    # the DOCUMENTED Java-vs-RE2 \s boundary (dedup.py simhash64 note) —
    # and sticks to case-stable characters (Java lower() full case
    # mapping vs DuckDB simple mapping diverges on e.g. Turkish dotted I,
    # which production normalizes upstream; same contract class).
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_infotheoretic_feature_selection_spark.operators.text import (
        HASH_SPLIT_ORACLE,
        epoch_shuffle,
        epoch_shuffle_oracle,
        hash_split,
        source_token_cap,
        source_token_cap_oracle,
    )

    alphabet = st.sampled_from(list("ab \t\n\f\r.,;-01") + ["é", "中"])
    docs_strategy = st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(alphabet, max_size=30)),
            st.sampled_from(["s1", "s2", "s3"]),
        ),
        min_size=1,
        max_size=20,
    )
    case = [0]

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=docs_strategy, seed=st.integers(1, 99))
    def check(docs, seed):
        case[0] += 1
        d = tmp_path / f"corpus_{case[0]}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array([t for t, _ in docs], pa.string()),
                    "source": pa.array([s for _, s in docs], pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        duck = duckdb.connect()
        duck.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
        )
        pairs = [
            (hash_split(spark, str(d)), HASH_SPLIT_ORACLE),
            (source_token_cap(spark, str(d), budget=40),
             source_token_cap_oracle(budget=40)),
            (epoch_shuffle(spark, str(d), seed=seed),
             epoch_shuffle_oracle(seed=seed)),
        ]
        for sdf, osql in pairs:
            got = sorted(tuple(r) for r in sdf.collect())
            exp = sorted(tuple(r) for r in duck.execute(osql).fetchall())
            assert got == exp, (docs, seed, osql[:80], got[:5], exp[:5])
        duck.close()

    check()


# ---------------------------------------------------------------------------
# Exact BPE tokenizer (r11, VERDICT ask #3)
# ---------------------------------------------------------------------------

def _bpe_ranks():
    from flink_infotheoretic_feature_selection_spark.operators.text import _load_bpe_fixture

    fx = _load_bpe_fixture()
    return {tuple(m): i for i, m in enumerate(fx["merges"])}


def test_bpe_encode_word_golden():
    # GOLDEN-pinned encodings against the frozen sf0.01 merges fixture
    # (like the simhash64 xxhash64 goldens): these fail loudly if the
    # fixture or the encoder algebra ever drifts.  Hand-traceable:
    # 'fast' -> (s,t) is rank 4, (a,s) rank 12 never applies afterwards
    # because the canonical loop takes the LOWEST rank present first.
    from flink_infotheoretic_feature_selection_spark.operators.text import bpe_encode_word

    ranks = _bpe_ranks()
    assert bpe_encode_word("fast", ranks) == ["f", "a", "st"]
    assert bpe_encode_word("customer", ranks) == ["customer"]
    assert bpe_encode_word("sorting", ranks) == ["s", "or", "t", "in", "g"]
    assert bpe_encode_word("vectorized", ranks) == ["vector", "i", "z", "e", "d"]
    assert bpe_encode_word("x", ranks) == ["x"]
    assert bpe_encode_word("stst", ranks) == ["st", "st"]


def test_bpe_sql_route_boundary_encoding(spark):
    # the sentinel regression ('s' merge pattern matching inside 'st'
    # etc.): adversarial single-word docs through the FULL SQL chain
    # must equal the canonical iterative encoder
    import duckdb

    from flink_infotheoretic_feature_selection_spark.operators.text import (
        _tokenize_bpe_sql,
        bpe_encode_word,
    )

    words = ["fast", "stst", "asst", "aas", "sta", "keykey", "atat",
             "valuevalue", "join", "joinjoin", "a", "", "x.y!z"]
    ranks = _bpe_ranks()
    import re
    pat = re.compile(r"[a-z]+|[0-9]|[^a-z0-9\s]")

    def expect(text):
        toks = [t for w in pat.findall(text.lower()) for t in bpe_encode_word(w, ranks)]
        return len(toks)

    sdf = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    sdf.createOrReplaceTempView("documents")
    got = {r.doc_id: r.n_bpe_exact for r in spark.sql(_tokenize_bpe_sql(duck=False)).collect()}
    for i, w in enumerate(words):
        assert got[i] == expect(w), (w, got[i], expect(w))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{w.replace(chr(39), chr(39)*2)}')" for i, w in enumerate(words))
                + ") t(doc_id, text)")
    for doc_id, n, _md5 in con.execute(_tokenize_bpe_sql(duck=True)).fetchall():
        assert n == expect(words[doc_id]), (words[doc_id], n)


def test_tokenize_bpe_three_route_parity(spark, sf_dir):
    # SQL rank-order replace chain vs canonical iterative Arrow kernel:
    # count AND md5 fingerprint bit-equal per doc (the equivalence
    # theorem re-proved on real data)
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        tokenize_bpe,
        tokenize_bpe_vectorized,
    )

    a = {r.doc_id: (r.n_bpe_exact, r.bpe_md5) for r in tokenize_bpe(spark, sf_dir).collect()}
    b = {r.doc_id: (r.n_bpe_exact, r.bpe_md5) for r in tokenize_bpe_vectorized(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_pack_sequences_token_counts_param_pins_exact_budgets(spark, sf_dir):
    # the token_counts= twin must reproduce pack_sequences_exact (same
    # shard hash, same packing rule, budgets on the EXACT counts), and
    # the exact counts must actually differ from the whitespace
    # approximation for some docs (else this pins nothing)
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        pack_sequences_exact,
        tokenize_bpe_vectorized,
    )

    exact = {r.doc_id: tuple(r) for r in pack_sequences_exact(spark, sf_dir).collect()}
    tc = tokenize_bpe_vectorized(spark, sf_dir).selectExpr(
        "doc_id", "n_bpe_exact AS n_tokens"
    )
    via_param = {
        r.doc_id: tuple(r)
        for r in pack_sequences(spark, sf_dir, token_counts=tc).collect()
    }
    assert exact == via_param
    approx = {r.doc_id: tuple(r) for r in pack_sequences(spark, sf_dir).collect()}
    assert any(exact[k][3] != approx[k][3] for k in exact), (
        "exact BPE counts never differ from whitespace counts — fixture too weak"
    )


def test_source_token_cap_token_counts_param(spark, sf_dir):
    # exact-count twin for the domain cap (r11): same priority hashes and
    # cumsum rule, budgets on the provided exact counts.  Verified by
    # recomputing the expected survivor set from the approximate run's
    # full ordering re-weighted with exact counts via a DuckDB replay.
    import duckdb

    from flink_infotheoretic_feature_selection_spark.operators.text import (
        SOURCE_TOKEN_BUDGET,
        source_token_cap,
        tokenize_bpe_vectorized,
    )

    tc = tokenize_bpe_vectorized(spark, sf_dir).selectExpr(
        "doc_id", "n_bpe_exact AS n_tokens"
    )
    got = {r.doc_id: (r.n_tokens, r.cum_tokens) for r in
           source_token_cap(spark, sf_dir, token_counts=tc).collect()}

    # independent replay: DuckDB computes the same cap over the exact
    # counts exported from the Spark encoder
    counts = {r.doc_id: r.n_tokens for r in tc.collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    con.execute("CREATE TABLE tc (doc_id BIGINT, n_tokens INT)")
    con.executemany("INSERT INTO tc VALUES (?, ?)", list(counts.items()))
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        rolling_hash_expr_duckdb,
    )
    rh = rolling_hash_expr_duckdb("lower(trim(text))")
    rh2 = rolling_hash_expr_duckdb("lower(trim(text))", mult=131)
    exp = {row[0]: (row[1], row[2]) for row in con.execute(f"""
        WITH pr AS (
          SELECT d.doc_id, d.source, CAST(t.n_tokens AS BIGINT) AS n_tokens,
                 {rh} AS prio, {rh2} AS prio2
          FROM documents d JOIN tc t USING (doc_id)),
        c AS (
          SELECT doc_id, n_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY source
                      ORDER BY prio, prio2, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
          FROM pr)
        SELECT doc_id, CAST(n_tokens AS INT), cum_tokens
        FROM c WHERE cum_tokens <= {SOURCE_TOKEN_BUDGET}
    """).fetchall()}
    assert got == exp and len(got) > 0


def test_bpe_routes_agree_on_unicode_whitespace(spark):
    # r11 review find: Python's default \s is Unicode (swallows U+00A0)
    # where Spark's Java \s is ASCII — the vectorized route must
    # pretokenize with re.ASCII so non-breaking-space text agrees
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        _tokenize_bpe_sql,
        tokenize_bpe_vectorized,
    )

    rows = [(0, "a b"), (1, "the fast fox"), (2, "x y")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    sdf.createOrReplaceTempView("documents")
    via_sql = {r.doc_id: (r.n_bpe_exact, r.bpe_md5)
               for r in spark.sql(_tokenize_bpe_sql(duck=False)).collect()}

    import tempfile, os
    d = tempfile.mkdtemp()
    sdf.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    via_vec = {r.doc_id: (r.n_bpe_exact, r.bpe_md5)
               for r in tokenize_bpe_vectorized(spark, d).collect()}
    assert via_sql == via_vec


def test_pack_sequences_token_counts_coverage_raises(spark, sf_dir):
    # r11 review find: a counts frame missing doc_ids must raise, not
    # silently drop docs from packing
    import pytest as _pytest

    from flink_infotheoretic_feature_selection_spark.operators.text import (
        source_token_cap,
        tokenize_bpe_vectorized,
    )

    partial = tokenize_bpe_vectorized(spark, sf_dir).selectExpr(
        "doc_id", "n_bpe_exact AS n_tokens"
    ).where("doc_id % 2 = 0")
    with _pytest.raises(Exception, match="token_counts is missing"):
        pack_sequences(spark, sf_dir, token_counts=partial).collect()
    with _pytest.raises(Exception, match="token_counts is missing"):
        source_token_cap(spark, sf_dir, token_counts=partial).collect()


def test_pack_sequences_token_counts_duplicates_raise(spark, sf_dir):
    # r11 advisor: duplicate doc_ids in the counts frame used to pack a
    # doc twice and corrupt every later cumsum in its shard SILENTLY
    # (the missing-doc case already failed loud) — now both raise
    import pytest as _pytest

    from flink_infotheoretic_feature_selection_spark.operators.text import (
        source_token_cap,
        tokenize_bpe_vectorized,
    )

    tc = tokenize_bpe_vectorized(spark, sf_dir).selectExpr(
        "doc_id", "n_bpe_exact AS n_tokens"
    )
    dup = tc.unionAll(tc.where("doc_id % 7 = 0"))
    with _pytest.raises(Exception, match="duplicate doc_ids"):
        pack_sequences(spark, sf_dir, token_counts=dup).collect()
    with _pytest.raises(Exception, match="duplicate doc_ids"):
        source_token_cap(spark, sf_dir, token_counts=dup).collect()


def test_source_token_cap_skew_bit_equal(spark, sf_dir):
    # r12 (VERDICT r11 ask #4): the bucketed distributed-prefix-sum twin
    # must be BIT-equal to the plain windowed form — on the test corpus,
    # on a deliberately 90%-one-source corpus (the hot source provably
    # split across >1 bucket), and on the token_counts= variant
    import os
    import random
    import tempfile

    from flink_infotheoretic_feature_selection_spark.operators.text import (
        source_token_cap,
        source_token_cap_skew,
        tokenize_bpe_vectorized,
    )

    def rows_of(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows_of(source_token_cap_skew(spark, sf_dir)) == rows_of(
        source_token_cap(spark, sf_dir)
    )

    # hot-source corpus: 90% of docs in one source; n_buckets=4 so the
    # bucket pruning and stitching actually engage at unit scale
    rng = random.Random(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = [
        (
            i,
            "hot" if i % 10 else f"cold{i % 3}",
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 40))),
        )
        for i in range(600)
    ] + [
        (600, "hot", ""),
        (601, "hot", None),
        # NULL source rows (r12 review find): the window/groupBy treat
        # NULL as its own source group; a plain equi-join in the skew
        # form silently dropped them — must stay bit-equal
        (602, None, "alpha beta gamma"),
        (603, None, "delta epsilon"),
    ]
    d = tempfile.mkdtemp(prefix="cap_skew_")
    spark.createDataFrame(docs, "doc_id long, source string, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))

    plain = rows_of(source_token_cap(spark, d, budget=2000))
    skew = source_token_cap_skew(spark, d, budget=2000, n_buckets=4)
    assert rows_of(skew) == plain and len(plain) > 0

    # the claim "hot source splits across buckets" must hold, else this
    # unit pins a degenerate single-bucket run
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        ROLLING_MOD,
        _cap_pr_body,
    )
    from pyspark.sql import functions as F

    width = (ROLLING_MOD + 3) // 4
    n_hot_buckets = (
        spark.sql(_cap_pr_body(duck=False))
        .where("source = 'hot'")
        .select(F.expr(f"CAST(prio div {width} AS INT)").alias("bkt"))
        .distinct()
        .count()
    )
    assert n_hot_buckets > 1

    # token_counts= variant rides the same shared pr body
    tc = tokenize_bpe_vectorized(spark, d).selectExpr(
        "doc_id", "n_bpe_exact AS n_tokens"
    )
    assert rows_of(
        source_token_cap_skew(spark, d, budget=2000, n_buckets=4, token_counts=tc)
    ) == rows_of(source_token_cap(spark, d, budget=2000, token_counts=tc))


def test_pack_sequences_token_counts_extra_columns_ok(spark, sf_dir):
    # r11 advisor: a counts frame that still carries text/source (easy if
    # a caller forgets to project the tokenizer output) used to fail with
    # an ambiguous-column AnalysisException — the operator now projects
    # to (doc_id, n_tokens) itself, so extra columns must be harmless
    from flink_infotheoretic_feature_selection_spark.operators.text import (
        source_token_cap,
        tokenize_bpe_vectorized,
    )

    clean = tokenize_bpe_vectorized(spark, sf_dir).selectExpr(
        "doc_id", "n_bpe_exact AS n_tokens"
    )
    messy = clean.selectExpr(
        "doc_id", "n_tokens", "'junk' AS text", "'web' AS source"
    )
    for op in (pack_sequences, source_token_cap):
        want = {tuple(r) for r in op(spark, sf_dir, token_counts=clean).collect()}
        got = {tuple(r) for r in op(spark, sf_dir, token_counts=messy).collect()}
        assert got == want and len(got) > 0
