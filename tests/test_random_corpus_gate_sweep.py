"""Randomized cross-engine sweep: every documents-only gate must stay
bit-equal to its DuckDB oracle on corpora the fixed synthetic corpus
never exercises.

The driver gate proves Spark == DuckDB on ONE text distribution; the
NULL-text hash divergence (text.py rolling_hash_expr docstring) showed
that a whole class of engine-boundary bugs hides outside it.  This
sweep replays the same (queries(), oracle_sql()) contract over three
DETERMINISTIC adversarial corpora (seeded, no flaky shrinking):

- nulls / empties / whitespace-only docs,
- exact duplicates and word-shuffled near-duplicates across sources,
- safe unicode (the \\x0B Java-vs-RE2 and full-vs-simple case-mapping
  boundaries are DOCUMENTED engine contracts, excluded by alphabet).

Gates whose oracle reads a frozen fixture keyed to the synthetic corpus
(xxhash64 SimHash family), needs non-documents tables, or depends on
corpus-specific constants are excluded with the reason inline.
"""

from __future__ import annotations

import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod

# documents-only gates safe on arbitrary corpora; everything else is
# excluded for a stated reason:
#   - simhash64_*: oracle reads the frozen xxhash64 fixture (synthetic-
#     corpus md5 keys) — random docs have no fixture rows; covered by
#     the md5-twin sweep below instead (same mining SQL, portable hash)
#   - semantic_decontaminate / ann_* / cosine / embedding_*: embeddings
#     table, not documents
#   - events / lineitem gates: other tables
#   - media_meta / media_pixels: their oracles walk unicode code points
#     as BYTES, a trick only valid on pure-ASCII corpora (documented at
#     multimodal.py MEDIA_FEATURES_ORACLE) — covered by the dedicated
#     ASCII+NULL corpus test below instead
#   - stream_*: availableNow staging, covered by their own fixtures
SWEEP_GATES = [
    "text_profile",
    "corpus_clean",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "minhash_lsh_pairs",
    "neardup_groups",
    "dedup_keep_best",
    "simhash_pairs",
    "decontaminate",
    "tfidf_topk",
    "vocab_topk",
    "chunk_documents",
    "pack_sequences",
    # frozen-BPE gates (r11): the merges fixture is corpus-independent
    # (any text re-encodes against the same frozen table), so random
    # corpora exercise the full merge chain + sentinel boundary encoding
    "tokenize_bpe",
    "pack_sequences_exact",
    "stratified_sample",
    "mixture_sample",
    "quality_quantile_filter",
    "hash_split",
    "source_token_cap",
    "epoch_shuffle",
    "corpus_rollup",
    "lm_score",
    "token_mi_topk",
    "cross_source_overlap",
    "substring_dup_spans",
    "scrub_dup_spans",
    # the composed pipelines are plain dual-dialect SQL over documents —
    # sweeping them re-verifies the COMPOSITION (stage interactions like
    # the split/mixture independent hash streams), not just the stages
    "pipeline_clean_pack",
    "pipeline_curate_split",
]

WORDS = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge",
    "part", "window", "small", "hash", "join", "batch", "stream",
    "spark", "dup", "é", "中", "0", "a,b", "x;y", "-",
]


def _random_corpus(seed: int, n: int = 40) -> dict:
    rng = random.Random(seed)
    texts: list[str | None] = []
    for i in range(n):
        roll = rng.random()
        if roll < 0.08:
            texts.append(None)
        elif roll < 0.14:
            texts.append("")
        elif roll < 0.20:
            texts.append(rng.choice([" ", "\t\t", " \n ", "\r\n", "\f"]))
        elif texts and roll < 0.30:
            texts.append(rng.choice([t for t in texts if t] or ["dup doc"]))
        elif texts and roll < 0.40:
            base = rng.choice([t for t in texts if t and len(t) > 10] or ["dup doc here now"])
            words = base.split(" ")
            rng.shuffle(words)
            texts.append(" ".join(words))
        else:
            k = rng.randint(1, 30)
            texts.append(" ".join(rng.choice(WORDS) for _ in range(k)))
    return {
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([random.Random(seed * 7 + i).choice(["en", "es", "zh", "de"]) for i in range(n)], pa.string()),
        "source": pa.array([f"src{random.Random(seed * 13 + i).randint(0, 3)}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) if t is not None else 0 for t in texts], pa.int64()),
    }


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_documents_gates_cross_engine_on_random_corpus(spark, tmp_path, seed):
    d = tmp_path / f"rc{seed}"
    d.mkdir()
    pq.write_table(pa.table(_random_corpus(seed)), f"{d}/documents.parquet")
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    for name in SWEEP_GATES:
        sdf = queries[name](spark, str(d))
        got = sorted(
            (
                tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            ),
            key=nullsafe,
        )
        cols = ", ".join(f'"{c}"' for c in sorted(sdf.columns))
        exp = sorted(
            (
                tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in duck.execute(
                    f"SELECT {cols} FROM ({oracles[name]})"
                ).fetchall()
            ),
            key=nullsafe,
        )
        if got != exp:
            only_s = [r for r in got if r not in exp][:3]
            only_d = [r for r in exp if r not in got][:3]
            failures.append(f"{name}: spark_only={only_s} duck_only={only_d}")
    duck.close()
    assert not failures, f"seed {seed}:\n" + "\n".join(failures)


@pytest.mark.parametrize("seed", [11, 47])
def test_simhash64_family_cross_engine_via_md5_twin(spark, tmp_path, seed):
    # The three simhash64 GATES run the production xxhash64 hash against
    # the frozen fixture, which only covers the synthetic corpus — so
    # they are excluded from the registry sweep above.  The md5 oracle
    # twin (dedup.simhash64_*_oracle(hash_fn="md5")) recomputes
    # signatures engine-portably through the SAME mining SQL / Spark
    # plans, so the banding, components and incremental machinery get
    # randomized cross-engine coverage here; the production-vs-twin
    # bit-equality units keep covering the xxhash64 math itself.
    from flink_infotheoretic_feature_selection_spark.operators import dedup

    d = tmp_path / f"sh{seed}"
    d.mkdir()
    pq.write_table(pa.table(_random_corpus(seed)), f"{d}/documents.parquet")
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    cases = {
        "pairs": (
            dedup.simhash64_pairs(spark, str(d), hash_fn="md5"),
            dedup.simhash64_pairs_oracle(hash_fn="md5"),
        ),
        "components": (
            dedup.simhash64_components(spark, str(d), hash_fn="md5"),
            dedup.simhash64_components_oracle(hash_fn="md5"),
        ),
        "incremental": (
            dedup.simhash64_incremental(spark, str(d), hash_fn="md5"),
            dedup.simhash64_incremental_oracle(hash_fn="md5"),
        ),
    }
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    failures = []
    for name, (sdf, osql) in cases.items():
        got = sorted(
            (tuple(r) for r in sdf.select(*sorted(sdf.columns)).collect()),
            key=nullsafe,
        )
        cols = ", ".join(f'"{c}"' for c in sorted(sdf.columns))
        exp = sorted(
            (tuple(r) for r in duck.execute(f"SELECT {cols} FROM ({osql})").fetchall()),
            key=nullsafe,
        )
        if got != exp:
            only_s = [r for r in got if r not in exp][:3]
            only_d = [r for r in exp if r not in got][:3]
            failures.append(f"{name}: spark_only={only_s} duck_only={only_d}")
    duck.close()
    assert not failures, f"seed {seed}:\n" + "\n".join(failures)


@pytest.mark.parametrize("seed", [97, 131])
def test_media_gates_on_ascii_corpus_with_nulls(spark, tmp_path, seed):
    # The media oracles' chars-as-bytes trick needs pure ASCII, so the
    # media gates get their own random corpus: ASCII words plus the
    # NULL/empty/whitespace docs that used to CRASH the Arrow kernels
    # (bytes(None) on the NULL media blob attach_media now coalesces
    # away — and _to_bytes guards arbitrary user binary columns too).
    rng = random.Random(seed)
    texts = [None, "", " ", "\t\t"] + [
        " ".join(rng.choice(WORDS[:17]) for _ in range(rng.randint(1, 40)))
        for _ in range(36)
    ]
    d = tmp_path / f"media_ascii{seed}"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s1"] * len(texts), pa.string()),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        f"{d}/documents.parquet",
    )
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    for name in ("media_meta", "media_pixels"):
        sdf = queries[name](spark, str(d))
        got = sorted(
            (
                tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            ),
            key=nullsafe,
        )
        cols = ", ".join(f'"{c}"' for c in sorted(sdf.columns))
        exp = sorted(
            (
                tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in duck.execute(
                    f"SELECT {cols} FROM ({oracles[name]})"
                ).fetchall()
            ),
            key=nullsafe,
        )
        assert got == exp, (name, got[:4], exp[:4])
    duck.close()


def test_documents_gates_on_extreme_length_corpus(spark, tmp_path):
    # Length-pathology axis the random generator never reaches (its docs
    # cap at ~30 words): a ~10k-token doc (rolling-hash windows, chunk
    # boundaries, shingle explosion, token-position arithmetic), a doc of
    # ONE enormous unbroken token (no shingle possible, n_chars >> token
    # count), a doc that is one word repeated (every shingle identical —
    # degenerate MinHash/SimHash signatures), an exact duplicate of the
    # giant doc (near-dup mining at scale-shaped sizes), and the usual
    # NULL/empty/tiny docs.  Same bit-exact cross-engine contract.
    # ~3k tokens keeps the DuckDB oracles (recursive-CTE closure /
    # window-heavy forms, quadratic in shingles-per-doc) inside the test
    # budget; the SPARK-side length pathology this test exists for showed
    # well below 3k (the quadratic interpreted-slice gram build fixed at
    # text._grams_expr / dedup.shingle_grams_expr read 2-4 s PER DOC here
    # before the zip_with rewrite, milliseconds after)
    rng = random.Random(7)
    giant = " ".join(rng.choice(WORDS[:17]) for _ in range(3_000))
    texts = [
        None,
        "",
        " ",
        "one",
        giant,
        giant,  # exact duplicate of the giant doc
        "x" * 20_000,  # one unbroken 20k-char token
        " ".join(["dup"] * 1_500),  # single word repeated
        " ".join(rng.choice(WORDS) for _ in range(25)),
        giant[: len(giant) // 2],  # half-prefix (substring-span bait)
    ]
    n = len(texts)
    d = tmp_path / "extreme"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array([f"src{i % 3}" for i in range(n)], pa.string()),
                "n_chars": pa.array(
                    [len(t) if t is not None else 0 for t in texts], pa.int64()
                ),
            }
        ),
        f"{d}/documents.parquet",
    )
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    for name in SWEEP_GATES:
        sdf = queries[name](spark, str(d))
        got = sorted(
            (
                tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            ),
            key=nullsafe,
        )
        cols = ", ".join(f'"{c}"' for c in sorted(sdf.columns))
        exp = sorted(
            (
                tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in duck.execute(
                    f"SELECT {cols} FROM ({oracles[name]})"
                ).fetchall()
            ),
            key=nullsafe,
        )
        if got != exp:
            only_s = [r for r in got if r not in exp][:3]
            only_d = [r for r in exp if r not in got][:3]
            failures.append(f"{name}: spark_only={only_s} duck_only={only_d}")
    duck.close()
    assert not failures, "\n".join(failures)


def test_documents_gates_on_duplication_clique_corpus(spark, tmp_path):
    # Duplication/skew axis (r8) — the random generator and the length
    # sweep never produce a LARGE near-dup clique, which is exactly what
    # web-scale corpora contain (boilerplate pages duplicated across
    # thousands of URLs).  120 byte-identical copies of one doc (a
    # 120-clique: 7,140 pairs through every pair miner, one hot LSH/
    # SimHash bucket, a 120-member connected component for keep-best),
    # two near-identical families (one-word edits — SimHash Hamming
    # neighbors), one doc whose text is another's prefix (substring-span
    # bait), a hot SOURCE (skewed group key for rollup/cap/mixture), and
    # the usual NULL/empty/tiny docs.  Same bit-exact cross-engine
    # contract as the random sweep: caps and union-find must change
    # NOTHING about values, only bound the work.
    rng = random.Random(11)
    boiler = " ".join(rng.choice(WORDS) for _ in range(40))
    near_a = boiler.replace(WORDS[0], "edited", 1)
    family_b = " ".join(rng.choice(WORDS) for _ in range(35))
    texts = [boiler] * 120
    texts += [near_a] * 3
    texts += [family_b, family_b + " tail", "prefix " + family_b]
    texts += [boiler[: len(boiler) // 2], None, "", "one",
              " ".join(rng.choice(WORDS) for _ in range(25))]
    n = len(texts)
    d = tmp_path / "clique"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                # hot source: 80% of docs share src0 (skewed group key)
                "source": pa.array(
                    [f"src{0 if i % 5 else i % 3}" for i in range(n)], pa.string()
                ),
                "n_chars": pa.array(
                    [len(t) if t is not None else 0 for t in texts], pa.int64()
                ),
            }
        ),
        f"{d}/documents.parquet",
    )
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    for name in SWEEP_GATES:
        sdf = queries[name](spark, str(d))
        got = sorted(
            (
                tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            ),
            key=nullsafe,
        )
        cols = ", ".join(f'"{c}"' for c in sorted(sdf.columns))
        exp = sorted(
            (
                tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in duck.execute(
                    f"SELECT {cols} FROM ({oracles[name]})"
                ).fetchall()
            ),
            key=nullsafe,
        )
        if got != exp:
            only_s = [r for r in got if r not in exp][:3]
            only_d = [r for r in exp if r not in got][:3]
            failures.append(f"{name}: spark_only={only_s} duck_only={only_d}")
    duck.close()
    assert not failures, "\n".join(failures)
