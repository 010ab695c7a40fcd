"""Production-vocab BPE regime (r12, VERDICT r11 ask #3).

The gate's 64-merge fixture proves VALUE correctness of both routes; this
module pins the 4096-merge fixture (fixtures/bpe_merges_4k.json) where
only the Arrow word-cache route exists — the SQL replace chain stops
compiling well below 4k merges (measured: tools/bpe_route_boundary.py,
regime table in BASELINE.md).

The cross-check is algorithm-level, same as the 64-merge parity: the
canonical iterative lowest-rank-first encoder (bpe_encode_word, the
production kernel) against an INDEPENDENT pure-Python replay of the SQL
route's rank-order replace chain.  Their equivalence is a theorem
(merging rank r only creates pairs trained after r), and holding it at
4096 ranks over a 30k-word vocabulary is the large-vocab pin the 64-merge
gate could not give.
"""

import json
import os
import random

import pytest

from flink_infotheoretic_feature_selection_spark.operators.text import (
    bpe_encode_word,
    tokenize_bpe_vectorized,
)

FIXTURE_4K = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "flink_infotheoretic_feature_selection_spark",
    "fixtures",
    "bpe_merges_4k.json",
)


def _load_4k() -> list[list[str]]:
    with open(FIXTURE_4K) as f:
        fx = json.load(f)
    assert fx["n_merges"] == 4096
    return fx["merges"]


def _rank_order_replace_encode(word: str, merges: list[list[str]]) -> list[str]:
    """The SQL route's algorithm, replayed in pure Python: encode each
    char as ' c.' then apply every merge once, in rank order, as a plain
    left-to-right non-overlapping string replace."""
    s = "".join(f" {c}." for c in word)
    for u, v in merges:
        s = s.replace(f" {u}. {v}.", f" {u}{v}.")
    return [t[:-1] for t in s.split(" ") if t]


def _sample_words(n: int = 2000, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(letters) for _ in range(rng.randint(1, 14)))
        for _ in range(n)
    ]
    # adversarial shapes: runs (overlapping pair occurrences), alternations,
    # and words built FROM merge outputs so deep ranks actually fire
    words += ["aaaa", "aaaaaaa", "abababab", "the", "snrsnrsnr", "ee", "e"]
    return words


def test_rank_order_replace_equals_canonical_at_4096_ranks():
    merges = _load_4k()
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    # also words stitched from learned merge products, to exercise ranks
    # deep in the table (random letter soup mostly dies in early ranks)
    deep = ["".join(u + v for u, v in merges[i : i + 3]) for i in range(0, 4096, 97)]
    mismatches = [
        w
        for w in _sample_words() + deep
        if bpe_encode_word(w, ranks) != _rank_order_replace_encode(w, merges)
    ]
    assert mismatches == [], mismatches[:5]
    # the deep words must actually reach high ranks, else this pins
    # nothing: a token that IS the product of merge rank r proves r fired
    product_rank = {u + v: i for i, (u, v) in enumerate(map(tuple, merges))}
    max_rank_hit = max(
        product_rank.get(t, -1) for w in deep for t in bpe_encode_word(w, ranks)
    )
    assert max_rank_hit > 2000


def test_fast_trainer_matches_full_rescan():
    # the r12 incremental trainer must reproduce the r11 full-rescan
    # trainer exactly (same max-count, lex-smallest-tie rule) — checked
    # on a random vocabulary at a depth where counters churn heavily
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "fit_bpe_merges",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "fit_bpe_merges.py",
        ),
    )
    fit = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fit)

    def train_full_rescan(word_freq, n_merges):
        from collections import Counter

        segs = {w: tuple(w) for w in word_freq}
        merges = []
        for _ in range(n_merges):
            pairs = Counter()
            for w, f in word_freq.items():
                s = segs[w]
                for i in range(len(s) - 1):
                    pairs[(s[i], s[i + 1])] += f
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(list(best))
            for w in word_freq:
                segs[w] = fit._resegment(segs[w], *best)
        return merges

    rng = random.Random(11)
    letters = "abcdef"  # small alphabet → heavy pair collisions/ties
    vocab = {
        "".join(rng.choice(letters) for _ in range(rng.randint(2, 9))): rng.randint(
            1, 500
        )
        for _ in range(400)
    }
    assert fit.train(dict(vocab), 200) == train_full_rescan(dict(vocab), 200)


def test_arrow_route_end_to_end_at_4k_fixture(spark, tmp_path):
    # the full mapInArrow plumbing (word cache, NULL text, md5 framing)
    # against a driver-side recompute through the INDEPENDENT replay —
    # at the vocab size where the SQL route no longer exists
    merges = _load_4k()
    rng = random.Random(3)
    base = _sample_words(300, seed=3)
    rows = [
        (i, " ".join(rng.choice(base) for _ in range(rng.randint(0, 30))) + " 7 !?")
        for i in range(120)
    ]
    rows.append((120, None))
    rows.append((121, ""))
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))

    got = {
        r.doc_id: (r.n_bpe_exact, r.bpe_md5)
        for r in tokenize_bpe_vectorized(spark, d, fixture_path=FIXTURE_4K).collect()
    }

    import hashlib
    import re

    rx = re.compile(r"[a-z]+|[0-9]|[^a-z0-9\s]", re.ASCII)
    cache: dict[str, str] = {}

    def enc(w: str) -> str:
        if w not in cache:
            cache[w] = "".join(
                " " + t + "." for t in _rank_order_replace_encode(w, merges)
            )
        return cache[w]

    want = {}
    for doc_id, text in rows:
        joined = "".join(enc(w) for w in rx.findall((text or "").lower()))
        want[doc_id] = (
            joined.count(" "),
            hashlib.md5(joined.encode("utf-8")).hexdigest(),
        )
    assert got == want
    # regime sanity: multi-token words must exist (4k merges don't fuse
    # whole random words) and so must fully-fused dictionary hits
    assert any(n > 0 for n, _ in got.values())
