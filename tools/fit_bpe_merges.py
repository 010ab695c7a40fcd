"""Train and FREEZE a tiny BPE merges table for exact token budgets.

Offline tokenizer-training step (same frozen-fixture pattern as
tools/fit_pq_codebooks.py): train once on the sf0.01 documents corpus,
freeze the merge list as JSON, and every later encode — Spark SQL,
DuckDB oracle, or the vectorized Arrow kernel — replays the SAME frozen
merges, making exact-token-count packing value-checkable end-to-end
(VERDICT r10 ask #3: pack_sequences/source_token_cap budgeted on
whitespace/BPE-ish approximations, not a real tokenizer).

Algorithm: standard BPE training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") over word frequencies —
repeatedly merge the most frequent adjacent symbol pair.  Deterministic
by construction: ties break on the lexicographically smallest pair.

Pretokenization is the repo's existing `_BPE` regex
(`[a-z]+|[0-9]|[^a-z0-9\\s]` over lowered text): only `[a-z]+` words are
multi-symbol, so every learned merge is letter-only — no quote/backslash
escaping concerns in the generated SQL.  No end-of-word marker (GPT-2
style pretoken boundaries already isolate words).

Usage:  python tools/fit_bpe_merges.py [sf_dir] [out.json] [n_merges]
        python tools/fit_bpe_merges.py --synthetic-vocab [out.json] [n_merges]

``--synthetic-vocab`` (r12, VERDICT r11 ask #3): the sf0.01 documents
corpus has only 30 distinct multi-character words — BPE training on it
EXHAUSTS at 89 merges, so a production-scale merge table (4k+) cannot
come from the test corpus.  The synthetic mode draws a deterministic
seeded 30k-word vocabulary (letter-only words, English-like letter
frequencies, Zipf word frequencies) and trains on that; the resulting
fixture exercises the production vocab REGIME (expression depth, word
cache, rank table size), while the 64-merge corpus-trained fixture
remains the value-gated one.
"""

from __future__ import annotations

import json
import re
import sys
from collections import Counter

import duckdb

N_MERGES = 64
PRETOKEN_RE = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def _resegment(s: tuple, u: str, v: str) -> tuple:
    out, i = [], 0
    while i < len(s):
        if i < len(s) - 1 and s[i] == u and s[i + 1] == v:
            out.append(u + v)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return tuple(out)


def train(word_freq: dict[str, int], n_merges: int) -> list[list[str]]:
    """Deterministic BPE training (max pair count, lexicographically
    smallest pair on ties) with INCREMENTAL pair bookkeeping: each merge
    touches only the words that contain the merged pair, so 4096 merges
    over an sf0.01 vocabulary train in seconds where the original
    full-rescan loop (r11, fine at 64 merges) was O(n_merges x corpus
    vocabulary) — hours at production vocab sizes.  Verified identical
    to the full-rescan output at 64 merges (the frozen fixture) by
    tests/test_bpe_large_vocab.py."""
    segs = {w: tuple(w) for w in word_freq}
    pairs: Counter = Counter()
    pair_words: dict[tuple, set] = {}
    for w, f in word_freq.items():
        s = segs[w]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            pairs[p] += f
            pair_words.setdefault(p, set()).add(w)
    merges: list[list[str]] = []
    for _ in range(n_merges):
        # drop exhausted pairs lazily; min over the live dict stays the
        # deterministic (-count, pair) rule of the original trainer
        best, best_key = None, None
        for p, c in pairs.items():
            if c <= 0:
                continue
            k = (-c, p)
            if best_key is None or k < best_key:
                best, best_key = p, k
        if best is None:
            break
        merges.append(list(best))
        u, v = best
        for w in list(pair_words.get(best, ())):
            s = segs[w]
            f = word_freq[w]
            new = _resegment(s, u, v)
            if new == s:
                continue
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pairs[p] -= f
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(w)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pairs[p] = pairs.get(p, 0) + f
                pair_words.setdefault(p, set()).add(w)
            segs[w] = new
    return merges


SYNTH_SEED = 20260816
SYNTH_VOCAB = 30_000


def synthetic_word_freq(
    n_words: int = SYNTH_VOCAB, seed: int = SYNTH_SEED
) -> dict[str, int]:
    """Deterministic seeded vocabulary: letter-only words (3-12 chars,
    English-like letter frequencies so common digraphs actually repeat),
    Zipf frequencies (rank r gets ~1e6/r).  Letter-only keeps the learned
    merges inside the `[a-z]+` pretoken class — the same no-escaping
    property the corpus-trained fixture relies on."""
    import numpy as np

    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    # rough English unigram frequencies (normalized)
    w = np.array([
        8.2, 1.5, 2.8, 4.3, 12.7, 2.2, 2.0, 6.1, 7.0, 0.15, 0.77, 4.0, 2.4,
        6.7, 7.5, 1.9, 0.095, 6.0, 6.3, 9.1, 2.8, 0.98, 2.4, 0.15, 2.0, 0.074,
    ])
    p = w / w.sum()
    vocab: dict[str, int] = {}
    rank = 0
    while len(vocab) < n_words:
        length = int(rng.integers(3, 13))
        word = "".join(rng.choice(letters, size=length, p=p))
        if word in vocab:
            continue
        rank += 1
        vocab[word] = max(1, int(1_000_000 / rank))
    return vocab


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--synthetic-vocab":
        out = (
            sys.argv[2]
            if len(sys.argv) > 2
            else "flink_infotheoretic_feature_selection_spark/fixtures/bpe_merges_4k.json"
        )
        n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
        freq = synthetic_word_freq()
        merges = train(freq, n_merges)
        with open(out, "w") as f:
            json.dump(
                {
                    "merges": merges,
                    "n_merges": len(merges),
                    "pretoken_regex": PRETOKEN_RE,
                    "trained_on": (
                        f"synthetic_word_freq(n_words={SYNTH_VOCAB}, "
                        f"seed={SYNTH_SEED})"
                    ),
                    "algorithm": "bpe-maxfreq-lex-ties",
                },
                f,
                indent=1,
            )
        print(f"froze {len(merges)} merges -> {out}")
        print("first 10:", merges[:10])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "flink_infotheoretic_feature_selection_spark/fixtures/bpe_merges.json"
    )
    rows = duckdb.sql(
        f"SELECT lower(text) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    freq: Counter = Counter()
    pat = re.compile(PRETOKEN_RE)
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else N_MERGES
    for (txt,) in rows:
        if txt:
            freq.update(t for t in pat.findall(txt) if len(t) > 1)
    merges = train(dict(freq), n_merges)
    with open(out, "w") as f:
        json.dump(
            {
                "merges": merges,
                "n_merges": len(merges),
                "pretoken_regex": PRETOKEN_RE,
                "trained_on": f"{sf_dir}/documents.parquet",
                "algorithm": "bpe-maxfreq-lex-ties",
            },
            f,
            indent=1,
        )
    print(f"froze {len(merges)} merges -> {out}")
    print("first 10:", merges[:10])


if __name__ == "__main__":
    main()
