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

Usage:  python tools/fit_bpe_merges.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import re
import sys
from collections import Counter

import duckdb

N_MERGES = 64
PRETOKEN_RE = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def train(word_freq: dict[str, int], n_merges: int) -> list[list[str]]:
    segs = {w: tuple(w) for w in word_freq}
    merges: list[list[str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, f in word_freq.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(list(best))
        u, v = best
        for w in word_freq:
            s = segs[w]
            if len(s) < 2:
                continue
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == u and s[i + 1] == v:
                    out.append(u + v)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = tuple(out)
    return merges


def main() -> None:
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
    for (txt,) in rows:
        if txt:
            freq.update(t for t in pat.findall(txt) if len(t) > 1)
    merges = train(dict(freq), N_MERGES)
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
