"""Randomized cross-engine sweep for the JSONL landing-dir reader — the
io twin of the KEEL/corpus/events/matrix sweeps.

The jsonl_read gate parses ONE fixed landing dir; this sweep generates
random dirs (mixed gzip + plain shards; valid rows with random unicode /
escapes / int64 extremes, random missing-field subsets, explicit nulls,
empty strings, nested extra fields, blank lines, junk lines, long-field
type corruption, duplicate doc_ids, empty objects) and checks
``sinks.read_documents_jsonl`` row-for-row against the generic DuckDB
oracle (``__spark_entry__.jsonl_oracle_sql``), which re-parses the same
bytes line-by-line with per-field json_type gating.

The generator stays inside the gate's probe-verified contract: no
top-level arrays, no numeric-valued string fields, no integers outside
int64, no whitespace-only lines (all documented out-of-contract in the
oracle builder's docstring).
"""

from __future__ import annotations

import gzip
import json
import random

import duckdb
import pytest

from __spark_entry__ import jsonl_oracle_sql
from flink_infotheoretic_feature_selection_spark.operators.sinks import (
    read_documents_jsonl,
)

LANGS = ["en", "de", "fr", "zh", "", None]
SOURCES = ["web", "cc", "books", "wiki", "", None]
TEXT_POOL = [
    "the quick brown fox",
    "hallo welt",
    "café — naïve façade",
    "中文文本与 emoji 🚀 混合",
    "tab\there and\nnewline and \"quotes\" and back\\slash",
    "control\x01char and \x1f unit sep",  # json.dumps escapes these
    "",
    "x" * 300,
]
JUNK_POOL = [
    "{not json at all",
    "complete garbage line",
    "42",
    "-3.75",
    "true",
    '"just a string"',
    "}{",
    "{\"unterminated\": ",
]


def _random_line(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.08:
        return ""  # blank: skipped by both engines
    if roll < 0.20:
        return rng.choice(JUNK_POOL)
    if roll < 0.24:
        return "{}"
    obj: dict = {}
    # random subset of schema fields present
    if rng.random() < 0.9:
        obj["doc_id"] = rng.choice(
            [
                rng.randint(0, 10),  # collisions -> duplicate ids
                rng.randint(-(2**63), 2**63 - 1),
                None,
            ]
        )
    if rng.random() < 0.9:
        obj["text"] = rng.choice(TEXT_POOL + [None])
    if rng.random() < 0.7:
        obj["lang"] = rng.choice(LANGS)
    if rng.random() < 0.7:
        obj["source"] = rng.choice(SOURCES)
    if rng.random() < 0.7:
        obj["n_chars"] = rng.choice([0, -5, rng.randint(0, 10**12), None])
    if rng.random() < 0.25:  # extra fields ignored, incl. nested subtrees
        obj["extra"] = rng.choice([True, 7, "x", {"nested": [1, 2]}, [1, "a"]])
    if rng.random() < 0.22:  # long-field corruption -> partial results
        obj[rng.choice(["doc_id", "n_chars"])] = rng.choice(
            ["abc", 1.5, True, ""]
        )
    return json.dumps(obj, ensure_ascii=rng.random() < 0.5)


@pytest.mark.parametrize("seed", [5, 23, 47, 61])
def test_jsonl_reader_cross_engine_on_random_dirs(spark, tmp_path, seed):
    rng = random.Random(seed)
    d = tmp_path / f"landing_{seed}"
    d.mkdir()
    n_rows = 0
    for s in range(rng.randint(2, 4)):
        lines = [_random_line(rng) for _ in range(rng.randint(8, 25))]
        n_rows += sum(1 for ln in lines if ln != "")
        payload = "\n".join(lines) + "\n"
        if rng.random() < 0.5:
            with gzip.open(d / f"part-{s:05d}.jsonl.gz", "wt", encoding="utf-8") as fh:
                fh.write(payload)
        else:
            (d / f"part-{s:05d}.jsonl").write_text(payload, encoding="utf-8")

    sdf = read_documents_jsonl(spark, str(d), corrupt_col="bad_line")
    got = sorted(
        (tuple(r) for r in sdf.select(*sorted(sdf.columns)).collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    cols = ", ".join(f'"{c}"' for c in sorted(sdf.columns))
    osql = jsonl_oracle_sql(str(d) + "/part-*")
    exp = sorted(
        (
            tuple(r)
            for r in duckdb.connect()
            .execute(f"SELECT {cols} FROM ({osql})")
            .fetchall()
        ),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    assert got == exp, (seed, got[:4], exp[:4])
    assert len(got) == n_rows  # every non-blank line lands exactly once


@pytest.mark.parametrize("seed", [11, 37])
def test_jsonl_write_read_roundtrip_random(spark, tmp_path, seed):
    # writer -> reader closure on random CLEAN corpora (the writer never
    # produces corrupt lines); gzip shards + content-hash sharding
    from flink_infotheoretic_feature_selection_spark.operators.sinks import (
        write_documents_jsonl,
    )

    rng = random.Random(seed)
    rows = [
        (
            i,
            rng.choice(TEXT_POOL + [None]),
            rng.choice([v for v in LANGS if v is not None] + [None]),
            rng.choice([v for v in SOURCES if v is not None] + [None]),
            rng.choice([0, -5, rng.randint(0, 10**12), None]),
        )
        for i in range(rng.randint(20, 60))
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "out")
    write_documents_jsonl(df, out, key_col="doc_id", n_shards=4)
    from flink_infotheoretic_feature_selection_spark.operators.sinks import (
        read_documents_jsonl,
    )

    back = read_documents_jsonl(spark, out).drop("shard")
    key = lambda t: tuple((v is None, v) for v in t)
    assert sorted(map(tuple, back.select(*df.columns).collect()), key=key) == sorted(
        map(tuple, rows), key=key
    )
