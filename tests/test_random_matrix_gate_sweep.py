"""Randomized cross-engine sweep for the 18 SURVEY-§2 CORE gates — the
feature-selection twin of test_random_corpus_gate_sweep.

The core gates derive the byte feature matrix from lineitem via
FEATURE_SPEC, so the sweep generates random lineitem/part tables inside
the reference's validity contract (non-negative keys/quantities,
2-decimal rates, shipdates in the 1992-1998 window — features must land
in the byte domain the reference's range validation enforces) while
stressing what the fixed TPC-H-ish generator never does:

- seed 61: duplicate-heavy — few distinct values per column (histogram
  cells collide, MI ties across features, greedy tie-breaks decide the
  selection path), duplicated retail prices (equal-frequency quantile
  ties sit exactly on bucket boundaries).
- seed 83: degenerate — one constant raw column (a zero-MI feature with
  a single histogram cell), a two-value label skewed 9:1, and a tiny
  row count where sample fraction 1.0 makes the discretizer walk fully
  deterministic.

Every gate — including all six greedy-selection loops and the sparse
path — must produce rows bit-equal to its DuckDB oracle on both.
"""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod

CORE_GATES = [
    "features_dense",
    "class_prior",
    "distinct_counts",
    "hist2d",
    "hist3d",
    "relevance_mi",
    "mim_topk",
    "projection",
    "equal_freq_bucket",
    "equal_width_bucket",
    "sparse_hist2d",
    "sparse_hist3d",
    "selected_mrmr",
    "selected_jmi",
    "selected_cmim",
    "selected_icap",
    "selected_mifs",
    "selected_sparse_mrmr",
    "profile_lineitem",  # one-scan numeric profile, lineitem-only
]


def _random_lineitem(seed: int, n: int) -> dict:
    rng = random.Random(seed)
    degenerate = seed % 2 == 1 and seed > 70  # seed 83 branch
    dup_pool_q = [5.0, 17.0, 33.0] if not degenerate else [5.0]
    flags = ["A", "N", "R"] if not degenerate else (["A"] * 9 + ["N"])
    rows = {
        "l_orderkey": [],
        "l_partkey": [],
        "l_suppkey": [],
        "l_linenumber": [],
        "l_quantity": [],
        "l_extendedprice": [],
        "l_discount": [],
        "l_tax": [],
        "l_returnflag": [],
        "l_linestatus": [],
        "l_shipdate": [],
    }
    for i in range(n):
        rows["l_orderkey"].append(rng.randrange(0, 40))  # heavy key reuse
        rows["l_partkey"].append(rng.randrange(0, 25))
        rows["l_suppkey"].append(rng.randrange(0, 12))
        rows["l_linenumber"].append(rng.randint(1, 7))
        rows["l_quantity"].append(
            rng.choice(dup_pool_q) if rng.random() < 0.6 else float(rng.randint(1, 49))
        )
        rows["l_extendedprice"].append(
            round(rng.choice([900.0, 1500.5, 42_000.25, 99_999.99]), 2)
            if rng.random() < 0.5
            else round(rng.uniform(1, 99_999), 2)
        )
        rows["l_discount"].append(rng.randint(0, 10) / 100.0)
        rows["l_tax"].append(0.0 if degenerate else rng.randint(0, 8) / 100.0)
        rows["l_returnflag"].append(rng.choice(flags))
        rows["l_linestatus"].append(rng.choice(["O", "F"]))
        rows["l_shipdate"].append(
            dt.datetime(1992, 1, 1) + dt.timedelta(days=rng.randrange(0, 2400))
        )
    return {
        "l_orderkey": pa.array(rows["l_orderkey"], pa.int64()),
        "l_partkey": pa.array(rows["l_partkey"], pa.int64()),
        "l_suppkey": pa.array(rows["l_suppkey"], pa.int64()),
        "l_linenumber": pa.array(rows["l_linenumber"], pa.int32()),
        "l_quantity": pa.array(rows["l_quantity"], pa.float64()),
        "l_extendedprice": pa.array(rows["l_extendedprice"], pa.float64()),
        "l_discount": pa.array(rows["l_discount"], pa.float64()),
        "l_tax": pa.array(rows["l_tax"], pa.float64()),
        "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
        "l_linestatus": pa.array(rows["l_linestatus"], pa.string()),
        "l_shipdate": pa.array(rows["l_shipdate"], pa.timestamp("us")),
    }


def _random_part(seed: int, n: int) -> dict:
    rng = random.Random(seed * 31 + 1)
    # duplicate-heavy prices: equal-frequency split points land ON tied
    # values, the adversarial case for the quantile walk
    prices = [
        round(rng.choice([901.0, 1200.5, 1200.5, 1777.77, 2098.99]), 2)
        if rng.random() < 0.7
        else round(rng.uniform(900, 2100), 2)
        for _ in range(n)
    ]
    return {
        "p_partkey": pa.array(range(1, n + 1), pa.int64()),
        "p_retailprice": pa.array(prices, pa.float64()),
    }


@pytest.mark.parametrize("seed,n", [(61, 300), (83, 60)])
def test_core_gates_cross_engine_on_random_matrix(spark, tmp_path, seed, n):
    d = tmp_path / f"rm{seed}"
    d.mkdir()
    pq.write_table(pa.table(_random_lineitem(seed, n)), f"{d}/lineitem.parquet")
    pq.write_table(pa.table(_random_part(seed, max(40, n // 3))), f"{d}/part.parquet")
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{d}/lineitem.parquet'")
    duck.execute(f"CREATE VIEW part AS SELECT * FROM '{d}/part.parquet'")
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    for name in CORE_GATES:
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
