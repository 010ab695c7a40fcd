"""Randomized cross-engine sweep for the EVENTS-table gates — the
events twin of test_random_corpus_gate_sweep.

Adversarial structure the fixed generator never stresses together:
duplicate (user_id, ts) pairs (the asof tiebreak), timestamps exactly
on hour/day boundaries (window/rollup edges), identical ts across
users and types, one hot user (~40% of rows — the skew-profile path),
and a props column mixing valid JSON, empty objects, NULLs, junk, a
missing key, negatives, and an int64-overflowing payload (the r4
oracle-crash class).  value keeps the generator's 2-decimal contract
(the exact-cents arithmetic both dialects rely on).
"""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod

EVENT_GATES = [
    "events_window_agg",
    "events_props_agg",
    "funnel_conversion",
    "sessionize",
    "asof_join",
    "range_join_agg",
    "hypertable_rollup",
    "key_skew_profile",
]

TYPES = ["click", "purchase", "error", "signup", "view"]
PROPS = [
    '{"k": 7}', '{"k": 0}', '{"k": -5}', "{}", None, "not json",
    '{"j": 1}', '{"k": 99999999999999999999999999}', '{"k": 3, "j": 9}',
    # Spark-lenient / DuckDB-strict payloads (the r6 advisor's
    # divergence class): get_json_object parses single quotes where
    # json_valid is false; parse_props's strict-JSON probe must NULL
    # them on the Spark side too.  Leading-zero numbers and bare
    # scalars exercise the other strictness edges.
    "{'k': 7}", "{k: 11}", '{"k": 07}', "5",
]


def _random_events(seed: int, n: int = 80) -> dict:
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        user = 0 if rng.random() < 0.4 else rng.randint(1, 5)
        roll = rng.random()
        if rows and roll < 0.15:
            ts = rows[rng.randrange(len(rows))][1]  # exact ts collision
        elif roll < 0.30:
            ts = base + dt.timedelta(hours=rng.randint(0, 72))  # boundary
        else:
            ts = base + dt.timedelta(seconds=rng.randint(0, 72 * 3600))
        rows.append(
            (
                i,
                ts,
                user,
                rng.choice(TYPES),
                rng.randint(0, 99999) / 100.0,
                rng.choice(PROPS),
            )
        )
    return {
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    }


@pytest.mark.parametrize("seed", [5, 19, 31])
def test_events_gates_cross_engine_on_random_events(spark, tmp_path, seed):
    d = tmp_path / f"re{seed}"
    d.mkdir()
    pq.write_table(pa.table(_random_events(seed)), f"{d}/events.parquet")
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    for name in EVENT_GATES:
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


def test_events_gates_on_hot_key_corpus(spark, tmp_path):
    # Skew axis (r8): one user owns ~90% of all events — the hot-key
    # profile real clickstreams have and the random generator (6 users,
    # mild 40% skew) never reaches.  Exercises: sessionize's per-user
    # window over one giant key, funnel ordering inside a 450-event
    # user, key_skew_profile's top-key stats, hypertable rollup with one
    # dominant group, and as-of/range joins where one side's key
    # distribution is degenerate.  Values must stay bit-exact — skew may
    # move work, never results.
    rng = random.Random(23)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(500):
        user = 0 if i % 10 else rng.randint(1, 4)  # user 0 holds ~90%
        # dense same-user ts collisions + session gaps
        if rng.random() < 0.2 and rows:
            ts = rows[-1][1]
        else:
            ts = base + dt.timedelta(seconds=rng.randint(0, 72 * 3600))
        rows.append(
            (i, ts, user, rng.choice(TYPES), rng.randint(0, 99999) / 100.0,
             rng.choice(PROPS))
        )
    tbl = {
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    }
    d = tmp_path / "hotkey"
    d.mkdir()
    pq.write_table(pa.table(tbl), f"{d}/events.parquet")
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    for name in EVENT_GATES:
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
