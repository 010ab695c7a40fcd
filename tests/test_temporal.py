"""Temporal operators: as-of join, bucketed range join, hypertable
rollup — hand-computed semantics on crafted fixtures plus plan-shape
witnesses (the as-of plan contains NO join; the range join is a single
equi-join, never a cross product)."""

import datetime as dt

from pyspark.sql import functions as F

from flink_infotheoretic_feature_selection_spark.operators.temporal import (
    asof_join,
    asof_join_query,
    hypertable_rollup,
    range_join,
    range_join_query,
)
from flink_infotheoretic_feature_selection_spark.plans import formatted_plan


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_asof_join_hand_computed(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(20), 101), (1, _ts(5), 102), (2, _ts(50), 103)],
        "user_id long, ts timestamp, event_id long",
    )
    ref = spark.createDataFrame(
        [(1, _ts(8), 1.0), (1, _ts(20), 2.0), (3, _ts(1), 9.0)],
        "user_id long, ts timestamp, ref_value double",
    )
    out = {
        r["event_id"]: (r["ref_ts"], r["ref_value"])
        for r in asof_join(left, ref).collect()
    }
    assert out[100] == (_ts(8), 1.0)  # latest ref at ts<=10 is ts=8
    assert out[101] == (_ts(20), 2.0)  # exact tie is INCLUSIVE
    assert out[102] == (None, None)  # no ref yet -> nulls
    assert out[103] == (None, None)  # user 2 has no refs at all


def test_asof_join_plan_has_no_join_operator(spark):
    left = spark.createDataFrame([(1, _ts(10), 7)], "user_id long, ts timestamp, event_id long")
    ref = spark.createDataFrame([(1, _ts(5), 1.0)], "user_id long, ts timestamp, ref_value double")
    plan = formatted_plan(asof_join(left, ref))
    assert "Join" not in plan  # union + window, never a join
    assert "Window" in plan


def test_asof_join_query_matches_per_user_scan(spark, sf_dir):
    # brute-force check at sf0.001: for each click, linear-scan the
    # error events of that user
    from flink_infotheoretic_feature_selection_spark.datasets import load_events

    ev = load_events(spark, sf_dir).collect()
    errors = {}
    for r in ev:
        if r["event_type"] == "error":
            errors.setdefault(r["user_id"], []).append(r)
    expect = {}
    for r in ev:
        if r["event_type"] != "click":
            continue
        cands = [e for e in errors.get(r["user_id"], []) if e["ts"] <= r["ts"]]
        if cands:
            best_ts = max(e["ts"] for e in cands)
            at_ts = [e for e in cands if e["ts"] == best_ts]
            best = max(at_ts, key=lambda e: e["event_id"])  # dedup rule
            expect[r["event_id"]] = (best["ts"], best["value"])
        else:
            expect[r["event_id"]] = (None, None)
    got = {
        r["event_id"]: (r["ref_ts"], r["ref_value"])
        for r in asof_join_query(spark, sf_dir).collect()
    }
    assert got == expect


def test_range_join_boundaries_and_bucket_spill(spark):
    # interval [100s, 220s) with 60s buckets -> spans 3 buckets? No:
    # width must be >= interval length; use 120s buckets.  Probe points
    # pin: start inclusive, end exclusive, and a match in the SECOND
    # covered bucket is still found exactly once.
    iv = spark.createDataFrame(
        [(1, _ts(100), _ts(220))], "interval_id long, start timestamp, end timestamp"
    )
    probe = spark.createDataFrame(
        [(_ts(100), 1.0), (_ts(219), 2.0), (_ts(220), 3.0), (_ts(99), 4.0), (_ts(150), 5.0)],
        "ts timestamp, value double",
    )
    rows = range_join(iv, probe, 120_000_000).select("ts", "interval_id").collect()
    got = sorted(r["ts"] for r in rows)
    assert got == [_ts(100), _ts(150), _ts(219)]  # 220 excluded, 99 before
    assert len(rows) == len(set(got))  # exactly-once, no dedup needed


def test_range_join_plan_is_single_equi_join(spark):
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(100))], "interval_id long, start timestamp, end timestamp"
    )
    probe = spark.createDataFrame([(_ts(5), 1.0)], "ts timestamp, value double")
    plan = formatted_plan(range_join(iv, probe, 120_000_000))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_query_matches_brute_force(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.datasets import load_events

    ev = load_events(spark, sf_dir).collect()
    views = [r for r in ev if r["event_type"] == "view"]
    expect = {}
    for e in ev:
        if e["event_type"] != "error":
            continue
        hits = [
            v for v in views
            if e["ts"] <= v["ts"] < e["ts"] + dt.timedelta(seconds=120)
        ]
        if hits:
            expect[e["event_id"]] = (
                len(hits),
                sum(int(round(v["value"] * 100)) for v in hits),
            )
    got = {
        r["interval_id"]: (r["n_hits"], r["sum_cents"])
        for r in range_join_query(spark, sf_dir).collect()
    }
    assert got == expect


def test_hypertable_rollup_grains_consistent(spark, sf_dir):
    df = hypertable_rollup(spark, sf_dir).collect()
    hour = [r for r in df if r["grain"] == "hour"]
    day = [r for r in df if r["grain"] == "day"]
    assert hour and day
    # day cells == sum of their hour cells, per event_type
    agg = {}
    for r in hour:
        k = (r["bucket_ts"].date(), r["event_type"])
        n, s = agg.get(k, (0, 0))
        agg[k] = (n + r["n_events"], s + r["sum_cents"])
    for r in day:
        assert agg[(r["bucket_ts"].date(), r["event_type"])] == (
            r["n_events"],
            r["sum_cents"],
        )
    # hour buckets are truncated timestamps
    assert all(r["bucket_ts"].minute == 0 and r["bucket_ts"].second == 0 for r in hour)


def test_hypertable_rollup_single_scan(spark, sf_dir):
    plan = formatted_plan(hypertable_rollup(spark, sf_dir))
    # one file-scan node == one "Location:" detail block
    assert plan.count("Location:") == 1
    assert "Expand" in plan  # grouping-sets expand, map-side
    assert "partial_count" in plan  # partial agg BELOW the exchange


def test_asof_join_randomized_vs_brute_force(spark):
    # seeded-random micro-tables (duplicate ts on both sides, sparse
    # keys) checked against a linear-scan reference — one Spark job per
    # seed, not per hypothesis example
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        left_rows = [
            (rng.randint(1, 4), _ts(rng.randint(0, 50)), i)
            for i in range(40)
        ]
        ref_rows = [
            (rng.randint(1, 4), _ts(rng.randint(0, 50)), float(i))
            for i in range(30)
        ]
        left = spark.createDataFrame(left_rows, "user_id long, ts timestamp, event_id long")
        # dedupe ref to unique (key, ts) with max-value rule (mirrors
        # asof_join_query's max_by discipline)
        best = {}
        for k, t, v in ref_rows:
            if (k, t) not in best or v > best[(k, t)]:
                best[(k, t)] = v
        ref = spark.createDataFrame(
            [(k, t, v) for (k, t), v in best.items()],
            "user_id long, ts timestamp, ref_value double",
        )
        got = {
            r["event_id"]: (r["ref_ts"], r["ref_value"])
            for r in asof_join(left, ref).collect()
        }
        for k, t, i in left_rows:
            cands = [(rt, v) for (rk, rt), v in best.items() if rk == k and rt <= t]
            expect = max(cands, key=lambda c: c[0]) if cands else (None, None)
            assert got[i] == expect, (seed, i)


def test_range_join_randomized_vs_brute_force(spark):
    import datetime as dtm
    import random

    for seed in (3, 9):
        rng = random.Random(seed)
        iv_rows = [
            (i, _ts(rng.randint(0, 300)))
            for i in range(15)
        ]
        probe_rows = [(_ts(rng.randint(0, 500)), float(i)) for i in range(80)]
        iv = spark.createDataFrame(
            [(i, s, s + dtm.timedelta(seconds=120)) for i, s in iv_rows],
            "interval_id long, start timestamp, end timestamp",
        )
        probe = spark.createDataFrame(probe_rows, "ts timestamp, value double")
        got = sorted(
            (r["interval_id"], r["ts"], r["value"])
            for r in range_join(iv, probe, 120_000_000).collect()
        )
        expect = sorted(
            (i, t, v)
            for i, s in iv_rows
            for t, v in probe_rows
            if s <= t < s + dtm.timedelta(seconds=120)
        )
        assert got == expect, seed


def test_asof_join_single_exchange(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.temporal import asof_join_query
    from flink_infotheoretic_feature_selection_spark.plans import exchange_count

    # union-interleave: both sides flow into ONE exchange (the window's
    # hashpartitioning on user_id) — the whole point of the no-join shape
    assert exchange_count(asof_join_query(spark, sf_dir)) == 1


def test_asof_join_ref_tiebreak_resolves_duplicates(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(5), 101)], "user_id long, ts timestamp, event_id long"
    )
    # three refs at the SAME (user, ts): winner must be max event_id (=9)
    ref = spark.createDataFrame(
        [(1, _ts(5), 7, 1.0), (1, _ts(5), 9, 2.0), (1, _ts(5), 8, 3.0)],
        "user_id long, ts timestamp, event_id long, ref_value double",
    )
    out = {
        r["event_id"]: r["ref_value"]
        for r in asof_join(left, ref, ref_tiebreak="event_id").collect()
    }
    assert out == {100: 2.0, 101: 2.0}  # exact tie inclusive, max-id wins


def test_asof_join_null_ref_column_carries_whole_row(spark):
    # review finding: per-column last(ignorenulls) built a "frankenrow"
    # mixing columns from different ref rows when a ref column was NULL.
    # The latest ref row must win ATOMICALLY, nulls and all.
    left = spark.createDataFrame(
        [(1, _ts(20), 100)], "user_id long, ts timestamp, event_id long"
    )
    ref = spark.createDataFrame(
        [(1, _ts(5), 5.0), (1, _ts(10), None)],
        "user_id long, ts timestamp, ref_value double",
    )
    r = asof_join(left, ref).collect()[0]
    assert r["ref_ts"] == _ts(10)
    assert r["ref_value"] is None  # NOT 5.0 carried from the older row


def test_range_join_ignores_inverted_intervals(spark):
    # review finding: sequence(a, b) with b < a runs DESCENDING — an
    # end<=start interval must produce zero matches and zero fan-out,
    # not thousands of spurious bucket rows.
    iv = spark.createDataFrame(
        [(1, _ts(1000), _ts(0)), (2, _ts(0), _ts(0)), (3, _ts(0), _ts(100))],
        "interval_id long, start timestamp, end timestamp",
    )
    probe = spark.createDataFrame([(_ts(50), 1.0)], "ts timestamp, value double")
    rows = range_join(iv, probe, 120_000_000).collect()
    assert [r["interval_id"] for r in rows] == [3]


def test_funnel_conversion_matches_brute_force(spark, sf_dir):
    import datetime as dtm

    from flink_infotheoretic_feature_selection_spark.datasets import load_events
    from flink_infotheoretic_feature_selection_spark.operators.events import (
        funnel_conversion,
    )

    ev = sorted(
        load_events(spark, sf_dir).collect(), key=lambda r: (r["ts"], r["event_id"])
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    horizon = dtm.timedelta(days=1)
    s1 = s2 = s3 = 0
    for rows in by_user.values():
        t1 = t2 = None
        reached3 = False
        for r in rows:
            if r["event_type"] == "view" and t1 is None:
                t1 = r["ts"]
            elif r["event_type"] == "click" and t1 is not None and t2 is None:
                if r["ts"] <= t1 + horizon:
                    t2 = r["ts"]
            elif r["event_type"] == "purchase" and t2 is not None:
                if r["ts"] <= t1 + horizon:
                    reached3 = True
        s1 += t1 is not None
        s2 += t2 is not None
        s3 += reached3
    got = {r["step"]: r["n_users"] for r in funnel_conversion(spark, sf_dir).collect()}
    assert got == {"view": s1, "click": s2, "purchase": s3}
    assert got["view"] >= got["click"] >= got["purchase"]


def test_funnel_single_user_partitioning(spark, sf_dir):
    from flink_infotheoretic_feature_selection_spark.operators.events import (
        funnel_conversion,
    )
    from flink_infotheoretic_feature_selection_spark.plans import formatted_plan

    plan = formatted_plan(funnel_conversion(spark, sf_dir))
    # both window passes + the per-user agg share the ONE
    # hashpartitioning(user_id) exchange; remaining exchanges are the
    # scalar single-partition finals of the three stage counts
    assert plan.count("hashpartitioning(user_id") == 1


def test_asof_join_forward_hand_computed(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(20), 101), (1, _ts(30), 102)],
        "user_id long, ts timestamp, event_id long",
    )
    ref = spark.createDataFrame(
        [(1, _ts(12), 1.0), (1, _ts(20), 2.0)],
        "user_id long, ts timestamp, ref_value double",
    )
    out = {
        r["event_id"]: (r["ref_ts"], r["ref_value"])
        for r in asof_join(left, ref, direction="forward").collect()
    }
    assert out[100] == (_ts(12), 1.0)  # earliest ref at ts>=10
    assert out[101] == (_ts(20), 2.0)  # exact tie inclusive
    assert out[102] == (None, None)  # nothing after 30


def test_asof_join_rejects_bad_direction(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(1, _ts(1), 1)], "user_id long, ts timestamp, event_id long")
    ref = spark.createDataFrame([(1, _ts(1), 1.0)], "user_id long, ts timestamp, ref_value double")
    with _pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, ref, direction="sideways")


# ---------------------------------------------------------------------------
# Property tests: random tie/duplicate-heavy inputs vs a pure-Python
# brute force.  Tiny key/ts domains FORCE the adversarial cases — exact
# ts ties between left and ref, duplicate (key, ts) ref rows resolved by
# the tiebreak, keys present on only one side — in almost every example.
# ---------------------------------------------------------------------------
def test_asof_join_property_random_vs_brute_force(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    left_s = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 9)), min_size=0, max_size=10
    )
    ref_s = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 9), st.integers(-3, 3)),
        min_size=0,
        max_size=10,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(left=left_s, ref=ref_s, direction=st.sampled_from(["backward", "forward"]))
    def check(left, ref, direction):
        lrows = [(k, _ts(s), i) for i, (k, s) in enumerate(left)]
        rrows = [(k, _ts(s), 100 + i, float(v)) for i, (k, s, v) in enumerate(ref)]
        ldf = spark.createDataFrame(lrows, "user_id long, ts timestamp, event_id long")
        rdf = spark.createDataFrame(
            rrows, "user_id long, ts timestamp, rid long, ref_value double"
        )
        got = {
            r["event_id"]: (r["ref_ts"], r["ref_value"])
            for r in asof_join(
                ldf, rdf, ref_tiebreak="rid", direction=direction
            ).collect()
        }
        expect = {}
        for k, lts, lid in lrows:
            if direction == "backward":
                cands = [r for r in rrows if r[0] == k and r[1] <= lts]
                best_ts = max((r[1] for r in cands), default=None)
            else:
                cands = [r for r in rrows if r[0] == k and r[1] >= lts]
                best_ts = min((r[1] for r in cands), default=None)
            if best_ts is None:
                expect[lid] = (None, None)
            else:
                best = max((r for r in cands if r[1] == best_ts), key=lambda r: r[2])
                expect[lid] = (best[1], best[3])
        assert got == expect, (left, ref, direction)

    check()


def test_range_join_property_random_vs_brute_force(spark):
    # Exactly-once pairing on random intervals/probes, including
    # boundary probes (ts == start included, ts == end excluded),
    # empty/inverted intervals (dropped before the explode), and bucket
    # widths both exactly equal to and larger than the longest interval.
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    iv_s = st.lists(
        st.tuples(st.integers(0, 30), st.integers(-3, 8)),  # (start, dur) sec
        min_size=0,
        max_size=8,
    )
    pb_s = st.lists(st.integers(0, 40), min_size=0, max_size=12)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ivs=iv_s, pbs=pb_s, slack=st.sampled_from([0, 1, 7]))
    def check(ivs, pbs, slack):
        max_dur = max((d for _, d in ivs), default=1)
        width_us = max(max_dur + slack, 1) * 1_000_000
        irows = [(i, _ts(s), _ts(s + d)) for i, (s, d) in enumerate(ivs)]
        prows = [(100 + j, _ts(s)) for j, s in enumerate(pbs)]
        idf = spark.createDataFrame(
            irows, "interval_id long, start timestamp, end timestamp"
        )
        pdf = spark.createDataFrame(prows, "probe_id long, ts timestamp")
        got = sorted(
            (r["interval_id"], r["probe_id"])
            for r in range_join(idf, pdf, width_us).collect()
        )
        expect = sorted(
            (i, pid)
            for i, st_, en in irows
            for pid, ts in prows
            if st_ < en and st_ <= ts < en
        )
        assert got == expect, (ivs, pbs, slack)

    check()
