"""In-repo enforcement of the gate-rotation contract.

The driver's correctness gate processes exactly the FIRST 50 entries of
``__spark_entry__.queries()`` (entry-count cap, observed at 50/55 in r3,
50/76 in r4, 50/81 in r5).  Since round 7 the registry orders ITSELF
from the on-disk CORRECTNESS history (``rotation_order``), so these
invariants hold by construction the moment a new CORRECTNESS file lands
— no per-round hand reorder, no red snapshot at round boundaries.  The
live-ordering tests below still run against whatever is on disk (they
catch a broken rotation_order), and the synthetic-history tests prove
the self-rotation keeps every gate within the 2-round period across
arbitrary future rounds.
"""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entry_mod

CAP = 50
CORE = [
    "features_dense", "class_prior", "distinct_counts", "hist2d", "hist3d",
    "relevance_mi", "mim_topk", "projection", "equal_freq_bucket",
    "equal_width_bucket", "sparse_hist2d", "sparse_hist3d", "selected_mrmr",
    "selected_jmi", "selected_cmim", "selected_icap", "selected_mifs",
    "selected_sparse_mrmr",
]
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _history():
    rounds = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if m:
            with open(path) as f:
                rounds[int(m.group(1))] = json.load(f)
    return rounds


def test_core_gates_open_the_registry():
    names = list(entry_mod.queries())
    assert names[: len(CORE)] == CORE, (
        "the 18 SURVEY-§2 core gates must be the first entries, in order"
    )


def test_every_query_has_an_oracle():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(q) == set(o), (
        f"queries()/oracle_sql() key mismatch: "
        f"missing={sorted(set(q) - set(o))} extra={sorted(set(o) - set(q))}"
    )


def test_never_verified_gates_sit_inside_the_cap():
    rounds = _history()
    assert rounds, "CORRECTNESS_r*.json history missing"
    names = list(entry_mod.queries())
    ever_green = {
        n
        for data in rounds.values()
        for n, row in data.items()
        if isinstance(row, dict) and row.get("hash_match")
    }
    parked = [n for n in names[CAP:] if n not in ever_green]
    assert not parked, (
        f"entries with NO green driver row ever are past the 50-entry cap "
        f"and will never get one: {parked}"
    )


def test_would_be_2_rounds_stale_gates_sit_inside_the_cap():
    # An entry whose last green row is already >= latest-1 rounds old goes
    # 2+ rounds stale if it misses the next sweep — the rotation period
    # contract (every gate re-verified within 2 rounds) requires it in
    # block A.
    rounds = _history()
    if not rounds:
        return
    latest = max(rounds)
    names = list(entry_mod.queries())
    last_green = {}
    for rn in sorted(rounds):
        for n, row in rounds[rn].items():
            if isinstance(row, dict) and row.get("hash_match"):
                last_green[n] = rn
    stale = [
        n
        for n in names[CAP:]
        if n in last_green and latest - last_green[n] >= 1
    ]
    assert not stale, (
        f"entries whose last green row is r{latest - 1} or older are past "
        f"the cap and would exceed the 2-round re-verification period: {stale}"
    )


def test_registry_size_keeps_rotation_period_under_two_rounds():
    # 50 verified per round; everything in block B was verified LAST
    # round by construction (the two tests above) — that only holds while
    # the registry stays within 2*CAP entries.
    n = len(entry_mod.queries())
    assert n <= 2 * CAP, (
        f"registry has {n} entries; 2-round rotation needs <= {2 * CAP} — "
        "consolidate gates before adding (keel_read precedent, r6/r7)"
    )


def _green(names):
    return {n: {"hash_match": True} for n in names}


def test_rotation_is_self_sustaining_over_simulated_rounds():
    # Drop a synthetic green sweep for whatever block A the registry
    # presents, recompute the ordering, repeat: no gate may ever go 2+
    # rounds without a row.  This is the exact loop the driver runs, so
    # it proves the judge's pytest stays green at every round boundary.
    names = list(entry_mod.queries())
    rounds = dict(_history())
    start = (max(rounds) if rounds else 0) + 1
    order = entry_mod.rotation_order(names, rounds)
    for rn in range(start, start + 10):
        rounds[rn] = _green(order[:CAP])
        order = entry_mod.rotation_order(names, rounds)
        last_green = {}
        for r in sorted(rounds):
            for n, row in rounds[r].items():
                if isinstance(row, dict) and row.get("hash_match"):
                    last_green[n] = r
        stale = [n for n in names if rn - last_green.get(n, -10**9) >= 2]
        assert not stale, f"after simulated r{rn}: {stale} went 2+ rounds stale"
        assert order[: len(CORE)] == CORE


def test_rotation_prioritizes_never_verified_and_stale_gates():
    names = [f"g{i:02d}" for i in range(6)] + ["stream_x", "new_gate"]
    core = []  # no core gates in this synthetic registry
    old_core = entry_mod.CORE_GATES[:]
    entry_mod.CORE_GATES[:] = core
    try:
        rounds = {
            1: _green(["g00", "g01", "g02", "stream_x"]),
            2: _green(["g02", "g03", "g04", "g05"]),
        }
        order = entry_mod.rotation_order(names, rounds)
        # never verified first; then 1-round-old gates (non-streams before
        # streams); then streak-1; then the 2-streak g02 last
        assert order[0] == "new_gate"
        assert order[1:4] == ["g00", "g01", "stream_x"]
        assert set(order[4:7]) == {"g03", "g04", "g05"}
        assert order[7] == "g02"
    finally:
        entry_mod.CORE_GATES[:] = old_core


def test_rotation_with_no_history_keeps_base_order():
    names = ["features_dense", "b", "a", "stream_z"]
    assert entry_mod.rotation_order(names, {}) == [
        "features_dense", "b", "a", "stream_z",
    ]


def test_rotation_promote_names_exist_in_the_registry():
    # a typo in ROTATION_PROMOTE would silently promote nothing
    unknown = entry_mod.ROTATION_PROMOTE - set(entry_mod.queries())
    assert not unknown, f"ROTATION_PROMOTE names not in queries(): {unknown}"


def test_rotation_survives_malformed_history(tmp_path):
    # a corrupt CORRECTNESS file or non-dict rows must degrade the
    # ordering, never crash queries() (the driver gate imports through it)
    (tmp_path / "CORRECTNESS_r1.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r2.json").write_text('["a", "list"]')
    (tmp_path / "CORRECTNESS_r3.json").write_text(
        '{"g0": {"hash_match": true}, "g1": "oops", "g2": null}'
    )
    rounds = entry_mod.rotation_history(str(tmp_path))
    assert list(rounds) == [3]
    old_core = entry_mod.CORE_GATES[:]
    entry_mod.CORE_GATES[:] = []
    try:
        order = entry_mod.rotation_order(["g0", "g1", "g2"], rounds)
    finally:
        entry_mod.CORE_GATES[:] = old_core
    # g1/g2 have no VALID green row -> never-verified tier, ahead of g0
    assert order == ["g1", "g2", "g0"]


# ---- churn-driven promotion (r8: the r7 verdict's ask #3) ----------------


def test_code_touched_gate_lands_in_block_a_even_when_freshly_green():
    # Synthetic: a gate green in the latest 2+ sweeps (tier 5, normally
    # rotated out) must land inside the cap when its code changed.
    names = list(entry_mod._base_queries())
    target = "epoch_shuffle"
    rounds = {
        1: {n: {"hash_match": True} for n in names},
        2: {n: {"hash_match": True} for n in names},
    }
    cold = entry_mod.rotation_order(names, rounds, promote=frozenset())
    hot = entry_mod.rotation_order(names, rounds, promote=frozenset({target}))
    assert target in hot[:CAP]
    # and the promotion is what moved it, not base-order luck
    assert hot.index(target) <= cold.index(target)
    tiers = [entry_mod.rotation_tier(n, names, rounds, frozenset({target})) for n in hot[:CAP]]
    assert entry_mod.rotation_tier(target, names, rounds, frozenset({target})) == 3
    # nothing staler (tier 1/2) was displaced to make room
    assert all(t <= 3 for t in tiers[: tiers.index(3) + 1])


def test_rotation_promote_derives_from_file_churn(monkeypatch):
    # A change in a shared package module must promote every gate whose
    # import closure reaches it — the exact under-promotion the r7 gram
    # rewrite exposed (17 dependent gates, only 1 hand-promoted).
    sel = "flink_infotheoretic_feature_selection_spark/operators/dedup.py"
    monkeypatch.setattr(
        entry_mod, "changed_files_since_last_round", lambda root: {sel}
    )
    got = entry_mod.rotation_promote(entry_mod._base_queries(), root=ROOT)
    for expected in ("dedup_exact", "minhash_lsh_pairs", "simhash64_mining", "decontaminate"):
        assert expected in got, f"{expected} depends on dedup.py but was not promoted"
    # a gate with no dedup dependency must NOT be promoted
    assert "equal_freq_bucket" not in got


def test_rotation_promote_degrades_to_manual_set_on_git_failure(monkeypatch):
    monkeypatch.setattr(
        entry_mod, "changed_files_since_last_round", lambda root: None
    )
    got = entry_mod.rotation_promote(entry_mod._base_queries(), root=ROOT)
    assert got == entry_mod.ROTATION_PROMOTE


def test_gate_source_mapping_sees_both_registry_shapes():
    # direct module functions map to their defining file; entry-file
    # _q_* wrappers map through aliases/inner imports
    aliases = entry_mod._entry_alias_files(ROOT)
    base = entry_mod._base_queries()
    direct = entry_mod._gate_direct_files(base["dedup_exact"], aliases, ROOT)
    assert "flink_infotheoretic_feature_selection_spark/operators/dedup.py" in direct
    keel = entry_mod._gate_direct_files(base["keel_read"], aliases, ROOT)
    assert any(f.endswith("sources/keel.py") for f in keel), keel


def test_changed_files_since_last_round_answers_in_this_repo():
    changed = entry_mod.changed_files_since_last_round(ROOT)
    # this repo has round-boundary commits; git must answer (the set may
    # be empty right after a round lands, but must not be None)
    assert changed is not None


def test_import_closure_complete_under_cycles(tmp_path):
    # r8 review find: recursive memoization cached a mid-cycle node's
    # incomplete closure (A<->B with A->C lost C from closure[B]); the
    # fixpoint form must be complete on cyclic graphs.
    pkg = tmp_path / "flink_infotheoretic_feature_selection_spark"
    pkg.mkdir()
    (pkg / "a.py").write_text(
        "import flink_infotheoretic_feature_selection_spark.b\n"
        "import flink_infotheoretic_feature_selection_spark.c\n"
    )
    (pkg / "b.py").write_text("import flink_infotheoretic_feature_selection_spark.a\n")
    (pkg / "c.py").write_text("x = 1\n")
    closure = entry_mod._package_import_closure(str(tmp_path))
    pfx = "flink_infotheoretic_feature_selection_spark/"
    assert closure[pfx + "b.py"] == {pfx + "a.py", pfx + "b.py", pfx + "c.py"}
    assert closure[pfx + "a.py"] == {pfx + "a.py", pfx + "b.py", pfx + "c.py"}
    assert closure[pfx + "c.py"] == {pfx + "c.py"}


def test_rotation_promote_does_not_cache_degraded_result(monkeypatch):
    # a transient git failure must degrade THIS call only — caching the
    # empty set would silently disable churn promotion process-wide
    monkeypatch.setattr(entry_mod, "_ROTATION_PROMOTE_CACHE", None)
    calls = {"n": 0}

    def flaky(root):
        calls["n"] += 1
        return None if calls["n"] == 1 else {
            "flink_infotheoretic_feature_selection_spark/operators/dedup.py"
        }

    monkeypatch.setattr(entry_mod, "changed_files_since_last_round", flaky)
    first = entry_mod.rotation_promote(root=ROOT)
    assert first == entry_mod.ROTATION_PROMOTE
    assert entry_mod._ROTATION_PROMOTE_CACHE is None  # not poisoned
    second = entry_mod.rotation_promote(root=ROOT)
    assert "dedup_exact" in second  # recovered on the next call


def test_rotation_promote_cache_invalidates_on_new_churn(monkeypatch):
    # r9 (advisor): the cache is keyed on the changed-file set — a file
    # edited AFTER the first default-args call must still promote its
    # dependents in the same process (the old process-lifetime cache
    # silently froze the first answer)
    monkeypatch.setattr(entry_mod, "_ROTATION_PROMOTE_CACHE", None)
    state = {"changed": set()}
    monkeypatch.setattr(
        entry_mod, "changed_files_since_last_round", lambda root: state["changed"]
    )
    first = entry_mod.rotation_promote(root=ROOT)
    assert first == entry_mod.ROTATION_PROMOTE
    # now a package file changes mid-session
    state["changed"] = {"flink_infotheoretic_feature_selection_spark/operators/dedup.py"}
    second = entry_mod.rotation_promote(root=ROOT)
    assert "dedup_exact" in second
    # and the recomputed answer is itself cached under the new key
    third = entry_mod.rotation_promote(root=ROOT)
    assert third == second


def test_gate_wrapper_with_no_parsed_deps_over_promotes():
    # r9 (advisor): an entry-file wrapper whose body shows no package
    # imports/aliases (it delegates to another entry-file helper) must
    # map to ALL aliased files — over-promotion is the safe error —
    # rather than silently dropping out of churn promotion
    aliases = entry_mod._entry_alias_files(ROOT)

    def _q_delegating(spark, sf_dir):
        return _some_entry_helper(spark, sf_dir)  # noqa: F821

    got = entry_mod._gate_direct_files(_q_delegating, aliases, ROOT)
    assert got == set().union(*aliases.values(), set())
    assert got  # the fallback set is non-empty in this repo
