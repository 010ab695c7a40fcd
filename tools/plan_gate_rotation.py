"""Plan the next round's gate ordering under the harness's 50-entry cap.

Reads every CORRECTNESS_r*.json in the repo root plus the current
``queries()`` registry and prints, per gate: its driver-green streak,
the last round it had a green row, and a recommended block-A ordering
for next round following the rotation contract documented at
``__spark_entry__.queries()``:

  block A (first 50) = core gates (always), never-verified entries,
  entries whose last green row is >= 2 rounds old, entries green in
  only one sweep so far; streams last.  block B = everything green in
  the two most recent sweeps it appeared in.

Usage: python tools/plan_gate_rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORE = [
    "features_dense", "class_prior", "distinct_counts", "hist2d", "hist3d",
    "relevance_mi", "mim_topk", "projection", "equal_freq_bucket",
    "equal_width_bucket", "sparse_hist2d", "sparse_hist3d", "selected_mrmr",
    "selected_jmi", "selected_cmim", "selected_icap", "selected_mifs",
    "selected_sparse_mrmr",
]
CAP = 50


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds: dict[int, dict] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if m:
            with open(path) as f:
                rounds[int(m.group(1))] = json.load(f)
    if not rounds:
        sys.exit("no CORRECTNESS_r*.json files found")
    latest = max(rounds)

    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    status = {}
    for name in names:
        greens = sorted(
            rn for rn, data in rounds.items() if data.get(name, {}).get("hash_match")
        )
        streak = 0
        rn = latest
        while rn in rounds and rounds[rn].get(name, {}).get("hash_match"):
            streak += 1
            rn -= 1
        status[name] = {
            "last_green": greens[-1] if greens else None,
            "streak_at_latest": streak,
            "rows_only": name in entry_mod.queries() and name not in entry_mod.oracle_sql(),
        }

    def priority(name: str) -> tuple:
        st = status[name]
        if name in CORE:
            tier = 0
        elif st["last_green"] is None and not st["rows_only"]:
            tier = 1  # never verified (and verifiable)
        elif st["last_green"] is not None and latest - st["last_green"] >= 1:
            # Last green row is 1+ rounds old (it sat in block B for the
            # latest sweep).  If it misses the NEXT sweep too it becomes
            # 2-rounds stale — exactly what the contract test
            # (tests/test_registry_contract.py) alarms on — so it MUST
            # re-enter block A now.  The r7 planner mis-tiered this case
            # as "rotate out" (the else arm below) because it only
            # caught >= 2, i.e. gates already past the deadline.
            tier = 2  # would be 2-rounds stale after next sweep
        elif st["streak_at_latest"] == 1:
            tier = 3  # green exactly once in a row
        elif st["rows_only"]:
            tier = 5
        else:
            tier = 4  # green in the latest 2+ sweeps: safe to rotate out
        stream = name.startswith("stream_")
        return (tier, stream, names.index(name))

    ordered = sorted(names, key=priority)
    print(f"latest round with rows: r{latest}; registry: {len(names)} entries\n")
    print(f"{'#':>3} {'gate':<28} {'tier':<5} {'last_green':<11} streak")
    for i, name in enumerate(ordered):
        st = status[name]
        tier = priority(name)[0]
        marker = " <-- CAP" if i == CAP else ""
        print(
            f"{i + 1:>3} {name:<28} {tier:<5} "
            f"{('r' + str(st['last_green'])) if st['last_green'] else '-':<11} "
            f"{st['streak_at_latest']}{marker}"
        )
    over = ordered[CAP:]
    missing_rows = [n for n in over if status[n]["last_green"] in (None,)]
    if missing_rows:
        print(f"\nWARNING: past-cap entries with NO green row ever: {missing_rows}")


if __name__ == "__main__":
    main()
