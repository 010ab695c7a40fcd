"""Status viewer for the gate-rotation contract.

Since round 7 the registry ORDERS ITSELF: ``__spark_entry__.queries()``
re-ranks its base order via ``rotation_order`` against the
CORRECTNESS_r*.json history on disk, so the first ``GATE_CAP`` entries
are always the right block A for the next driver sweep (the invariants
are pinned in tests/test_registry_contract.py, including on synthetic
multi-round histories).  This tool just PRINTS that ordering with each
gate's tier, last green round, and current streak — nothing to apply.

Usage: python tools/plan_gate_rotation.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    rounds = entry_mod.rotation_history()
    if not rounds:
        sys.exit("no CORRECTNESS_r*.json files found")
    latest = max(rounds)

    names = list(entry_mod.queries())  # already rotation-ordered
    last_green: dict[str, int] = {}
    for rn in sorted(rounds):
        for n, row in rounds[rn].items():
            if isinstance(row, dict) and row.get("hash_match"):
                last_green[n] = rn

    def streak(name: str) -> int:
        k, rn = 0, latest
        while rn in rounds and rounds[rn].get(name, {}).get("hash_match"):
            k += 1
            rn -= 1
        return k

    def tier(name: str) -> int:
        return entry_mod.rotation_tier(name, names, rounds)

    print(
        f"latest round with rows: r{latest}; registry: {len(names)} entries "
        f"(self-ordered)\n"
    )
    print(f"{'#':>3} {'gate':<28} {'tier':<5} {'last_green':<11} streak")
    for i, name in enumerate(names):
        marker = " <-- CAP" if i == entry_mod.GATE_CAP else ""
        lg = last_green.get(name)
        print(
            f"{i + 1:>3} {name:<28} {tier(name):<5} "
            f"{('r' + str(lg)) if lg else '-':<11} {streak(name)}{marker}"
        )
    over = names[entry_mod.GATE_CAP:]
    missing = [n for n in over if n not in last_green]
    if missing:
        print(f"\nWARNING: past-cap entries with NO green row ever: {missing}")


if __name__ == "__main__":
    main()
