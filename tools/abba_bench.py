"""ABBA bench — controlled A/B comparison of two source trees.

The r8 verdict demonstrated that cross-window min-of-3 sweeps CANNOT
detect a 10-15% loop-path change (host wall-clock swings 2-4x with
load), while an interleaved same-window experiment can.  This tool is
the judge's protocol, made repeatable:

    python tools/abba_bench.py TREE_A TREE_B [--rounds 1] [--sf-dir D]

- Each *run* is a FRESH subprocess (own JVM) with PYTHONPATH pointed at
  one tree, executing the dense greedy-loop family (mRMR k10/k25, JMI
  k10, CMIM k10) min-of-3 in-process — the same shape as bench.py's
  b4/b5 and the judge's r8 script.
- Runs interleave A B B A (per --rounds), so slow host drift hits both
  trees symmetrically; the report gives per-query per-tree minima and
  the B/A ratio.

Use this (not cross-window record comparison) whenever a round touches
loop-path code.  Typical call for a regression check against the
previous round boundary:

    git worktree add /tmp/tree_r7 <boundary-commit>
    python tools/abba_bench.py /tmp/tree_r7 /root/repo
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, os, sys, time

from flink_infotheoretic_feature_selection_spark.datasets import features_dense
from flink_infotheoretic_feature_selection_spark.selector import InfoThSelector
from flink_infotheoretic_feature_selection_spark.session import get_spark
from pyspark.storagelevel import StorageLevel

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
spark = get_spark("abba", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
df = features_dense(spark, SF_DIR)
# warm the input cache once so every tree times the fit, not the scan
df = df.persist(StorageLevel.MEMORY_AND_DISK)
df.count()

QUERIES = [
    ("mrmr_k10", "mrmr", 10),
    ("mrmr_k25", "mrmr", 25),
    ("jmi_k10", "jmi", 10),
    ("cmim_k10", "cmim", 10),
]
out = {}
for name, crit, k in QUERIES:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        InfoThSelector(n_to_select=k, criterion=crit).fit(df)
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print("ABBA_RESULT " + json.dumps(out))
"""


def run_tree(tree: str, sf_dir: str) -> dict[str, float]:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(RUNNER)
        path = f.name
    try:
        proc = subprocess.run(
            [sys.executable, path], env=env, capture_output=True, text=True, timeout=3600
        )
        for line in proc.stdout.splitlines():
            if line.startswith("ABBA_RESULT "):
                return json.loads(line[len("ABBA_RESULT ") :])
        raise RuntimeError(
            f"runner in {tree} produced no result:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
    finally:
        os.unlink(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tree_a")
    ap.add_argument("tree_b")
    ap.add_argument("--rounds", type=int, default=1, help="ABBA blocks (4 runs each)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    runs: list[tuple[str, dict[str, float]]] = []
    for r in range(args.rounds):
        for label, tree in (("A", args.tree_a), ("B", args.tree_b), ("B", args.tree_b), ("A", args.tree_a)):
            print(f"[abba] block {r} run {label} ({tree}) ...", file=sys.stderr, flush=True)
            runs.append((label, run_tree(tree, args.sf_dir)))

    queries = list(runs[0][1].keys())
    report: dict[str, dict] = {}
    for q in queries:
        a_vals = [res[q] for lbl, res in runs if lbl == "A"]
        b_vals = [res[q] for lbl, res in runs if lbl == "B"]
        a_min, b_min = min(a_vals), min(b_vals)
        report[q] = {
            "A_runs": a_vals,
            "B_runs": b_vals,
            "A_min": a_min,
            "B_min": b_min,
            "B_over_A": round(b_min / a_min, 3) if a_min > 0 else None,
        }
    print(json.dumps({"tree_a": args.tree_a, "tree_b": args.tree_b, "sf_dir": args.sf_dir, "queries": report}, indent=2))


if __name__ == "__main__":
    main()
