"""Phase-level ABBA — localize a dense-loop delta to pack/stats/
relevance/loop using the model's fit_timings breakdown.

Same interleaved-subprocess protocol as tools/abba_bench.py, but each
run reports per-PHASE minima for mRMR k25 (the most loop-dominated
headline query), so a wall-clock delta can be attributed to the phase
that actually carries it instead of re-guessing from totals.

Usage: python tools/abba_phases.py TREE_A TREE_B [--rounds 2] [--sf-dir D]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, os, time

from flink_infotheoretic_feature_selection_spark.datasets import features_dense
from flink_infotheoretic_feature_selection_spark.selector import InfoThSelector
from flink_infotheoretic_feature_selection_spark.session import get_spark
from pyspark.storagelevel import StorageLevel

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
spark = get_spark("abba-phases", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
df = features_dense(spark, SF_DIR).persist(StorageLevel.MEMORY_AND_DISK)
df.count()

best: dict = {}
for _ in range(3):
    t0 = time.perf_counter()
    m = InfoThSelector(n_to_select=25, criterion="mrmr").fit(df)
    wall = time.perf_counter() - t0
    t = dict(m.fit_timings or {})
    t["wall"] = round(wall, 3)
    iters = t.get("iterations") or 1
    t["loop_iter"] = round(t.get("loop_sec", 0.0) / iters, 4)
    for k, v in t.items():
        if isinstance(v, (int, float)):
            best[k] = min(best.get(k, float("inf")), v)
print("ABBA_RESULT " + json.dumps(best))
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
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    runs: list[tuple[str, dict[str, float]]] = []
    for r in range(args.rounds):
        for label, tree in (("A", args.tree_a), ("B", args.tree_b), ("B", args.tree_b), ("A", args.tree_a)):
            print(f"[abba-phases] block {r} run {label} ({tree}) ...", file=sys.stderr, flush=True)
            runs.append((label, run_tree(tree, args.sf_dir)))

    keys = sorted({k for _, res in runs for k in res})
    report: dict[str, dict] = {}
    for k in keys:
        a_vals = [res[k] for lbl, res in runs if lbl == "A" and k in res]
        b_vals = [res[k] for lbl, res in runs if lbl == "B" and k in res]
        a_min, b_min = min(a_vals), min(b_vals)
        report[k] = {
            "A_runs": a_vals,
            "B_runs": b_vals,
            "A_min": a_min,
            "B_min": b_min,
            "B_over_A": round(b_min / a_min, 3) if a_min > 0 else None,
        }
    print(json.dumps({"tree_a": args.tree_a, "tree_b": args.tree_b, "sf_dir": args.sf_dir, "phases": report}, indent=2))


if __name__ == "__main__":
    main()
