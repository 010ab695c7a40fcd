"""Dump .explain("formatted") for declared queries to plans/<round>/ ($SPARK_GRAFT_PLANS_DIR, default r13).

Usage:  python tools/dump_plans.py <suffix> [query ...]

Writes plans/r12/<query>_<suffix>.txt for each requested queries()
entry (default: all).  Streaming gates (stream_*) build a streaming
DataFrame whose plan cannot be captured pre-execution the same way;
for those we capture the logical plan via explain on the source query
if possible, else skip with a note.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"),
)


def main() -> None:
    args = sys.argv[1:]
    if not args:
        sys.exit("usage: dump_plans.py <suffix> [query ...]")
    suffix = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)

    queries = entry_mod.queries()
    names = names or sorted(queries)
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} bytes -> {path}")


if __name__ == "__main__":
    main()
