"""Measure where the BPE SQL replace-chain route stops being viable
(r12, VERDICT r11 ask #3).

The gate's SQL route compiles one nested ``replace(...)`` per merge into
a single expression.  That is fine at the 64-merge gate fixture, but a
production vocabulary is 4k-50k merges — this tool walks the expression
depth up through the 4k synthetic fixture (fixtures/bpe_merges_4k.json)
and records, per depth:

  - expression size (chars) and analysis/plan time,
  - execution wall time on a fixed 200-doc corpus (forced aggregate so
    Catalyst cannot prune the chain — the phantom-lever rule),
  - the failure mode when the route stops working (exception class), and
  - the Arrow word-cache route's wall time on the SAME corpus at the
    SAME depth (fixture override), plus SQL-vs-Arrow value parity while
    both routes exist.

Output: one JSON line per depth; paste the table into BASELINE.md.

Usage: python tools/bpe_route_boundary.py [max_depth]
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_infotheoretic_feature_selection_spark.operators.text import (  # noqa: E402
    _bpe_word_encode_expr,
    _bpe_words_expr,
    _load_bpe_fixture,
    tokenize_bpe_vectorized,
)
from flink_infotheoretic_feature_selection_spark.session import get_spark  # noqa: E402

FIXTURE_4K = os.path.join(
    REPO, "flink_infotheoretic_feature_selection_spark", "fixtures", "bpe_merges_4k.json"
)
# 303/304 bracket the measured parse boundary (bisected r12): Spark's
# ANTLR parser raises [FAILED_TO_PARSE_TOO_COMPLEX] above 303 merges
DEPTHS = [64, 128, 256, 303, 304, 512, 1024, 2048, 4096]


def staged_corpus(spark, n_docs: int = 200) -> str:
    rng = random.Random(3)
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(letters) for _ in range(rng.randint(2, 12)))
        for _ in range(500)
    ]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(5, 60))))
        for i in range(n_docs)
    ]
    d = tempfile.mkdtemp(prefix="bpe_boundary_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def truncated_fixture(merges, n: int) -> str:
    fd, path = tempfile.mkstemp(suffix=f"_bpe_{n}.json")
    with os.fdopen(fd, "w") as f:
        json.dump(
            {
                "merges": merges[:n],
                "n_merges": n,
                "pretoken_regex": _load_bpe_fixture(FIXTURE_4K)["pretoken_regex"],
            },
            f,
        )
    return path


def sql_route_df(spark, merges_n):
    enc = _bpe_word_encode_expr(duck=False, merges=merges_n)
    words = _bpe_words_expr(duck=False, col="lower(coalesce(text, ''))")
    j = f"array_join(transform({words}, w -> {enc}), '')"
    return spark.sql(f"""
      SELECT count(*) AS n,
             sum(length(j) - length(replace(j, ' ', ''))) AS total_tokens,
             count(DISTINCT md5(j)) AS distinct_md5
      FROM (SELECT doc_id, {j} AS j FROM documents)
    """)


def main() -> None:
    max_depth = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    spark = get_spark("bpe_route_boundary", cpus=8)
    merges = [tuple(m) for m in _load_bpe_fixture(FIXTURE_4K)["merges"]]
    d = staged_corpus(spark)
    spark.read.parquet(os.path.join(d, "documents.parquet")).createOrReplaceTempView(
        "documents"
    )

    for depth in [x for x in DEPTHS if x <= max_depth]:
        sub = merges[:depth]
        row: dict = {"depth": depth}
        enc = _bpe_word_encode_expr(duck=False, merges=sub)
        row["expr_chars"] = len(enc)
        # SQL route: analysis (plan) then execution, separately timed
        try:
            t0 = time.perf_counter()
            df = sql_route_df(spark, sub)
            row["sql_plan_sec"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            sql_out = df.collect()[0]
            row["sql_exec_sec"] = round(time.perf_counter() - t0, 3)
            row["sql_total_tokens"] = int(sql_out["total_tokens"])
        except Exception as e:  # noqa: BLE001 — the failure IS the datum
            row["sql_error"] = f"{type(e).__name__}"
            # the Py4J wrapper's first line is generic — dig for the
            # Spark error class ([FAILED_TO_PARSE_TOO_COMPLEX] at 4k)
            text = str(e)
            je = getattr(e, "java_exception", None)
            if je is not None:
                try:
                    text += "\n" + je.toString()
                except Exception:  # noqa: BLE001
                    pass
            lines = [ln for ln in text.splitlines() if ln.strip()]
            head = next((ln for ln in lines if ln.lstrip().startswith("[")), lines[0] if lines else "")
            row["sql_error_head"] = head.strip()[:160]
        # Arrow route at the same depth via a truncated fixture
        fx = truncated_fixture(merges, depth)
        try:
            t0 = time.perf_counter()
            vec = (
                tokenize_bpe_vectorized(spark, d, fixture_path=fx)
                .groupBy()
                .agg({"n_bpe_exact": "sum"})
                .collect()[0][0]
            )
            row["arrow_exec_sec"] = round(time.perf_counter() - t0, 3)
            row["arrow_total_tokens"] = int(vec)
        finally:
            os.unlink(fx)
        if "sql_total_tokens" in row and "arrow_total_tokens" in row:
            row["routes_agree"] = row["sql_total_tokens"] == row["arrow_total_tokens"]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
