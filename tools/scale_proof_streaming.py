"""Streaming 100× scale proof: drain the N-copy fixtures through the
stream-static ops in many micro-batches and record wall / rows /
per-batch flatness / peak state-store rows.

Usage: python tools/scale_proof_streaming.py [N] [sf_dir]
       (defaults: 100 /root/testdata/sf0.1; expects the fixtures from
        tools/make_scale_docs.py N sf_dir /tmp/scale{N}
        tools/make_scale_events.py N sf_dir /tmp/scale_ev{N} — built
        here automatically when missing)

What each row proves for the 100 TB design (BASELINE.md table):

- ``stream_neardup_cands`` — the stream-static signature chunk join is
  STATELESS (zero state operators in every progress event) and
  per-batch wall stays flat across the drain: batch 10 pays the same as
  batch 1 no matter how much has been ingested, because the static
  chunk index is fixed and nothing accumulates.
- ``stream_decontaminate`` — the only state is
  ``dropDuplicatesWithinWatermark`` on flagged doc_ids; with event time
  spanning far beyond the 2 h watermark horizon, peak state rows stay
  bounded by flags-per-horizon instead of growing with the stream.  The
  eval shingle set carries the OFFLINE df-cap the op's contract assigns
  to the persisted set (drop shingles whose BASE-corpus train-side df
  exceeds the batch twin's max_train_df) — without it, template
  boilerplate shingles flag ~100% of docs and the op measures output
  volume, not decontamination.
- ``stream_window_agg`` — state rows bounded by
  types × windows-in-horizon (watermark evicts closed windows), not by
  input rows: 100× input, same window grid → state flat.

The fixtures write one parquet file per copy; ``maxFilesPerTrigger`` on
the READER (a source option — on the writer it is silently ignored)
splits the drain into real micro-batches, so state growth and per-batch
wall are observable between batches instead of collapsing into one.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_TRAIN_DF = 1000  # the batch twin's default offline df-cap


def ensure_fixture(script: str, n: int, sf_dir: str, out: str) -> str:
    if not os.path.isdir(out):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", script), str(n), sf_dir, out],
            check=True,
        )
    return out


def drain(
    stream_df, name: str, budget_s: int = 1800, sink: str = "memory",
    mode: str = "append",
):
    """Run to a sink with availableNow; return metrics dict.

    ``sink="parquet"`` for high-volume outputs: the memory sink COLLECTS
    every output row to the driver — exactly the anti-pattern the
    engine avoids — so a multi-million-row drain must land in files and
    be counted from them, or the measurement times driver
    materialization instead of the operator.
    """
    spark = stream_df.sparkSession
    w = stream_df.writeStream.outputMode(mode).trigger(availableNow=True)
    if sink == "parquet":
        out_dir = f"/tmp/sp_stream_out/{name}"
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        q = (
            w.format("parquet")
            .option("path", f"{out_dir}/data")
            .option("checkpointLocation", f"{out_dir}/ckpt")
            .start()
        )
    else:
        q = w.format("memory").queryName(name).start()
    t0 = time.perf_counter()
    if not q.awaitTermination(budget_s):
        q.stop()
        raise RuntimeError(f"{name} did not drain in {budget_s}s")
    wall = time.perf_counter() - t0
    progresses = [json.loads(p.json) for p in q.recentProgress]
    batches = [p for p in progresses if p.get("numInputRows", 0) > 0]
    batch_walls = [
        round(p["durationMs"]["triggerExecution"] / 1000.0, 2)
        for p in batches
        if "triggerExecution" in p.get("durationMs", {})
    ]
    peak_state = max(
        (
            so.get("numRowsTotal", 0)
            for p in progresses
            for so in p.get("stateOperators", [])
        ),
        default=0,
    )
    n_state_ops = max(
        (len(p.get("stateOperators", [])) for p in progresses), default=0
    )
    if sink == "parquet":
        rows = spark.read.parquet(f"/tmp/sp_stream_out/{name}/data").count()
    else:
        rows = spark.table(name).count()
    return {
        "wall_s": round(wall, 2),
        "out_rows": rows,
        "batches": len(batches),
        "batch_walls_s": batch_walls,
        "state_ops": n_state_ops,
        "peak_state_rows": peak_state,
    }


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    ops = {a for a in argv if a in ("neardup", "decon", "winagg", "userstats")} or {
        "neardup", "decon", "winagg", "userstats"
    }
    nums = [a for a in argv if a not in ops]
    n = int(nums[0]) if nums else 100
    sf_dir = nums[1] if len(nums) > 1 else "/root/testdata/sf0.1"
    docs_nx = ensure_fixture("make_scale_docs.py", n, sf_dir, f"/tmp/scale{n}")
    ev_nx = ensure_fixture("make_scale_events.py", n, sf_dir, f"/tmp/scale_ev{n}")

    from pyspark.sql import functions as F

    from flink_infotheoretic_feature_selection_spark.operators import dedup
    from flink_infotheoretic_feature_selection_spark.session import get_spark
    from flink_infotheoretic_feature_selection_spark.streaming import (
        stream_decontaminate,
        stream_neardup_candidates,
        windowed_event_agg,
    )

    spark = get_spark("scale-proof-streaming")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    report: dict[str, dict] = {}
    fpt = max(1, n // 10)  # ~10 micro-batches per drain

    # Static sides built ONCE from the BASE corpus (the deployment's
    # persisted index); the stream is the N× ingest.
    base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_sig = dedup.simhash64(spark, sf_dir).localCheckpoint(eager=True)
    # eval shingles with the OFFLINE df-cap (see module docstring)
    low_df = (
        dedup.doc_shingles(base_docs.where(f"NOT ({dedup.DECONTAMINATE_EVAL_PRED})"))
        .groupBy("shingle")
        .count()
        .where(F.col("count") <= MAX_TRAIN_DF)
        .select("shingle")
    )
    eval_sh = (
        dedup.doc_shingles(base_docs.where(dedup.DECONTAMINATE_EVAL_PRED))
        .select("shingle")
        .distinct()
        .join(low_df, "shingle", "left_semi")
        .localCheckpoint(eager=True)
    )

    def docs_stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", str(fpt))
            .parquet(f"{docs_nx}/documents.parquet")
        )

    if "neardup" in ops:
        report["stream_neardup_cands"] = drain(
            stream_neardup_candidates(docs_stream(), corpus_sig),
            "sp_neardup",
            sink="parquet",  # 18.6M output rows: never collect to the driver
        )

    # Event time advances ~1 s per doc_id, so the 100-copy drain spans
    # days of event time — far past the 2 h watermark horizon; later
    # micro-batches advance the watermark and evict earlier flag state.
    docs_ts = docs_stream().withColumn(
        "ts", F.expr("timestamp_micros(1700000000000000 + doc_id * 1000000)")
    )
    if "decon" in ops:
        report["stream_decontaminate"] = drain(
            stream_decontaminate(docs_ts, eval_sh).select("doc_id"), "sp_decon"
        )

    # read_events_stream with the per-trigger file cap: same schema
    # probe + nanos handling, reader option added
    from flink_infotheoretic_feature_selection_spark.datasets import events_read_plan

    schema, ts_is_nanos = events_read_plan(f"{ev_nx}/events.parquet")
    ev_stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(fpt))
        .parquet(f"{ev_nx}/events.parquet")
    )
    if ts_is_nanos:
        ev_stream = ev_stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    if "winagg" in ops:
        report["stream_window_agg"] = drain(
            windowed_event_agg(ev_stream), "sp_winagg"
        )

    if "userstats" in ops:
        # r12: the applyInPandasWithState custom stateful op.  State is
        # ONE fixed-width row per user (bounded by key cardinality, not
        # stream length); update-mode emission re-emits each touched
        # user per micro-batch, so out_rows ~ users x batches while
        # peak_state_rows must stay ~= distinct users.  Memory sink:
        # file sinks cannot take update mode; output is users-bounded
        # (NOT row-bounded), so the driver collect is the small side.
        from flink_infotheoretic_feature_selection_spark.streaming import (
            stateful_user_stats,
        )

        report["stream_user_stats"] = drain(
            stateful_user_stats(ev_stream), "sp_userstats", mode="update"
        )

    print(json.dumps({"n_copies": n, "files_per_trigger": fpt, "ops": report}))


if __name__ == "__main__":
    main()
