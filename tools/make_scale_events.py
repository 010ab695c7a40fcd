"""Build a deterministic N× copy of the events table for scale tests.

Usage: python tools/make_scale_events.py [N] [src_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 /tmp/scale10)

Each copy offsets user_id by copy*100000 and event_id by copy*10**9 so
keys stay distinct and per-user row counts (the sessionize/asof state
size) are PRESERVED rather than multiplied — the honest way to scale a
keyed workload: more keys, same per-key depth.  Timestamps are shifted
by copy*1 hour so event-time windows overlap but don't collapse.
"""

from __future__ import annotations

import sys


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale10"

    import os

    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{src}/events.parquet")
    # one parquet FILE per copy (events.parquet as a directory) — a
    # single concatenated file reads as one input split for Python-stage
    # ops; see BASELINE's layout correction
    dst = f"{out}/events.parquet"
    os.makedirs(dst, exist_ok=True)
    rows = 0
    for copy in range(n):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name == "user_id":
                col = pa.compute.add(col, copy * 100_000)
            elif name == "event_id":
                col = pa.compute.add(col, copy * 1_000_000_000)
            elif name == "ts":
                # assumes the timestamp[us] layout (sf* default); an
                # int64-nanos events build would need an integer add instead
                col = pa.compute.add(col, pa.scalar(copy * 3_600_000_000, pa.duration("us")))
            cols[name] = col
        part = pa.table(cols)
        pq.write_table(part, f"{dst}/part-{copy:05d}.parquet")
        rows += part.num_rows
    print(f"{dst} rows={rows} files={n}")


if __name__ == "__main__":
    main()
