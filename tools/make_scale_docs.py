"""Build a deterministic N× copy of the documents table for scale tests.

Usage: python tools/make_scale_docs.py [N] [src_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 /tmp/scale10)

Copy 0 is the original; each further copy word-shuffles every text with
a seed derived from (copy, doc_id) — contents stay DISTINCT (no new
exact dups) while the bag-of-words, length and vocabulary are
preserved, so token/quality statistics scale honestly (the round-4
10×-corpus protocol).  doc_ids offset by copy*1e6.
"""

from __future__ import annotations

import random
import sys


def main() -> None:
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale10"

    # one parquet FILE per copy (documents.parquet as a directory): a
    # single concatenated file reads as ONE input split and serializes
    # every Python stage — see BASELINE's 100×-dedup layout correction
    dst = f"{out}/documents.parquet"
    os.makedirs(dst, exist_ok=True)
    t = pq.read_table(f"{src}/documents.parquet")
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    rows = 0
    for copy in range(n):
        if copy == 0:
            pq.write_table(t, f"{dst}/part-00000.parquet")
            rows += t.num_rows
            continue
        shuffled = []
        for did, txt in zip(doc_ids, texts):
            words = txt.split(" ")
            random.Random(copy * 10_000_019 + did).shuffle(words)
            shuffled.append(" ".join(words))
        cols = {name: t.column(name) for name in t.column_names}
        cols["doc_id"] = pa.compute.add(t.column("doc_id"), copy * 1_000_000)
        cols["text"] = pa.array(shuffled, pa.string())
        part = pa.table({k: cols[k] for k in t.column_names})
        pq.write_table(part, f"{dst}/part-{copy:05d}.parquet")
        rows += part.num_rows
    print(f"{dst} rows={rows} files={n}")


if __name__ == "__main__":
    main()
