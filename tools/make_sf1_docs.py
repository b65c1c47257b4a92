#!/usr/bin/env python3
"""Synthesize a 10x-documents benchmark directory (driver-side tooling,
like bench_oracle.py — NOT part of the engine).

Purpose: turn the "per-query overhead amortizes at scale" argument into a
measured curve. The driver ships sf0.001/0.01/0.1 only; this builds a
documents table 10x sf0.1 (= sf1-equivalent for the document-centric
queries, which dominate the bench tail) without distorting the workload's
pair structure:

 - each replica k gets doc_ids offset by k*100_000_000 (disjoint id space);
 - every WORD in replica k>0 is prefixed "r<k>q" so shingle sets are
   DISJOINT across replicas: within-replica near-dup structure is
   identical to the original, cross-replica similarity is zero, so the
   true pair workload scales LINEARLY (10x) — replicating text verbatim
   would instead make every doc a 10-clique near-dup cluster, a
   quadratically heavier (and unrealistic) workload than real 10x data.

Non-document tables are symlinked from the source SF so the bench binary
can run its full query list; only document-query timings are meaningful
at 10x and the combiner script selects those.

Usage: python3 tools/make_sf1_docs.py [srcSfDir] [outDir] [replicas]
"""
import os, sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "embeddings"]


def main(src="/root/testdata/sf0.1", out="/tmp/sf1docs", replicas=10):
    replicas = int(replicas)
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.exists(s) and not os.path.exists(d):
            os.symlink(s, d)

    docs = pq.read_table(f"{src}/documents.parquet")
    cols = docs.column_names
    data = docs.to_pylist()
    batches = []
    for k in range(replicas):
        rep = []
        for row in data:
            r = dict(row)
            r["doc_id"] = row["doc_id"] + k * 100_000_000
            if k > 0:
                pre = f"r{k}q"
                r["text"] = " ".join(
                    pre + w for w in row["text"].split(" ") if w != "")
            rep.append(r)
        batches.append(pa.Table.from_pylist(rep, schema=docs.schema))
    big = pa.concat_tables(batches)
    pq.write_table(big, f"{out}/documents.parquet")
    print(f"wrote {big.num_rows} docs ({replicas}x) to {out}/documents.parquet")


if __name__ == "__main__":
    main(*sys.argv[1:])
