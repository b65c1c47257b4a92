#!/usr/bin/env python3
"""Synthesize a 10x-WAREHOUSE benchmark directory (driver-side tooling,
like make_sf1_docs.py — NOT part of the engine).

Purpose: the 10x-documents fixture measures the doc-centric half of the
bench; this is its warehouse twin, so the join/window/rollup/stats query
families get a measured >=10x point too. Replication follows the same
disjoint-replica philosophy: every KEY in replica k is offset by
k*100_000_000, applied CONSISTENTLY across fact and dimension tables —

 - customer/supplier/part replicate with their primary keys offset, so
   dimension cardinality scales with the facts (the TPC-H scaling rule)
   and per-key fan-out (orders per customer, lineitems per part) stays
   EXACTLY the original workload's: the true join/agg workload scales
   linearly, not quadratically per key;
 - orders replicates with o_orderkey AND o_custkey offset together, so
   each replica's order graph is an isomorphic copy wired to its own
   customer replica;
 - lineitem offsets l_orderkey/l_partkey/l_suppkey the same way;
 - events offsets event_id and user_id (10x users, per-user streams
   unchanged — sessionization/funnel state per key is the original's).

Low-cardinality value columns (dates, prices, flags, brands, types) are
kept verbatim: group-by domains keep their cardinality and get 10x rows
per group — the realistic "facts grow faster than domains" shape.
HIGH-CARDINALITY NAME columns (p_name, c_name, s_name) get every WORD
prefixed "r<k>q" in replica k>0, the exact move make_sf1_docs.py makes
on document words: string-similarity queries (entity resolution,
edit-distance pairs) block on name content (last token, length), and
verbatim-replicated names would make every name a 10-clique of
near-exact matches in one shared block — a quadratically heavier (and
unrealistic) pair workload than real 10x data. Per-word prefixes keep
within-replica distances and blocking structure identical to the
original while making cross-replica blocks disjoint, so the true pair
workload scales linearly. region/nation stay fixed (they are
genuinely bounded); documents/embeddings are symlinked from the source
SF so the full query list still runs (doc-query timings at this point
are NOT meaningful — use /tmp/sf1docs for those; the combiner selects
per-family).

Usage: python3 tools/make_sf1.py [srcSfDir] [outDir] [replicas]
"""
import os, sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 100_000_000

# table -> key columns to offset per replica (consistent across tables)
REPLICATED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
# table -> high-cardinality name columns, every word prefixed per replica
PREFIXED = {
    "customer": ["c_name"],
    "supplier": ["s_name"],
    "part": ["p_name"],
}
SYMLINKED = ["region", "nation", "documents", "embeddings"]


def main(src="/root/testdata/sf0.1", out="/tmp/sf1wh", replicas=10):
    replicas = int(replicas)
    os.makedirs(out, exist_ok=True)
    for t in SYMLINKED:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.exists(s) and not os.path.exists(d):
            os.symlink(s, d)

    for t, keys in REPLICATED.items():
        tab = pq.read_table(f"{src}/{t}.parquet")
        copies = []
        for k in range(replicas):
            if k == 0:
                copies.append(tab)
                continue
            cols = {}
            for name in tab.column_names:
                col = tab[name]
                if name in keys:
                    col = pc.add(col, pa.scalar(k * OFFSET, type=pa.int64()))
                elif name in PREFIXED.get(t, []):
                    # "a b" -> "r<k>qa r<k>qb": word structure kept,
                    # cross-replica token sets disjoint
                    pre = f"r{k}q"
                    col = pc.binary_join_element_wise(
                        pa.scalar(pre),
                        pc.replace_substring(col, " ", f" {pre}"), "")
                cols[name] = col
            copies.append(pa.Table.from_pydict(cols, schema=tab.schema))
        big = pa.concat_tables(copies)
        pq.write_table(big, f"{out}/{t}.parquet")
        print(f"wrote {t}: {tab.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main(*sys.argv[1:])
