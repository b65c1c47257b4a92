#!/usr/bin/env python3
"""Publish the floor: time every SparkEntry.oracleSql in DuckDB over the
same parquet tables the engine benches against, so the Spark-vs-oracle
ratio is computed by the harness instead of ad-hoc judge-side timing.

DuckDB only exists driver-side (Python), so this is the tools/ twin of
graft.Bench: same min-of-N-passes policy, same loss-proof per-query
flush of a parseable JSON artifact.

Usage:
  python3 tools/bench_oracle.py <sfDir> <oracleSqlJson> [outJson]

  <oracleSqlJson> is the oracle_sql.json a graft.Verify run dumps.
  Passes default to 2; override with ORACLE_BENCH_PASSES.

Output (one JSON object, rewritten after every timed query):
  {"metric":"oracle_total","value":N,"unit":"sec",
   "queries":{...},"sf":...,"threads":T,"partial":bool}

Compare against the engine's BENCH json for the floor ratio; note the
near-dup oracles (q26/q27/q37/q39/q40) are deliberately brute-force
quadratic — they are recall gates, not a performance target.
"""
import sys, os, json, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _label_propagate(con, sql):
    """Shared machinery: materialize the oracle's own `pairs` CTE
    (everything before `,\nedges AS (` — the honest brute-force pair
    scan, timed), then run min-label propagation to the fixpoint.
    Leaves TEMP tables __pairs (id_a, id_b) and __labels (node, label =
    component = min reachable id)."""
    prefix = sql[:sql.index(",\nedges AS (")].replace(
        "WITH RECURSIVE", "WITH", 1)
    con.execute("DROP TABLE IF EXISTS __pairs")
    con.execute("DROP TABLE IF EXISTS __edges")
    con.execute("DROP TABLE IF EXISTS __labels")
    con.execute(f"CREATE TEMP TABLE __pairs AS {prefix} "
                "SELECT id_a, id_b FROM pairs")
    con.execute("CREATE TEMP TABLE __edges AS "
                "SELECT id_a AS src, id_b AS dst FROM __pairs "
                "UNION SELECT id_b, id_a FROM __pairs")
    con.execute("CREATE TEMP TABLE __labels AS "
                "SELECT DISTINCT src AS node, src AS label FROM __edges")
    prev = None
    while True:
        con.execute("""CREATE TEMP TABLE __nxt AS
            SELECT node, min(label) AS label FROM (
              SELECT node, label FROM __labels
              UNION ALL
              SELECT e.dst AS node, l.label
              FROM __edges e JOIN __labels l ON l.node = e.src
            ) GROUP BY node""")
        con.execute("DROP TABLE __labels")
        con.execute("ALTER TABLE __nxt RENAME TO __labels")
        s = con.execute(
            "SELECT COALESCE(SUM(label), 0) FROM __labels").fetchone()[0]
        if s == prev:
            break
        prev = s


def q43_iterative(con, sql):
    """q43's recursive-CTE closure enumerates full reachability (node, r)
    pairs — O(n x component size) rows through DuckDB's UNION-dedup
    recursion, which does not complete at sf0.1. The floor instead times
    the ITERATIVE min-label-propagation twin (temp-table loop to the
    fixpoint), which computes the identical (node, component=min id)
    result; the pairs CTE is reused verbatim from the oracle SQL so both
    floors pay the same brute-force pair scan."""
    _label_propagate(con, sql)
    return con.execute("SELECT node AS doc_id, label AS component "
                       "FROM __labels ORDER BY doc_id").fetchall()


def q108_iterative(con, sql):
    """q108's recursive closure hits the same wall as q43 — worse, in
    fact, since every duplicated part name is a clique (hundreds of ids
    per name at sf0.1), so the (node, reachable) enumeration is
    O(Σ component²) through O(V·E) join rounds and does not complete.
    Identical label-propagation twin + the oracle's own final census
    (component, member count, lexicographic-min canonical name); the
    word-drop candidate scan — the honest brute-force stage — is reused
    verbatim from the oracle SQL and fully timed."""
    _label_propagate(con, sql)
    return con.execute(
        "SELECT l.label AS component, count(*) AS n_members, "
        "  min(p.p_name) AS canonical_name "
        "FROM __labels l JOIN part p ON p.p_partkey = l.node "
        "GROUP BY l.label ORDER BY component").fetchall()


# Oracles whose straight SQL cannot finish at bench scale get an
# equivalent imperative runner; the timed work includes every shared
# stage (the pair scan), so the floor stays honest.
ITERATIVE_RUNNERS = {"q43_dedup_clusters": q43_iterative,
                     "q108_entity_resolution": q108_iterative}


def main(sf_dir, oracle_json, out="oracle_bench.json"):
    passes = max(1, int(os.environ.get("ORACLE_BENCH_PASSES", "2")))
    con = duckdb.connect()
    threads = con.execute("SELECT current_setting('threads')").fetchone()[0]
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_json))

    def flush(results, partial):
        art = {"metric": "oracle_total",
               "value": round(sum(results.values()), 3), "unit": "sec",
               "queries": {k: round(v, 3) for k, v in results.items()},
               "sf": sf_dir, "threads": int(threads), "partial": partial}
        tmp = f"{out}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(json.dumps(art) + "\n")
        os.replace(tmp, out)

    results = {}
    flush(results, True)
    # Fastest-first ordering from a prior round's artifact
    # (ORACLE_BENCH_PRIOR=path): with the heavy quadratic tail last, an
    # interrupted run still yields near-complete per-query coverage.
    prior_path = os.environ.get("ORACLE_BENCH_PRIOR")
    prior = {}
    if prior_path and os.path.exists(prior_path):
        try:
            prior = json.load(open(prior_path)).get("queries", {})
        except Exception as e:
            print(f"[oracle-bench] prior load failed: {e}", file=sys.stderr)
    for name in sorted(oracle, key=lambda n: (prior.get(n, 0.0), n)):
        best = None
        for _ in range(passes):
            t0 = time.monotonic()
            try:
                if name in ITERATIVE_RUNNERS:
                    ITERATIVE_RUNNERS[name](con, oracle[name])
                else:
                    con.execute(oracle[name]).fetchall()
                dt = time.monotonic() - t0
            except Exception as e:
                print(f"[oracle-bench] {name} FAILED: {e}", file=sys.stderr)
                dt = float("nan")
                break
            best = dt if best is None else min(best, dt)
        if best is not None:
            results[name] = best
            print(f"[oracle-bench] {name} {best:.3f} s", file=sys.stderr)
        flush(results, True)
    flush(results, False)
    print(json.dumps({"metric": "oracle_total",
                      "value": round(sum(results.values()), 3),
                      "unit": "sec", "sf": sf_dir}))


if __name__ == "__main__":
    main(*sys.argv[1:])
