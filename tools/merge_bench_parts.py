#!/usr/bin/env python3
"""Merge per-query graft.Bench artifacts (one forked JVM each — see
sweep_forked.sh) into one Bench-shaped artifact combine_scaling.py
accepts: {"metric":"total","value":sum,"queries":{...},"sf":...}."""
import sys, json


def main(out, sf_dir, *parts):
    queries = {}
    for path in parts:
        with open(path) as f:
            art = json.load(f)
        if art.get("partial"):
            print(f"[merge] WARNING {path} is partial — skipped")
            continue
        queries.update(art.get("queries", {}))
    total = round(sum(queries.values()), 3)
    with open(out, "w") as f:
        f.write(json.dumps({
            "metric": "total", "value": total, "unit": "sec",
            "queries": queries, "sf": sf_dir, "partial": False,
            "isolation": "one JVM per query (sweep_forked.sh)"}) + "\n")
    print(f"[merge] wrote {out}: {len(queries)} queries, total {total}s")


if __name__ == "__main__":
    main(*sys.argv[1:])
