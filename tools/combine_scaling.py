#!/usr/bin/env python3
"""Merge per-SF graft.Bench artifacts into one scaling-curve artifact.

Usage: python3 tools/combine_scaling.py out.json label1=bench1.json label2=bench2.json ...

Output: {"metric":"scaling","points":{label:{"total":..,"queries":{..}}},
         "ratios":{label_pair:{query:ratio,...}}} — ratios are computed
between consecutive points in argument order (e.g. sf0.01->sf0.1,
sf0.1->sf1docs), the measured answer to "does per-query cost grow
linearly with data, or is it dominated by fixed overhead that amortizes?"
"""
import sys, json


def main(out, *pairs):
    points = {}
    order = []
    wm_points = {}   # label -> {query: {counter: value}}
    wm_order = []
    for p in pairs:
        label, path = p.split("=", 1)
        with open(path) as f:
            art = json.load(f)
        if label.startswith("wm:"):
            # work-mass counters (graft.WorkMass artifact): attached per
            # query so a fat-tail time ratio arrives WITH its measured
            # cause instead of needing a post-hoc probe
            wm_points[label[3:]] = art.get("workmass", {})
            wm_order.append(label[3:])
            continue
        points[label] = {"total": art.get("value"),
                         "queries": art.get("queries", {})}
        order.append(label)
    ratios = {}
    for a, b in zip(order, order[1:]):
        qa, qb = points[a]["queries"], points[b]["queries"]
        ratios[f"{a}->{b}"] = {
            q: round(qb[q] / qa[q], 2)
            for q in sorted(qa) if q in qb and qa[q] > 0}
    art = {"metric": "scaling", "points": points, "ratios": ratios}
    if wm_order:
        workmass = {}
        for a, b in zip(wm_order, wm_order[1:]):
            for q in sorted(wm_points[a]):
                if q not in wm_points[b]:
                    continue
                for c, va in wm_points[a][q].items():
                    vb = wm_points[b][q].get(c)
                    if vb is None:
                        continue
                    workmass.setdefault(q, {})[c] = {
                        a: va, b: vb,
                        "ratio": round(vb / va, 2) if va else None}
        art["workmass"] = workmass
    with open(out, "w") as f:
        f.write(json.dumps(art, indent=1) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
