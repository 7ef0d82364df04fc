#!/usr/bin/env python3
"""Assemble SCALING_r07_newops.json from the round-7 new-operator sweep
(tools/newops_sweep.sh): per-query log-log slopes over generated
sf0.1/0.5/1/2 (5k..100k docs, 2k..40k embeddings; corpus rows scale
linearly with sf). Slope fit on minima (the stable estimator on a
time-shared host, per the r6 method) with medians alongside.

Usage: newops_report.py <r07Dir> [sf ...]
"""
import json
import math
import sys

work = sys.argv[1]
sfs = [float(s) for s in (sys.argv[2:] or ["0.1", "0.5", "1", "2"])]


def sfname(sf):
    return str(int(sf)) if sf == int(sf) else str(sf)


points = {}
for sf in sfs:
    with open(f"{work}/newops_sf{sfname(sf)}.json") as f:
        points[sf] = json.load(f)

queries = sorted(points[sfs[0]]["queries"].keys())


def fit(xs, ys):
    lx = [math.log(x) for x in xs]
    ly = [math.log(max(y, 1e-3)) for y in ys]
    n = len(xs)
    mx, my = sum(lx) / n, sum(ly) / n
    den = sum((x - mx) ** 2 for x in lx)
    return sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / den if den else 0.0


NOTES = {
    "q69_span_dedup":
        "production twin: compiled ShingleListExpr window kernel, 8-byte "
        "keys on the single wk exchange; work is linear in corpus tokens.",
    "q70_semdedup":
        "production twin sizes clusters with autoNlist (occupancy held "
        "~flat at 4096), so within-cluster pair work per vector stays "
        "bounded and total pair tests grow LINEARLY with the corpus — the "
        "oracled fixed-nCentroids=8 config would be quadratic (the q62/q44 "
        "fixed-knob hazard, avoided the same way). At the smallest point "
        "autoNlist=1 (whole corpus one cluster: 2k rows under the 4096 "
        "occupancy target), so the first segment overstates the slope.",
    "q71_compaction_plan":
        "windowed cumsum over the per-source listing: one hash exchange + "
        "per-partition sort of metadata-width rows.",
    "q72_span_rewrite":
        "production twin: same single wk exchange as q69 (occurrence "
        "count + canonical witness as two window fns over one partition "
        "spec) plus the token anti-join and per-doc rebuild — work linear "
        "in corpus tokens, removal interval explode proportional to the "
        "duplicated minority.",
}

out = {
    "what": "round-7 NEW operator family at generated sf0.1/0.5/1/2 "
            "(one JVM per point, production bench twins, reps=5, minima "
            "published beside medians)",
    "sfs": sfs,
    "queries": {},
}
for q in queries:
    med = {sfname(sf): points[sf]["queries"][q] for sf in sfs}
    mn = {sfname(sf): points[sf]["queries_min"][q] for sf in sfs}
    out["queries"][q] = {
        "sec_median": med,
        "sec_min": mn,
        "slope_min": round(fit(sfs, [points[sf]["queries_min"][q] for sf in sfs]), 3),
        "slope_median": round(fit(sfs, [points[sf]["queries"][q] for sf in sfs]), 3),
        "note": NOTES.get(q, ""),
    }
print(json.dumps(out, indent=1))
