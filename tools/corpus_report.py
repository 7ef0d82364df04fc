#!/usr/bin/env python3
"""Assemble SCALING_r07_corpus.json from per-size CorpusScale runs
(tools/corpus_scale.sh): per-stage log-log slopes over generated
sf0.1/0.5/1/2 (corpus rows/tokens scale linearly with sf).

Usage: corpus_report.py <workDir> <sf1> <sf2> ...
"""
import json
import math
import sys

work = sys.argv[1]
sfs = [float(s) for s in sys.argv[2:]]


def sfname(sf):
    return str(int(sf)) if sf == int(sf) else str(sf)


points = {}
for sf in sfs:
    with open(f"{work}/corpus_{sfname(sf)}.json") as f:
        points[sf] = json.load(f)


def fit(xs, ys):
    lx = [math.log(x) for x in xs]
    ly = [math.log(max(y, 1e-3)) for y in ys]
    n = len(xs)
    mx, my = sum(lx) / n, sum(ly) / n
    den = sum((x - mx) ** 2 for x in lx)
    return sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / den if den else 0.0


stages = list(points[sfs[0]]["stages"].keys())
out = {
    "what": "CorpusPipeline (clean -> quality -> ppl gate -> exact dedup "
            "-> near-dup -> span rewrite -> decontaminate -> mixture -> "
            "pack -> shard) end-to-end over "
            "generated documents at 4 sizes, one JVM per point, fresh "
            "output per point; stages checkpoint through parquet (each "
            "stage time includes its write+readback, the restartable-"
            "lake contract)",
    "sfs": sfs,
    "points": {sfname(sf): points[sf] for sf in sfs},
    "total_slope": round(fit(sfs, [points[sf]["total_sec"] for sf in sfs]), 3),
    "stage_slopes": {
        st: round(fit(sfs, [points[sf]["stages"][st]["sec"] for sf in sfs]), 3)
        for st in stages
    },
}
print(json.dumps(out, indent=1))
