#!/usr/bin/env python3
"""Assemble SCALING_r07_pipeline.json from per-size PipelineScale runs.

Slope = d log(sec) / d log(nTickers), least-squares over the sweep points
(same fit as tools/scaling_report.py). Input volume scales linearly with
nTickers (files AND rows), so slope 1.0 = linear scaling; file-lake
ingestion has a per-file constant cost, so sub-linear slopes appear when
fixed overheads amortize.

Usage: pipeline_report.py <workDir> <size1> <size2> ...
"""
import json
import math
import sys

work = sys.argv[1]
sizes = [int(s) for s in sys.argv[2:]]

points = {}
for s in sizes:
    with open(f"{work}/pipeline_{s}.json") as f:
        points[s] = json.load(f)


def fit(xs, ys):
    lx = [math.log(x) for x in xs]
    ly = [math.log(max(y, 1e-3)) for y in ys]
    n = len(xs)
    mx, my = sum(lx) / n, sum(ly) / n
    den = sum((x - mx) ** 2 for x in lx)
    return sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / den if den else 0.0


stages = list(points[sizes[0]]["stages"].keys())
out = {
    "what": "DailyPipeline end-to-end at 3 generated lake sizes "
            "(GenLakeData: per-ticker CSV staging shape, 3 sources, "
            "heterogeneous headers), one JVM per point, fresh warehouse "
            "per point",
    "sizes_tickers": sizes,
    "points": {str(s): points[s] for s in sizes},
    "total_slope": round(fit(sizes, [points[s]["total_sec"] for s in sizes]), 3),
    "stage_slopes": {
        st: round(fit(sizes, [points[s]["stages"][st]["sec"] for s in sizes]), 3)
        for st in stages
    },
}
print(json.dumps(out, indent=1))
