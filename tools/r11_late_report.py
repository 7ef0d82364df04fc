#!/usr/bin/env python3
"""Regenerate the round-11 LATE sections of SCALING_r11.json from the
committed per-point JSONs under scaling/r11/ — the sections added after
tools/r11_sweep.sh ran (same refusal discipline: an errors key or a
negative sentinel breaks the report):

  bpe_new_ops_r11_late        <- bpenew_sf{1,2,4,8}.json   (q94/q95/q96)
  bpe_pack_materialize_r11_late <- q97_sf{1,2,4,8}.json    (q97, native kernel)
  corpus_bpe_r11_late         <- corpus_bpe_{4,8,16}.json  (bpeMerges=1024 decade)
  bpe_trainer_merges_dimension.rich16_exhaustion
                              <- bpetrain_rich16_exhaust.json (ids phase)

Usage: r11_late_report.py <scalingDir> [--write]
Without --write, prints the regenerated sections; with it, folds them
into <scalingDir>/SCALING_r11.json and the repo-root copy, preserving
every other section. Prose `note` fields are kept from the existing
artifact when present (they carry measurement context, not numbers).
"""
import json
import math
import os
import sys

work = sys.argv[1]
write = "--write" in sys.argv


def fit(sfs, ys):
    lx = [math.log(s) for s in sfs]
    ly = [math.log(y) for y in ys]
    n = len(sfs)
    mx, my = sum(lx) / n, sum(ly) / n
    return round(sum((x - mx) * (y - my) for x, y in zip(lx, ly)) /
                 sum((x - mx) ** 2 for x in lx), 3)


def segs(sfs, ys):
    return {f"sf{a}->sf{b}": round(math.log(tb / ta) / math.log(b / a), 3)
            for (a, ta), (b, tb) in zip(zip(sfs, ys), zip(sfs[1:], ys[1:]))}


def bench_lines(path):
    with open(path) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    med = next(l for l in lines if l["metric"] == "total")
    mn = next(l for l in lines if l["metric"] == "total_min")
    if "errors" in med:
        sys.exit(f"REFUSING {path}: bench run carries errors: {med['errors']}")
    bad = {k: v for line in (med["queries"], mn["queries_min"])
           for k, v in line.items() if v < 0}
    if bad:
        sys.exit(f"REFUSING {path}: negative (sentinel) timings: {bad}")
    return med, mn


SFS = [1, 2, 4, 8]
out = {}

# --- bpe_new_ops_r11_late: q94/q95/q96 one JVM per point ---
NEWQ = {"q94": "q94_bpe_lm_perplexity", "q95": "q95_bpe_ppl_buckets",
        "q96": "q96_bpe_temperature_mix"}
pts, mins = {}, {k: [] for k in NEWQ}
for sf in SFS:
    med, mn = bench_lines(os.path.join(work, f"bpenew_sf{sf}.json"))
    row = {}
    for short, q in NEWQ.items():
        row[f"{short}_median_sec"] = med["queries"][q]
        row[f"{short}_min_sec"] = mn["queries_min"][q]
        mins[short].append(mn["queries_min"][q])
    pts[f"sf{sf}"] = row
out["bpe_new_ops_r11_late"] = {
    "points": pts,
    "fit_slopes_min": {q: fit(SFS, mins[s]) for s, q in NEWQ.items()},
}

# --- bpe_pack_materialize_r11_late: q97 one JVM per point ---
pts, ys = {}, []
for sf in SFS:
    med, mn = bench_lines(os.path.join(work, f"q97_sf{sf}.json"))
    pts[f"sf{sf}"] = {"median_sec": round(med["queries"]["q97_bpe_pack_ids"], 4),
                      "min_sec": round(mn["queries_min"]["q97_bpe_pack_ids"], 4)}
    ys.append(mn["queries_min"]["q97_bpe_pack_ids"])
out["bpe_pack_materialize_r11_late"] = {
    "points": pts, "fit_slope_min": fit(SFS, ys),
    "segment_slopes_min": segs(SFS, ys),
}

# --- corpus_bpe_r11_late: bpeMerges=1024 decade ---
RICH = [4, 8, 16]
pts = {}
for sf in RICH:
    with open(os.path.join(work, f"corpus_bpe_{sf}.json")) as f:
        d = json.loads(f.read())
    pts[f"rich{sf}"] = {"total_sec": d["total_sec"],
                        "stages": {k: v["sec"] for k, v in d["stages"].items()}}
word = {}
for sf in RICH:
    with open(os.path.join(work, f"corpus_rich_{sf}.json")) as f:
        word[f"rich{sf}"] = json.loads(f.read())["total_sec"]
new_stages = {}
for st in ("tokenizer", "pack_ids"):
    ys = [pts[f"rich{s}"]["stages"][st] for s in RICH]
    new_stages[st] = {
        "sec": dict(zip((f"rich{s}" for s in RICH), ys)),
        "full_range_slope": round(math.log(ys[2] / ys[0]) / math.log(4), 3),
        "segments": {"4->8": round(math.log(ys[1] / ys[0]) / math.log(2), 3),
                     "8->16": round(math.log(ys[2] / ys[1]) / math.log(2), 3)}}
out["corpus_bpe_r11_late"] = {
    "points": pts, "word_config_total_sec": word,
    "new_stage_slopes": new_stages,
}

# --- rich16_exhaustion (ids phase) ---
with open(os.path.join(work, "bpetrain_rich16_exhaust.json")) as f:
    out["rich16_exhaustion"] = json.loads(f.read())

if not write:
    print(json.dumps(out, indent=1))
    sys.exit(0)

for path in (os.path.join(work, "SCALING_r11.json"),
             os.path.join(os.path.dirname(os.path.abspath(work.rstrip("/"))),
                          "..", "SCALING_r11.json")):
    path = os.path.normpath(path)
    if not os.path.exists(path):
        continue
    with open(path) as f:
        d = json.load(f)
    for key in ("bpe_new_ops_r11_late", "bpe_pack_materialize_r11_late",
                "corpus_bpe_r11_late"):
        regen = dict(out[key])
        if key in d and "note" in d[key]:
            regen["note"] = d[key]["note"]
        d[key] = regen
    d["bpe_trainer_merges_dimension"]["rich16_exhaustion"] = out["rich16_exhaustion"]
    with open(path, "w") as f:
        json.dump(d, f, indent=1)
    print(f"updated {path}")
