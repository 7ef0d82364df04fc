#!/usr/bin/env python3
"""Assemble SCALING_r09.json from the round-9 sweep (tools/r09_sweep.sh):

  A. new-op families sf1/2/4/8 — q70/q75/q76/q79/q82 bench twins, one JVM
     per point, minima-of-3 (the r8 sweep caught q70/q82 cliffing 3.66x/
     3.07x on the sf2->4 doubling; round 9 tiled the pair join and
     nativized the dot/argmin kernels — this is the re-measurement)
  B. q39 sf2 same-config stability x2 under the SIZED pairPartitions
  C. CorpusPipeline end-to-end at sf2/4/8
  D. multimodal decode->aHash->near-dup at 8k/32k/128k real PNGs, with
     measured payload-pruning bytes and planted-pair recall
  E. streaming curation steady state: per-batch wall vs index size,
     least-squares drift over the post-warmup tail

Replaces tools/r08_report.py, which fed Bench's -1.0 error sentinels into
the log-log fits (clamped to log(1e-3) — a failed query yielded a
plausible-looking corrupted slope). This version FAILS FAST when a bench
line carries an 'errors' key or any negative per-query value: scaling
evidence must come from clean runs only.

Usage: r09_report.py <workDir> [> SCALING_r09.json]
"""
import json
import math
import sys

work = sys.argv[1]


def fit(xs, ys):
    assert all(y > 0 for y in ys), f"non-positive time in fit input: {ys}"
    lx = [math.log(x) for x in xs]
    ly = [math.log(y) for y in ys]
    n = len(xs)
    mx, my = sum(lx) / n, sum(ly) / n
    den = sum((x - mx) ** 2 for x in lx)
    return sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / den if den else 0.0


def bench_lines(path):
    """Bench writes two self-contained lines: medians then minima.
    Refuse errored or sentinel-carrying runs — a corrupted point must
    break the report, not bend a slope."""
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


# --- A: new-op families, sf1..8 (+ an optional sf16 point for the two
# cliff queries: one more doubling past the artifact's core decade) ---
SFS = [1, 2, 4, 8, 16]
points = {}
for sf in SFS:
    try:
        med, mn = bench_lines(f"{work}/newops_sf{sf}.json")
    except FileNotFoundError:
        continue
    points[sf] = {"med": med["queries"], "min": mn["queries_min"]}

newops = {}
# key the query list off the smallest PRESENT sf (degrade gracefully when
# sf1 is missing, consistent with the per-file FileNotFoundError handling)
base_sf = min(points) if points else None
for q in (sorted(points[base_sf]["med"].keys()) if points else []):
    qsfs = [sf for sf in SFS if sf in points and q in points[sf]["min"]]
    mins = {sf: points[sf]["min"][q] for sf in qsfs}
    meds = {sf: points[sf]["med"][q] for sf in qsfs}
    slope = fit(qsfs, [mins[sf] for sf in qsfs])
    # the extrapolation question: does the top doubling bend upward?
    tail = fit(qsfs[-2:], [mins[sf] for sf in qsfs[-2:]])
    newops[q] = {
        "sec_min": {str(sf): mins[sf] for sf in qsfs},
        "sec_median": {str(sf): meds[sf] for sf in qsfs},
        "slope_minima_full_range": round(slope, 3),
        "slope_last_doubling": round(tail, 3),
        "max_sf": qsfs[-1],
    }

# --- B: q39 sf2 stability ---
q39 = {}
q39_runs = []
for run in (1, 2, 3, 4, 5):
    try:
        med, _ = bench_lines(f"{work}/q39_sf2_run{run}.json")
    except FileNotFoundError:
        continue
    q39[f"run{run}_sec"] = med["queries"]["q39_dedup_jaccard"]
    q39_runs.append(q39[f"run{run}_sec"])
if q39_runs:
    q39["min_sec"] = min(q39_runs)
    q39["spread_all"] = round(max(q39_runs) / min(q39_runs), 3)
if len(q39_runs) >= 2:
    warmed = sorted(q39_runs)[:2]
    q39["spread_warmed"] = round(warmed[1] / warmed[0], 3)
q39["note"] = ("same config, one idle JVM per run; runs decline "
               "monotonically (390/274/206/179/179 s — page-cache warming "
               "of the 100k-doc corpus) and the two warmed runs agree to "
               "0.3%. Steady state ~179 s vs r7's 510-564 s under the "
               "flat-512 exchange: the SIZED posting exchange is 2.9x "
               "faster, and the r6 thrash regime (5.3x same-config spread, "
               "1862 s outlier) stays gone.")
# q39 on realistic-entropy documents (same counts as sf2/sf8 synthetic):
# the absolute cost above is the 31-word corpus's shared-shingle posting
# lists, not the operator
for name, key in (("q39_rich2", "rich2_100k_docs_sec"),
                  ("q39_rich8", "rich8_400k_docs_sec")):
    try:
        _, mn = bench_lines(f"{work}/{name}.json")
        q39[key] = mn["queries_min"]["q39_dedup_jaccard"]
    except FileNotFoundError:
        pass
if "rich2_100k_docs_sec" in q39 and "rich8_400k_docs_sec" in q39:
    q39["rich_slope_2_8"] = round(fit(
        [2, 8], [q39["rich2_100k_docs_sec"], q39["rich8_400k_docs_sec"]]), 3)
    q39["rich_note"] = ("identical doc counts and shape at 20k-word "
                        "vocabulary: 100k docs in ~3-5 s, 400k in ~14 s "
                        "(slope ~1.1, linear in docs) — the synthetic "
                        "corpus's ~179 s is data-intrinsic posting-list "
                        "degeneracy, the same artifact quantified in "
                        "corpus_pipeline_richvocab and curate_steady_state")

# --- C: corpus pipeline sf2/4/8 ---
# per SF take the fastest same-config run (sweep + any idle re-run): the
# sweep's sf2/sf4 JVMs ran in a degraded host window (every stage,
# including trivially-linear ones, ~1.7x slower than both the r7 baseline
# and the idle re-runs), and the min across isolated same-config runs is
# the established contention-floor estimator
CSFS = [2, 4, 8]
cpoints = {}
cruns = {}
for sf in CSFS:
    runs = []
    for name in (f"corpus_{sf}", f"corpus_rerun_{sf}"):
        try:
            with open(f"{work}/{name}.json") as f:
                runs.append(json.load(f))
        except FileNotFoundError:
            pass
    best = min(runs, key=lambda r: r["total_sec"])
    cpoints[sf] = best
    cruns[sf] = [r["total_sec"] for r in runs]
ctotals = [cpoints[sf]["total_sec"] for sf in CSFS]
stage_names = list(cpoints[CSFS[0]]["stages"].keys())
cstages = {
    s: {
        "sec": {str(sf): cpoints[sf]["stages"][s]["sec"] for sf in CSFS},
        "rows": {str(sf): cpoints[sf]["stages"][s]["rows"] for sf in CSFS},
        "slope": round(fit(CSFS, [cpoints[sf]["stages"][s]["sec"] for sf in CSFS]), 3),
    }
    for s in stage_names
}
corpus = {
    "total_sec": {str(sf): ctotals[i] for i, sf in enumerate(CSFS)},
    "total_slope_sf2_8": round(fit(CSFS, ctotals), 3),
    "runs_total_sec": {str(sf): cruns[sf] for sf in CSFS},
    "stages": cstages,
    "near_dedup_note": (
        "near_dedup's super-linear slope is the 31-word-vocab collision "
        "load quantified in curate_steady_state: on GenScaleData text, "
        "minhash concentrates on the globally smallest common shingles, so "
        "LSH candidate count per doc grows with corpus size until the "
        "maxBucketSize cap truncates degenerate buckets; the same loop is "
        "measured FLAT at 20k-word vocabulary (curate v2_sidecar_vocab20k), "
        "and corpus_pipeline_richvocab below runs the FULL pipeline on "
        "20k-word documents of identical shape — near_dedup slope 0.60, "
        "every stage sublinear. Per-task work stays bounded by the bucket "
        "cap regardless."),
}

# --- C2: corpus pipeline on realistic-entropy documents (20k-word vocab,
# same doc shape/dup rate/source mix) — the direct counter-evidence that
# the synthetic series' near_dedup slope is a data artifact ---
rich = {}
rpoints = {}
for sf in CSFS:
    try:
        with open(f"{work}/corpus_rich_{sf}.json") as f:
            rpoints[sf] = json.load(f)
    except FileNotFoundError:
        pass
if len(rpoints) == len(CSFS):
    rtotals = [rpoints[sf]["total_sec"] for sf in CSFS]
    rich = {
        "vocab_size": 20000,
        "total_sec": {str(sf): rtotals[i] for i, sf in enumerate(CSFS)},
        "total_slope_sf2_8": round(fit(CSFS, rtotals), 3),
        "stages": {
            s: {
                "sec": {str(sf): rpoints[sf]["stages"][s]["sec"] for sf in CSFS},
                "slope": round(fit(CSFS, [rpoints[sf]["stages"][s]["sec"]
                                          for sf in CSFS]), 3),
            }
            for s in stage_names
        },
    }

# --- D: multimodal ---
MMN = [8000, 32000, 128000]
mpoints = {}
for n in MMN:
    with open(f"{work}/mm_{n}.json") as f:
        mpoints[n] = json.load(f)
multimodal = {
    "points": {str(n): mpoints[n] for n in MMN},
    "decode_slope": round(fit(MMN, [mpoints[n]["decode_sec"] for n in MMN]), 3),
    "neardup_slope": round(fit(MMN, [mpoints[n]["neardup_sec"] for n in MMN]), 3),
    "pruning_ratio_at_max": round(
        mpoints[MMN[-1]]["payload_scan_bytes"] /
        max(1, mpoints[MMN[-1]]["meta_scan_bytes"]), 1),
    "planted_recall": min(mpoints[n]["planted_recall"] for n in MMN),
}

# --- E: streaming curation steady state ---
def curate_summary(name, full_batches=False):
    try:
        with open(f"{work}/{name}.json") as f:
            c = json.load(f)
    except FileNotFoundError:
        return None
    walls = [b["wall_ms"] for b in c["batches"]]
    steady = walls[3:]
    out = {k: c[k] for k in ("n_batches", "batch_rows", "compact_every",
                             "bands", "max_bucket_size", "vocab_size",
                             "drift_ms_per_batch",
                             "drift_theil_sen_ms_per_batch") if k in c}
    out["steady_mean_ms"] = round(sum(steady) / max(1, len(steady)), 1)
    out["steady_max_over_min"] = (round(max(steady) / max(1, min(steady)), 3)
                                  if steady else None)
    out["final_index_rows"] = c["batches"][-1]["index_rows_after"]
    if full_batches:
        out["batches"] = c["batches"]
    return out


curation = {
    "what": ("decomposition of the r9 v1 drift (+166 ms/batch): the plain "
             "probe re-derived LSH buckets from every indexed signature per "
             "batch; v2 probes the thin bucket SIDECAR written at index time "
             "and fetches shingle sets only from collided batch_id "
             "partitions (Dedup.incrementalNearDupsIndexed). Residual slope "
             "on the 31-word-vocab GenScaleData corpus is collision load "
             "intrinsic to the DATA (minhash concentrates on the globally "
             "smallest common shingles, so nearly every doc collides with "
             "the whole index); at 20k-word vocabulary the same loop is "
             "flat to within host noise. Theil-Sen is the headline fit "
             "(LSQ bends tens of ms/batch on one multi-second host spike)."),
    "v1_prefix_probe": curate_summary("curate"),
    "v2_sidecar_synthetic_vocab31": curate_summary("curate_f1", full_batches=True),
    "v2_sidecar_vocab20k": curate_summary("curate_f2", full_batches=True),
    "ablations": {k: curate_summary(k) for k in
                  ("curate_c5", "curate_v2", "curate_v2c",
                   "curate_v2b16", "curate_v2cap", "curate_v2rich")},
}

out = {
    "what": ("round-9 scale evidence: the r8-measured q70/q82 cliff "
             "re-measured after the tiled pair join + native dot/argmin "
             "kernels (sf1-8, isolated JVMs, minima-of-3), q39 sf2 "
             "stability under the SIZED posting exchange, CorpusPipeline "
             "end-to-end sf2-8, multimodal decode/near-dup at 8k-128k real "
             "PNGs with measured payload pruning, and the streaming "
             "curation loop's per-batch steady state"),
    "bench_context": (
        "the q70/q82 bench twins now run CONVERGED k-means++ centroids "
        "(build cost timed in) instead of seed centroids, as the operators' "
        "scaladoc mandates — seed-centroid occupancy skew squares into pair "
        "work. At sf0.1 this adds ~2.3 s absolute to q82 (1.99 -> 4.25 s in "
        "a same-host A/B vs the r8 tail) while q70 absorbs the same build "
        "inside its tiled-join saving (1.80 -> 1.72 s); at sf4 the combined "
        "change is 262 -> 19 s (q82) and 325 -> 16 s (q70). Full-suite "
        "sf0.1 totals this session (bench_sf01_full.json, all 86 queries "
        "incl. the new q86): 67.9 s median / 60.5 s min — level with r8's "
        "85-query 67.5/60.0 despite the added query and the q82 build "
        "cost. An earlier run in a loaded window measured 71.7/64.7 with "
        "untouched sub-second queries inflated 50-90%, the same host "
        "pattern seen in the corpus sweep re-runs — treat cross-round "
        "per-query deltas at that granularity as window noise."),
    "newops_sf1_8": newops,
    "q39_sf2_stability_sized": q39,
    "corpus_pipeline_sf2_8": corpus,
    "corpus_pipeline_richvocab_sf2_8": rich,
    "multimodal": multimodal,
    "curate_steady_state": curation,
}
print(json.dumps(out, indent=1))
