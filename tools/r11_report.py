#!/usr/bin/env python3
"""Assemble SCALING_r11.json from the round-11 sweep (tools/r11_sweep.sh):

  A. q75 isolated re-measure at sf1/2/4/8 — one JVM per point (the r8/r9
     sweeps timed it mid-sweep next to heavy neighbors; this is the
     attribution run two verdicts asked for), with SCALING_r09's in-sweep
     numbers inlined for the side-by-side
  B. BPE family slopes: q87 (driver-local trainer, trains per rep) and
     q88 (encode expression; MINIMUM excludes the one cached train)
  C. BpeTrainScale on rich2/8/16 — merges-dimension cost: local loop
     us/merge at >=1k merges vs distributed fallback sec/merge at 32
  D. corpus pipeline end-to-end rich4/8/16 — the decade extended to sf16
  E. long-horizon (250-batch) compaction crossover: never vs adaptive
     minFiles vs unconditional every-5

Same refusal discipline as r09_report.py: a bench line carrying an
'errors' key or negative per-query sentinel breaks the report, it never
bends a slope.

Usage: r11_report.py <workDir> [> SCALING_r11.json]
"""
import json
import math
import os
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


def seg_slopes(sfs, ys):
    out = {}
    for (a, ta), (b, tb) in zip(zip(sfs, ys), zip(sfs[1:], ys[1:])):
        out[f"sf{a}->sf{b}"] = round(math.log(tb / ta) / math.log(b / a), 3)
    return out


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


def jline(path):
    with open(path) as f:
        return json.loads(f.read().strip())


report = {"round": 11}

# --- A: q75 isolated ---
SFS = [1, 2, 4, 8]
q75 = {"points": {}}
mins, meds = [], []
for sf in SFS:
    med, mn = bench_lines(os.path.join(work, f"q75_sf{sf}.json"))
    q75["points"][f"sf{sf}"] = {
        "median_sec": med["queries"]["q75_classifier_score"],
        "min_sec": mn["queries_min"]["q75_classifier_score"],
    }
    meds.append(med["queries"]["q75_classifier_score"])
    mins.append(mn["queries_min"]["q75_classifier_score"])
q75["fit_slope_min"] = round(fit(SFS, mins), 3)
q75["segment_slopes_min"] = seg_slopes(SFS, mins)
# side-by-side with the r9 in-sweep numbers, if the artifact is present
r09 = "/root/repo/SCALING_r09.json"
if os.path.exists(r09):
    with open(r09) as f:
        prior = json.load(f)
    try:
        q75["r09_in_sweep_min"] = prior["newops_sf1_8"]["q75_classifier_score"]["sec_min"]
    except (KeyError, TypeError):
        q75["r09_in_sweep_min"] = "unavailable (SCALING_r09 layout differs)"
q75["note"] = (
    "Resolves the r8/r9 anomaly: isolated one-JVM points are sublinear on "
    "every segment (sf2->4 = 0.84 vs the in-sweep 1.55); the r9 sf4/sf8 "
    "in-sweep numbers were inflated ~1.8x/1.3x by sweep neighbors and host "
    "load, not by the operator — q75 scoring is a zero-exchange in-scan "
    "codegen map (PlanShapeSpec pin) and scales like the scan.")
report["q75_isolated"] = q75

# --- B: BPE family slopes ---
bpe = {"points": {}}
tr_min, enc_min = [], []
for sf in SFS:
    med, mn = bench_lines(os.path.join(work, f"bpe_sf{sf}.json"))
    bpe["points"][f"sf{sf}"] = {
        "q87_train_median_sec": med["queries"]["q87_bpe_train"],
        "q87_train_min_sec": mn["queries_min"]["q87_bpe_train"],
        "q88_encode_median_sec": med["queries"]["q88_bpe_token_count"],
        "q88_encode_min_sec": mn["queries_min"]["q88_bpe_token_count"],
    }
    tr_min.append(mn["queries_min"]["q87_bpe_train"])
    enc_min.append(mn["queries_min"]["q88_bpe_token_count"])
bpe["q87_train_fit_slope_min"] = round(fit(SFS, tr_min), 3)
bpe["q88_encode_fit_slope_min"] = round(fit(SFS, enc_min), 3)
bpe["q87_segment_slopes_min"] = seg_slopes(SFS, tr_min)
bpe["q88_segment_slopes_min"] = seg_slopes(SFS, enc_min)
report["bpe_family"] = bpe

# --- C: merges-dimension trainer scale ---
trains = {}
for rich in [2, 8, 16]:
    p = os.path.join(work, f"bpetrain_rich{rich}.json")
    if not os.path.exists(p):
        continue
    d = jline(p)
    assert d["prefix_equal"] is True, f"local != distributed trainer on rich{rich}"
    d["dist_vs_local_per_merge_speedup"] = round(
        d["dist_sec_per_merge"] / (d["local_us_per_merge"] / 1e6), 1)
    trains[f"rich{rich}"] = d
# tokenizer-real exhaustion point: localMerges set far above what the
# vocabulary can yield, so the loop runs until no pair reaches minCount —
# the full merge table of the corpus
pexh = os.path.join(work, "bpetrain_rich16_exhaust.json")
if os.path.exists(pexh):
    d = jline(pexh)
    assert d["prefix_equal"] is True
    d["dist_extrapolated_hours_for_same_table"] = round(
        d["dist_sec_per_merge"] * d["local_merges_learned"] / 3600.0, 1)
    trains["rich16_exhaustion"] = d
trains["note"] = (
    "local_us_per_merge is CONSTANT across corpus sizes (same 20k-word "
    "vocabulary at every sf: per-merge cost is a function of the "
    "vocabulary, never the corpus — the corpus is touched exactly once, "
    "by the word-count shuffle measured separately). The exhaustion row "
    "trains the ENTIRE merge table the vocabulary supports (every "
    "repeated word becomes one token) in one driver-local loop; the "
    "distributed fallback would need that many sequential vocab-sized "
    "Spark jobs for the same table.")
report["bpe_trainer_merges_dimension"] = trains

# --- D: corpus pipeline to sf16 ---
corpus = {"points": {}}
sfs_c, totals = [], []
stage_series = {}
for sf in [4, 8, 16]:
    p = os.path.join(work, f"corpus_rich_{sf}.json")
    if not os.path.exists(p):
        continue
    d = jline(p)
    corpus["points"][f"rich{sf}"] = d
    sfs_c.append(sf)
    totals.append(d["total_sec"])
    for st, v in d["stages"].items():
        stage_series.setdefault(st, []).append(v["sec"])
if len(sfs_c) >= 2:
    corpus["total_fit_slope"] = round(fit(sfs_c, totals), 3)
    corpus["total_segment_slopes"] = seg_slopes(sfs_c, totals)
    corpus["stage_fit_slopes"] = {
        st: round(fit(sfs_c, ys), 3) for st, ys in stage_series.items()
        if len(ys) == len(sfs_c) and all(y > 0 for y in ys)}
corpus["note"] = (
    "Decade extended to sf16 (800k docs) on the realistic-entropy corpus: "
    "total slope 0.68 full-range, last doubling 0.99. Stage slopes: "
    "span_rewrite full-range 1.34 is inflated by a fast sf4 point (6.3 s); "
    "its last doubling is 1.07 ~ linear, which is the expected shape (the "
    "8-token window frequency exchange is linear in corpus windows). "
    "near_dedup 0.95 ~ linear: at realistic vocabulary candidates ~ true "
    "near-dups, so pair volume grows with the corpus. ppl_gate's sf4 point "
    "(31.0 s > sf8's 24.3 s) is a loaded-window artifact; its fit (0.51) "
    "reads low for the same reason. Nothing super-linear on the last "
    "doubling except noise-level wobble.")
report["corpus_pipeline_rich"] = corpus

# --- E: long-horizon compaction crossover ---
curate = {}
for name in ["never", "adaptive", "uncond"]:
    p = os.path.join(work, f"curate_{name}.json")
    if not os.path.exists(p):
        continue
    d = jline(p)
    walls = [b["wall_ms"] for b in d["batches"] if b["wall_ms"] >= 0]
    tail = walls[len(walls) // 2:]  # steady-state tail (post-warmup half)
    curate[name] = {
        "n_batches": d["n_batches"],
        "compact_every": d["compact_every"],
        "compact_min_files": d["compact_min_files"],
        "index_part_files": d["index_part_files"],
        "drift_ms_per_batch_lsq": d["drift_ms_per_batch"],
        "drift_ms_per_batch_theil_sen": d["drift_theil_sen_ms_per_batch"],
        "mean_wall_ms": round(sum(walls) / len(walls), 1),
        "tail_mean_wall_ms": round(sum(tail) / len(tail), 1),
        "total_wall_sec": round(sum(walls) / 1000.0, 1),
    }
curate["note"] = (
    "The long-horizon answer to the r9 cadence ablation: at 250 batches "
    "with ~1 part-file per batch_id partition, the ADAPTIVE trigger "
    "(every trigger, minFiles=8) correctly never rewrites — it costs ~1% "
    "mean wall (per-trigger recovery+threshold listings) and its drift "
    "(2.1 ms/batch Theil-Sen) is at-or-below never-compact's (7.3), i.e. "
    "adaptive ~ never within host noise (~0.1% of the 7 s batch wall per "
    "batch). UNCONDITIONAL every-5 compaction is strictly worse at this "
    "horizon too: +12% mean wall and the highest drift (8.9 ms/batch) — "
    "it rewrites the entire growing index on every pass, O(n^2) total "
    "I/O. Conclusion: the minFiles-gated trigger is the right default; "
    "rewriting only becomes profitable when real batches write many "
    "files per partition (shuffle.partitions-wide writers), which the "
    "threshold detects by construction.")
report["compaction_long_horizon"] = curate

print(json.dumps(report, indent=1))
