#!/usr/bin/env python3
"""Assemble SCALING_r12.json from the committed scaling/r12/ point files:
the final-code corpus-pipeline decade (rich4/8/16/32), the streaming
tokenizer-mode steady-state series (+ word control), and the standalone
operator A/Bs measured during the round (recorded as constants here, with
their methodology in the note).

Usage: python3 tools/r12_report.py > SCALING_r12.json
"""
import json
import math
import os

R12 = os.path.join(os.path.dirname(__file__), "..", "scaling", "r12")


def load(name):
    with open(os.path.join(R12, name)) as f:
        return json.load(f)


def slope(a, b):
    return round(math.log2(b / a), 3)


points = {}
labels = [("rich4", 4), ("rich8", 8), ("rich16", 16), ("rich32", 32)]
for label, _ in labels:
    d = load(f"corpus_final_rich{label[4:]}.json")
    points[label] = {
        "total_sec": d["total_sec"],
        "stages": {k: v["sec"] for k, v in d["stages"].items()},
        "rows_out": d["stages"]["shard"]["rows"],
    }

totals = [points[l]["total_sec"] for l, _ in labels]
seg = {f"{labels[i][0]}->{labels[i+1][0]}": slope(totals[i], totals[i + 1])
       for i in range(len(labels) - 1)}
stage_last_doubling = {
    s: slope(points["rich16"]["stages"][s], points["rich32"]["stages"][s])
    for s in points["rich16"]["stages"]}

r11 = {"rich4": 72.101, "rich8": 93.741, "rich16": 185.494}
vs_r11 = {l: round(points[l]["total_sec"] / r11[l], 3) for l in r11}

steady_tok = load("steady_tokenizer.json")
steady_word = load("steady_word.json")


def steady_summary(d):
    ws = sorted(b["wall_ms"] for b in d["batches"])
    return {
        "n_batches": d["n_batches"],
        "batch_rows": d["batch_rows"],
        "vocab_size": d["vocab_size"],
        "bands": d["bands"],
        "tokenizer_merges": d.get("tokenizer_merges", 0),
        "median_wall_ms": ws[len(ws) // 2],
        "drift_theil_sen_ms_per_batch": d["drift_theil_sen_ms_per_batch"],
        "drift_lsq_ms_per_batch": d["drift_ms_per_batch"],
    }


out = {
    "round": 12,
    "corpus_pipeline_final": {
        "points": points,
        "total_segment_slopes": seg,
        "stage_slopes_rich16_to_rich32": stage_last_doubling,
        "total_vs_r11": vs_r11,
        "note": (
            "Fresh JVM per point, FINAL round-12 code (incl. the "
            "union-find CC fast path), quiet host: rich4/8/16/32 = "
            "38.4/50.5/77.5/125.4 s vs r11's 72.1/93.7/185.5 - rich16 "
            "-58%. rich32 (1.6M docs) is the new largest point. Total "
            "doubling slopes 0.40/0.62/0.69 - every segment sublinear "
            "(r11 last doubling was 0.985). The stage rewrites behind "
            "it: near_dedup (single-pass bucket-member aggregation + "
            "union-find CC on match-sized pair lists), span_rewrite "
            "(one hash-agg wk exchange + in-array rebuild of affected "
            "docs), ppl_gate (local-LM zero-shuffle scorer; 66.3 -> "
            "~12 s at rich32). Stage walls at rich32 wobble +-30% "
            "run-to-run on this time-shared host (span_rewrite seen at "
            "23.2 and 33.7 s under identical code); the standalone "
            "fresh-JVM A/Bs below are the attributable per-operator "
            "numbers, and the cross-round deltas are far above the "
            "noise floor."),
    },
    "standalone_operator_ab": {
        "dedup_clusters_rich8_min_sec": {"r11_code": 24.7, "r12_code": 14.4},
        "dedup_clusters_rich16_min_sec": {"collect_list_shape": 19.2,
                                          "count_plus_semijoin_shape": 19.0},
        "remove_duplicate_spans_rich8_min_sec": {"r11_code": 8.1, "r12_code": 4.0},
        "ppl_gate_rich32_in_pipeline_sec": {"distributed": 66.3, "local_lm": 12.8},
        "connected_components_union_find": {
            "cc_step_rich16_sec": {"distributed_loop": 3.1, "union_find": 0.5},
            "note": (
                "748 edges across 800k docs: the distributed loop paid "
                "~0.5 s of plan-compile + job overhead per round "
                "regardless of graph size; under maxLocalEdges (4M, "
                "bounded-metadata collect) edges resolve driver-side "
                "with min-id union-find, pinned == the loop on "
                "randomized graphs. With it, q53_dedup_clusters at the "
                "sf0.1 bench dropped 2.06 (r11) -> 1.02 s."),
        },
        "adversarial_testdata_tradeoff": {
            "q69_span_dedup_sf01_min_sec": {"r11": 0.64, "r12": 0.84},
            "note": (
                "The driver testdata documents table is a DEGENERATE "
                "31-word-vocabulary corpus where nearly every window is "
                "duplicated, so the span rewrite's 'duplicated minority' "
                "assumption is false there: the dup-key probe frame is "
                "corpus-sized. Conscious tradeoff: +0.2 s on q69 on the "
                "degenerate fixture bought 2x on realistic-entropy "
                "corpora (the 100 TB case). The dedup-family queries "
                "that looked regressed mid-round recovered once the "
                "union-find CC landed (q53 2.06 -> 1.02; q40/q65/q86 "
                "level or better in the final anchor)."),
        },
        "note": (
            "3 reps per side, fresh JVM, min reported; outputs asserted "
            "identical (dedup: same 400k rows / 748 pairs; spans: "
            "removed=42085 chars=147725740 equal on both sides)."),
    },
    "corpus_pipeline_bpe_config": {
        "points": {
            l: (lambda d: {"total_sec": d["total_sec"],
                           "stages": {k: v["sec"] for k, v in d["stages"].items()}})(
                load(f"corpus_bpe_rich{l[4:]}.json"))
            for l in ["rich16", "rich32"]},
        "total_vs_r11": {"rich16": round(96.475 / 170.719, 3)},
        "note": (
            "Tokenizer-faithful configuration (bpeMerges=1024, matching "
            "the r11 corpus_bpe decade): rich16 170.7 -> 96.5 s (-43%) "
            "on the round-12 stage rewrites; rich32 = 165.0 s, doubling "
            "slope 0.77. Caveat on per-stage attribution at the big "
            "points: span_rewrite read 20.0 s and 45.8 s in two "
            "back-to-back rich32 runs of IDENTICAL code (512- vs "
            "1024-merge configs - the stage does not depend on the "
            "merge count), so individual stage walls at rich32 carry "
            "up-to-2x host noise; totals and cross-round deltas are "
            "the reliable signal."),
    },
    "curate_steady_state_tokenizer_mode": {
        "tokenizer": steady_summary(steady_tok),
        "word_control": steady_summary(steady_word),
        "note": (
            "25 batches x 4000 docs, realistic 20k vocab, bands=16, "
            "index uncompacted. Tokenizer mode (256 merges, |V|=1046 "
            "marked-bytes artifact, packed-id emission per batch): "
            "Theil-Sen drift -23.6 ms/batch on ~7.3 s batches - flat; "
            "word control +11.3 ms/batch on ~9.2 s batches - flat. "
            "Per-batch encode cost is invisible against the near-dup "
            "probe; medians differ only by host noise (the two runs "
            "executed at different host-load windows)."),
    },
}
print(json.dumps(out, indent=1))
