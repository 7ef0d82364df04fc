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
    "q73_chunking":
        "pure narrow plan (tokenize, explode a sequence, slice): zero "
        "exchanges, linear in corpus tokens.",
    "q74_shard_plan":
        "two-phase PrefixSum rank over 24-byte (key,id) rows; both "
        "shuffles metadata-width, payload never moves.",
    "q75_classifier_score":
        "whole model inside the scan's codegen span: zero exchanges, "
        "linear in corpus tokens.",
    "q76_lm_perplexity":
        "word-count shuffle (map-side partials, vocab-bounded) + Zipf-"
        "small broadcast probe; per-doc sum map-side combined.",
    "q77_dsir_weights":
        "two word-count-shaped bucket-count shuffles (2^10-bounded after "
        "partial agg) + broadcast lambda probe + per-doc sum — linear in "
        "corpus features (uni+bigrams ~ 2x tokens). Bigrams built with "
        "zip_with against the shifted token array: element_at inside a "
        "transform lambda re-evaluated the tokenize per ELEMENT "
        "(O(tokens^2)/doc, 13.6 s -> 2.7 s on the bench corpus).",
    "q78_dsir_resample":
        "q77 plus a TakeOrdered top-40 — per-partition top-k, driver "
        "merges k rows; no global sort.",
    "q79_ppl_buckets":
        "q76's LM pass + the two-phase PrefixSum rank on a 35-byte key "
        "frame; ntile assignment from broadcast totals.",
    "q80_zipf_stats":
        "one word-count shuffle; the rank window sees only the "
        "TakeOrdered top-100 head. Vocab plateaus with corpus growth "
        "(Heaps' law), so the count shuffle is the whole cost.",
    "q81_tfidf_topk":
        "per-doc tf shuffle + broadcast df probe + doc-partitioned rank "
        "window — linear in distinct (doc,tok) pairs.",
    "q82_label_noise":
        "production twin: autoNlist cluster-bounded kNN (occupancy ~1024; "
        "the audit pays occupancy^2 per cluster so quadratic-term sizing, "
        "not semDedup's 4096), shared assignment exchange, and the rank "
        "window keyed (centroid,id) so the candidate stream is ranked IN "
        "PLACE — a bare-id window re-shuffled every pair (measured 114 s "
        "vs 30.8 s at sf2). Segment slopes wobble with the autoNlist "
        "staircase (nlist is discrete); the q70 caveat applies.",
    "q83_text_cleanup":
        "zero-exchange codegen scan: replace chain + three regexes, "
        "linear in corpus chars.",
    "q84_split_assign":
        "zero-exchange codegen scan: one md5 + a when-chain per row.",
    "q85_incr_embed_dedup":
        "O(batch) by construction: the index is probed only through the "
        "buckets the batch occupies (broadcast semi-join), index-vs-index "
        "collisions dropped before the threshold test; twin runs "
        "autoBits/autoBands + the hot-bucket cap.",
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
    prov = {sfname(sf): points[sf].get("provenance", {}).get(q) for sf in sfs
            if points[sf].get("provenance", {}).get(q)}
    if prov:
        out["queries"][q]["provenance"] = sorted(set(prov.values()))
print(json.dumps(out, indent=1))
