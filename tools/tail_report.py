#!/usr/bin/env python3
"""Assemble SCALING_r06_tail.json: a 4th scale point (generated sf2 —
12M-row lineitem / 100k docs / 40k embeddings, 20x the smallest sweep
point) for the scale-SENSITIVE dedup/similarity family, measured in
ISOLATION per query group (a first attempt measured the whole family in
one JVM and q39's 350 s reps inflated every neighbor 4-6x — lesson
recorded here and in Bench.scala's noise notes).

Tail slope = d log(min sec) / d log(sf) over sf1 -> sf2.
"""
import json
import math
import sys

NOTES = {
    "q39_dedup_jaccard":
        "candidate-bound by construction (see SCALING_r06.json): per-"
        "shingle DF doubles at 2x corpus, so the exhaustive candidate set "
        "quadruples (~470M candidate rows at sf2) and the pair aggregation "
        "spills — measured 352 s in one run and 1862 s in another (spill "
        "thrash makes the regime unstable), i.e. slope >= 2 and memory-"
        "bound past it. This is the exact-contract worst case the "
        "maxPostings cap exists for: this corpus's DF (~180/posting at "
        "sf2) sits under the default 1000 cap so the cap correctly never "
        "fires, while a production corpus crossing it gets the flattened "
        "sum-of-min(DF,cap)^2 cost; q40 MinHash (slope 0.21 on this same "
        "doubling) is the engine's scale path.",
    "q44_embed_neardup":
        "the stated fixed-recall LSH trade, not a defect: autoBits holds "
        "bucket occupancy flat (measured: 39 rows at both SFs, skew only "
        "1.3x over uniform — BucketSkew tool), but holding recall at 0.9 "
        "while bits grow forces autoBands up (9 -> 10 bands here, "
        "geometric in bits), so candidates/row grow ~bands(n): measured "
        "candidates 4.5M -> 10.5M (2.35x for 2x rows). autoBands' "
        "maxBands=16 clamp bounds this; past it a deployment trades "
        "recall or re-blocks (scaladoc states both).",
    "q62_ann_ivf":
        "transitional nlist regime: autoNlist doubles the centroid count "
        "(5 -> 10) so the inlined-argmin map costs 2x per row on 2x rows; "
        "bounded — nlist is clamped at maxNlist=4096, after which "
        "assignment cost per row is constant and scaling is linear. The "
        "100 TB note in ivfTopKInt covers the two-level coarse quantizer "
        "beyond that.",
}

def main(out_path):
    sf1 = json.load(open("/root/repo/scaledata/bench_sf1.json"))
    mins2 = {}
    for f in ("/tmp/q44_sf2_b.json", "/tmp/q6243_sf2.json",
              "/tmp/rest_sf2.json", "/tmp/q39_sf2.json"):
        try:
            d = json.load(open(f))
            mins2.update(d["queries_min"])
        except FileNotFoundError:
            print(f"missing {f}", file=sys.stderr)
    queries = {}
    for q, b in sorted(mins2.items()):
        a = sf1["queries_min"][q]
        slope = math.log(b / a) / math.log(2.0)
        entry = {"sec_min_sf1": round(a, 3), "sec_min_sf2": round(b, 3),
                 "tail_slope": round(slope, 3)}
        if q in NOTES:
            entry["note"] = NOTES[q]
        elif slope > 1.3:
            entry["note"] = "UNEXPLAINED"
        queries[q] = entry
    report = {
        "what": "4th scale point for the scale-sensitive dedup/similarity "
                "family: generated sf2 (12M-row lineitem, 100k docs, 40k "
                "embeddings) vs the sweep's sf1 — a 20x range from the "
                "smallest sweep point",
        "method": "min of reps, each query group timed in an OTHERWISE "
                  "IDLE JVM (SPARK_GRAFT_BENCH_ONLY); an initial all-in-"
                  "one-JVM run inflated q39's neighbors 4-6x and was "
                  "discarded",
        "tail_slope_definition": "d log(min sec) / d log(sf) over "
                                 "sf1 -> sf2; 1.0 = linear in rows",
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}: {len(queries)} queries")
    for q, e in queries.items():
        flag = " *" if e.get("note") else ""
        print(f"  {q}: {e['tail_slope']}{flag}")
    if any(e.get("note") == "UNEXPLAINED" for e in queries.values()):
        print("UNEXPLAINED super-linear tails present", file=sys.stderr)
        sys.exit(1)

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/SCALING_r06_tail.json")
