#!/bin/bash
# Round-8 scale-evidence sweep — one JVM per measurement point, run on an
# IDLE machine (no sbt while this runs; tools/jrun.sh avoids the sbt lock).
#
#  A. near-linear families one more decade: q70/q75/q76/q79/q82 bench
#     twins at sf1/2/4/8 (the r7 evidence stopped at sf2; q39 proved
#     regimes can change with another doubling)
#  B. q39 sf2 same-config stability x2 under the NEW sized pairPartitions
#     (replaces the r7 fixed-512 pin; sf0.1 recovery is in BENCH_r08)
#  C. CorpusPipeline end-to-end at sf2/4/8 (within-round continuity point
#     at sf2, then the new decade)
#  D. multimodal decode->aHash->near-dup at 8k/32k/128k real PNGs — the
#     one family with no scaling point in r7 — plus measured payload
#     pruning bytes
#  E. streaming curation steady state: 25 fixed-size micro-batches,
#     per-batch wall vs index size (the O(batch) flat-line)
set -u
cd "$(dirname "$0")/.."
WORK=/root/repo/scaledata/r08
mkdir -p "$WORK"
STATUS="$WORK/status.txt"
: > "$STATUS"

# A: new-op families, one more decade
for sf in 1 2 4 8; do
  SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf$sf \
  SPARK_GRAFT_BENCH_ONLY=q70_semdedup,q75_classifier_score,q76_lm_perplexity,q79_ppl_buckets,q82_label_noise \
  SPARK_GRAFT_BENCH_REPS=3 \
  SPARK_GRAFT_BENCH_OUT=$WORK/newops_sf$sf.json \
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.Bench > $WORK/newops_log_sf$sf.txt 2>&1
  echo "newops sf$sf rc=$?" >> "$STATUS"
done

# B: q39 sf2 stability under sized pairPartitions (reps=1, two JVMs)
for run in 1 2; do
  SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf2 \
  SPARK_GRAFT_BENCH_ONLY=q39_dedup_jaccard \
  SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=$WORK/q39_sf2_run$run.json \
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.Bench > $WORK/q39_sf2_run$run.log 2>&1
  echo "q39 run$run rc=$?" >> "$STATUS"
done

# C: corpus pipeline end-to-end
for sf in 2 4 8; do
  rm -rf "$WORK/corpus_out_$sf"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.tools.CorpusScale \
    "/root/repo/scaledata/sf$sf" "$WORK/corpus_out_$sf" "$sf" \
    "$WORK/corpus_$sf.json" > "$WORK/corpus_$sf.log" 2>&1
  echo "corpus sf$sf rc=$?" >> "$STATUS"
done

# D: multimodal scaling points
for n in 8000 32000 128000; do
  rm -rf "$WORK/mm_$n"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g SPARK_GRAFT_MM_REPS=3 \
  tools/jrun.sh graft.tools.MultimodalScale \
    "$n" "$WORK/mm_$n" "$n" "$WORK/mm_$n.json" > "$WORK/mm_$n.log" 2>&1
  echo "mm $n rc=$?" >> "$STATUS"
  rm -rf "$WORK/mm_$n"   # keep the JSON, drop the corpus (up to ~500 MB)
done

# E: streaming curation steady state
rm -rf "$WORK/curate"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
tools/jrun.sh graft.tools.CurateSteadyState \
  "$WORK/curate" 25 2000 "$WORK/curate.json" > "$WORK/curate.log" 2>&1
echo "curate rc=$?" >> "$STATUS"

echo "R08_SWEEP_COMPLETE" >> "$STATUS"
