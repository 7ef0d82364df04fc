#!/bin/bash
# Round-9 scale-evidence sweep — one JVM per measurement point, run on an
# IDLE machine (no sbt while this runs; tools/jrun.sh avoids the sbt lock).
# Replaces tools/r08_sweep.sh (whose stage A was interrupted at sf8 and
# whose artifacts lived only in gitignored scaledata/ — this version ends
# by COPYING every point JSON into scaling/r09/, which is committed).
#
#  A. q70/q75/q76/q79/q82 bench twins at sf1/2/4/8 (+ q70/q82 at sf16) —
#     the re-measurement of the r8 cliff after the tiled pair join +
#     native kernels
#  B. q39 sf2 same-config stability x5 under the SIZED pairPartitions
#     (page-cache warming visible over the first ~3 runs) + q39 on
#     realistic-entropy documents at the same doc counts
#  C. CorpusPipeline end-to-end at sf2/4/8, synthetic AND 20k-word-vocab
#  D. multimodal decode->aHash->near-dup at 8k/32k/128k real PNGs
#  E. streaming curation steady state: 25 fixed-size micro-batches
set -u
cd "$(dirname "$0")/.."
WORK=/root/repo/scaledata/r09
KEEP=/root/repo/scaling/r09
mkdir -p "$WORK" "$KEEP"
STATUS="$WORK/status.txt"
: > "$STATUS"

# A: new-op families — the cliff re-measurement decade, plus an sf16
# point for the two cliff queries (one more doubling past the decade)
for sf in 1 2 4 8 16; do
  QUERIES=q70_semdedup,q75_classifier_score,q76_lm_perplexity,q79_ppl_buckets,q82_label_noise
  [ "$sf" = 16 ] && QUERIES=q70_semdedup,q82_label_noise
  SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf$sf \
  SPARK_GRAFT_BENCH_ONLY=$QUERIES \
  SPARK_GRAFT_BENCH_REPS=3 \
  SPARK_GRAFT_BENCH_OUT=$WORK/newops_sf$sf.json \
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.Bench > $WORK/newops_log_sf$sf.txt 2>&1
  echo "newops sf$sf rc=$?" >> "$STATUS"
done

# B: q39 sf2 stability under sized pairPartitions (reps=1, one JVM per
# run; 5 runs — the corpus page cache warms over the first ~3, the last
# two are the steady state), plus the data-entropy counter-points: q39 on
# 20k-word-vocab documents at the SAME doc counts (needs stage C's
# gen_rich to have run, which the sweep order guarantees... it runs
# after; generate rich dirs up front instead)
SPARK_DRIVER_MEM=16g tools/jrun.sh graft.tools.GenScaleData \
  /root/repo/scaledata --docs-vocab 20000 2 4 8 > "$WORK/gen_rich.log" 2>&1
echo "gen rich rc=$?" >> "$STATUS"
for run in 1 2 3 4 5; do
  SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf2 \
  SPARK_GRAFT_BENCH_ONLY=q39_dedup_jaccard \
  SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_OUT=$WORK/q39_sf2_run$run.json \
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.Bench > $WORK/q39_sf2_run$run.log 2>&1
  echo "q39 run$run rc=$?" >> "$STATUS"
done
for rich in 2 8; do
  SPARK_GRAFT_SF_DIR=/root/repo/scaledata/rich$rich \
  SPARK_GRAFT_BENCH_ONLY=q39_dedup_jaccard \
  SPARK_GRAFT_BENCH_REPS=2 \
  SPARK_GRAFT_BENCH_OUT=$WORK/q39_rich$rich.json \
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.Bench > $WORK/q39_rich$rich.log 2>&1
  echo "q39 rich$rich rc=$?" >> "$STATUS"
done

# C: corpus pipeline end-to-end — synthetic (31-word vocab, the driver's
# testdata distribution) AND realistic-entropy (20k-word vocab, same doc
# shape) series; the latter separates operator scaling from the former's
# data-intrinsic LSH collision load. (rich dirs generated in stage B.)
for sf in 2 4 8; do
  for series in "sf corpus" "rich corpus_rich"; do
    set -- $series
    rm -rf "$WORK/${2}_out_$sf"
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
    tools/jrun.sh graft.tools.CorpusScale \
      "/root/repo/scaledata/$1$sf" "$WORK/${2}_out_$sf" "$1$sf" \
      "$WORK/${2}_$sf.json" > "$WORK/${2}_$sf.log" 2>&1
    echo "$2 sf$sf rc=$?" >> "$STATUS"
    rm -rf "$WORK/${2}_out_$sf"
  done
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

# E: streaming curation steady state — v1 (plain probe era) kept for the
# drift baseline; f1/f2 are the post-sidecar decomposition pair (40
# batches; GenScaleData 31-word vocab vs 20k-word synthetic vocab)
rm -rf "$WORK/curate"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
tools/jrun.sh graft.tools.CurateSteadyState \
  "$WORK/curate" 25 2000 "$WORK/curate.json" > "$WORK/curate.log" 2>&1
echo "curate rc=$?" >> "$STATUS"
rm -rf "$WORK/curate"
for run in "f1 40 2000 0 32 1000 0" "f2 40 2000 0 32 1000 20000"; do
  set -- $run
  rm -rf "$WORK/curate_$1"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.tools.CurateSteadyState \
    "$WORK/curate_$1" "$2" "$3" "$WORK/curate_$1.json" "$4" "$5" "$6" "$7" \
    > "$WORK/curate_$1.log" 2>&1
  echo "curate_$1 rc=$?" >> "$STATUS"
  rm -rf "$WORK/curate_$1"
done

# persist every point artifact where git can see it (the r8 lesson:
# evidence left in gitignored scaledata/ vanished with the workdir)
cp "$WORK"/newops_sf*.json "$WORK"/q39_sf2_run*.json "$WORK"/q39_rich*.json \
   "$WORK"/corpus_*.json "$WORK"/mm_*.json "$WORK"/curate*.json \
   "$WORK/status.txt" "$KEEP"/ 2>> "$STATUS"
python3 tools/r09_report.py "$KEEP" > "$KEEP/SCALING_r09.json" 2>> "$STATUS" \
  && cp "$KEEP/SCALING_r09.json" /root/repo/SCALING_r09.json
echo "R09_SWEEP_COMPLETE" >> "$STATUS"
