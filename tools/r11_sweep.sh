#!/bin/bash
# Round-11 scale-evidence sweep — one JVM per measurement point, run on an
# IDLE machine (no sbt while this runs; tools/jrun.sh avoids the sbt lock).
# This is the round the evidence catches back up with the code (r10 shipped
# none): every artifact JSON is copied into committed scaling/r11/.
#
#  A. q75 isolated re-measure at sf1/2/4/8 — the twice-asked (r8, r9)
#     attribution run for the artifact's only unexplained super-linear
#     segment (sf2->4 slope 1.55 in SCALING_r09) and the r10 bench's
#     largest regression; one JVM per point, away from sweep neighbors.
#  B. BPE family slopes at sf1/2/4/8: q87 (training, now the driver-local
#     trainer) and q88 (encode expression) — the scale points the r10
#     BPE family shipped without.
#  C. BpeTrainScale on the realistic-entropy corpora (rich2/8/16): the
#     merges-dimension measurement at >=1k merges (local loop) vs the
#     one-job-per-merge distributed fallback at 32.
#  D. Corpus-pipeline end-to-end on rich4/8/16 — extends the product
#     decade to sf16 (r9 stopped at 8) with same-session anchor points.
#  E. Long-horizon streaming compaction crossover: 250 batches, vocab
#     20000, three cadences — never / adaptive minFiles / unconditional
#     every-5 (the knob landed in r10; this is the experiment).
set -u
cd "$(dirname "$0")/.."
WORK=/root/repo/scaledata/r11
KEEP=/root/repo/scaling/r11
mkdir -p "$WORK" "$KEEP"
STATUS="$WORK/status.txt"
: > "$STATUS"

# A: q75 isolated, one JVM per sf point
for sf in 1 2 4 8; do
  SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf$sf \
  SPARK_GRAFT_BENCH_ONLY=q75_classifier_score \
  SPARK_GRAFT_BENCH_REPS=3 \
  SPARK_GRAFT_BENCH_OUT=$WORK/q75_sf$sf.json \
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.Bench > $WORK/q75_sf$sf.log 2>&1
  echo "q75 sf$sf rc=$?" >> "$STATUS"
done

# B: BPE training + encode slopes (q87 trains uncached per rep — honest
# training cost; q88's first rep pays one cached train, so its MINIMUM is
# the encode-only number the report reads)
for sf in 1 2 4 8; do
  SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf$sf \
  SPARK_GRAFT_BENCH_ONLY=q87_bpe_train,q88_bpe_token_count \
  SPARK_GRAFT_BENCH_REPS=3 \
  SPARK_GRAFT_BENCH_OUT=$WORK/bpe_sf$sf.json \
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.Bench > $WORK/bpe_sf$sf.log 2>&1
  echo "bpe sf$sf rc=$?" >> "$STATUS"
done

# C: merges-dimension trainer scale (rich16 documents generated in D's
# prelude below would be too late — generate first)
SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=32 tools/jrun.sh graft.tools.GenScaleData \
  /root/repo/scaledata --docs-vocab 20000 16 > "$WORK/gen_rich16.log" 2>&1
echo "gen rich16 rc=$?" >> "$STATUS"
for rich in 2 8 16; do
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.tools.BpeTrainScale \
    /root/repo/scaledata/rich$rich "$WORK/bpetrain_rich$rich.json" 1024 32 \
    > "$WORK/bpetrain_rich$rich.log" 2>&1
  echo "bpetrain rich$rich rc=$?" >> "$STATUS"
done

# D: corpus pipeline end-to-end, realistic-entropy series to sf16
for sf in 4 8 16; do
  rm -rf "$WORK/corpus_rich_out_$sf"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.tools.CorpusScale \
    "/root/repo/scaledata/rich$sf" "$WORK/corpus_rich_out_$sf" "rich$sf" \
    "$WORK/corpus_rich_$sf.json" > "$WORK/corpus_rich_$sf.log" 2>&1
  echo "corpus_rich sf$sf rc=$?" >> "$STATUS"
  rm -rf "$WORK/corpus_rich_out_$sf"
done

# E: long-horizon compaction crossover — 250 batches x 2000 rows at vocab
# 20000 (the realistic-entropy loop r9 measured flat over 40 batches).
# args: workDir nBatches batchRows outJson compactEvery bands maxBucket vocab compactMinFiles
for run in "never 0 0" "adaptive 1 8" "uncond 5 0"; do
  set -- $run
  rm -rf "$WORK/curate_$1"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/jrun.sh graft.tools.CurateSteadyState \
    "$WORK/curate_$1" 250 2000 "$WORK/curate_$1.json" "$2" 32 1000 20000 "$3" \
    > "$WORK/curate_$1.log" 2>&1
  echo "curate_$1 rc=$?" >> "$STATUS"
  rm -rf "$WORK/curate_$1"
done

# persist every point artifact where git can see it
cp "$WORK"/q75_sf*.json "$WORK"/bpe_sf*.json "$WORK"/bpetrain_rich*.json \
   "$WORK"/corpus_rich_*.json "$WORK"/curate_*.json \
   "$WORK/status.txt" "$KEEP"/ 2>> "$STATUS"
python3 tools/r11_report.py "$KEEP" > "$KEEP/SCALING_r11.json" 2>> "$STATUS" \
  && cp "$KEEP/SCALING_r11.json" /root/repo/SCALING_r11.json
echo "R11_SWEEP_COMPLETE" >> "$STATUS"
