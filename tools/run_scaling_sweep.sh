#!/bin/bash
# 3-point scaling sweep for SCALING_r06: per-query wall-times at generated
# sf0.1 / sf0.5 / sf1 (same seeded generator, same schemas as /root/testdata).
cd /root/repo
for cfg in "0.1 3" "0.5 2" "1 2"; do
  set -- $cfg
  SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf$1 SPARK_GRAFT_BENCH_REPS=$2 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/scaledata/bench_sf$1.json SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /root/repo/scaledata/benchlog_sf$1.txt 2>&1
  echo "done sf$1 rc=$?" >> /root/repo/scaledata/sweep_status.txt
done
echo "SWEEP_COMPLETE" >> /root/repo/scaledata/sweep_status.txt
