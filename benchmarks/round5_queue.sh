#!/bin/bash
# Round-5 sequential TPU artifact queue.  ONE tunneled TPU: jobs must
# never overlap (two processes on the tunnel deadlock).  Run with
#   nohup bash benchmarks/round5_queue.sh > benchmarks/results/round5_queue.log 2>&1 &
# Each stage is resumable; a crash mid-stage loses at most one instance
# (run_suite checkpoints per record).
set -x
cd "$(dirname "$0")/.."

R=benchmarks/results

# Stage 1: fresh full 19-family xlarge TPU artifact under round-5 code,
# --measure-ls + endgame_time columns (VERDICT r4 items #2, #5, #9).
# The round-4 artifact is preserved for history.
[ -f $R/suite_xlarge_tpu.json ] && cp -n $R/suite_xlarge_tpu.json $R/suite_xlarge_tpu_r4.json
OUT=$R/suite_xlarge_tpu_r5.json
COMMON="--suite structured:xlarge --repeat 3 --resume --measure-ls --out $OUT"

python benchmarks/run_suite.py $COMMON \
  --backend device --mixed-precision \
  --families blending,multicomm,portfolio

# The three never-run families FIRST (VERDICT r4 missing #1), then the 16.
python benchmarks/run_suite.py $COMMON \
  --backend sparse-device --mixed-precision --endgame auto \
  --families cvxqp,laplqp,lasso

python benchmarks/run_suite.py $COMMON \
  --backend sparse-device --mixed-precision --endgame auto \
  --families transport,staircase,assignment,setcover,diet,illscaled,redundant,ranges,gridlp,bandedlp,fixed,svm,chainqp

cp $OUT $R/suite_xlarge_tpu.json   # canonical name for the report tools

# Stage 2: matched-iteration f64 parity families (VERDICT r4 missing #2).
bash benchmarks/run_xlarge_tpu_f64.sh

# Stage 3: large-tier refresh under round-5 defaults (VERDICT r4 weak #3).
python benchmarks/run_suite.py \
  --suite structured:large --repeat 3 --resume --measure-ls \
  --backend sparse-device --mixed-precision --endgame auto \
  --out $R/suite_large_device_tpu_r5.json

# Stage 4: headline bench (drift check, VERDICT r4 weak #7/item #8).
timeout 900 python bench.py > $R/bench_r5_tpu.json

echo QUEUE-DONE
