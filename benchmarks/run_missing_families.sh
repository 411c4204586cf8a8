#!/bin/bash
# The cvxqp_20000 TPU compile blew past 100 GB RSS in the axon backend's
# compiler (the same program compiles on the CPU backend in 108 s at
# 0.5 GB — round-5 repro) and the OOM kill took laplqp/lasso down with
# it, both in round 4 and in the first round-5 queue pass.  Retry each
# family SEPARATELY under a memory cap + timeout so one pathological
# compile can only cost its own family, and a failure lands in the
# artifact as a visible error record instead of silent absence.
cd "$(dirname "$0")/.."
OUT=benchmarks/results/suite_xlarge_tpu_r5.json
COMMON="--suite structured:xlarge --repeat 3 --resume --measure-ls --out $OUT"

for fam in lasso laplqp cvxqp; do
  ( ulimit -v 60000000
    timeout 2700 python benchmarks/run_suite.py $COMMON \
      --backend sparse-device --mixed-precision --endgame auto \
      --families $fam )
  echo "family $fam exit: $?"
done
