#!/bin/bash
# Full 19-family xlarge TPU run (round-3 judge "next round" #2) into ONE
# artifact via --families + --resume.  Per-family backend policy (recorded
# here, summarised in BENCH_NOTES):
#   - dense device f32+IR (condensed KKT): small dense-ish instances where
#     one padded MXU factorization wins — blending(441), multicomm(1822),
#     portfolio(841).
#   - sparse-device f32 + auto endgame: everything factorization-dominated —
#     the big sparse LPs and the large sparse QPs (chainqp/lasso n=50k,
#     cvxqp n=20k, svm n=3201).
# Run ONLY on a quiet host (the load guard enforces it) and never
# concurrently with a host-baseline timing run: XLA compiles saturate the
# 4 CPU cores (round-3 post-mortem).
set -e
cd "$(dirname "$0")/.."
# No --quiet-load here: the run's OWN XLA compiles leave a 1-min load
# shadow that would make the guard stall after every cold solve.  load_1min
# is still recorded per row; the rule that matters is the one the round-3
# post-mortem established — never time the HOST baseline while this runs.
OUT=benchmarks/results/suite_xlarge_tpu.json
COMMON="--suite structured:xlarge --repeat 3 --resume --out $OUT"

python benchmarks/run_suite.py $COMMON \
  --backend device --mixed-precision \
  --families blending,multicomm,portfolio

python benchmarks/run_suite.py $COMMON \
  --backend sparse-device --mixed-precision --endgame auto \
  --families transport,staircase,assignment,setcover,diet,illscaled,redundant,ranges,gridlp,bandedlp,fixed,svm,chainqp,laplqp,cvxqp,lasso
