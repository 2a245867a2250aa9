#!/bin/bash
# Round-3 bench suite: one TPU job at a time, each logged to bench_logs/.
# Usage: bash tools/run_bench_suite.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
export BENCH_ATTEMPTS=${BENCH_ATTEMPTS:-5}
run() {
  name=$1; shift
  echo "=== $name: python bench.py $* ===" >&2
  timeout 3300 python bench.py "$@" >"bench_logs/${name}.json" 2>"bench_logs/${name}.log"
  echo "--- $name rc=$? $(tail -1 bench_logs/${name}.json 2>/dev/null)" >&2
}
run curved_chees
run curved_chees_8192 nchains=8192
run curved_chees_pallas use_pallas=1
run nuts_pallas_d6 grad_mode=nuts nuts_max_depth=6 timed_iters=4000 burn_iters=2000
run hierarchical workload=hierarchical
run gaussian200 workload=gaussian200 nchains=1024 timed_iters=6000 burn_iters=2000
echo "suite done" >&2
