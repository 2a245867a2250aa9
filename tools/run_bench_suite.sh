#!/bin/bash
# Round-5 bench suite: one TPU job at a time, each logged to bench_logs/.
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
run curved_chees                               # headline default ([8 x 8192])
run curved_chees_4096 nchains=4096
run curved_chees_ladder adapt_ladder=1
run curved_de_iid de_pair=iid         # DE-correlation A/B control
run nuts_parity grad_mode=nuts nchains=4096    # fused tree kernel, depth 10
run gaussian40 workload=gaussian nchains=4096
run hierarchical workload=hierarchical nchains=4096  # has the moment QA
run gaussian200 workload=gaussian200 nchains=1024 timed_iters=6000 burn_iters=2000
# NOTE: use_pallas=1 with ChEES now RAISES on TPU by design (the in-step
# trajectory kernels crash the TPU worker, PROFILE_r04.md) - not in the
# suite.
echo "suite done" >&2
