#!/bin/bash
# Round-3 TPU A/B matrix: gather binning (now default), Pallas pair
# kernels, warm start. One bench.py run per row; logs to /tmp/ab_r3/.
# Usage: bash tools/run_ab_r3.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_r3

run() {
  name=$1; shift
  echo "=== $name ($*) ==="
  env "$@" BENCH_DEBUG=1 timeout 3600 python bench.py \
    > /tmp/ab_r3/$name.json 2> /tmp/ab_r3/$name.err
  echo "rc=$?"
  tail -1 /tmp/ab_r3/$name.json
  tail -2 /tmp/ab_r3/$name.err
}

run 97k_default   BENCH_N=100000
run 97k_pallas    BENCH_N=100000 BENCH_PALLAS=1
run 97k_cold      BENCH_N=100000 BENCH_WARM=0
run 1m_default    BENCH_N=1000000 BENCH_STEPS=10
run 1m_pallas     BENCH_N=1000000 BENCH_STEPS=10 BENCH_PALLAS=1
