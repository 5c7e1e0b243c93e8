#!/bin/bash
# Round-4 TPU A/B matrix, run SEQUENTIALLY on an idle host (1 CPU —
# concurrent jobs starve the tunnel client's dispatch loop and pollute
# ms/step). Pallas first (VERDICT r3 #1), then the warm-start A/B
# (VERDICT r3 #4). Logs to /tmp/ab_r4/.
# Usage: bash tools/run_ab_r4.sh [row ...]   (default: all rows)
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/ab_r4

run() {
  name=$1; shift
  echo "=== $name ($*) ==="
  env "$@" BENCH_DEBUG=1 timeout 3600 python bench.py \
    > /tmp/ab_r4/$name.json 2> /tmp/ab_r4/$name.err
  echo "rc=$?"
  tail -1 /tmp/ab_r4/$name.json
  tail -2 /tmp/ab_r4/$name.err
}

want() {
  [ $# -eq 0 ] && return 0
  return 1
}

rows="${*:-97k_pallas 97k_cold 97k_default 97k_pallas_cold}"
for row in $rows; do
  case $row in
    97k_pallas)      run 97k_pallas      BENCH_N=100000 BENCH_PALLAS=1 ;;
    97k_cold)        run 97k_cold        BENCH_N=100000 BENCH_WARM=0 ;;
    97k_default)     run 97k_default     BENCH_N=100000 ;;
    97k_pallas_cold) run 97k_pallas_cold BENCH_N=100000 BENCH_PALLAS=1 BENCH_WARM=0 ;;
    1m_best)         run 1m_best         BENCH_N=1000000 BENCH_STEPS=10 ;;
    1m_pallas)       run 1m_pallas       BENCH_N=1000000 BENCH_STEPS=10 BENCH_PALLAS=1 ;;
    *) echo "unknown row: $row" ;;
  esac
done
