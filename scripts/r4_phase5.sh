#!/bin/bash
# Round-4 phase-5: leftover perf A/Bs, fired only if phase-4 finishes
# before the round deadline. Launch pattern:
#   nohup bash -c 'while ps -p $(cat /tmp/r4p4_launcher.pid) >/dev/null 2>&1; \
#     do sleep 60; done; bash scripts/r4_phase5.sh' > /tmp/r4p5.log 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
DEADLINE=1787141892
left() { echo $(( DEADLINE - $(date +%s) )); }

commit_results() {
  for i in 1 2 3 4 5; do
    git add -A results && git commit -m "$1" >/dev/null 2>&1 && break
    sleep $((i * 3))
  done
  echo "committed: $1"
}

if [ "$(left)" -gt 2100 ]; then
  echo "=== [P5.1] UNROLL x TILE-68 (4 independent tile chains) $(date) left=$(left)"
  timeout 1800 bash -c 'GAMD_UNROLL_TILES=1 GAMD_BENCH_TILE_N=68 python bench.py' \
    > results/bench_unroll68_r4.log 2>&1
  echo "P5.1 rc=$? $(grep '^{' results/bench_unroll68_r4.log | tail -1)"
  commit_results "results: headline bench, unroll x tile-68 A/B (r4)"
fi

echo "=== PHASE 5 DONE $(date) left=$(left)"
