#!/bin/bash
# Round-4 phase-3 chip queue: perf follow-ups that depend on phase-2
# results. The launcher below waits for phase-2 (one TPU job at a time).
#   nohup bash -c 'while ps -p $(cat /tmp/r4p2_launcher.pid) >/dev/null 2>&1; \
#     do sleep 60; done; bash scripts/r4_phase3.sh' > /tmp/r4p3.log 2>&1 &
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
mkdir -p results

commit_results() {
  for i in 1 2 3 4 5; do
    git add -A results && git commit -m "$1" >/dev/null 2>&1 && break
    sleep $((i * 3))
  done
  echo "committed: $1"
}

echo "=== [P3.1] FIXED GATHER PROBE (full-reduction carry, error capture) $(date)"
timeout 3600 python scripts/probe_gather.py > results/probe_gather_r4b.log 2>&1
echo "p3.1 rc=$? $(grep SUMMARY results/probe_gather_r4b.log | tail -1)"
commit_results "results: gather-variant probe, collapse-proof rerun (r4)"

echo "=== [P3.2] UNROLL x TILE-68 (4 independent tile chains) $(date)"
timeout 2400 bash -c 'GAMD_UNROLL_TILES=1 GAMD_BENCH_TILE_N=68 python bench.py' \
  > results/bench_unroll68_r4.log 2>&1
echo "p3.2 rc=$? $(grep '^{' results/bench_unroll68_r4.log | tail -1)"
commit_results "results: headline bench, unroll x tile-68 A/B (r4)"

echo "=== [P3.3] TRAIN-STEP THROUGH PALLAS KERNELS (fwd + real bwd) $(date)"
timeout 2400 python scripts/profile_train.py --batch 1 --use_pallas \
  > results/profile_train_pallas_r4.log 2>&1
echo "p3.3 rc=$? $(tail -3 results/profile_train_pallas_r4.log | head -1)"
commit_results "results: LJ b1 train-step timing through Pallas fwd+bwd kernels (r4)"

echo "=== [P3.4] KERNEL PARITY RE-CHECK (bwd kernel landed) $(date)"
timeout 1800 python scripts/check_kernels.py > results/check_kernels_r4b.log 2>&1
echo "p3.4 rc=$? $(tail -1 results/check_kernels_r4b.log)"
commit_results "results: on-chip kernel parity after backward-kernel landing (r4)"

echo "=== PHASE 3 DONE $(date)"
