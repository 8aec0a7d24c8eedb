#!/bin/bash
# Round-4 phase-1 evidence queue (cheap, high-value chip jobs first).
# Fire with:
#   nohup bash scripts/r4_phase1.sh > /tmp/r4p1.log 2>&1 &
#   echo $! > /tmp/r4p1.pid
# One TPU job at a time; evidence committed under results/ per stage.
# Covers: VERDICT #3 (LJ cosine slices + r3e rollout RDF), #6a (NHC
# per-step rollout perf), #8 (XLA train-step timing), ADVICE #4 (replica
# NHC bench after the 112 MB scoped-VMEM raise), plus the clean headline
# bench the r3e round-end was denied.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
mkdir -p results results/ckpts

commit_results() {
  for i in 1 2 3 4 5; do
    git add -A results && git commit -m "$1" >/dev/null 2>&1 && break
    sleep $((i * 3))
  done
  echo "committed: $1"
}

echo "=== [1] CHECK_KERNELS $(date)"
timeout 1800 python scripts/check_kernels.py > results/check_kernels_r4.log 2>&1
echo "step1 rc=$? $(tail -n 1 results/check_kernels_r4.log)"
commit_results "results: on-chip kernel parity log (r4)"

echo "=== [2] BENCH headline (clean chip) $(date)"
timeout 2400 python bench.py > results/bench_r4a.log 2>&1
echo "step2 rc=$? $(tail -n 1 results/bench_r4a.log)"
commit_results "results: headline bench log (r4, clean chip)"

CKL=results/ckpts/lj_highest_latest.msgpack

echo "=== [3] LJ r3e eval w/ cosine-decile slices $(date)"
timeout 1500 python scripts/evaluate.py --system lj --ckpt "$CKL" \
  --data_dir md_dataset/lj_data --json_out results/lj_eval_r4_sliced.json \
  > results/lj_eval_r4_sliced.log 2>&1
echo "step3 rc=$? $(head -c 300 results/lj_eval_r4_sliced.json 2>/dev/null)"
commit_results "results: LJ r3e eval with cosine-vs-magnitude decile slices (r4)"

echo "=== [4] LJ 25k NHC rollout + RDF from r3e ckpt (VERDICT #3) $(date)"
timeout 3600 python scripts/analyze_rollout.py --system lj --ckpt "$CKL" \
  --data_dir md_dataset/lj_data --steps 25000 --integrator nose_hoover \
  --classical_baseline --json_out results/lj_rdf_r4.json \
  > results/lj_rdf_r4.log 2>&1
echo "step4 rc=$? $(head -c 300 results/lj_rdf_r4.json 2>/dev/null)"
commit_results "results: LJ 25k-step NHC rollout RDF A/B from r3e ckpt (r4)"

echo "=== [5] NHC per-step rollout perf (VERDICT #6a) $(date)"
timeout 1800 python scripts/run_md.py --system lj --ckpt "$CKL" \
  --integrator nose_hoover --steps 25000 \
  --log results/log_nvt_lj_nhc_r4.txt > results/lj_nhc_perf_r4.log 2>&1
echo "step5 rc=$? $(tail -n 2 results/lj_nhc_perf_r4.log)"
commit_results "results: LJ per-step NHC rollout perf log (r4)"

echo "=== [6] NHC replica bench after 112MB VMEM raise (ADVICE #4) $(date)"
timeout 2400 bash -c 'GAMD_BENCH_INTEGRATOR=nose_hoover python scripts/bench_replicas.py 8 500' \
  > results/bench_replicas_nhc_r4.log 2>&1
echo "step6 rc=$? $(grep '^{' results/bench_replicas_nhc_r4.log | tail -1)"
commit_results "results: NHC 8-replica fused bench log (r4)"

echo "=== [7] XLA train-step timing b1 (VERDICT #8) $(date)"
timeout 2400 python scripts/profile_train.py --system lj --batch 1 \
  > results/profile_train_b1_r4.log 2>&1
echo "step7 rc=$? $(tail -n 6 results/profile_train_b1_r4.log)"
commit_results "results: XLA train-step timing, LJ b1 (r4)"

echo "=== [8] RPBE surrogate dataset regen (for GAMD-large, VERDICT #5) $(date)"
if [ ! -f md_dataset/RPBE-surrogate.npz ]; then
  timeout 4500 python scripts/generate_data.py --system rpbe \
    --out md_dataset/RPBE-surrogate.npz --frames 1000 \
    > results/gen_rpbe_r4.log 2>&1
  echo "step8 rc=$? $(tail -n 1 results/gen_rpbe_r4.log)"
  commit_results "results: RPBE surrogate dataset regeneration log (r4)"
fi

echo "=== PHASE 1 DONE $(date)"
