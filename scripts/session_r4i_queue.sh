#!/bin/bash
# Session r4h follow-on: fire AFTER /tmp/queue_r4h.log prints QUEUE R4H DONE.
#   nohup bash scripts/session_r4i_queue.sh > /tmp/queue_r4i.log 2>&1 &
#   echo $! > /tmp/queue_r4i.pid
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

echo "=== [F] LJ PAIR-BIAS for the relabel ckpt $(date)"
if [ -f results/ckpts/lj_relabel_latest.msgpack ]; then
  timeout 1800 python scripts/analyze_pair_bias.py \
    --ckpt results/ckpts/lj_relabel_latest.msgpack \
    --data_dir md_dataset/lj_data --max_frames 200 \
    --json_out results/pair_bias_relabel_r4h.json \
    > results/pair_bias_relabel_r4h.log 2>&1
  echo "stepF rc=$? $(grep du_at_min results/pair_bias_relabel_r4h.log)"
  commit_results "results: pair-bias analysis of relabel-trained LJ ckpt (r4h)"
fi

echo "=== [G] LJ MEGASTEP DEPLOYMENT ROLLOUT (run_md surface) $(date)"
# The precision-guard fix makes run_md --megastep compile for the first
# time from the deployment CLI; commit a deployment-surface throughput
# number (bench.py measures the same program from the bench harness).
timeout 3600 python scripts/run_md.py --system lj \
  --ckpt results/ckpts/lj_highest_latest.msgpack \
  --integrator langevin --steps 25000 --megastep \
  --log results/log_lj_megastep_r4h.txt \
  > results/lj_megastep_deploy_r4h.log 2>&1
echo "stepG rc=$? $(grep 'steps/s' results/lj_megastep_deploy_r4h.log)"
commit_results "results: LJ megastep deployment rollout perf (r4h)"

echo "=== [G2] TIP3P NOSE-HOOVER ROLLOUT (reference's 2nd water protocol) $(date)"
# Faulted twice on worker errors in r3; retry on the best available water
# ckpt. 25k steps, rigid, NHC chain 10/5/5 like the reference's
# water/test_script/test_nosehoover.py.
CKW=results/ckpts/tip3p_relabel_latest.msgpack
[ -f "$CKW" ] || CKW=results/ckpts/tip3p_final.msgpack
timeout 3600 python scripts/run_md.py --system tip3p --ckpt "$CKW" \
  --integrator nose_hoover --steps 25000 \
  --log results/log_water_nhc_r4h.txt \
  > results/water_nhc_rollout_r4h.log 2>&1
echo "stepG2 rc=$? $(grep 'steps/s' results/water_nhc_rollout_r4h.log)"
commit_results "results: TIP3P Nose-Hoover 25k rollout (r4h)"

echo "=== [H] CLEAN HEADLINE BENCH $(date)"
timeout 3600 python bench.py > results/bench_r4h.log 2>&1
echo "stepH rc=$? $(grep '^{' results/bench_r4h.log | tail -1)"
commit_results "results: clean headline bench (r4h)"

echo "=== QUEUE R4I DONE $(date)"
