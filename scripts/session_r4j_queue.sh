#!/bin/bash
# Session r4j queue (final round-4 session): datasets were wiped at the
# boundary again; regenerate LJ ground truth, then run the EXACT-RELABEL
# jitter retrain — the designed attack on the open LJ RDF gate (r4h
# finding: RDF over-structure tracks training-time jitter robustness, not
# mean pair-force bias; exact oracle labels at jittered positions are the
# counter the reference could not implement, since it had no generator at
# train time). Clean A/B vs r3e: ONLY the label protocol and sigma change
# (r3e = stale-label jitter 0.005; r4j = exact-relabel jitter 0.01).
# Then: eval + 25k NHC RDF rollout; water NHC deployment perf
# (reference's 2nd water rollout protocol, run_md needs no dataset);
# TIP3P regen for future sessions; clean bench last.
# Fire:  nohup bash scripts/session_r4j_queue.sh > /tmp/queue_r4j.log 2>&1 &
#        echo $! > /tmp/queue_r4j.pid
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

echo "=== [A] LJ DATASET REGEN $(date)"
if [ ! -f md_dataset/lj_data/data_9_999.npz ]; then
  timeout 2400 python scripts/generate_data.py --system lj \
    --out md_dataset/lj_data --seeds 10 --frames 1000 \
    > results/gen_lj_r4j.log 2>&1
  echo "stepA rc=$? $(tail -1 results/gen_lj_r4j.log)"
  commit_results "results: LJ dataset regeneration log (r4j)"
fi

echo "=== [B] LJ EXACT-RELABEL RETRAIN b1x30 (RDF-gate attack) $(date)"
(
  while true; do
    sleep 300
    CK=$(ls model_ckpt_lj_r4j/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
    if [ -n "$CK" ] && ! cmp -s "$CK" results/ckpts/lj_relabel_latest.msgpack 2>/dev/null; then
      cp "$CK" results/ckpts/lj_relabel_latest.msgpack
      SC=$(ls model_ckpt_lj_r4j/scaler_*.npz 2>/dev/null | sort -V | tail -1)
      [ -n "$SC" ] && cp "$SC" results/ckpts/lj_relabel_scaler.npz
      echo "r4j exact-relabel jitter0.01 b1x30 highest: $CK" \
        > results/ckpts/lj_relabel_PROVENANCE.txt
      commit_results "results: LJ exact-relabel train checkpoint ($(basename "$CK"))"
    fi
  done
) &
WATCHER=$!
timeout 7200 python scripts/train_gamd.py --system lj --batch_size 1 \
  --max_epoch 30 --use_layer_norm --precompute_nbrs \
  --matmul_precision highest --relabel --jitter_sigma 0.01 \
  --cp_dir ./model_ckpt_lj_r4j > results/lj_train_r4j.log 2>&1
echo "stepB rc=$? $(tail -2 results/lj_train_r4j.log | head -1)"
kill $WATCHER 2>/dev/null
commit_results "results: LJ exact-relabel training log (r4j)"

CKL=$(ls model_ckpt_lj_r4j/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
[ -z "$CKL" ] && CKL=results/ckpts/lj_relabel_latest.msgpack
if [ -f "$CKL" ]; then
  cp "$CKL" results/ckpts/lj_relabel_latest.msgpack
  SC=$(ls model_ckpt_lj_r4j/scaler_*.npz 2>/dev/null | sort -V | tail -1)
  [ -n "$SC" ] && cp "$SC" results/ckpts/lj_relabel_scaler.npz

  echo "=== [C] LJ EVAL (relabel ckpt) $(date)"
  timeout 1800 python scripts/evaluate.py --system lj --ckpt "$CKL" \
    --data_dir md_dataset/lj_data --json_out results/lj_eval_r4j.json \
    > results/lj_eval_r4j.log 2>&1
  echo "stepC rc=$? $(head -c 300 results/lj_eval_r4j.json 2>/dev/null)"
  commit_results "results: LJ exact-relabel eval (r4j)"

  echo "=== [D] LJ RDF 25k NHC ROLLOUT (the gate) $(date)"
  timeout 5400 python scripts/analyze_rollout.py --system lj \
    --ckpt "$CKL" --data_dir md_dataset/lj_data \
    --steps 25000 --integrator nose_hoover --classical_baseline \
    --json_out results/lj_rdf_r4j.json > results/lj_rdf_r4j.log 2>&1
  echo "stepD rc=$? $(head -c 300 results/lj_rdf_r4j.json 2>/dev/null)"
  commit_results "results: LJ RDF rollout with exact-relabel ckpt (r4j)"

  echo "=== [D2] LJ PAIR-BIAS (relabel ckpt) $(date)"
  timeout 1800 python scripts/analyze_pair_bias.py \
    --ckpt "$CKL" --data_dir md_dataset/lj_data --max_frames 200 \
    --json_out results/pair_bias_relabel_r4j.json \
    > results/pair_bias_relabel_r4j.log 2>&1
  echo "stepD2 rc=$? $(grep du_at_min results/pair_bias_relabel_r4j.log)"
  commit_results "results: pair-bias analysis of exact-relabel LJ ckpt (r4j)"
fi

echo "=== [E] TIP3P NOSE-HOOVER 25k ROLLOUT (reference's 2nd water protocol) $(date)"
timeout 3600 python scripts/run_md.py --system tip3p \
  --ckpt results/ckpts/tip3p_final.msgpack \
  --integrator nose_hoover --steps 25000 \
  --log results/log_water_nhc_r4j.txt \
  > results/water_nhc_rollout_r4j.log 2>&1
echo "stepE rc=$? $(grep 'steps/s' results/water_nhc_rollout_r4j.log)"
commit_results "results: TIP3P Nose-Hoover 25k rollout perf+thermo (r4j)"

echo "=== [F] TIP3P EWALD DATASET REGEN (canonical 10 seeds) $(date)"
if [ ! -f md_dataset/water_data/data_9_999.npz ]; then
  timeout 7200 python scripts/generate_data.py --system tip3p \
    --out md_dataset/water_data --seeds 10 \
    --frames 1000 --interval 50 --dispatch_frames 50 \
    > results/gen_tip3p_r4j.log 2>&1
  echo "stepF rc=$? $(tail -1 results/gen_tip3p_r4j.log)"
  commit_results "results: TIP3P Ewald dataset regeneration log (r4j)"
fi

echo "=== [G] LJ MEGASTEP DEPLOYMENT ROLLOUT (run_md surface) $(date)"
timeout 3600 python scripts/run_md.py --system lj \
  --ckpt results/ckpts/lj_highest_latest.msgpack \
  --integrator langevin --steps 25000 --megastep \
  --log results/log_lj_megastep_r4j.txt \
  > results/lj_megastep_deploy_r4j.log 2>&1
echo "stepG rc=$? $(grep 'steps/s' results/lj_megastep_deploy_r4j.log)"
commit_results "results: LJ megastep deployment rollout perf (r4j)"

echo "=== [H] CLEAN HEADLINE BENCH $(date)"
timeout 3600 python bench.py > results/bench_r4j.log 2>&1
echo "stepH rc=$? $(grep '^{' results/bench_r4j.log | tail -1)"
commit_results "results: clean headline bench (r4j)"

echo "=== QUEUE R4J DONE $(date)"
