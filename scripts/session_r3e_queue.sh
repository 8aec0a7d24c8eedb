#!/bin/bash
# Session r3e chip queue — value-ordered for a short (~1h) session.
# Fire with:
#   nohup bash scripts/session_r3e_queue.sh > /tmp/queue_r3e.log 2>&1 &
#   echo $! > /tmp/queue_r3e.pid
# One TPU job at a time; every stage wall-clock bounded; evidence committed
# under results/ after every stage (session boundaries wipe untracked
# artifacts — only committed files survive).
#
# Value ordering for this session:
#  [1] bench.py            — headline number incl. the packed-256 encoder
#                            gather fix landed late in session 3
#  [2] bench_ablate        — RE-COMMIT the SOL stage-decomposition evidence
#                            (results/bench_ablate_r3.log was wiped; the
#                            RESULTS.md table currently has no on-disk log)
#  [3] probe_nhc_kernel    — NHC-megastep lowering verdict (round-4 design gate)
#  [4] banded N=32768      — re-commit the largest single-chip GNN-MD number
#  [5] NHC replica bench   — fused-chain replica path evidence
#  [6] LJ dataset regen + b1 HIGHEST-precision train (VERDICT #5) with a
#      checkpoint watcher committing progress every 5 min so a mid-train
#      session end still leaves resumable state + eval material.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
mkdir -p results results/ckpts

commit_results() {  # commit_results <msg> — retry through index-lock races
  for i in 1 2 3 4 5; do
    git add -A results && git commit -m "$1" >/dev/null 2>&1 && break
    sleep $((i * 3))
  done
  echo "committed: $1"
}

echo "=== [1] BENCH (tile 136 default) $(date)"
timeout 1200 python bench.py > results/bench_r3e.log 2>&1
echo "step1 rc=$? $(tail -n 1 results/bench_r3e.log)"
commit_results "results: headline bench log (r3e, packed-256 encoder gather)"

echo "=== [2] BENCH_ABLATE stage decomposition $(date)"
timeout 2100 python scripts/bench_ablate.py > results/bench_ablate_r3e.log 2>&1
echo "step2 rc=$? $(grep '^{' results/bench_ablate_r3e.log | tail -1)"
commit_results "results: megastep stage decomposition by ablation (r3e re-run)"

echo "=== [3] NHC-megastep lowering probe $(date)"
timeout 1200 python scripts/probe_nhc_kernel.py > results/probe_nhc_kernel_r3e.log 2>&1
echo "step3 rc=$? $(tail -1 results/probe_nhc_kernel_r3e.log)"
commit_results "results: NHC in-kernel chain-update lowering probe (on-chip)"

echo "=== [4] BANDED N=32768 $(date)"
timeout 1500 python scripts/bench_large.py --sizes 1000 --gnn_size 0 \
  --gnn_banded_sizes 32768 > results/bench_banded_32k_r3e.log 2>&1
echo "step4 rc=$? $(grep '^{' results/bench_banded_32k_r3e.log | tail -1)"
commit_results "results: banded N=32768 GNN-MD bench (r3e re-run)"

echo "=== [5] NHC replica bench $(date)"
timeout 1200 bash -c 'GAMD_BENCH_INTEGRATOR=nose_hoover python scripts/bench_replicas.py 8 500' \
  > results/bench_replicas_nhc_r3e.log 2>&1
echo "step5 rc=$? $(grep '^{' results/bench_replicas_nhc_r3e.log | tail -1)"
commit_results "results: NHC fused-chain replica bench (r3e)"

echo "=== [6] LJ dataset regen $(date)"
if [ ! -e md_dataset/lj_data ] || [ -z "$(ls md_dataset/lj_data 2>/dev/null | head -1)" ]; then
  timeout 2400 python scripts/generate_data.py --system lj \
    --out md_dataset/lj_data --seeds 10 --frames 1000 \
    > results/gen_lj_r3e.log 2>&1
  echo "gen lj rc=$? $(tail -1 results/gen_lj_r3e.log)"
  commit_results "results: LJ dataset generation log (r3e)"
fi

echo "=== [7] LJ TRAIN b1x30 HIGHEST PRECISION (VERDICT #5) $(date)"
# Checkpoint watcher: every 5 min copy the newest checkpoint + scaler into
# results/ckpts and commit, so mid-train session death leaves resume state.
(
  while true; do
    sleep 300
    CK=$(ls model_ckpt_lj_r3e/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
    if [ -n "$CK" ] && ! cmp -s "$CK" results/ckpts/lj_highest_latest.msgpack 2>/dev/null; then
      cp "$CK" results/ckpts/lj_highest_latest.msgpack
      ls model_ckpt_lj_r3e/scaler_*.npz >/dev/null 2>&1 && \
        cp "$(ls model_ckpt_lj_r3e/scaler_*.npz | sort -V | tail -1)" \
           results/ckpts/lj_highest_scaler.npz
      echo "$CK" > results/ckpts/lj_highest_PROVENANCE.txt
      commit_results "results: LJ highest-precision train checkpoint ($(basename "$CK"))"
    fi
  done
) &
WATCHER=$!
timeout 9000 python scripts/train_gamd.py --system lj --batch_size 1 \
  --max_epoch 30 --use_layer_norm --precompute_nbrs \
  --matmul_precision highest \
  --cp_dir ./model_ckpt_lj_r3e > results/lj_train_r3e.log 2>&1
echo "step7 rc=$?"
kill $WATCHER 2>/dev/null
CKL=$(ls model_ckpt_lj_r3e/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CKL" ]; then
  cp "$CKL" results/ckpts/lj_highest_latest.msgpack
  cp "$(ls model_ckpt_lj_r3e/scaler_*.npz | sort -V | tail -1)" \
     results/ckpts/lj_highest_scaler.npz 2>/dev/null
  echo "$CKL" > results/ckpts/lj_highest_PROVENANCE.txt
  commit_results "results: LJ highest-precision training log + final state (r3e)"
  timeout 1200 python scripts/evaluate.py --system lj --ckpt "$CKL" \
    --data_dir md_dataset/lj_data --json_out results/lj_eval_r3e.json \
    > results/lj_eval_r3e.log 2>&1
  echo "step7b rc=$? $(head -c 200 results/lj_eval_r3e.json 2>/dev/null)"
  commit_results "results: LJ highest-precision eval (r3e)"
fi

echo "=== QUEUE R3E DONE $(date)"
