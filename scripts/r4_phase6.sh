#!/bin/bash
# Round-4 phase-6: continuation queue (replaces the tail of r4_phase4.sh).
# Inserted stage: the FIXED gather probe (probe_gather.py now reuses one
# jit callable per variant; the r4a-r4c timings were compile-cache
# deserialization, not execution — see the probe's run_variant comment).
# Launch:
#   nohup bash scripts/r4_phase6.sh > /tmp/r4p6.log 2>&1 &
#   echo $! > /tmp/r4p6_launcher.pid
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
mkdir -p results results/ckpts

DEADLINE=1787141892
left() { echo $(( DEADLINE - $(date +%s) )); }

commit_results() {
  for i in 1 2 3 4 5; do
    git add -A results && git commit -m "$1" >/dev/null 2>&1 && break
    sleep $((i * 3))
  done
  echo "committed: $1"
}

latest_ckpt() {
  ls "$1"/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1
}

echo "=== [P6.0] waiting for LJ fine-tune (pid 21879) $(date)"
while kill -0 21879 2>/dev/null; do sleep 20; done
echo "fine-tune done $(date); left=$(left)s"

CKF=$(latest_ckpt model_ckpt_lj_ft_r4)
if [ -n "$CKF" ]; then
  cp "$CKF" results/ckpts/lj_cosft_latest.msgpack
  cp "$(ls model_ckpt_lj_ft_r4/scaler_*.npz | sort -V | tail -1)" \
     results/ckpts/lj_cosft_scaler.npz 2>/dev/null
  timeout 1200 python scripts/evaluate.py --system lj --ckpt "$CKF" \
    --data_dir md_dataset/lj_data --json_out results/lj_eval_cosft_r4.json \
    > results/lj_eval_cosft_r4.log 2>&1
  echo "P6.1 eval rc=$? $(head -c 300 results/lj_eval_cosft_r4.json 2>/dev/null)"
  commit_results "results: LJ jitter-free cosine fine-tune (lambda_cos=1.0, 10 ep from r3e ckpt) + eval (r4)"
fi

echo "=== [P6.2] FIXED GATHER PROBE on idle chip $(date) left=$(left)"
timeout 900 python scripts/probe_gather.py > results/probe_gather_r4d.log 2>&1
echo "P6.2 rc=$? $(grep SUMMARY results/probe_gather_r4d.log | tail -1)"
commit_results "results: gather-variant probe rerun with per-variant jit reuse (previous runs timed cache deserialization)"

BUDGET=$(( $(left) - 2100 ))
if [ "$BUDGET" -gt 1200 ]; then
  echo "=== [P6.3] GAMD-LARGE RPBE (ref real_large.py defaults + update_edge) $(date) budget=${BUDGET}s"
  timeout "$BUDGET" python scripts/train_gamd.py --system dft \
    --data_dir md_dataset/RPBE-surrogate.npz --batch_size 1 --max_epoch 14 \
    --min_epoch 14 --lr 1e-4 --use_layer_norm --update_edge \
    --encoding_size 256 --hidden_dim 128 --edge_embedding_dim 256 \
    --conv_layer 5 --checkpoint_every 2 \
    --cp_dir ./model_ckpt_dftlarge_r4 > results/dftlarge_train_r4.log 2>&1
  echo "P6.3 rc=$?"
  CKD=$(latest_ckpt model_ckpt_dftlarge_r4)
  if [ -n "$CKD" ]; then
    cp "$CKD" results/ckpts/dftlarge_final.msgpack
    cp "$(ls model_ckpt_dftlarge_r4/scaler_*.npz | sort -V | tail -1)" \
      results/ckpts/dftlarge_scaler.npz 2>/dev/null
    timeout 1100 python scripts/evaluate.py --system dft --ckpt "$CKD" \
      --data_dir md_dataset/RPBE-surrogate.npz \
      --json_out results/dftlarge_eval_r4.json > results/dftlarge_eval_r4.log 2>&1
    echo "P6.3b rc=$? $(head -c 300 results/dftlarge_eval_r4.json 2>/dev/null)"
    commit_results "results: GAMD-large (enc256/hid128/edge256/conv5 + update_edge) RPBE-surrogate train + eval (r4)"
  fi
fi

if [ "$(left)" -gt 700 ]; then
  echo "=== [P6.4] FINAL CLEAN HEADLINE BENCH (unroll default) $(date) left=$(left)"
  timeout $(( $(left) - 240 )) python bench.py > results/bench_r4_final.log 2>&1
  echo "P6.4 rc=$? $(grep '^{' results/bench_r4_final.log | tail -1)"
  commit_results "results: final clean headline bench, unroll default (r4)"
fi

echo "=== PHASE 6 DONE $(date) left=$(left)"
