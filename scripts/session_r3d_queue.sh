#!/bin/bash
# Round-3 session-5 chip schedule. The r3c queue was cut after stage A
# (kernel parity committed); this queue re-executes the remaining evidence
# chain with ~1h of wall clock, ordered so that COMMITTED evidence lands
# after every stage:
#   C LJ dataset  D TIP3P dataset  E RPBE surrogate
#   F DFT train b1x30 + eval + 1e5-step stability rollout (full chain)
#   H TIP4P dataset (dispatch 50)
#   I TIP3P b1x30 train (expected to be cut; checkpoints commit per-epoch
#     snapshot at the end if any exist)
# Datasets themselves are untracked (GBs) but their generation logs with
# per-seed force statistics are committed; the DFT chain commits eval JSON,
# thermo log and the final checkpoint (small msgpack) under results/.
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

echo "=== [C] GENERATE LJ 10x1000 $(date)"
timeout 2400 python scripts/generate_data.py --system lj \
  --out md_dataset/lj_data --seeds 10 --frames 1000 > results/gen_lj.log 2>&1
echo "C rc=$? $(tail -1 results/gen_lj.log)"
commit_results "results: LJ dataset generation log (session r3d)"

echo "=== [D] GENERATE TIP3P 10x1000 rigid $(date)"
timeout 3000 python scripts/generate_data.py --system tip3p \
  --out md_dataset/water_data --seeds 10 --frames 1000 > results/gen_tip3p.log 2>&1
echo "D rc=$? $(tail -1 results/gen_tip3p.log)"
commit_results "results: TIP3P dataset generation log (session r3d)"

echo "=== [E] GENERATE RPBE SURROGATE $(date)"
timeout 3000 python scripts/generate_data.py --system rpbe \
  --out md_dataset/RPBE-surrogate.npz --frames 1000 > results/gen_rpbe.log 2>&1
echo "E rc=$? $(tail -1 results/gen_rpbe.log)"
commit_results "results: RPBE surrogate generation log (session r3d)"

echo "=== [F] DFT TRAIN b1x30 lr1e-4 $(date)"
time timeout 4200 python scripts/train_gamd.py --system dft \
  --data_dir md_dataset/RPBE-surrogate.npz --batch_size 1 --max_epoch 30 \
  --lr 1e-4 --use_layer_norm --cp_dir ./model_ckpt_dft_r3 \
  > results/dft_train.log 2>&1
echo "F rc=$?"
CKD=$(ls model_ckpt_dft_r3/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CKD" ]; then
  cp "$CKD" results/ckpts/dft_final.msgpack
  cp model_ckpt_dft_r3/scaler_*.npz results/ckpts/ 2>/dev/null
  timeout 1800 python scripts/evaluate.py --system dft --ckpt "$CKD" \
    --data_dir md_dataset/RPBE-surrogate.npz \
    --json_out results/dft_eval.json > results/dft_eval.log 2>&1
  echo "F2 rc=$? $(head -c 200 results/dft_eval.json 2>/dev/null)"
  commit_results "results: DFT-surrogate training + eval (ckpt committed)"
  timeout 1800 python scripts/run_md.py --system dft --ckpt "$CKD" \
    --integrator langevin --friction 25.0 --steps 100000 \
    --log results/log_nvt_dft_f25.txt > results/dft_md.log 2>&1
  echo "F3 rc=$? $(tail -2 results/log_nvt_dft_f25.txt 2>/dev/null | head -1)"
  commit_results "results: DFT 1e5-step f25 stability rollout log"
fi

echo "=== [H] GENERATE TIP4P 10x1000 (dispatch 50) $(date)"
timeout 4500 python scripts/generate_data.py --system tip4p \
  --out md_dataset/tip4p_data --seeds 10 --frames 1000 \
  --dispatch_frames 50 > results/gen_tip4p.log 2>&1
echo "H rc=$? $(tail -1 results/gen_tip4p.log)"
commit_results "results: TIP4P dataset generation log (session r3d)"

echo "=== [I] TIP3P TRAIN b1x30 $(date)"
time timeout 14400 python scripts/train_gamd.py --system tip3p \
  --batch_size 1 --max_epoch 30 --use_layer_norm --precompute_nbrs \
  --cp_dir ./model_ckpt_tip3p_r3 > results/tip3p_train.log 2>&1
echo "I rc=$?"
CK3=$(ls model_ckpt_tip3p_r3/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CK3" ]; then
  cp "$CK3" results/ckpts/tip3p_final.msgpack
  cp model_ckpt_tip3p_r3/scaler_*.npz results/ckpts/ 2>/dev/null
  timeout 1500 python scripts/evaluate.py --system tip3p --ckpt "$CK3" \
    --data_dir md_dataset/water_data \
    --json_out results/tip3p_eval.json > results/tip3p_eval.log 2>&1
  echo "I2 rc=$? $(head -c 200 results/tip3p_eval.json 2>/dev/null)"
  commit_results "results: TIP3P b1x30 training + eval (ckpt committed)"
fi

echo "=== QUEUE R3D DONE $(date)"
