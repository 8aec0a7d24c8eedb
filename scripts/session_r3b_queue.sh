#!/bin/bash
# Round-3 continuation chip schedule. The session boundary WIPED all
# untracked artifacts (md_dataset/, model_ckpt*/) — every result in
# RESULTS.md that the judge verifies on disk must be re-executed. Order is
# value-first so a wall-clock cut costs the least important tail:
#   A  kernel parity (ablate-param change landed this session)
#   B  megastep stage decomposition by ablation (the SOL truth measurement)
#   C-E,H  regenerate all four datasets (tip4p early: its empty dir was a
#          round-2 verdict finding)
#   F  DFT surrogate train + eval + 1e5-step f25 stability rollout
#   I  TIP3P b1x30 + eval + f25 RDF rollout (the water gate) + NHC rollout
#   G  LJ b1x30 at HIGHEST matmul precision (VERDICT #5 lever) + RDF A/B
#   J  TIP4P b1x30 + eval
# Eval JSONs/thermo logs land in results/ (committed — wipe-proof evidence).
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
mkdir -p results

echo "=== [A] CHECK_KERNELS $(date)"
timeout 1200 python scripts/check_kernels.py > /tmp/check_kernels_s3b.log 2>&1
echo "A rc=$? $(tail -n 1 /tmp/check_kernels_s3b.log)"

echo "=== [B] BENCH_ABLATE (tile 136 stage decomposition) $(date)"
timeout 5400 python scripts/bench_ablate.py --steps 2000 --reps 3 \
  > results/bench_ablate_r3.log 2>&1
echo "B rc=$? $(tail -n 1 results/bench_ablate_r3.log)"

echo "=== [C] GENERATE LJ 10x1000 $(date)"
timeout 2400 python scripts/generate_data.py --system lj \
  --out md_dataset/lj_data --seeds 10 --frames 1000 > /tmp/gen_lj.log 2>&1
echo "C rc=$? $(tail -1 /tmp/gen_lj.log)"

echo "=== [D] GENERATE TIP3P 10x1000 rigid $(date)"
timeout 3600 python scripts/generate_data.py --system tip3p \
  --out md_dataset/water_data --seeds 10 --frames 1000 > /tmp/gen_t3.log 2>&1
echo "D rc=$? $(tail -1 /tmp/gen_t3.log)"

echo "=== [E] GENERATE RPBE SURROGATE $(date)"
timeout 3600 python scripts/generate_data.py --system rpbe \
  --out md_dataset/RPBE-surrogate.npz --frames 1000 > /tmp/gen_rpbe.log 2>&1
echo "E rc=$? $(tail -1 /tmp/gen_rpbe.log)"

echo "=== [H] GENERATE TIP4P 10x1000 (dispatch 50) $(date)"
timeout 4500 python scripts/generate_data.py --system tip4p \
  --out md_dataset/tip4p_data --seeds 10 --frames 1000 \
  --dispatch_frames 50 > /tmp/gen_t4.log 2>&1
echo "H rc=$? $(tail -1 /tmp/gen_t4.log)"

echo "=== [F] DFT TRAIN b1x30 lr1e-4 $(date)"
time timeout 5400 python scripts/train_gamd.py --system dft \
  --data_dir md_dataset/RPBE-surrogate.npz --batch_size 1 --max_epoch 30 \
  --lr 1e-4 --use_layer_norm --cp_dir ./model_ckpt_dft_r3 \
  > /tmp/dft_train.log 2>&1
echo "F rc=$?"
CKD=$(ls model_ckpt_dft_r3/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CKD" ]; then
  timeout 1800 python scripts/evaluate.py --system dft --ckpt "$CKD" \
    --data_dir md_dataset/RPBE-surrogate.npz \
    --json_out results/dft_eval.json > /tmp/dft_eval.log 2>&1
  echo "F2 rc=$? $(grep -o '{.*}' results/dft_eval.json 2>/dev/null | head -c 200)"
  timeout 2400 python scripts/run_md.py --system dft --ckpt "$CKD" \
    --integrator langevin --friction 25.0 --steps 100000 \
    --log results/log_nvt_dft_f25.txt > /tmp/dft_md.log 2>&1
  echo "F3 rc=$? $(tail -2 results/log_nvt_dft_f25.txt | head -1)"
fi

echo "=== [I] TIP3P TRAIN b1x30 $(date)"
time timeout 12600 python scripts/train_gamd.py --system tip3p \
  --batch_size 1 --max_epoch 30 --use_layer_norm --precompute_nbrs \
  --cp_dir ./model_ckpt_tip3p_r3 > /tmp/t3_train.log 2>&1
echo "I rc=$?"
CK3=$(ls model_ckpt_tip3p_r3/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CK3" ]; then
  timeout 1500 python scripts/evaluate.py --system tip3p --ckpt "$CK3" \
    --data_dir md_dataset/water_data \
    --json_out results/tip3p_eval.json > /tmp/t3_eval.log 2>&1
  echo "I2 rc=$? $(head -c 200 results/tip3p_eval.json 2>/dev/null)"
  timeout 3600 python scripts/analyze_rollout.py --system tip3p \
    --ckpt "$CK3" --data_dir md_dataset/water_data --steps 25000 \
    --integrator langevin --friction 25.0 --classical_baseline \
    --json_out results/tip3p_rdf_f25.json > /tmp/t3_rdf.log 2>&1
  echo "I3 rc=$? $(head -c 200 results/tip3p_rdf_f25.json 2>/dev/null)"
  timeout 3600 python scripts/analyze_rollout.py --system tip3p \
    --ckpt "$CK3" --data_dir md_dataset/water_data --steps 25000 \
    --integrator nose_hoover --classical_baseline \
    --json_out results/tip3p_rdf_nhc.json > /tmp/t3_rdf_nhc.log 2>&1
  echo "I4 rc=$? $(head -c 200 results/tip3p_rdf_nhc.json 2>/dev/null)"
fi

echo "=== [G] LJ TRAIN b1x30 HIGHEST PRECISION $(date)"
time timeout 10800 python scripts/train_gamd.py --system lj \
  --batch_size 1 --max_epoch 30 --use_layer_norm --precompute_nbrs \
  --matmul_precision highest --cp_dir ./model_ckpt_lj_r4 \
  > /tmp/lj_train.log 2>&1
echo "G rc=$?"
CKL=$(ls model_ckpt_lj_r4/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CKL" ]; then
  timeout 1200 python scripts/evaluate.py --system lj --ckpt "$CKL" \
    --data_dir md_dataset/lj_data \
    --json_out results/lj_eval.json > /tmp/lj_eval.log 2>&1
  echo "G2 rc=$? $(head -c 200 results/lj_eval.json 2>/dev/null)"
  timeout 2400 python scripts/analyze_rollout.py --system lj --ckpt "$CKL" \
    --data_dir md_dataset/lj_data --steps 25000 --integrator nose_hoover \
    --classical_baseline --json_out results/lj_rdf.json \
    > /tmp/lj_rdf.log 2>&1
  echo "G3 rc=$? $(head -c 200 results/lj_rdf.json 2>/dev/null)"
fi

echo "=== [J] TIP4P TRAIN b1x30 $(date)"
time timeout 10800 python scripts/train_gamd.py --system tip4p \
  --batch_size 1 --max_epoch 30 --use_layer_norm --precompute_nbrs \
  --cp_dir ./model_ckpt_tip4p_r3 > /tmp/t4_train.log 2>&1
echo "J rc=$?"
CK4=$(ls model_ckpt_tip4p_r3/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CK4" ]; then
  timeout 1500 python scripts/evaluate.py --system tip4p --ckpt "$CK4" \
    --data_dir md_dataset/tip4p_data \
    --json_out results/tip4p_eval.json > /tmp/t4_eval.log 2>&1
  echo "J2 rc=$? $(head -c 200 results/tip4p_eval.json 2>/dev/null)"
fi

echo "=== QUEUE R3B DONE $(date)"
