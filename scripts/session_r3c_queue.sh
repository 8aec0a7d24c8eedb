#!/bin/bash
# Round-3 session-4 chip schedule. The previous session produced the full
# evidence chain but its results/ dir was never committed and the session
# boundary wiped it. This queue re-executes the chain and COMMITS evidence
# incrementally after every stage (results/ + final checkpoints), so a cut
# at any point preserves everything already done.
#
# Order (value-first):
#   A  kernel parity           B  megastep stage ablation (SOL evidence)
#   C  LJ dataset              D  TIP3P dataset
#   E  RPBE surrogate          H  TIP4P dataset (dispatch 50)
#   F  DFT train+eval+1e5-step stability rollout
#   I  TIP3P b1x30 train + eval + f25 RDF rollout  (water gate)
#   J  TIP4P b1x30 train + eval                    (round-2 missing #2)
#   G  LJ b1x30 HIGHEST-precision train + eval + RDF (VERDICT #5)
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

echo "=== [A] CHECK_KERNELS $(date)"
timeout 1200 python scripts/check_kernels.py > results/check_kernels_r3.log 2>&1
echo "A rc=$? $(tail -n 1 results/check_kernels_r3.log)"
commit_results "results: on-chip kernel parity log (session r3c)"

echo "=== [B] BENCH_ABLATE (tile 136 stage decomposition) $(date)"
timeout 4200 python scripts/bench_ablate.py --steps 2000 --reps 2 \
  > results/bench_ablate_r3.log 2>&1
echo "B rc=$? $(tail -n 1 results/bench_ablate_r3.log)"
commit_results "results: megastep stage-ablation log (SOL evidence)"

echo "=== [C] GENERATE LJ 10x1000 $(date)"
timeout 2400 python scripts/generate_data.py --system lj \
  --out md_dataset/lj_data --seeds 10 --frames 1000 > results/gen_lj.log 2>&1
echo "C rc=$? $(tail -1 results/gen_lj.log)"
commit_results "results: LJ dataset generation log"

echo "=== [D] GENERATE TIP3P 10x1000 rigid $(date)"
timeout 3600 python scripts/generate_data.py --system tip3p \
  --out md_dataset/water_data --seeds 10 --frames 1000 > results/gen_tip3p.log 2>&1
echo "D rc=$? $(tail -1 results/gen_tip3p.log)"
commit_results "results: TIP3P dataset generation log"

echo "=== [E] GENERATE RPBE SURROGATE $(date)"
timeout 3600 python scripts/generate_data.py --system rpbe \
  --out md_dataset/RPBE-surrogate.npz --frames 1000 > results/gen_rpbe.log 2>&1
echo "E rc=$? $(tail -1 results/gen_rpbe.log)"
commit_results "results: RPBE surrogate generation log"

echo "=== [H] GENERATE TIP4P 10x1000 (dispatch 50) $(date)"
timeout 4500 python scripts/generate_data.py --system tip4p \
  --out md_dataset/tip4p_data --seeds 10 --frames 1000 \
  --dispatch_frames 50 > results/gen_tip4p.log 2>&1
echo "H rc=$? $(tail -1 results/gen_tip4p.log)"
commit_results "results: TIP4P dataset generation log"

echo "=== [F] DFT TRAIN b1x30 lr1e-4 $(date)"
time timeout 5400 python scripts/train_gamd.py --system dft \
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
  timeout 2400 python scripts/run_md.py --system dft --ckpt "$CKD" \
    --integrator langevin --friction 25.0 --steps 100000 \
    --log results/log_nvt_dft_f25.txt > results/dft_md.log 2>&1
  echo "F3 rc=$? $(tail -2 results/log_nvt_dft_f25.txt 2>/dev/null | head -1)"
  commit_results "results: DFT 1e5-step f25 stability rollout log"
fi

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
  timeout 3600 python scripts/analyze_rollout.py --system tip3p \
    --ckpt "$CK3" --data_dir md_dataset/water_data --steps 25000 \
    --integrator langevin --friction 25.0 --classical_baseline \
    --json_out results/tip3p_rdf_f25.json > results/tip3p_rdf.log 2>&1
  echo "I3 rc=$? $(head -c 200 results/tip3p_rdf_f25.json 2>/dev/null)"
  commit_results "results: TIP3P 25k-step f25 rollout RDF A/B (water gate)"
fi

echo "=== [J] TIP4P TRAIN b1x30 $(date)"
time timeout 14400 python scripts/train_gamd.py --system tip4p \
  --batch_size 1 --max_epoch 30 --use_layer_norm --precompute_nbrs \
  --cp_dir ./model_ckpt_tip4p_r3 > results/tip4p_train.log 2>&1
echo "J rc=$?"
CK4=$(ls model_ckpt_tip4p_r3/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CK4" ]; then
  cp "$CK4" results/ckpts/tip4p_final.msgpack
  cp model_ckpt_tip4p_r3/scaler_*.npz results/ckpts/ 2>/dev/null
  timeout 1500 python scripts/evaluate.py --system tip4p --ckpt "$CK4" \
    --data_dir md_dataset/tip4p_data \
    --json_out results/tip4p_eval.json > results/tip4p_eval.log 2>&1
  echo "J2 rc=$? $(head -c 200 results/tip4p_eval.json 2>/dev/null)"
  commit_results "results: TIP4P-Ew b1x30 training + eval (ckpt committed)"
fi

echo "=== [G] LJ TRAIN b1x30 HIGHEST PRECISION $(date)"
time timeout 10800 python scripts/train_gamd.py --system lj \
  --batch_size 1 --max_epoch 30 --use_layer_norm --precompute_nbrs \
  --matmul_precision highest --cp_dir ./model_ckpt_lj_r4 \
  > results/lj_train.log 2>&1
echo "G rc=$?"
CKL=$(ls model_ckpt_lj_r4/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CKL" ]; then
  cp "$CKL" results/ckpts/lj_final.msgpack
  cp model_ckpt_lj_r4/scaler_*.npz results/ckpts/ 2>/dev/null
  timeout 1200 python scripts/evaluate.py --system lj --ckpt "$CKL" \
    --data_dir md_dataset/lj_data \
    --json_out results/lj_eval.json > results/lj_eval.log 2>&1
  echo "G2 rc=$? $(head -c 200 results/lj_eval.json 2>/dev/null)"
  commit_results "results: LJ highest-precision training + eval (ckpt committed)"
  timeout 2400 python scripts/analyze_rollout.py --system lj --ckpt "$CKL" \
    --data_dir md_dataset/lj_data --steps 25000 --integrator nose_hoover \
    --classical_baseline --json_out results/lj_rdf.json \
    > results/lj_rdf.log 2>&1
  echo "G3 rc=$? $(head -c 200 results/lj_rdf.json 2>/dev/null)"
  commit_results "results: LJ 25k-step NHC rollout RDF A/B"
fi

echo "=== QUEUE R3C DONE $(date)"
