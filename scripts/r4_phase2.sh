#!/bin/bash
# Round-4 phase-2 chip queue. Fire with:
#   nohup bash scripts/r4_phase2.sh > /tmp/r4p2.log 2>&1 &
#   echo $! > /tmp/r4p2_launcher.pid
# One TPU job at a time; every step wall-clock bounded; evidence committed
# under results/ after every stage (session boundaries wipe untracked files).
# Value order: gather probe (VERDICT #1) -> short benches -> TIP3P Ewald
# chain (VERDICT #4 + #2) -> GAMD-large RPBE (VERDICT #5) -> DFT-small
# evidence re-commit -> TIP4P Ewald chain (stretch).
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

latest_ckpt() {
  local ck
  ck=$(ls "$1"/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
  [ -n "$ck" ] && { echo "$ck"; return; }
  [ -f "$2" ] && echo "$2"
}

echo "=== [1] GATHER PROBE (VERDICT #1) $(date)"
timeout 3600 python scripts/probe_gather.py > results/probe_gather_r4.log 2>&1
echo "step1 rc=$? $(grep SUMMARY results/probe_gather_r4.log | tail -1)"
commit_results "results: on-chip gather-variant probe (r4)"

echo "=== [2] NHC REPLICA BENCH, 126MB scoped VMEM (ADVICE #4) $(date)"
timeout 1800 bash -c 'GAMD_BENCH_INTEGRATOR=nose_hoover python scripts/bench_replicas.py 8 500' \
  > results/bench_replicas_nhc_r4b.log 2>&1
echo "step2 rc=$? $(grep '^{' results/bench_replicas_nhc_r4b.log | tail -1)"
commit_results "results: NHC 8-replica fused bench at 126MB scoped VMEM (r4)"

echo "=== [3] UNROLL-TILES A/B HEADLINE BENCH $(date)"
timeout 2400 bash -c 'GAMD_UNROLL_TILES=1 python bench.py' \
  > results/bench_unroll_r4.log 2>&1
echo "step3 rc=$? $(grep '^{' results/bench_unroll_r4.log | tail -1)"
commit_results "results: headline bench with static tile unroll (r4 A/B)"

echo "=== [4] TIP3P EWALD DATASET REGEN (VERDICT #4) $(date)"
timeout 6000 python scripts/generate_data.py --system tip3p \
  --out md_dataset/water_data --seeds 10 --frames 1000 \
  > results/gen_tip3p_ewald_r4.log 2>&1
echo "step4 rc=$? $(tail -1 results/gen_tip3p_ewald_r4.log)"
python - <<'EOF' >> results/gen_tip3p_ewald_r4.log 2>&1
import numpy as np, glob
fs = sorted(glob.glob('md_dataset/water_data/*.npz'))
f = np.concatenate([np.load(x)['forces'] for x in fs[::37]])
print(f"FORCE-STD-CHECK n_files={len(fs)} sampled={len(f)} "
      f"std={f.std():.2f} kJ/mol/nm (reference scaler sqrt(3.49e5)=590.8)")
EOF
tail -1 results/gen_tip3p_ewald_r4.log
commit_results "results: TIP3P Ewald ground-truth regeneration log + force-scale check (r4)"

echo "=== [5] TIP3P b1x60 EXTENDED ANNEAL (VERDICT #2) $(date)"
time timeout 14400 python scripts/train_gamd.py --system tip3p --batch_size 1 \
  --max_epoch 60 --use_layer_norm --precompute_nbrs \
  --cp_dir ./model_ckpt_tip3p_r4 > results/tip3p_train_r4.log 2>&1
echo "step5 rc=$?"
CK3=$(latest_ckpt model_ckpt_tip3p_r4 "")
if [ -n "$CK3" ]; then
  cp "$CK3" results/ckpts/tip3p_final.msgpack
  cp model_ckpt_tip3p_r4/scaler_*.npz results/ckpts/tip3p_scaler.npz 2>/dev/null
  timeout 1500 python scripts/evaluate.py --system tip3p --ckpt "$CK3" \
    --data_dir md_dataset/water_data --json_out results/tip3p_eval_r4.json \
    > results/tip3p_eval_r4.log 2>&1
  echo "step5b rc=$? $(head -c 300 results/tip3p_eval_r4.json 2>/dev/null)"
  commit_results "results: TIP3P b1x60 anneal on Ewald labels - training log, ckpt, eval (r4)"
  timeout 3600 python scripts/analyze_rollout.py --system tip3p --ckpt "$CK3" \
    --data_dir md_dataset/water_data --steps 25000 --integrator langevin \
    --friction 25.0 --classical_baseline \
    --json_out results/tip3p_rdf_f25_r4.json > results/tip3p_rdf_r4.log 2>&1
  echo "step5c rc=$? $(head -c 200 results/tip3p_rdf_f25_r4.json 2>/dev/null)"
  commit_results "results: TIP3P 25k-step f25 rollout RDF A/B on Ewald model (r4)"
fi

echo "=== [6] GAMD-LARGE RPBE SURROGATE (VERDICT #5) $(date)"
if [ ! -f md_dataset/RPBE-surrogate.npz ]; then
  timeout 3000 python scripts/generate_data.py --system rpbe \
    --out md_dataset/RPBE-surrogate.npz --frames 1000 > results/gen_rpbe_r4b.log 2>&1
  commit_results "results: RPBE surrogate regeneration log (r4b)"
fi
time timeout 9000 python scripts/train_gamd.py --system dft \
  --data_dir md_dataset/RPBE-surrogate.npz --batch_size 1 --max_epoch 40 \
  --lr 1e-4 --use_layer_norm --encoding_size 512 --hidden_dim 512 \
  --edge_embedding_dim 768 --conv_layer 5 \
  --cp_dir ./model_ckpt_dftlarge_r4 > results/dftlarge_train_r4.log 2>&1
echo "step6 rc=$?"
CKD=$(latest_ckpt model_ckpt_dftlarge_r4 "")
if [ -n "$CKD" ]; then
  cp "$CKD" results/ckpts/dftlarge_final.msgpack
  cp model_ckpt_dftlarge_r4/scaler_*.npz results/ckpts/dftlarge_scaler.npz 2>/dev/null
  timeout 1800 python scripts/evaluate.py --system dft --ckpt "$CKD" \
    --data_dir md_dataset/RPBE-surrogate.npz \
    --json_out results/dftlarge_eval_r4.json > results/dftlarge_eval_r4.log 2>&1
  echo "step6b rc=$? $(head -c 300 results/dftlarge_eval_r4.json 2>/dev/null)"
  commit_results "results: GAMD-large (enc512/hid512/edge768/conv5) RPBE-surrogate training + eval (r4)"
fi

echo "=== [7] DFT-SMALL EVIDENCE RE-COMMIT (eval json + 1e5 rollout) $(date)"
if [ ! -f results/dft_eval.json ]; then
  time timeout 4200 python scripts/train_gamd.py --system dft \
    --data_dir md_dataset/RPBE-surrogate.npz --batch_size 1 --max_epoch 30 \
    --lr 1e-4 --use_layer_norm --cp_dir ./model_ckpt_dft_r4 \
    > results/dft_train_r4.log 2>&1
  CKS=$(latest_ckpt model_ckpt_dft_r4 "")
  if [ -n "$CKS" ]; then
    cp "$CKS" results/ckpts/dft_final.msgpack
    cp model_ckpt_dft_r4/scaler_*.npz results/ckpts/dft_scaler.npz 2>/dev/null
    timeout 1800 python scripts/evaluate.py --system dft --ckpt "$CKS" \
      --data_dir md_dataset/RPBE-surrogate.npz \
      --json_out results/dft_eval.json > results/dft_eval_r4.log 2>&1
    commit_results "results: DFT-surrogate small-tier training + eval (r4 re-commit)"
    timeout 2400 python scripts/run_md.py --system dft --ckpt "$CKS" \
      --integrator langevin --friction 25.0 --steps 100000 \
      --log results/log_nvt_dft_f25.txt > results/dft_md_r4.log 2>&1
    commit_results "results: DFT 1e5-step f25 stability rollout (r4 re-commit)"
  fi
fi

echo "=== [8] TIP4P EWALD CHAIN (stretch) $(date)"
timeout 6000 python scripts/generate_data.py --system tip4p \
  --out md_dataset/tip4p_data --seeds 10 --frames 1000 --dispatch_frames 50 \
  > results/gen_tip4p_ewald_r4.log 2>&1
echo "step8 rc=$? $(tail -1 results/gen_tip4p_ewald_r4.log)"
commit_results "results: TIP4P-Ew Ewald ground-truth regeneration log (r4)"
time timeout 14400 python scripts/train_gamd.py --system tip4p --batch_size 1 \
  --max_epoch 60 --use_layer_norm --precompute_nbrs \
  --cp_dir ./model_ckpt_tip4p_r4 > results/tip4p_train_r4.log 2>&1
echo "step8b rc=$?"
CK4=$(latest_ckpt model_ckpt_tip4p_r4 "")
if [ -n "$CK4" ]; then
  cp "$CK4" results/ckpts/tip4p_final.msgpack
  cp model_ckpt_tip4p_r4/scaler_*.npz results/ckpts/tip4p_scaler.npz 2>/dev/null
  timeout 1500 python scripts/evaluate.py --system tip4p --ckpt "$CK4" \
    --data_dir md_dataset/tip4p_data --json_out results/tip4p_eval_r4.json \
    > results/tip4p_eval_r4.log 2>&1
  echo "step8c rc=$? $(head -c 300 results/tip4p_eval_r4.json 2>/dev/null)"
  commit_results "results: TIP4P-Ew b1x60 anneal on Ewald labels - training + eval (r4)"
fi

echo "=== QUEUE R4 PHASE 2 DONE $(date)"
