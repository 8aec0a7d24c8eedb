#!/bin/bash
# Round-5 opener chip queue (wipe-proof). Fire FIRST THING next round:
#   nohup bash scripts/round5_queue.sh > /tmp/queue_r5.log 2>&1 &
#   echo $! > /tmp/queue_r5.pid
# Rationale per stage is in PLAN.md "Round-5 queue". Session boundaries
# wipe untracked artifacts: every stage regenerates what it needs and
# falls back to the committed results/ckpts/*.msgpack checkpoints.
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

ensure_dataset() {  # ensure_dataset <system> <path> [extra flags...]
  local sys=$1 out=$2; shift 2
  if [ -e "$out" ] && [ -n "$(ls "$out" 2>/dev/null | head -1)" ]; then
    echo "dataset $out present"; return 0
  fi
  echo "--- regenerating $sys dataset -> $out $(date)"
  timeout 4500 python scripts/generate_data.py --system "$sys" \
    --out "$out" --seeds 10 --frames 1000 "$@" \
    > "results/gen_${sys}_r5.log" 2>&1
  echo "gen $sys rc=$? $(tail -1 results/gen_${sys}_r5.log)"
  commit_results "results: $sys dataset generation log (r5)"
}

latest_ckpt() {  # latest_ckpt <cp_dir> <committed_fallback>
  local ck
  ck=$(ls "$1"/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
  [ -n "$ck" ] && { echo "$ck"; return; }
  [ -f "$2" ] && echo "$2"
}

echo "=== [1] KERNEL PARITY $(date)"
timeout 1800 python scripts/check_kernels.py > results/check_kernels_r5.log 2>&1
echo "step1 rc=$? $(tail -1 results/check_kernels_r5.log)"

echo "=== [2] HEADLINE BENCH $(date)"
timeout 2400 python bench.py > results/bench_r5.log 2>&1
echo "step2 rc=$? $(grep '^{' results/bench_r5.log | tail -1)"
commit_results "results: round-5 opener - kernel parity + headline bench"

echo "=== [3] DATASETS $(date)"
ensure_dataset lj md_dataset/lj_data
ensure_dataset tip3p md_dataset/water_data

echo "=== [4] TIP3P drop_edge RETRAIN on Ewald labels (r4 overfit fix) $(date)"
# r4 finding: the reference recipe OVERFITS on Ewald labels from ~ep13
# (RESULTS.md round-4 TIP3P bullet). The reference's own regularizer —
# 20% per-layer edge dropout (nn_module.py:111-122) — was off in every
# water run so far. 40 epochs, best-val selected below.
timeout 7200 python scripts/train_gamd.py --system tip3p --batch_size 1 \
  --max_epoch 40 --min_epoch 40 --use_layer_norm --drop_edge \
  --checkpoint_every 2 --cp_dir ./model_ckpt_tip3p_r5 \
  > results/tip3p_train_r5.log 2>&1
echo "step4 rc=$?"
CK3=$(latest_ckpt model_ckpt_tip3p_r5 results/ckpts/tip3p_final.msgpack)
BEST=$(python - <<'PYEOF'
import re
best, ep = 9e9, None
try:
    for ln in open("results/tip3p_train_r5.log"):
        m = re.search(r"epoch (\d+) val: val_mae=([0-9.e-]+)", ln)
        if m and float(m.group(2)) < best:
            best, ep = float(m.group(2)), int(m.group(1))
except Exception:
    pass
# checkpoints land every 2 epochs as checkpoint_{ep}.msgpack (0-based
# epoch indexing in the trainer; keep the nearest saved one at/below)
if ep is not None:
    import glob
    cands = sorted(int(p.split("_")[-1].split(".")[0])
                   for p in glob.glob("model_ckpt_tip3p_r5/checkpoint_*.msgpack"))
    cands = [c for c in cands if c <= ep]
    if cands:
        print(f"model_ckpt_tip3p_r5/checkpoint_{cands[-1]}.msgpack")
PYEOF
)
for CK in "$CK3" "$BEST"; do
  [ -n "$CK" ] && [ -f "$CK" ] || continue
  TAG=$(basename "$CK" .msgpack)
  timeout 1200 python scripts/evaluate.py --system tip3p --ckpt "$CK" \
    --data_dir md_dataset/water_data \
    --json_out "results/tip3p_eval_r5_${TAG}.json" \
    > "results/tip3p_eval_r5_${TAG}.log" 2>&1
  echo "step4-eval $TAG rc=$? $(head -c 200 results/tip3p_eval_r5_${TAG}.json 2>/dev/null)"
done
commit_results "results: TIP3P drop_edge retrain on Ewald labels + evals (r5)"
# Ship the better of latest/best-val as tip3p_final
PICK=$(python - <<'PYEOF'
import glob, json
best, pick = 9e9, None
for p in glob.glob("results/tip3p_eval_r5_*.json"):
    try:
        d = json.load(open(p))
    except Exception:
        continue
    if d.get("force_mae_ev_a", 9e9) < best:
        best = d["force_mae_ev_a"]
        pick = p.split("tip3p_eval_r5_")[1].rsplit(".json", 1)[0]
print(pick or "")
PYEOF
)
if [ -n "$PICK" ] && [ -f "model_ckpt_tip3p_r5/${PICK}.msgpack" ]; then
  cp "model_ckpt_tip3p_r5/${PICK}.msgpack" results/ckpts/tip3p_final.msgpack
  EP=$(echo "$PICK" | sed 's/[^0-9]//g')
  cp "model_ckpt_tip3p_r5/scaler_${EP}.npz" results/ckpts/tip3p_scaler.npz \
    2>/dev/null || cp "$(ls model_ckpt_tip3p_r5/scaler_*.npz | sort -V | tail -1)" \
    results/ckpts/tip3p_scaler.npz
  commit_results "results: ship best TIP3P drop_edge ckpt (r5)"
fi

echo "=== [5] TIP3P f25 25k ROLLOUT RDF on the shipped ckpt $(date)"
timeout 5400 python scripts/analyze_rollout.py --system tip3p \
  --ckpt results/ckpts/tip3p_final.msgpack --data_dir md_dataset/water_data \
  --steps 25000 --integrator langevin --friction 25.0 --classical_baseline \
  --json_out results/tip3p_rdf_f25_r5.json > results/tip3p_rdf_r5.log 2>&1
echo "step5 rc=$? $(head -c 200 results/tip3p_rdf_f25_r5.json 2>/dev/null)"
commit_results "results: TIP3P f25 rollout RDF, round-5 ckpt"

echo "=== [6] LJ RDF with the cosine-fine-tuned ckpt (if r4 cosft improved) $(date)"
if [ -f results/ckpts/lj_cosft_latest.msgpack ]; then
  timeout 5400 python scripts/analyze_rollout.py --system lj \
    --ckpt results/ckpts/lj_cosft_latest.msgpack --data_dir md_dataset/lj_data \
    --steps 25000 --integrator nose_hoover --classical_baseline \
    --json_out results/lj_rdf_cosft_r5.json > results/lj_rdf_cosft_r5.log 2>&1
  echo "step6 rc=$? $(head -c 200 results/lj_rdf_cosft_r5.json 2>/dev/null)"
  commit_results "results: LJ RDF with cosine-fine-tuned ckpt (r5)"
fi

echo "=== [7] GAMD-LARGE completion (skip if dftlarge eval committed in r4) $(date)"
if [ ! -f results/dftlarge_eval_r4.json ]; then
  if [ ! -f md_dataset/RPBE-surrogate.npz ]; then
    timeout 4500 python scripts/generate_data.py --system rpbe \
      --out md_dataset/RPBE-surrogate.npz --frames 1000 \
      > results/gen_rpbe_r5.log 2>&1
    commit_results "results: RPBE surrogate regeneration (r5)"
  fi
  timeout 7200 python scripts/train_gamd.py --system dft \
    --data_dir md_dataset/RPBE-surrogate.npz --batch_size 1 --max_epoch 14 \
    --min_epoch 14 --lr 1e-4 --use_layer_norm --update_edge \
    --encoding_size 256 --hidden_dim 128 --edge_embedding_dim 256 \
    --conv_layer 5 --checkpoint_every 2 \
    --cp_dir ./model_ckpt_dftlarge_r5 > results/dftlarge_train_r5.log 2>&1
  CKD=$(latest_ckpt model_ckpt_dftlarge_r5 results/ckpts/dftlarge_final.msgpack)
  if [ -n "$CKD" ]; then
    timeout 1200 python scripts/evaluate.py --system dft --ckpt "$CKD" \
      --data_dir md_dataset/RPBE-surrogate.npz \
      --json_out results/dftlarge_eval_r5.json > results/dftlarge_eval_r5.log 2>&1
    echo "step7 rc=$? $(head -c 300 results/dftlarge_eval_r5.json 2>/dev/null)"
    commit_results "results: GAMD-large RPBE-surrogate train + eval (r5)"
  fi
fi

echo "=== ROUND-5 OPENER DONE $(date)"
