#!/bin/bash
# Round-5 opener chip queue (wipe-proof). Fire FIRST THING next round:
#   nohup bash scripts/round5_queue.sh > /tmp/queue_r5.log 2>&1 &
#   echo $! > /tmp/queue_r5.pid
# Value order: kernel parity -> datasets -> TIP3P FLAGSHIP retrain
# (--longrange + --relabel + --extra_seeds: the analytic k-space split
# plus exact-relabel jitter plus 10 extra Ewald trajectories — the
# combined attack on the round-4 finding that a local GNN memorizes the
# reciprocal-space force component; target MAE <= ref 0.01126 eV/A)
# -> eval/ship/f25 RDF -> LJ follow-on conditioned on r4j's exact-relabel
# RDF -> TIP4P Ewald regeneration + longrange arm -> bench.
# Session boundaries wipe untracked artifacts: every stage regenerates
# what it needs and falls back to committed results/ckpts/*.msgpack.
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

ensure_dataset() {  # ensure_dataset <system> <path> <last_file> [flags...]
  # Skip only when BOTH the last frame file AND this round's own
  # generation log exist: water/tip4p labels must come from THIS round's
  # (Ewald-default) generator — a leftover DSF-era directory from an
  # earlier session would otherwise silently poison the --longrange /
  # --relabel label contract. The log name carries the last-file tag so
  # canonical and extra-seed runs of the same dir keep separate evidence.
  local sys=$1 out=$2 last=$3; shift 3
  local log="results/gen_${sys}_$(basename "$out")_${last%.npz}_r5.log"
  if [ -f "$out/$last" ] && { [ "$sys" = lj ] || [ -f "$log" ]; }; then
    echo "dataset $out ($last) present"; return 0
  fi
  echo "--- regenerating $sys dataset -> $out $(date)"
  timeout 7200 python scripts/generate_data.py --system "$sys" \
    --out "$out" --frames 1000 --interval 50 "$@" \
    > "$log" 2>&1
  echo "gen $sys rc=$? $(tail -1 "$log")"
  commit_results "results: $sys dataset generation log ($last, r5)"
}

latest_ckpt() {  # latest_ckpt <cp_dir> <committed_fallback>
  local ck
  ck=$(ls "$1"/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
  [ -n "$ck" ] && { echo "$ck"; return; }
  [ -f "$2" ] && echo "$2"
}

ship_best() {  # ship_best <cp_dir> <train_log> <system> <data_dir> <tag>
  # Eval best-val + latest checkpoints, copy the better (by eval MAE) to
  # results/ckpts/<tag>_latest.msgpack (+ scaler), echo its path.
  local d=$1 log=$2 sys=$3 data=$4 tag=$5
  local CKT BE E
  CKT=$(latest_ckpt "$d" "")
  BE=$(python - "$log" "$d" <<'PYEOF'
import glob, re, sys
log, d = sys.argv[1], sys.argv[2]
best, ep = 9e9, None
try:
    for ln in open(log):
        m = re.search(r"epoch (\d+) val: val_mae=([0-9.e-]+)", ln)
        if m and float(m.group(2)) < best:
            best, ep = float(m.group(2)), int(m.group(1))
except Exception:
    pass
if ep is not None:
    c = sorted(int(p.split("_")[-1].split(".")[0])
               for p in glob.glob(f"{d}/checkpoint_*.msgpack"))
    c = [x for x in c if x <= ep]
    if c:
        print(f"{d}/checkpoint_{c[-1]}.msgpack")
PYEOF
)
  [ "$BE" = "$CKT" ] && BE=""   # best-val IS latest: one eval suffices
  for PAIR in "best $BE" "latest $CKT"; do
    set -- $PAIR
    [ -n "$2" ] && [ -f "$2" ] || continue
    timeout 2400 python scripts/evaluate.py --system "$sys" --ckpt "$2" \
      --data_dir "$data" --json_out "results/${tag}_eval_$1_r5.json" \
      > "results/${tag}_eval_$1_r5.log" 2>&1
    echo "eval $tag/$1 rc=$? $(head -c 200 results/${tag}_eval_$1_r5.json 2>/dev/null)"
  done
  python - "$BE" "$CKT" "$tag" <<'PYEOF'
import json, os, shutil, sys
be, ckt, tag = sys.argv[1], sys.argv[2], sys.argv[3]
win = None
for t, ck in (("best", be), ("latest", ckt)):
    p = f"results/{tag}_eval_{t}_r5.json"
    if os.path.exists(p) and ck and os.path.exists(ck):
        d = json.load(open(p))
        if win is None or d["force_mae_ev_a"] < win[1]:
            win = (ck, d["force_mae_ev_a"])
if win:
    shutil.copy(win[0], f"results/ckpts/{tag}_latest.msgpack")
    e = os.path.basename(win[0]).split("_")[1].split(".")[0]
    sc = os.path.join(os.path.dirname(win[0]), f"scaler_{e}.npz")
    if os.path.exists(sc):
        shutil.copy(sc, f"results/ckpts/{tag}_scaler.npz")
    with open(f"results/ckpts/{tag}_PROVENANCE.txt", "w") as f:
        f.write(f"{win[0]} eval_mae={win[1]}\n")
    print(win[0])
PYEOF
}

# [1] kernel parity moved AFTER the flagship (stage 4b): in a short
# session the datasets + incremental train checkpoints are the scarce
# wall-clock items; parity was green in r4c and is re-captured later.

echo "=== [2] DATASETS $(date)"
ensure_dataset tip3p md_dataset/water_data data_9_999.npz \
  --seeds 10 --dispatch_frames 50
ensure_dataset tip3p md_dataset/water_data data_19_999.npz \
  --seeds 10 --seed_start 10 --dispatch_frames 50

echo "=== [3] TIP3P FLAGSHIP: longrange + relabel + extra seeds, b1x30 $(date)"
(
  while true; do
    sleep 300
    CK=$(ls model_ckpt_tip3p_r5/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
    if [ -n "$CK" ] && ! cmp -s "$CK" results/ckpts/tip3p_lr_latest.msgpack 2>/dev/null; then
      cp "$CK" results/ckpts/tip3p_lr_latest.msgpack
      SC=$(ls model_ckpt_tip3p_r5/scaler_*.npz 2>/dev/null | sort -V | tail -1)
      [ -n "$SC" ] && cp "$SC" results/ckpts/tip3p_lr_scaler.npz
      commit_results "results: TIP3P longrange train checkpoint ($(basename "$CK"))"
    fi
  done
) &
W1=$!
timeout 28800 python scripts/train_gamd.py --system tip3p --use_layer_norm \
  --data_dir md_dataset --extra_seeds 10 --relabel --longrange \
  --precompute_nbrs --batch_size 1 --max_epoch 30 --lr 3e-4 \
  --cp_dir model_ckpt_tip3p_r5 --checkpoint_every 2 \
  > results/tip3p_train_lr_r5.log 2>&1
echo "step3 rc=$? $(tail -2 results/tip3p_train_lr_r5.log | head -1)"
kill $W1 2>/dev/null
commit_results "results: TIP3P longrange+relabel+extra-seeds training log (r5)"

ship_best model_ckpt_tip3p_r5 results/tip3p_train_lr_r5.log \
  tip3p md_dataset/water_data tip3p_lr
commit_results "results: TIP3P longrange evals + shipped ckpt (r5)"

if [ -f results/ckpts/tip3p_lr_latest.msgpack ]; then
  echo "=== [4] TIP3P f25 25k ROLLOUT RDF (longrange ckpt) $(date)"
  timeout 5400 python scripts/analyze_rollout.py --system tip3p \
    --ckpt results/ckpts/tip3p_lr_latest.msgpack \
    --data_dir md_dataset/water_data \
    --steps 25000 --integrator langevin --friction 25.0 \
    --classical_baseline \
    --json_out results/tip3p_rdf_lr_r5.json > results/tip3p_rdf_lr_r5.log 2>&1
  echo "step4 rc=$? $(head -c 300 results/tip3p_rdf_lr_r5.json 2>/dev/null)"
  commit_results "results: TIP3P f25 rollout RDF, longrange ckpt (r5)"
fi

echo "=== [4b] KERNEL PARITY $(date)"
if [ ! -f results/check_kernels_r5.log ]; then
  timeout 1800 python scripts/check_kernels.py > results/check_kernels_r5.log 2>&1
  echo "step4b rc=$? $(tail -1 results/check_kernels_r5.log)"
  commit_results "results: round-5 kernel parity"
fi

echo "=== [5] LJ FOLLOW-ON: rollout distillation $(date)"
ensure_dataset lj md_dataset/lj_data data_9_999.npz --seeds 10
# First, catch-up eval/RDF for the r4j exact-relabel ckpt if the r4j
# session was cut before they ran; then the distillation attack below.
if [ ! -f results/lj_rdf_r4j.json ] && [ -f results/ckpts/lj_relabel_latest.msgpack ]; then
  ensure_dataset lj md_dataset/lj_data data_9_999.npz --seeds 10
  timeout 2400 python scripts/evaluate.py --system lj \
    --ckpt results/ckpts/lj_relabel_latest.msgpack \
    --data_dir md_dataset/lj_data --json_out results/lj_eval_r4j.json \
    > results/lj_eval_r4j.log 2>&1
  timeout 5400 python scripts/analyze_rollout.py --system lj \
    --ckpt results/ckpts/lj_relabel_latest.msgpack \
    --data_dir md_dataset/lj_data \
    --steps 25000 --integrator nose_hoover --classical_baseline \
    --json_out results/lj_rdf_r4j.json > results/lj_rdf_r4j.log 2>&1
  echo "step5-catchup rc=$? $(head -c 300 results/lj_rdf_r4j.json 2>/dev/null)"
  commit_results "results: LJ exact-relabel eval + RDF (r4j catch-up)"
fi
# ROLLOUT DISTILLATION attack (DAgger-style; scripts/distill_rollout.py):
# the RDF residual is off-manifold error, so train on frames from the
# model's OWN rollout distribution, labeled by the classical oracle.
# Applies whether or not r4j's exact-relabel improved the RDF — the
# distilled frames target exactly the states the RDF is measured on.
CKBEST=results/ckpts/lj_relabel_latest.msgpack
[ -f "$CKBEST" ] || CKBEST=results/ckpts/lj_highest_latest.msgpack
if [ -f "$CKBEST" ]; then
  echo "--- distilling 5 GNN-NHC trajectories from $CKBEST $(date)"
  timeout 7200 python scripts/distill_rollout.py --system lj \
    --ckpt "$CKBEST" --out md_dataset/lj_data \
    --seeds 5 --seed_start 10 --frames 1000 --interval 50 \
    > results/lj_distill_r5.log 2>&1
  echo "step5-distill rc=$? $(tail -1 results/lj_distill_r5.log)"
  commit_results "results: LJ rollout-distillation generation log (r5)"
fi
# Recipe: the r3e one (STALE-label jitter 0.005) + distilled frames.
# r4j measured the exact-relabel arm WORSE on RDF (L2 0.102 vs r3e
# 0.078) despite best-ever MAE: stale-label jitter is a regularizer
# (label noise smooths the learned force field), so keep it and change
# exactly one variable — the distilled on-distribution frames.
if [ -f md_dataset/lj_data/data_14_999.npz ]; then
  timeout 14400 python scripts/train_gamd.py --system lj --use_layer_norm \
    --data_dir md_dataset --extra_seeds 5 \
    --precompute_nbrs --batch_size 1 --max_epoch 30 --lr 3e-4 \
    --matmul_precision highest \
    --cp_dir model_ckpt_lj_r5 --checkpoint_every 5 \
    > results/lj_train_distill_r5.log 2>&1
  echo "step5-train rc=$?"
  commit_results "results: LJ r3e-recipe + distilled-rollout-frames training log (r5)"
  CKL=$(latest_ckpt model_ckpt_lj_r5 "")
  if [ -f "$CKL" ]; then
    timeout 2400 python scripts/evaluate.py --system lj --ckpt "$CKL" \
      --data_dir md_dataset/lj_data --json_out results/lj_eval_distill_r5.json \
      > results/lj_eval_distill_r5.log 2>&1
    timeout 5400 python scripts/analyze_rollout.py --system lj \
      --ckpt "$CKL" --data_dir md_dataset/lj_data \
      --steps 25000 --integrator nose_hoover --classical_baseline \
      --json_out results/lj_rdf_distill_r5.json > results/lj_rdf_distill_r5.log 2>&1
    echo "step5-rdf rc=$? $(head -c 300 results/lj_rdf_distill_r5.json 2>/dev/null)"
    cp "$CKL" results/ckpts/lj_distill_latest.msgpack
    cp "$(dirname "$CKL")/scaler_$(basename "$CKL" .msgpack | cut -d_ -f2).npz" \
       results/ckpts/lj_distill_scaler.npz 2>/dev/null
    commit_results "results: LJ distillation-trained eval + RDF (r5)"
  fi
fi

echo "=== [6] TIP4P EWALD REGEN + LONGRANGE ARM $(date)"
# Current TIP4P labels are DSF-truncated; regenerate under the reference
# protocol (full Ewald on M/H sites, physics/water.py
# tip4pew_energy_rigid_ewald) and train the longrange split arm.
ensure_dataset tip4p md_dataset/tip4p_data data_9_999.npz \
  --seeds 10 --dispatch_frames 50 --electrostatics ewald
if [ -f md_dataset/tip4p_data/data_9_999.npz ]; then
  timeout 21600 python scripts/train_gamd.py --system tip4p --use_layer_norm \
    --data_dir md_dataset --longrange --precompute_nbrs \
    --batch_size 1 --max_epoch 30 --lr 3e-4 \
    --cp_dir model_ckpt_tip4p_r5 --checkpoint_every 2 \
    > results/tip4p_train_lr_r5.log 2>&1
  echo "step6 rc=$? $(tail -2 results/tip4p_train_lr_r5.log | head -1)"
  commit_results "results: TIP4P Ewald longrange training log (r5)"
  ship_best model_ckpt_tip4p_r5 results/tip4p_train_lr_r5.log \
    tip4p md_dataset/tip4p_data tip4p_lr
  commit_results "results: TIP4P longrange evals + shipped ckpt (r5)"
fi

echo "=== [7] HEADLINE BENCH $(date)"
timeout 3600 python bench.py > results/bench_r5.log 2>&1
echo "step7 rc=$? $(grep '^{' results/bench_r5.log | tail -1)"
commit_results "results: round-5 headline bench"

echo "=== QUEUE R5 DONE $(date)"
