#!/bin/bash
# Round-5 CONTINUATION queue (wipe-proof, resume-aware). Fire FIRST THING
# in any session after the one that ran round5_queue.sh:
#   nohup bash scripts/round5b_queue.sh > /tmp/queue_r5b.log 2>&1 &
#   echo $! > /tmp/queue_r5b.pid
#   nohup bash scripts/ckpt_provenance_watcher.sh > /tmp/prov.log 2>&1 &
# Differences vs round5_queue.sh:
#  - every training stage RESUMES from the committed
#    results/ckpts/<tag>_latest.msgpack + <tag>_RESUME.txt epoch marker
#    (written by scripts/ckpt_provenance_watcher.sh) instead of training
#    from scratch — a cut-short flagship run continues where it stopped.
#  - every stage is skipped when its terminal artifact (eval/RDF json)
#    is already committed.
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
  commit_results "results: $sys dataset generation log ($last, r5b)"
}

latest_ckpt() {
  local ck
  ck=$(ls "$1"/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
  [ -n "$ck" ] && { echo "$ck"; return; }
  [ -f "$2" ] && echo "$2"
}

resume_args() {  # resume_args <tag> <cp_dir> -> "--state_ckpt_dir X --start_epoch N"
  # Prefer a live cp_dir checkpoint (same session), else the committed
  # snapshot + RESUME marker from a previous session.
  local tag=$1 d=$2 ck ep
  ck=$(ls "$d"/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
  if [ -n "$ck" ]; then
    ep=$(basename "$ck" .msgpack); ep=${ep#checkpoint_}
    echo "--state_ckpt_dir $ck --start_epoch $((ep + 1))"; return
  fi
  if [ -f "results/ckpts/${tag}_RESUME.txt" ] && \
     [ -f "results/ckpts/${tag}_latest.msgpack" ]; then
    ep=$(cat "results/ckpts/${tag}_RESUME.txt")
    ep=${ep#checkpoint_}; ep=${ep%.msgpack}
    echo "--state_ckpt_dir results/ckpts/${tag}_latest.msgpack --start_epoch $((ep + 1))"
  fi
}

ship_best() {  # ship_best <cp_dir> <train_log> <system> <data_dir> <tag>
  local d=$1 log=$2 sys=$3 data=$4 tag=$5
  local CKT BE E
  CKT=$(latest_ckpt "$d" "results/ckpts/${tag}_latest.msgpack")
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
  [ "$BE" = "$CKT" ] && BE=""
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
    if os.path.abspath(win[0]) != os.path.abspath(
            f"results/ckpts/{tag}_latest.msgpack"):
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

echo "=== [2] DATASETS $(date)"
ensure_dataset tip3p md_dataset/water_data data_9_999.npz \
  --seeds 10 --dispatch_frames 50
ensure_dataset tip3p md_dataset/water_data data_19_999.npz \
  --seeds 10 --seed_start 10 --dispatch_frames 50

echo "=== [3] TIP3P FLAGSHIP (resume-aware) $(date)"
if [ -f results/tip3p_eval_lr_done.marker ] || \
   ls results/tip3p_lr_eval_*_r5.json >/dev/null 2>&1; then
  echo "flagship already evaluated — skip"
else
  RA=$(resume_args tip3p_lr model_ckpt_tip3p_r5)
  echo "resume_args: '$RA'"
  SE=0
  case "$RA" in *start_epoch*) SE=${RA##* };; esac
  if [ "$SE" -lt 30 ]; then
    (
      while true; do
        sleep 300
        CK=$(ls model_ckpt_tip3p_r5/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
        if [ -n "$CK" ] && ! cmp -s "$CK" results/ckpts/tip3p_lr_latest.msgpack 2>/dev/null; then
          cp "$CK" results/ckpts/tip3p_lr_latest.msgpack
          basename "$CK" > results/ckpts/tip3p_lr_RESUME.txt
          SC=$(ls model_ckpt_tip3p_r5/scaler_*.npz 2>/dev/null | sort -V | tail -1)
          [ -n "$SC" ] && cp "$SC" results/ckpts/tip3p_lr_scaler.npz
          for i in 1 2 3; do
            git add results/ckpts && git commit -m \
              "results: TIP3P longrange train checkpoint ($(basename "$CK"))" \
              >/dev/null 2>&1 && break
            sleep 5
          done
        fi
      done
    ) &
    W1=$!
    timeout 28800 python scripts/train_gamd.py --system tip3p --use_layer_norm \
      --data_dir md_dataset --extra_seeds 10 --relabel --longrange \
      --precompute_nbrs --batch_size 1 --max_epoch 30 --lr 3e-4 \
      --cp_dir model_ckpt_tip3p_r5 --checkpoint_every 2 $RA \
      > results/tip3p_train_lr_r5b.log 2>&1
    echo "step3 rc=$? $(tail -2 results/tip3p_train_lr_r5b.log | head -1)"
    kill $W1 2>/dev/null
    commit_results "results: TIP3P longrange training log (r5b resume)"
  fi
  # best-val over BOTH session logs (cat them; ship_best reads one path)
  cat results/tip3p_train_lr_r5.log results/tip3p_train_lr_r5b.log \
    > /tmp/tip3p_lr_all.log 2>/dev/null
  ship_best model_ckpt_tip3p_r5 /tmp/tip3p_lr_all.log \
    tip3p md_dataset/water_data tip3p_lr
  commit_results "results: TIP3P longrange evals + shipped ckpt (r5b)"
fi

if [ -f results/ckpts/tip3p_lr_latest.msgpack ] && \
   [ ! -f results/tip3p_rdf_lr_r5.json ]; then
  echo "=== [4] TIP3P f25 25k ROLLOUT RDF (longrange ckpt) $(date)"
  timeout 5400 python scripts/analyze_rollout.py --system tip3p \
    --ckpt results/ckpts/tip3p_lr_latest.msgpack \
    --data_dir md_dataset/water_data \
    --steps 25000 --integrator langevin --friction 25.0 \
    --classical_baseline \
    --json_out results/tip3p_rdf_lr_r5.json > results/tip3p_rdf_lr_r5.log 2>&1
  echo "step4 rc=$? $(head -c 300 results/tip3p_rdf_lr_r5.json 2>/dev/null)"
  commit_results "results: TIP3P f25 rollout RDF, longrange ckpt (r5b)"
fi

echo "=== [4b] KERNEL PARITY $(date)"
if [ ! -f results/check_kernels_r5.log ]; then
  timeout 1800 python scripts/check_kernels.py > results/check_kernels_r5.log 2>&1
  echo "step4b rc=$? $(tail -1 results/check_kernels_r5.log)"
  commit_results "results: round-5 kernel parity"
fi

echo "=== [5] LJ DISTILLATION ARM (resume-aware) $(date)"
if [ -f results/lj_rdf_distill_r5.json ]; then
  echo "LJ distill arm already measured — skip"
else
  ensure_dataset lj md_dataset/lj_data data_9_999.npz --seeds 10
  CKBEST=results/ckpts/lj_relabel_latest.msgpack
  [ -f "$CKBEST" ] || CKBEST=results/ckpts/lj_highest_latest.msgpack
  if [ ! -f md_dataset/lj_data/data_14_999.npz ] && [ -f "$CKBEST" ]; then
    echo "--- distilling 5 GNN-NHC trajectories from $CKBEST $(date)"
    timeout 7200 python scripts/distill_rollout.py --system lj \
      --ckpt "$CKBEST" --out md_dataset/lj_data \
      --seeds 5 --seed_start 10 --frames 1000 --interval 50 \
      > results/lj_distill_r5.log 2>&1
    echo "step5-distill rc=$? $(tail -1 results/lj_distill_r5.log)"
    commit_results "results: LJ rollout-distillation generation log (r5b)"
  fi
  if [ -f md_dataset/lj_data/data_14_999.npz ]; then
    RA=$(resume_args lj_distill model_ckpt_lj_r5)
    SE=0; case "$RA" in *start_epoch*) SE=${RA##* };; esac
    if [ "$SE" -lt 30 ]; then
      timeout 14400 python scripts/train_gamd.py --system lj --use_layer_norm \
        --data_dir md_dataset --extra_seeds 5 \
        --precompute_nbrs --batch_size 1 --max_epoch 30 --lr 3e-4 \
        --matmul_precision highest \
        --cp_dir model_ckpt_lj_r5 --checkpoint_every 5 $RA \
        > results/lj_train_distill_r5b.log 2>&1
      echo "step5-train rc=$?"
      commit_results "results: LJ distilled-frames training log (r5b resume)"
    fi
    CKL=$(latest_ckpt model_ckpt_lj_r5 results/ckpts/lj_distill_latest.msgpack)
    if [ -f "$CKL" ]; then
      timeout 2400 python scripts/evaluate.py --system lj --ckpt "$CKL" \
        --data_dir md_dataset/lj_data --json_out results/lj_eval_distill_r5.json \
        > results/lj_eval_distill_r5.log 2>&1
      timeout 5400 python scripts/analyze_rollout.py --system lj \
        --ckpt "$CKL" --data_dir md_dataset/lj_data \
        --steps 25000 --integrator nose_hoover --classical_baseline \
        --json_out results/lj_rdf_distill_r5.json > results/lj_rdf_distill_r5.log 2>&1
      echo "step5-rdf rc=$? $(head -c 300 results/lj_rdf_distill_r5.json 2>/dev/null)"
      if [ "$CKL" != results/ckpts/lj_distill_latest.msgpack ]; then
        cp "$CKL" results/ckpts/lj_distill_latest.msgpack
        cp "$(dirname "$CKL")/scaler_$(basename "$CKL" .msgpack | cut -d_ -f2).npz" \
           results/ckpts/lj_distill_scaler.npz 2>/dev/null
      fi
      commit_results "results: LJ distillation-trained eval + RDF (r5b)"
    fi
  fi
fi

echo "=== [6] TIP4P EWALD REGEN + LONGRANGE ARM (resume-aware) $(date)"
if ls results/tip4p_lr_eval_*_r5.json >/dev/null 2>&1; then
  echo "TIP4P arm already evaluated — skip"
else
  ensure_dataset tip4p md_dataset/tip4p_data data_9_999.npz \
    --seeds 10 --dispatch_frames 50 --electrostatics ewald
  if [ -f md_dataset/tip4p_data/data_9_999.npz ]; then
    RA=$(resume_args tip4p_lr model_ckpt_tip4p_r5)
    SE=0; case "$RA" in *start_epoch*) SE=${RA##* };; esac
    if [ "$SE" -lt 30 ]; then
      timeout 21600 python scripts/train_gamd.py --system tip4p --use_layer_norm \
        --data_dir md_dataset --longrange --precompute_nbrs \
        --batch_size 1 --max_epoch 30 --lr 3e-4 \
        --cp_dir model_ckpt_tip4p_r5 --checkpoint_every 2 $RA \
        > results/tip4p_train_lr_r5b.log 2>&1
      echo "step6 rc=$? $(tail -2 results/tip4p_train_lr_r5b.log | head -1)"
      commit_results "results: TIP4P Ewald longrange training log (r5b)"
    fi
    cat results/tip4p_train_lr_r5.log results/tip4p_train_lr_r5b.log \
      > /tmp/tip4p_lr_all.log 2>/dev/null
    ship_best model_ckpt_tip4p_r5 /tmp/tip4p_lr_all.log \
      tip4p md_dataset/tip4p_data tip4p_lr
    commit_results "results: TIP4P longrange evals + shipped ckpt (r5b)"
  fi
fi

echo "=== [7] HEADLINE BENCH $(date)"
if [ ! -f results/bench_r5.log ] || ! grep -q '^{' results/bench_r5.log; then
  timeout 3600 python bench.py > results/bench_r5.log 2>&1
  echo "step7 rc=$? $(grep '^{' results/bench_r5.log | tail -1)"
  commit_results "results: round-5 headline bench"
fi

echo "=== QUEUE R5B DONE $(date)"
