#!/bin/bash
# Round-5 session-d queue (final round, post-wipe continuation of r5c).
# Fire with:
#   nohup bash scripts/round5d_queue.sh > /tmp/queue_r5d.log 2>&1 &
#   echo $! > /tmp/queue_r5d.pid
#   nohup bash scripts/ckpt_provenance_watcher.sh > /tmp/prov.log 2>&1 &
#
# Session-boundary state this queue recovers from:
#   - md_dataset/ and model_ckpt_* wiped; results/ckpts snapshots survive.
#   - r5c stage 0 DONE (tip3p_lr shipped from best-val cp2, eval 0.01886).
#   - LJ distill data gone (log committed) -> regenerate (deterministic:
#     same ckpt results/ckpts/lj_relabel_latest.msgpack, seeds 10-14).
#   - LJ distill training reached ep3; committed best.msgpack is ep2
#     (val 0.020996) -> resume from it.
# Order follows VERDICT.md round-5 priorities (LJ distill FIRST).
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

run_injected() {
  mkdir -p /tmp/chip_jobs /tmp/chip_jobs/done
  for J in /tmp/chip_jobs/*.sh; do
    [ -f "$J" ] || continue
    echo "--- injected job $J $(date)"
    bash "$J"
    mv "$J" /tmp/chip_jobs/done/
  done
}

latest_ckpt() {
  ls "$1"/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1
}

# prep_resume <tag> <cp_dir>: restore committed best-val state into the
# cp_dir so _best_val_tracker does not clobber a better historical best.
prep_resume() {
  local tag=$1 d=$2
  mkdir -p "$d"
  if [ -f "results/ckpts/${tag}_best.msgpack" ] && [ ! -f "$d/best.msgpack" ]; then
    cp "results/ckpts/${tag}_best.msgpack" "$d/best.msgpack"
    [ -f "results/ckpts/${tag}_best_scaler.npz" ] && \
      cp "results/ckpts/${tag}_best_scaler.npz" "$d/scaler_best.npz"
    [ -f "results/ckpts/${tag}_best_val.txt" ] && \
      cp "results/ckpts/${tag}_best_val.txt" "$d/best_val.txt"
  fi
}

# resume_args <tag> <cp_dir>: prefer the newest live checkpoint; else the
# newest committed snapshot (best vs latest, by epoch).
resume_args() {
  local tag=$1 d=$2 ck ep bep lep
  ck=$(latest_ckpt "$d")
  if [ -n "$ck" ]; then
    ep=$(basename "$ck" .msgpack); ep=${ep#checkpoint_}
    echo "--state_ckpt_dir $ck --start_epoch $((ep + 1))"; return
  fi
  bep=-1; lep=-1
  if [ -f "results/ckpts/${tag}_best_val.txt" ] && \
     [ -f "results/ckpts/${tag}_best.msgpack" ]; then
    bep=$(sed -n 's/.*epoch=\([0-9]*\).*/\1/p' "results/ckpts/${tag}_best_val.txt")
    [ -n "$bep" ] || bep=-1
  fi
  if [ -f "results/ckpts/${tag}_RESUME.txt" ] && \
     [ -f "results/ckpts/${tag}_latest.msgpack" ]; then
    lep=$(cat "results/ckpts/${tag}_RESUME.txt")
    lep=${lep#checkpoint_}; lep=${lep%.msgpack}
    [ -n "$lep" ] || lep=-1
  fi
  if [ "$bep" -ge "$lep" ] && [ "$bep" -ge 0 ]; then
    echo "--state_ckpt_dir results/ckpts/${tag}_best.msgpack --start_epoch $((bep + 1))"
  elif [ "$lep" -ge 0 ]; then
    echo "--state_ckpt_dir results/ckpts/${tag}_latest.msgpack --start_epoch $((lep + 1))"
  fi
}

eval_one() {  # eval_one <system> <ckpt> <out_tag> <data_dir>
  timeout 2400 python scripts/evaluate.py --system "$1" --ckpt "$2" \
    --data_dir "$4" --json_out "results/${3}.json" \
    > "results/${3}.log" 2>&1
  echo "eval $3 rc=$? $(head -c 200 results/${3}.json 2>/dev/null)"
}

ship_winner() {  # ship_winner <tag> <candA_json:ckpt> [candB_json:ckpt ...]
  python - "$@" <<'PYEOF'
import json, os, shutil, sys
tag = sys.argv[1]
win = None
for pair in sys.argv[2:]:
    j, ck = pair.split(":", 1)
    if os.path.exists(j) and os.path.exists(ck):
        mae = json.load(open(j))["force_mae_ev_a"]
        if win is None or mae < win[1]:
            win = (ck, mae, j)
if win:
    dst = f"results/ckpts/{tag}_latest.msgpack"
    if os.path.abspath(win[0]) != os.path.abspath(dst):
        shutil.copy(win[0], dst)
    d = os.path.dirname(win[0])
    base = os.path.basename(win[0])
    sc = (os.path.join(d, "scaler_best.npz") if base == "best.msgpack" else
          os.path.join(d, "scaler_" + base.split("_")[-1].split(".")[0]
                       + ".npz"))
    if os.path.exists(sc):
        shutil.copy(sc, f"results/ckpts/{tag}_scaler.npz")
    with open(f"results/ckpts/{tag}_PROVENANCE.txt", "w") as f:
        f.write(f"{win[0]} eval_mae={win[1]} json={win[2]}\n")
    print(f"shipped {tag}: {win[0]} mae={win[1]}")
PYEOF
}

echo "=== [A] LJ CANONICAL DATASET (CPU, background) $(date)"
LJGEN_PID=""
if [ ! -f md_dataset/lj_data/data_9_999.npz ]; then
  # CPU fallback needs BOTH: axon_site OFF the PYTHONPATH (its
  # sitecustomize force-sets JAX_PLATFORMS=axon) and JAX_PLATFORMS=cpu.
  ( PYTHONPATH=$PWD JAX_PLATFORMS=cpu timeout 10800 python \
      scripts/generate_data.py \
      --system lj --out md_dataset/lj_data --frames 1000 --interval 50 \
      --seeds 10 > results/gen_lj_cpu_r5d.log 2>&1 ) &
  LJGEN_PID=$!
  echo "LJ CPU gen started pid=$LJGEN_PID"
fi

echo "=== [1] LJ DISTILLATION ARM $(date)"
if [ -f results/lj_rdf_distill_r5.json ]; then
  echo "LJ distill arm already measured — skip"
else
  CKBEST=results/ckpts/lj_relabel_latest.msgpack
  [ -f "$CKBEST" ] || CKBEST=results/ckpts/lj_highest_latest.msgpack
  if [ ! -f md_dataset/lj_data/data_14_999.npz ] && [ -f "$CKBEST" ]; then
    echo "--- distilling 5 GNN-NHC trajectories from $CKBEST $(date)"
    timeout 7200 python scripts/distill_rollout.py --system lj \
      --ckpt "$CKBEST" --out md_dataset/lj_data \
      --seeds 5 --seed_start 10 --frames 1000 --interval 50 \
      > results/lj_distill_r5d.log 2>&1
    echo "distill rc=$? $(tail -1 results/lj_distill_r5d.log)"
    commit_results "results: LJ rollout-distillation regeneration log (r5d)"
  fi
  if [ -n "$LJGEN_PID" ]; then
    echo "--- waiting for LJ CPU gen (pid $LJGEN_PID) $(date)"
    wait "$LJGEN_PID"
    echo "LJ CPU gen done rc=$? $(tail -1 results/gen_lj_cpu_r5d.log)"
    commit_results "results: LJ canonical dataset CPU generation log (r5d)"
  fi
  if [ -f md_dataset/lj_data/data_14_999.npz ] && \
     [ -f md_dataset/lj_data/data_9_999.npz ]; then
    prep_resume lj_distill model_ckpt_lj_r5
    RA=$(resume_args lj_distill model_ckpt_lj_r5)
    echo "resume_args: '$RA'"
    SE=0; case "$RA" in *start_epoch*) SE=${RA##* };; esac
    if [ "$SE" -lt 30 ]; then
      timeout 14400 python scripts/train_gamd.py --system lj \
        --use_layer_norm --data_dir md_dataset --extra_seeds 5 \
        --precompute_nbrs --batch_size 1 --max_epoch 30 --lr 3e-4 \
        --matmul_precision highest \
        --cp_dir model_ckpt_lj_r5 --checkpoint_every 5 $RA \
        >> results/lj_train_distill_r5c.log 2>&1
      echo "train rc=$?"
      commit_results "results: LJ distilled-frames training log (r5d)"
    fi
    CKL=$(latest_ckpt model_ckpt_lj_r5)
    CANDS=""
    if [ -f model_ckpt_lj_r5/best.msgpack ]; then
      eval_one lj model_ckpt_lj_r5/best.msgpack lj_eval_distill_best_r5 \
        md_dataset/lj_data
      CANDS="results/lj_eval_distill_best_r5.json:model_ckpt_lj_r5/best.msgpack"
    fi
    if [ -n "$CKL" ]; then
      eval_one lj "$CKL" lj_eval_distill_latest_r5 md_dataset/lj_data
      CANDS="$CANDS results/lj_eval_distill_latest_r5.json:$CKL"
    fi
    [ -n "$CANDS" ] && ship_winner lj_distill $CANDS
    commit_results "results: LJ distillation-arm evals + shipped ckpt (r5d)"
    if [ -f results/ckpts/lj_distill_latest.msgpack ]; then
      timeout 5400 python scripts/analyze_rollout.py --system lj \
        --ckpt results/ckpts/lj_distill_latest.msgpack \
        --data_dir md_dataset/lj_data \
        --steps 25000 --integrator nose_hoover --classical_baseline \
        --pe --pe_out results/lj_rdf_distill_r5_pe.tsv \
        --json_out results/lj_rdf_distill_r5.json \
        > results/lj_rdf_distill_r5.log 2>&1
      echo "rdf rc=$? $(head -c 300 results/lj_rdf_distill_r5.json 2>/dev/null)"
      commit_results "results: LJ distillation-trained eval + RDF + PE (r5d)"
    fi
  fi
fi
run_injected

echo "=== [1b] TIP3P DATASETS (chip) $(date)"
ensure_tip3p() {  # ensure_tip3p <last_file> [flags...]
  local last=$1; shift
  local log="results/gen_tip3p_${last%.npz}_r5d.log"
  if [ -f "md_dataset/water_data/$last" ]; then
    echo "water_data $last present"; return 0
  fi
  timeout 7200 python scripts/generate_data.py --system tip3p \
    --out md_dataset/water_data --frames 1000 --interval 50 "$@" \
    > "$log" 2>&1
  echo "gen tip3p($last) rc=$? $(tail -1 "$log")"
  commit_results "results: tip3p dataset generation log ($last, r5d)"
}
ensure_tip3p data_9_999.npz --seeds 10 --dispatch_frames 50
ensure_tip3p data_19_999.npz --seeds 10 --seed_start 10 --dispatch_frames 50
run_injected

echo "=== [2] TIP3P RIGID-JITTER FLAGSHIP $(date)"
if [ -f results/tip3p_rdf_rj_r5.json ]; then
  echo "flagship already measured — skip"
elif [ -f md_dataset/water_data/data_19_999.npz ]; then
  prep_resume tip3p_rj model_ckpt_tip3p_rj
  RA=$(resume_args tip3p_rj model_ckpt_tip3p_rj)
  echo "resume_args: '$RA'"
  SE=0; case "$RA" in *start_epoch*) SE=${RA##* };; esac
  if [ "$SE" -lt 30 ]; then
    timeout 21600 python scripts/train_gamd.py --system tip3p \
      --use_layer_norm --data_dir md_dataset --extra_seeds 10 \
      --relabel --rigid_jitter --jitter_sigma 0.02 --longrange \
      --precompute_nbrs --batch_size 1 --max_epoch 30 --lr 3e-4 \
      --cp_dir model_ckpt_tip3p_rj --checkpoint_every 2 $RA \
      >> results/tip3p_train_rj_r5c.log 2>&1
    echo "train rc=$?"
    commit_results "results: TIP3P rigid-jitter flagship training log (r5d)"
  fi
  CKL=$(latest_ckpt model_ckpt_tip3p_rj)
  CANDS=""
  if [ -f model_ckpt_tip3p_rj/best.msgpack ]; then
    eval_one tip3p model_ckpt_tip3p_rj/best.msgpack tip3p_rj_eval_best_r5 \
      md_dataset/water_data
    CANDS="results/tip3p_rj_eval_best_r5.json:model_ckpt_tip3p_rj/best.msgpack"
  fi
  if [ -n "$CKL" ]; then
    eval_one tip3p "$CKL" tip3p_rj_eval_latest_r5 md_dataset/water_data
    CANDS="$CANDS results/tip3p_rj_eval_latest_r5.json:$CKL"
  fi
  [ -n "$CANDS" ] && ship_winner tip3p_rj $CANDS
  commit_results "results: TIP3P rigid-jitter evals + shipped ckpt (r5d)"
  # f25 rollout RDF + classical-oracle PE on the overall TIP3P winner.
  WIN=$(python - <<'PYEOF'
import os
best = None
for tag in ("tip3p_rj", "tip3p_lr"):
    ck = f"results/ckpts/{tag}_latest.msgpack"
    prov = f"results/ckpts/{tag}_PROVENANCE.txt"
    if os.path.exists(ck) and os.path.exists(prov):
        try:
            mae = float(open(prov).read().split("eval_mae=")[1].split()[0])
        except (IndexError, ValueError):
            continue
        if best is None or mae < best[1]:
            best = (ck, mae)
print(best[0] if best else "")
PYEOF
)
  [ -f "$WIN" ] || WIN=results/ckpts/tip3p_lr_latest.msgpack
  if [ -f "$WIN" ]; then
    echo "--- f25 rollout on winner $WIN $(date)"
    timeout 7200 python scripts/analyze_rollout.py --system tip3p \
      --ckpt "$WIN" --data_dir md_dataset/water_data \
      --steps 25000 --integrator langevin --friction 25.0 \
      --classical_baseline --pe --pe_out results/tip3p_rdf_rj_r5_pe.tsv \
      --json_out results/tip3p_rdf_rj_r5.json \
      > results/tip3p_rdf_rj_r5.log 2>&1
    echo "rdf rc=$? $(head -c 300 results/tip3p_rdf_rj_r5.json 2>/dev/null)"
    commit_results "results: TIP3P f25 rollout RDF + PE, flagship ckpt (r5d)"
  fi
fi
run_injected

echo "=== [3] KERNEL PARITY $(date)"
if [ ! -f results/check_kernels_r5.log ] || \
   ! grep -qi "pass" results/check_kernels_r5.log; then
  timeout 2400 python scripts/check_kernels.py > results/check_kernels_r5.log 2>&1
  echo "parity rc=$? $(tail -1 results/check_kernels_r5.log)"
  timeout 2400 python scripts/check_kernels.py --water \
    > results/check_kernels_water_r5.log 2>&1
  echo "parity water rc=$? $(tail -1 results/check_kernels_water_r5.log)"
  GAMD_EDGE_HILO=0 timeout 2400 python scripts/check_kernels.py --water \
    > results/check_kernels_water_nohilo_r5.log 2>&1
  echo "parity water(nohilo) rc=$? $(tail -1 results/check_kernels_water_nohilo_r5.log)"
  commit_results "results: round-5 kernel parity (incl water edge_hilo A/B)"
fi
run_injected

echo "=== [4] HEADLINE BENCH $(date)"
if [ ! -f results/bench_r5.log ] || ! grep -q '^{' results/bench_r5.log; then
  timeout 3600 python bench.py > results/bench_r5.log 2>&1
  echo "bench rc=$? $(grep '^{' results/bench_r5.log | tail -1)"
  commit_results "results: round-5 headline bench"
fi
run_injected

echo "=== [5] LJ ANGULAR-FLOOR ARM (relmae from scratch) $(date)"
if [ -f results/lj_eval_relmae_r5.json ]; then
  echo "relmae arm already evaluated — skip"
elif [ -f md_dataset/lj_data/data_9_999.npz ]; then
  prep_resume lj_relmae model_ckpt_lj_relmae
  RA=$(resume_args lj_relmae model_ckpt_lj_relmae)
  SE=0; case "$RA" in *start_epoch*) SE=${RA##* };; esac
  if [ "$SE" -lt 30 ]; then
    timeout 10800 python scripts/train_gamd.py --system lj \
      --use_layer_norm --data_dir md_dataset \
      --precompute_nbrs --batch_size 1 --max_epoch 30 --lr 3e-4 \
      --loss relmae --matmul_precision highest \
      --cp_dir model_ckpt_lj_relmae --checkpoint_every 5 $RA \
      >> results/lj_train_relmae_r5.log 2>&1
    echo "train rc=$?"
    commit_results "results: LJ relmae-loss training log (r5d)"
  fi
  CKR=model_ckpt_lj_relmae/best.msgpack
  [ -f "$CKR" ] || CKR=$(latest_ckpt model_ckpt_lj_relmae)
  if [ -n "$CKR" ] && [ -f "$CKR" ]; then
    eval_one lj "$CKR" lj_eval_relmae_r5 md_dataset/lj_data
    cp "$CKR" results/ckpts/lj_relmae_loss_latest.msgpack
    commit_results "results: LJ relmae eval (angular-floor arm, r5d)"
  fi
fi
run_injected

echo "=== [6] TIP4P LONGRANGE ARM (opportunistic) $(date)"
if ls results/tip4p_lr_eval_*_r5.json >/dev/null 2>&1; then
  echo "TIP4P arm already evaluated — skip"
else
  if [ ! -f md_dataset/tip4p_data/data_9_999.npz ]; then
    timeout 10800 python scripts/generate_data.py --system tip4p \
      --out md_dataset/tip4p_data --frames 1000 --interval 50 \
      --seeds 10 --dispatch_frames 50 --electrostatics ewald \
      > results/gen_tip4p_r5d.log 2>&1
    echo "gen rc=$? $(tail -1 results/gen_tip4p_r5d.log)"
    commit_results "results: tip4p Ewald dataset generation log (r5d)"
  fi
  if [ -f md_dataset/tip4p_data/data_9_999.npz ]; then
    prep_resume tip4p_lr model_ckpt_tip4p_r5
    RA=$(resume_args tip4p_lr model_ckpt_tip4p_r5)
    SE=0; case "$RA" in *start_epoch*) SE=${RA##* };; esac
    if [ "$SE" -lt 30 ]; then
      timeout 21600 python scripts/train_gamd.py --system tip4p \
        --use_layer_norm --data_dir md_dataset --longrange \
        --precompute_nbrs --batch_size 1 --max_epoch 30 --lr 3e-4 \
        --cp_dir model_ckpt_tip4p_r5 --checkpoint_every 2 $RA \
        >> results/tip4p_train_lr_r5c.log 2>&1
      echo "train rc=$?"
      commit_results "results: TIP4P Ewald longrange training log (r5d)"
    fi
    CKL=$(latest_ckpt model_ckpt_tip4p_r5)
    CANDS=""
    if [ -f model_ckpt_tip4p_r5/best.msgpack ]; then
      eval_one tip4p model_ckpt_tip4p_r5/best.msgpack tip4p_lr_eval_best_r5 \
        md_dataset/tip4p_data
      CANDS="results/tip4p_lr_eval_best_r5.json:model_ckpt_tip4p_r5/best.msgpack"
    fi
    if [ -n "$CKL" ]; then
      eval_one tip4p "$CKL" tip4p_lr_eval_latest_r5 md_dataset/tip4p_data
      CANDS="$CANDS results/tip4p_lr_eval_latest_r5.json:$CKL"
    fi
    [ -n "$CANDS" ] && ship_winner tip4p_lr $CANDS
    commit_results "results: TIP4P longrange evals + shipped ckpt (r5d)"
  fi
fi
run_injected

echo "=== [7] TIP3P NHC MEGAKERNEL ROLLOUT RETRY (worker-fault risk; LAST) $(date)"
if [ ! -f results/water_nhc_rollout_r5.log ]; then
  WIN=results/ckpts/tip3p_rj_latest.msgpack
  [ -f "$WIN" ] || WIN=results/ckpts/tip3p_lr_latest.msgpack
  timeout 5400 python scripts/run_md.py --system tip3p --ckpt "$WIN" \
    --integrator nose_hoover --steps 25000 --megakernel \
    --log results/water_nhc_rollout_r5_thermo.tsv \
    > results/water_nhc_rollout_r5.log 2>&1
  echo "nhc rc=$? $(tail -2 results/water_nhc_rollout_r5.log | head -1)"
  commit_results "results: TIP3P NHC megakernel rollout retry (r5d)"
fi

echo "=== QUEUE R5D DONE $(date)"
