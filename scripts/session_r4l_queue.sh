#!/bin/bash
# r4j follow-on 2: the ROLLOUT-DISTILLATION RDF attack, in-round.
# r4j settled the mechanism (stale-jitter regularization; exact relabel
# worsens RDF), so supervise on the model's own rollout distribution:
# distill GNN-rollout frames labeled by the classical oracle, retrain at
# the r3e recipe (the RDF champion) + the distilled extra frames, then
# eval + RDF. Water NHC megakernel-path retry last (3 prior faults).
#   nohup bash scripts/session_r4l_queue.sh > /tmp/queue_r4l.log 2>&1 &
#   echo $! > /tmp/queue_r4l.pid
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

echo "=== [A] LJ ROLLOUT DISTILLATION (5 trajectories) $(date)"
if [ ! -f md_dataset/lj_data/data_14_999.npz ]; then
  timeout 7200 python scripts/distill_rollout.py --system lj \
    --ckpt results/ckpts/lj_relabel_latest.msgpack \
    --out md_dataset/lj_data \
    --seeds 5 --seed_start 10 --frames 1000 --interval 50 \
    > results/lj_distill_r4l.log 2>&1
  echo "stepA rc=$? $(tail -1 results/lj_distill_r4l.log)"
  commit_results "results: LJ rollout-distillation generation log (r4l)"
fi

echo "=== [B] LJ RETRAIN: r3e recipe + distilled frames $(date)"
if [ -f md_dataset/lj_data/data_14_999.npz ]; then
  (
    while true; do
      sleep 300
      CK=$(ls model_ckpt_lj_r4l/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
      if [ -n "$CK" ] && ! cmp -s "$CK" results/ckpts/lj_distill_latest.msgpack 2>/dev/null; then
        cp "$CK" results/ckpts/lj_distill_latest.msgpack
        SC=$(ls model_ckpt_lj_r4l/scaler_*.npz 2>/dev/null | sort -V | tail -1)
        [ -n "$SC" ] && cp "$SC" results/ckpts/lj_distill_scaler.npz
        echo "r4l r3e-recipe + 5 distilled seeds: $CK" \
          > results/ckpts/lj_distill_PROVENANCE.txt
        commit_results "results: LJ distillation train checkpoint ($(basename "$CK"))"
      fi
    done
  ) &
  W=$!
  timeout 10800 python scripts/train_gamd.py --system lj --batch_size 1 \
    --max_epoch 30 --use_layer_norm --precompute_nbrs \
    --matmul_precision highest --extra_seeds 5 \
    --cp_dir ./model_ckpt_lj_r4l > results/lj_train_distill_r4l.log 2>&1
  echo "stepB rc=$? $(tail -2 results/lj_train_distill_r4l.log | head -1)"
  kill $W 2>/dev/null
  commit_results "results: LJ distillation training log (r4l)"

  CKL=$(ls model_ckpt_lj_r4l/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
  [ -z "$CKL" ] && CKL=results/ckpts/lj_distill_latest.msgpack
  if [ -f "$CKL" ]; then
    cp "$CKL" results/ckpts/lj_distill_latest.msgpack
    SC=$(ls model_ckpt_lj_r4l/scaler_*.npz 2>/dev/null | sort -V | tail -1)
    [ -n "$SC" ] && cp "$SC" results/ckpts/lj_distill_scaler.npz

    echo "=== [C] LJ EVAL (distill ckpt) $(date)"
    timeout 1800 python scripts/evaluate.py --system lj --ckpt "$CKL" \
      --data_dir md_dataset/lj_data --json_out results/lj_eval_distill_r4l.json \
      > results/lj_eval_distill_r4l.log 2>&1
    echo "stepC rc=$? $(head -c 300 results/lj_eval_distill_r4l.json 2>/dev/null)"
    commit_results "results: LJ distillation eval (r4l)"

    echo "=== [D] LJ RDF 25k NHC ROLLOUT (distill ckpt) $(date)"
    timeout 5400 python scripts/analyze_rollout.py --system lj \
      --ckpt "$CKL" --data_dir md_dataset/lj_data \
      --steps 25000 --integrator nose_hoover --classical_baseline \
      --json_out results/lj_rdf_distill_r4l.json > results/lj_rdf_distill_r4l.log 2>&1
    echo "stepD rc=$? $(head -c 300 results/lj_rdf_distill_r4l.json 2>/dev/null)"
    commit_results "results: LJ RDF rollout with distillation ckpt (r4l)"
  fi
fi

echo "=== [E] TIP3P NHC 25k RETRY (megakernel force path) $(date)"
timeout 3600 python scripts/run_md.py --system tip3p \
  --ckpt results/ckpts/tip3p_final.msgpack \
  --integrator nose_hoover --steps 25000 --megakernel \
  --log results/log_water_nhc_mk_r4l.txt \
  > results/water_nhc_mk_r4l.log 2>&1
echo "stepE rc=$? $(grep 'steps/s' results/water_nhc_mk_r4l.log)"
commit_results "results: TIP3P NHC 25k rollout retry on megakernel path (r4l)"

echo "=== QUEUE R4L DONE $(date)"
