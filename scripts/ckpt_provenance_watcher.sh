#!/bin/bash
# Side-car watcher: record WHICH epoch the committed *_latest.msgpack
# checkpoints correspond to, so a cut-short training run can be resumed
# next session with --state_ckpt_dir + --start_epoch (the stage-3/6
# watchers inside round5_queue.sh copy checkpoints but drop the epoch).
# Safe to run alongside the queue: commit retries through index-lock
# races just like the queue's commit_results.
cd "$(dirname "$0")/.."
mkdir -p results/ckpts
while true; do
  sleep 120
  for PAIR in "model_ckpt_tip3p_r5 tip3p_lr" "model_ckpt_lj_r5 lj_distill" \
              "model_ckpt_tip4p_r5 tip4p_lr"; do
    set -- $PAIR
    D=$1 TAG=$2
    CK=$(ls "$D"/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
    [ -n "$CK" ] || continue
    B=$(basename "$CK")
    F="results/ckpts/${TAG}_RESUME.txt"
    if [ ! -f "$F" ] || [ "$(cat "$F")" != "$B" ]; then
      echo "$B" > "$F"
      # also snapshot the ckpt+scaler for tags the queue's own watcher
      # does not cover (lj_distill/tip4p_lr only get shipped at stage end)
      if [ "$TAG" != tip3p_lr ]; then
        cp "$CK" "results/ckpts/${TAG}_latest.msgpack"
        SC="$D/scaler_$(echo "$B" | sed 's/checkpoint_\([0-9]*\).msgpack/\1/').npz"
        [ -f "$SC" ] && cp "$SC" "results/ckpts/${TAG}_scaler.npz"
      fi
      for i in 1 2 3 4 5; do
        git add results/ckpts && \
          git commit -m "results: ${TAG} in-train checkpoint snapshot ($B)" \
          >/dev/null 2>&1 && break
        sleep $((i * 3))
      done
      echo "snapshot ${TAG} $B $(date)"
    fi
  done
done
