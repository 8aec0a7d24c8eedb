#!/bin/bash
# Side-car watcher for in-flight training runs (wipe-proofing).
#
# Every 2 min, for each (cp_dir, tag, train_log) triple:
#   * snapshot the newest checkpoint_N.msgpack -> results/ckpts/<tag>_latest
#     + RESUME marker (epoch) so a cut run resumes next session;
#   * snapshot cp_dir/best.msgpack -> results/ckpts/<tag>_best.msgpack
#     (ADVICE r4: latest-only persistence loses the best model when a run
#     diverges past its val minimum);
#   * include the TRAINING LOG in the same commit (ADVICE r4: a committed
#     checkpoint without its log breaks best-epoch selection after a wipe);
#   * AMEND the previous snapshot commit for the same tag instead of
#     appending a new ~8 MB blob commit every cadence (ADVICE r4: history
#     bloat) — a fresh commit is only created when other work landed on
#     HEAD in between.
cd "$(dirname "$0")/.."
mkdir -p results/ckpts

snapshot() {  # snapshot <cp_dir> <tag> <train_log>
  local D=$1 TAG=$2 LOG=$3 CK B SC CHANGED=0
  CK=$(ls "$D"/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
  if [ -n "$CK" ]; then
    B=$(basename "$CK")
    if [ ! -f "results/ckpts/${TAG}_RESUME.txt" ] || \
       [ "$(cat "results/ckpts/${TAG}_RESUME.txt")" != "$B" ]; then
      cp "$CK" "results/ckpts/${TAG}_latest.msgpack"
      echo "$B" > "results/ckpts/${TAG}_RESUME.txt"
      SC="$D/scaler_${B#checkpoint_}"; SC="${SC%.msgpack}.npz"
      [ -f "$SC" ] && cp "$SC" "results/ckpts/${TAG}_scaler.npz"
      CHANGED=1
    fi
  fi
  if [ -f "$D/best.msgpack" ] && \
     ! cmp -s "$D/best.msgpack" "results/ckpts/${TAG}_best.msgpack"; then
    cp "$D/best.msgpack" "results/ckpts/${TAG}_best.msgpack"
    [ -f "$D/scaler_best.npz" ] && \
      cp "$D/scaler_best.npz" "results/ckpts/${TAG}_best_scaler.npz"
    [ -f "$D/best_val.txt" ] && \
      cp "$D/best_val.txt" "results/ckpts/${TAG}_best_val.txt"
    CHANGED=1
  fi
  [ "$CHANGED" = 1 ] || return 0
  local MSG="results: ${TAG} train snapshot (rolling; $B)"
  local PREV_MSG AMEND=""
  PREV_MSG=$(git log -1 --format=%s 2>/dev/null)
  case "$PREV_MSG" in
    "results: ${TAG} train snapshot (rolling;"*) AMEND="--amend" ;;
  esac
  for i in 1 2 3 4 5; do
    git add results/ckpts "$LOG" 2>/dev/null
    git commit $AMEND -m "$MSG" >/dev/null 2>&1 && break
    sleep $((i * 3))
  done
  echo "snapshot ${TAG} ${B:-best-only} (amend=${AMEND:-no}) $(date)"
}

while true; do
  sleep 120
  snapshot model_ckpt_tip3p_rj tip3p_rj results/tip3p_train_rj_r5c.log
  snapshot model_ckpt_lj_r5 lj_distill results/lj_train_distill_r5c.log
  snapshot model_ckpt_lj_relmae lj_relmae results/lj_train_relmae_r5.log
  snapshot model_ckpt_tip4p_r5 tip4p_lr results/tip4p_train_lr_r5c.log
done
