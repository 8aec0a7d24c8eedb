#!/bin/bash
# Session r4f follow-on: pair-bias diagnostics once the r4f queue frees
# the chip. Fire AFTER /tmp/queue_r4f.log prints QUEUE R4F DONE:
#   nohup bash scripts/session_r4g_queue.sh > /tmp/queue_r4g.log 2>&1 &
#   echo $! > /tmp/queue_r4g.pid
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
mkdir -p results

commit_results() {
  for i in 1 2 3 4 5; do
    git add -A results && git commit -m "$1" >/dev/null 2>&1 && break
    sleep $((i * 3))
  done
  echo "committed: $1"
}

echo "=== [F] PAIR-FORCE BIAS b(r): r3e ckpt vs cosft ckpt vs nojit ckpt $(date)"
# Three checkpoints with KNOWN rollout RDF behavior (r3e L2 0.078,
# cosft L2 0.090, nojit = stage E if run): if the over-structure is a
# distance-dependent bias, du(r) at the LJ minimum should rank the
# same way the RDF L2 does.
for PAIR in "r3e results/ckpts/lj_highest_latest.msgpack" \
            "cosft results/ckpts/lj_cosft_latest.msgpack" \
            "nojit results/ckpts/lj_nojit_latest.msgpack"; do
  set -- $PAIR
  TAG=$1; CK=$2
  [ -f "$CK" ] || continue
  timeout 1800 python scripts/analyze_pair_bias.py --ckpt "$CK" \
    --data_dir md_dataset/lj_data --max_frames 200 \
    --json_out "results/pair_bias_${TAG}_r4f.json" \
    > "results/pair_bias_${TAG}_r4f.log" 2>&1
  echo "stepF $TAG rc=$? $(grep du_at_min results/pair_bias_${TAG}_r4f.log)"
done
commit_results "results: pair-distance-resolved force bias, three LJ ckpts (r4f)"

echo "=== [G] RIGID-WATER ROLLOUT PERF: XLA vs per-step megakernel $(date)"
# VERDICT #6b: committed steps/s for the rigid-water Langevin rollout —
# the path the water demo actually runs on. A/B the per-step megakernel
# (parity evidence: check_kernels --water) against the XLA force path
# at the reference rollout protocol (f=25/ps, 25k steps, 774 atoms).
CKW=results/ckpts/tip3p_final.msgpack
if [ -f "$CKW" ]; then
  timeout 3600 python scripts/run_md.py --system tip3p --ckpt "$CKW" \
    --integrator langevin --friction 25.0 --steps 25000 \
    --log results/log_water_xla_r4f.txt \
    > results/water_rollout_perf_xla_r4f.log 2>&1
  echo "stepG-xla rc=$? $(grep 'steps/s' results/water_rollout_perf_xla_r4f.log)"
  timeout 3600 python scripts/run_md.py --system tip3p --ckpt "$CKW" \
    --integrator langevin --friction 25.0 --steps 25000 --megakernel \
    --log results/log_water_mk_r4f.txt \
    > results/water_rollout_perf_mk_r4f.log 2>&1
  echo "stepG-mk rc=$? $(grep 'steps/s' results/water_rollout_perf_mk_r4f.log)"
  commit_results "results: rigid-water Langevin rollout perf, XLA vs megakernel (r4f)"
fi

echo "=== QUEUE R4G DONE $(date)"
