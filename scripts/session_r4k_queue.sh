#!/bin/bash
# r4j follow-on: fire AFTER /tmp/queue_r4j.log prints QUEUE R4J DONE.
#   nohup bash scripts/session_r4k_queue.sh > /tmp/queue_r4k.log 2>&1 &
#   echo $! > /tmp/queue_r4k.pid
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

echo "=== [A] TIP3P NHC 25k RETRY (megakernel force path) $(date)"
# The per-step XLA NHC water program faulted the worker three times
# (r3 x2, r4j stepE). The megakernel per-step path is a different device
# program and is also the faster deployment; chain math stays in XLA.
timeout 3600 python scripts/run_md.py --system tip3p \
  --ckpt results/ckpts/tip3p_final.msgpack \
  --integrator nose_hoover --steps 25000 --megakernel \
  --log results/log_water_nhc_mk_r4k.txt \
  > results/water_nhc_mk_r4k.log 2>&1
echo "stepA rc=$? $(grep 'steps/s' results/water_nhc_mk_r4k.log)"
commit_results "results: TIP3P NHC 25k rollout retry on megakernel path (r4k)"

echo "=== QUEUE R4K DONE $(date)"
