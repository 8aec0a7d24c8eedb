#!/bin/bash
# Round-4 chip queue (prepared at the end of round 3 while the TPU tunnel
# was down). Fire with:
#   nohup bash scripts/round4_queue.sh > /tmp/queue_r4.log 2>&1 &
#   echo $! > /tmp/queue_r4.pid
# One TPU job at a time; every step is wall-clock bounded.
#
# NOTE (learned the hard way in round 3):
#  - PYTHONPATH must keep /root/.axon_site or the axon backend vanishes.
#  - kill the bash CHILD (ps ax | grep round4_queue) and its python
#    descendants by explicit pid — killing the launcher wrapper leaves
#    this script running and a relaunch races it on the chip.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site

echo "=== [0] BENCH_MXU truth run (carry-threaded loop + calibration) $(date)"
timeout 2400 python scripts/bench_mxu.py --iters 200 > /tmp/bench_mxu_r4.log 2>&1
echo "step0 rc=$? $(grep calibration /tmp/bench_mxu_r4.log)"
timeout 1500 python scripts/bench_mxu.py --iters 200 --tile_n 136 \
  > /tmp/bench_mxu_r4_t136.log 2>&1
echo "step0b rc=$? (tile 136 = production bench tile)"

echo "=== [1] CHECK_KERNELS $(date)"
timeout 1200 python scripts/check_kernels.py > /tmp/check_kernels_r4.log 2>&1
echo "step1 rc=$? $(tail -n 1 /tmp/check_kernels_r4.log)"

echo "=== [2] BENCH (tile 136 default) $(date)"
timeout 2400 python bench.py > /tmp/bench_r4.log 2>&1
echo "step2 rc=$? $(tail -n 1 /tmp/bench_r4.log)"

echo "=== [3] BANDED N=32768 (vmem-limit fix) $(date)"
timeout 1800 python scripts/bench_large.py --sizes 1000 --gnn_size 0 \
  --gnn_banded_sizes 32768 > /tmp/bench_banded_32k.log 2>&1
echo "step3 rc=$? $(grep '^{' /tmp/bench_banded_32k.log | tail -1)"

echo "=== [3b] NHC REPLICA BENCH (fused chain path, r3 feature) $(date)"
timeout 1800 bash -c 'GAMD_BENCH_INTEGRATOR=nose_hoover python scripts/bench_replicas.py 8 500' \
  > /tmp/bench_replicas_nhc_r4.log 2>&1
echo "step3b rc=$? $(grep '^{' /tmp/bench_replicas_nhc_r4.log | tail -1)"

echo "=== [4] TIP3P NHC ROLLOUT (faulted twice in r3 on worker errors) $(date)"
CKPT=$(ls model_ckpt_tip3p_r3/checkpoint_*.msgpack | sort -V | tail -1)
timeout 2400 python scripts/analyze_rollout.py --system tip3p --ckpt "$CKPT" \
  --data_dir md_dataset/water_data --steps 25000 --integrator nose_hoover \
  --classical_baseline --json_out /tmp/tip3p_r4_rdf_nhc.json
echo "step4 rc=$?"

echo "=== [5] DFT f25 1e5-STEP STABILITY (killed at r3 round end) $(date)"
CKD=$(ls model_ckpt_dft_r3/checkpoint_*.msgpack | sort -V | tail -1)
timeout 1800 python scripts/run_md.py --system dft --ckpt "$CKD" \
  --integrator langevin --friction 25.0 --steps 100000 \
  --log /tmp/log_nvt_dft_r4_f25.txt
echo "step5 rc=$?"

echo "=== [6] LJ TRAIN b1x30 HIGHEST PRECISION (VERDICT #5) $(date)"
time timeout 10800 python scripts/train_gamd.py --system lj --batch_size 1 \
  --max_epoch 30 --use_layer_norm --precompute_nbrs \
  --matmul_precision highest \
  --cp_dir ./model_ckpt_lj_r4 > /tmp/lj_train_r4.log 2>&1
echo "step6 rc=$?"
CKL=$(ls model_ckpt_lj_r4/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CKL" ]; then
  timeout 1200 python scripts/evaluate.py --system lj --ckpt "$CKL" \
    --data_dir md_dataset/lj_data --json_out /tmp/lj_r4_eval.json
  echo "step6b rc=$?"
fi

echo "=== [7] TIP3P TRAIN b1x60 EXTENDED ANNEAL $(date)"
time timeout 14400 python scripts/train_gamd.py --system tip3p --batch_size 1 \
  --max_epoch 60 --use_layer_norm --precompute_nbrs \
  --cp_dir ./model_ckpt_tip3p_r4 > /tmp/t3_train_r4.log 2>&1
echo "step7 rc=$?"
CK3=$(ls model_ckpt_tip3p_r4/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CK3" ]; then
  timeout 1500 python scripts/evaluate.py --system tip3p --ckpt "$CK3" \
    --data_dir md_dataset/water_data --json_out /tmp/tip3p_r4_eval.json
  echo "step7b rc=$?"
  timeout 3600 python scripts/analyze_rollout.py --system tip3p --ckpt "$CK3" \
    --data_dir md_dataset/water_data --steps 25000 --integrator langevin \
    --friction 25.0 --classical_baseline \
    --json_out /tmp/tip3p_r4_rdf_f25.json
  echo "step7c rc=$?"
fi

echo "=== [8] TIP4P TRAIN b1x60 EXTENDED ANNEAL $(date)"
time timeout 14400 python scripts/train_gamd.py --system tip4p --batch_size 1 \
  --max_epoch 60 --use_layer_norm --precompute_nbrs \
  --cp_dir ./model_ckpt_tip4p_r4 > /tmp/t4_train_r4.log 2>&1
echo "step8 rc=$?"
CK4=$(ls model_ckpt_tip4p_r4/checkpoint_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$CK4" ]; then
  timeout 1500 python scripts/evaluate.py --system tip4p --ckpt "$CK4" \
    --data_dir md_dataset/tip4p_data --json_out /tmp/tip4p_r4_eval.json
  echo "step8b rc=$?"
fi

echo "=== QUEUE R4 DONE $(date)"
