#!/bin/bash
# Round-3 pending on-chip validation (queued during the 2026-08-17 axon
# relay outage).  Run when the TPU returns:  bash scripts/r3_tpu_validation.sh
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# 1. kernel parity + whole-model gates
timeout 1800 python scripts/run_tpu_checks.py 2>&1 | grep -v WARNING | tail -12
# 2. shape sweep (now incl. fused-FP shapes)
timeout 1800 python scripts/shape_sweep.py 2>&1 | grep -v WARNING | tail -12
# 3. semseg bf16 production guard == the measured sa1-f32 bisection run
timeout 900 python train.py --model pointnet2_sem_seg --npoint 2048 --epoch 15 \
  --batch_size 8 --train_size 128 --test_size 32 --bn_momentum 0.5 --seed 0 \
  --no_checkpoint --dtype bfloat16 --run_name r3_ss_guard_final 2>&1 | grep final:
# 4. partseg bf16-vs-fp32 pair (last family without measured bf16 quality)
timeout 900 python train.py --model pointnet2_part_seg_ssg --npoint 1024 --epoch 12 \
  --batch_size 8 --train_size 128 --test_size 32 --bn_momentum 0.5 --seed 0 \
  --no_checkpoint --run_name r3_ps_fp32 2>&1 | grep final:
timeout 900 python train.py --model pointnet2_part_seg_ssg --npoint 1024 --epoch 12 \
  --batch_size 8 --train_size 128 --test_size 32 --bn_momentum 0.5 --seed 0 \
  --no_checkpoint --dtype bfloat16 --run_name r3_ps_bf16 2>&1 | grep final:
# 5. train bench + serving bench
timeout 1800 python scripts/bench_train.py --json 2>/dev/null | tail -1
timeout 1200 python bench.py 2>/dev/null | tail -1
