#!/bin/bash
# Resolve the open partseg bf16 question (BASELINE.md r5 on-chip table):
# seed-0 showed a 3.4-pt final-mIoU gap (fp32 0.716 vs bf16 0.682) —
# single-seed noise or a real partseg bf16 island?  Same config, seed 1.
# Sequential — NEVER run two TPU jobs at once (CLAUDE.md).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 1500 python train.py --model pointnet2_part_seg_ssg --npoint 1024 --epoch 12 \
  --batch_size 8 --train_size 128 --test_size 32 --bn_momentum 0.5 --seed 1 \
  --no_checkpoint --run_name r5_ps_fp32_s1 2>&1 | grep final:
timeout 1500 python train.py --model pointnet2_part_seg_ssg --npoint 1024 --epoch 12 \
  --batch_size 8 --train_size 128 --test_size 32 --bn_momentum 0.5 --seed 1 \
  --no_checkpoint --dtype bfloat16 --run_name r5_ps_bf16_s1 2>&1 | grep final:
