#!/bin/bash
# On-chip fusion-family TRAINING quality evidence (late round 5).
#
# Every prior on-chip training-quality run covered the point-only
# families (cls/semseg/partseg, fp32-vs-bf16 pairs); the fusion configs
# 4-5 — the north-star family bench.py serves — had only forward-path
# evidence (serving bench, export/daemon smokes) plus CPU convergence
# smokes.  This script trains both fusion tasks on the real chip with
# the r5 augmentation pipelines (fusion_cls = cls point augs;
# fusion_semseg = Z-rotation with extrinsics compensation) in both
# dtypes, matching the partseg-pair protocol (small synthetic sets,
# bn_momentum 0.5 for short-run eval sanity).
# Sequential — NEVER run two TPU jobs at once (CLAUDE.md).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for dt in float32 bfloat16; do
  timeout 2400 python train.py --model fusion_cls --epoch 12 \
    --batch_size 16 --train_size 256 --test_size 64 --bn_momentum 0.5 \
    --seed 0 --no_checkpoint --dtype $dt \
    --run_name r5_fus_cls_$dt 2>&1 | grep -E "final:|best"
done

for dt in float32 bfloat16; do
  timeout 2400 python train.py --model fusion_sem_seg --epoch 10 \
    --batch_size 8 --train_size 128 --test_size 32 --bn_momentum 0.5 \
    --seed 0 --no_checkpoint --dtype $dt \
    --run_name r5_fus_semseg_$dt 2>&1 | grep -E "final:|best"
done

# attention-fusion variants: convergence smoke (registry coverage)
timeout 1200 python train.py --model fusion_cls_attention --epoch 6 \
  --batch_size 16 --train_size 128 --test_size 32 --bn_momentum 0.5 \
  --seed 0 --no_checkpoint --run_name r5_fus_attn 2>&1 | grep -E "final:|best"
