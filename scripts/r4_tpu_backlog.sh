#!/bin/bash
# Round-4 on-chip backlog.  Runs the queued r3 validation first
# (VERDICT r4 item 1 — strictly first), then the r4 kernel races.
# Run when the TPU returns:  bash scripts/r4_tpu_backlog.sh
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# ---- r3 backlog (quality gates, sweeps, bf16 pairs, benches) ----
bash scripts/r3_tpu_validation.sh

# ---- r4: race v7 slab-select fused SA vs v4/v6 defaults ----
timeout 1800 python scripts/proto_sa_v7.py 2>&1 | grep -v WARNING | tail -8
MM3D_PROTO_DTYPE=float32 timeout 1800 python scripts/proto_sa_v7.py 2>&1 | grep -v WARNING | tail -8

# ---- r4: quantify the row-DMA gather lever ----
timeout 1200 python scripts/proto_dma_gather.py 2>&1 | grep -v WARNING | tail -6

# ---- r4: train-floor roofline closure (VERDICT item 3, route b) ----
timeout 1800 python scripts/roofline_train.py 2>&1 | grep -v WARNING | tail -8

# ---- r4: FPS interleave-depth sweep (post-v7, FPS is the next item) ----
timeout 1200 python scripts/proto_fps_v2.py 2 4 8 16 2>&1 | grep -v WARNING | tail -8

# ---- r4: fps_random_start on the pallas path (vector start on chip) ----
timeout 900 python train.py --model pointnet2_cls_ssg --epoch 2 --batch_size 16 \
  --train_size 64 --test_size 32 --bn_momentum 0.5 --seed 0 --no_checkpoint \
  --fps_random_start --run_name r4_fps_rand 2>&1 | grep final:
