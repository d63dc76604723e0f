#!/bin/bash
# Round-5 remaining on-chip backlog — everything r5_tpu_quick.sh did NOT
# already capture on 2026-08-19 (quick captured: bench 14,893 clouds/s,
# run_tpu_checks ALL PASSED, shape_sweep [1 FP VMEM fail, since fixed],
# proto_sa_v7 bf16 race [v7 loses 0.32-0.52x]).
# Sequential — NEVER run two TPU jobs at once (CLAUDE.md).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# ---- 0. shape sweep re-run: confirms the fused-FP VMEM-model fix makes
#         every shape green (warm cache: only the fixed shape recompiles)
timeout 2400 python scripts/shape_sweep.py 2>&1 | grep -v WARNING | tail -24

# ---- 1. r4: v7 fp32 race (bf16 already captured: v7 loses) ----
MM3D_PROTO_DTYPE=float32 timeout 1800 python scripts/proto_sa_v7.py 2>&1 | grep -v WARNING | tail -8

# ---- 2. r3: semseg bf16 production guard == measured sa1-f32 bisection run
timeout 1200 python train.py --model pointnet2_sem_seg --npoint 2048 --epoch 15 \
  --batch_size 8 --train_size 128 --test_size 32 --bn_momentum 0.5 --seed 0 \
  --no_checkpoint --dtype bfloat16 --run_name r3_ss_guard_final 2>&1 | grep final:

# ---- 3. r3: partseg bf16-vs-fp32 pair (last family without measured bf16 quality)
timeout 1200 python train.py --model pointnet2_part_seg_ssg --npoint 1024 --epoch 12 \
  --batch_size 8 --train_size 128 --test_size 32 --bn_momentum 0.5 --seed 0 \
  --no_checkpoint --run_name r3_ps_fp32 2>&1 | grep final:
timeout 1200 python train.py --model pointnet2_part_seg_ssg --npoint 1024 --epoch 12 \
  --batch_size 8 --train_size 128 --test_size 32 --bn_momentum 0.5 --seed 0 \
  --no_checkpoint --dtype bfloat16 --run_name r3_ps_bf16 2>&1 | grep final:

# ---- 4. r3: train bench ----
timeout 1800 python scripts/bench_train.py --json 2>/dev/null | tail -1

# ---- 5. r4: quantify the row-DMA gather lever ----
timeout 1200 python scripts/proto_dma_gather.py 2>&1 | grep -v WARNING | tail -6

# ---- 6. r4: train-floor roofline closure (VERDICT r3 item 3, route b) ----
timeout 1800 python scripts/roofline_train.py 2>&1 | grep -v WARNING | tail -10

# ---- 7. r4: FPS interleave-depth sweep ----
timeout 1200 python scripts/proto_fps_v2.py 2 4 8 16 2>&1 | grep -v WARNING | tail -8

# ---- 8. r4: fps_random_start on the pallas path (vector start on chip)
timeout 900 python train.py --model pointnet2_cls_ssg --epoch 2 --batch_size 16 \
  --train_size 64 --test_size 32 --bn_momentum 0.5 --seed 0 --no_checkpoint \
  --fps_random_start --run_name r4_fps_rand 2>&1 | grep final:
