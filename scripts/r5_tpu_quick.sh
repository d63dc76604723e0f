#!/bin/bash
# SHORT-FORM on-chip essentials (~30-45 min) for when the TPU returns
# late in a round: capture the driver-visible evidence FIRST, then, if
# time remains, run the full backlog (scripts/r5_tpu_backlog.sh).
#
#   1. bench.py            — the north-star JSON line (BENCH_r05 material)
#   2. run_tpu_checks.py   — kernel parity + whole-model quality gates
#   3. shape_sweep.py      — every kernel compiles + is exact at every
#                            model shape (incl. v7 + fused_sa_idx)
#   4. proto_sa_v7.py      — the one unraced kernel thesis (bf16 race)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 1200 python bench.py 2>/dev/null | tail -1
timeout 1800 python scripts/run_tpu_checks.py 2>&1 | grep -v WARNING | tail -12
timeout 1800 python scripts/shape_sweep.py 2>&1 | grep -v WARNING | tail -12
timeout 1800 python scripts/proto_sa_v7.py 2>&1 | grep -v WARNING | tail -8
