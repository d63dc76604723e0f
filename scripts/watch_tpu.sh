#!/bin/bash
# Poll for the TPU's return during the axon relay outage (began
# 2026-08-17 20:01 UTC).  Exits 0 the moment a probe succeeds so the
# operator can run scripts/r5_tpu_backlog.sh; exits 1 if the deadline
# passes first.  Each probe is a bounded backend-init attempt — during
# the outage init hangs, so `timeout` kills it.
#
# Usage: bash scripts/watch_tpu.sh [max_hours]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
MAX_HOURS=${1:-11}
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  # nice -19: a probe must not skew suite/bench timings on the 1-core host.
  # the axon plugin registers the backend as 'axon' (run_tpu_checks.py
  # accepts both) — matching only 'tpu' would never fire
  if nice -n 19 timeout 120 python -c "import jax; assert jax.devices()[0].platform in ('tpu', 'axon')" 2>/dev/null; then
    echo "TPU BACK at $(date -u '+%Y-%m-%d %H:%M:%S UTC')"
    # capture the driver-visible essentials immediately (bench + quality
    # gates + sweep + v7 race, ~30-45 min) — the operator follows with
    # the full scripts/r5_tpu_backlog.sh
    bash scripts/r5_tpu_quick.sh > log/r5_quick_onchip.log 2>&1
    echo "r5_tpu_quick.sh done, log/r5_quick_onchip.log written"
    exit 0
  fi
  echo "probe failed at $(date -u '+%Y-%m-%d %H:%M:%S UTC'); sleeping 600s"
  sleep 600
done
echo "deadline passed; TPU never returned"
exit 1
