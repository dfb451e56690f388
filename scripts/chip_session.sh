#!/bin/bash
# One-shot TPU session: run the round's on-chip work queue in wedge-risk
# order (familiar compiles first, novel ones last) with per-step
# timeouts, so a mid-session tunnel wedge still leaves the earlier
# artifacts on disk.  Each step logs to docs/chip_session_r2.log.
#
#   bash scripts/chip_session.sh
set -u
cd /root/repo
LOG=docs/chip_session_r2.log
: > "$LOG"

wait_tunnel() {
  # Up to ~7 min of quick probes: a re-wedged tunnel must not burn every
  # remaining step's full timeout.  Returns 0 when the device answers.
  for i in 1 2 3; do
    if timeout 60 python -c "import jax, jax.numpy as jnp; jax.device_get(jnp.ones((8,128)).sum())" >/dev/null 2>&1; then
      return 0
    fi
    echo "    (tunnel probe $i failed $(date -u +%H:%M:%S))" | tee -a "$LOG"
    sleep 120
  done
  return 1
}

step() {
  local name="$1" tmo="$2"; shift 2
  if ! wait_tunnel; then
    echo "=== $name SKIPPED: tunnel dead ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
    return 0
  fi
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $name exit=$rc ($(date -u +%H:%M:%S)) ---" | tee -a "$LOG"
  # a wedge means everything later hangs too, but the per-step timeout
  # lets later CHEAP steps still try after the tunnel self-recovers
  return 0
}

# 0. probe
step probe 60 python -c "import jax, jax.numpy as jnp; print(float(jax.device_get(jnp.sum(jnp.ones((8,128))))))"

# 1. the headline bench (familiar kernel shapes; must work at round end)
step bench 1500 python bench.py

# 1b. deep error-floor sweep (identical kernel shapes to bench — cheap)
step error_floor 1800 python scripts/error_floor.py

# 2. staging cascade grid (new mi budgets: 6/8/16)
step staging_grid 2400 python scripts/staging_grid.py --trials 3

# 3. int8 message-memory study (novel int8 kernel compile)
step quantized_ber 1800 python scripts/quantized_ber.py

# 4. wifi sum-product pallas waterfall (novel but small kernels)
step wifi_pallas 1800 python scripts/wifi_waterfall.py --engine pallas --words 8192

# 5. scheduling A/B (novel barrier kernels, biggest wedge risk — last):
#    dep_stride x tile_b cartesian; tile 256 doubles the live set and may
#    be rejected at compile time by the scoped-VMEM ceiling (safe).
step sched_ab 3300 python scripts/sched_ab.py --strides 0,4 --tile-bs 128,256 --trials 3

echo "ALL DONE $(date -u)" | tee -a "$LOG"
