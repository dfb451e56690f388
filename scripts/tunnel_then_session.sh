#!/bin/bash
# Poll the tunnelled TPU with a trivial op; when it answers, run the
# round's on-chip work queue.  Gives up after ~10h.
#
#   bash scripts/tunnel_then_session.sh [session_script] [start_step]
set -u
cd /root/repo
SESSION=${1:-scripts/chip_session_r3.sh}
START=${2:-0}
LOG=/tmp/tunnel_then_session.log
: > "$LOG"
for i in $(seq 1 200); do
  echo "probe $i $(date -u +%H:%M:%S)" >> "$LOG"
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jax.device_get(jnp.sum(jnp.ones((8,128))))))" >> "$LOG" 2>&1; then
    echo "TUNNEL ALIVE $(date -u +%H:%M:%S) — starting $SESSION" >> "$LOG"
    bash "$SESSION" "$START" >> "$LOG" 2>&1
    echo "SESSION DONE $(date -u +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
  sleep 180
done
echo "GAVE UP $(date -u +%H:%M:%S)" >> "$LOG"
exit 1
