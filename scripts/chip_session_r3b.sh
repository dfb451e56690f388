#!/bin/bash
# Round-3 follow-up TPU session: the scheduling A/Bs that died in the
# first session (optimization_barrier not lowerable -> mul-0 gate
# fallback; int8 arith.subi -> f32 negate fix), then the adoption-aware
# re-bench, a fresh kernel-hash-stamped BER-parity artifact, and the
# wide-window RL search with whatever time remains.
#
#   bash scripts/chip_session_r3b.sh [start_step]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
LOG=docs/chip_session_r3b.log
START=${1:-0}
touch "$LOG"

wait_tunnel() {
  for i in 1 2 3; do
    if timeout 60 python -c "import jax, jax.numpy as jnp; jax.device_get(jnp.ones((8,128)).sum())" >/dev/null 2>&1; then
      return 0
    fi
    echo "    (tunnel probe $i failed $(date -u +%H:%M:%S))" | tee -a "$LOG"
    sleep 120
  done
  return 1
}

N=0
step() {
  local name="$1" tmo="$2"; shift 2
  N=$((N+1))
  if [ "$N" -le "$START" ]; then return 0; fi
  if ! wait_tunnel; then
    echo "=== $name SKIPPED: tunnel dead ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
    return 0
  fi
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $name exit=$rc ($(date -u +%H:%M:%S)) ---" | tee -a "$LOG"
  # `git add docs <missing-file>` adds NOTHING when any pathspec is
  # absent (the r3a session lost every auto-commit to this) — add each
  # pathspec separately.
  git add docs 2>/dev/null
  [ -f BENCH_r03.json ] && git add BENCH_r03.json 2>/dev/null
  git diff --cached --quiet || git commit -q -m "chip session r3b: $name artifacts (exit=$rc)"
  return 0
}

# 1. popcount-sign A/B (one new kernel compile on the familiar tile-128
#    flooding shape; bit-identical outputs by construction)
step sched_ab_pop 2400 python scripts/sched_ab.py --strides 0 --tile-bs 128 --popcounts 0,1 --trials 4

# 2. dep_stride x tile_b A/B (mul-0 gate; tile 256 may be compile-
#    rejected by the scoped-VMEM ceiling — the script skips those)
step sched_ab 3300 python scripts/sched_ab.py --strides 0,4,8 --tile-bs 128,256 --trials 3

# 3. int8 storage x tile A/B (first hardware compile of the int8 path
#    post-fix; recorded only — adoption is adjudicated by step 4)
step sched_ab_int8 2400 python scripts/sched_ab.py --strides 0 --tile-bs 128,256 --store int8 --trials 3

# 4. int8 message-memory BER study -> adoption verdict for bench.py
step quantized_ber 1800 python scripts/quantized_ber.py

# 5. headline bench: adopts docs/sched_ab.json + docs/quantized_ber.json
#    recommendations while their kernel hashes are fresh
step bench 2400 python bench.py

# 6. refresh the BER-parity artifact so its kernel-hash stamp matches
#    the final round-3 kernel sources (bench warns on mismatch)
step ber_parity 2400 python scripts/ber_parity.py --words 16384

# 7. wide-window RL search (longest step; interrupted in r3a — uses
#    only bench-familiar decode shapes)
step rl_search_wide 7200 python scripts/rl_search_wide.py

echo "ALL DONE $(date -u)" | tee -a "$LOG"
