"""One-process grid over staged-decode cascades (2-stage vs 3-stage).

The round-2 grid tuned the classic two-phase decode (p1=12, cap=3B/16,
B=32k -> 659 Mbit/s @3.4 dB).  The N-stage cascade (sim/evaluate.py
``phase1_iters`` sequence) can trim the phase-1 waste further: most
words converge by ~7-10 iterations at the operating point, so a short
first stage plus a mid-budget second stage lets the easy majority exit
early while only the hard tail pays 50.

All configs run in ONE device session with distinct inputs per trial
(the tunnelled backend caches identical calls; cross-process comparisons
also pay per-process compile).  Each config is a different executable,
so schedule-quality variance applies — use several trials and compare
best-of (round-2 method).

Run ON THE REAL CHIP:
    python scripts/staging_grid.py [--batch 32768] [--snr 3.4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("LDPC_TPU_PLATFORM"):
    # sitecustomize registers the tunnelled backend before JAX_PLATFORMS
    # is honoured; the config route still works (see ldpc_tpu/cli.py)
    jax.config.update("jax_platforms", os.environ["LDPC_TPU_PLATFORM"])
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--snr", type=float, default=3.4)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--store", default="bfloat16")
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--code", default="near-earth",
                    help="near-earth (production grid) or wifi (CPU smoke)")
    args = ap.parse_args()
    b = args.batch

    from ldpc_tpu.codes import near_earth_code, wifi_code
    from ldpc_tpu.sim.evaluate import (_transmit_fn,
                                       make_staged_decoder_device)

    code = wifi_code() if args.code == "wifi" else near_earth_code()
    transmit = _transmit_fn(code.n, scale_llr=False)

    # Re-tune on the ADOPTED kernel configuration: reuse bench.py's
    # resolvers so the grid measures the same schedule + bit-identical
    # levers the headline bench will run (env overrides still win there;
    # the phases/caps the cascade resolver returns are ignored — the
    # cascade IS what this grid searches).
    import bench
    schedule, _, _ = bench.resolve_cascade("pallas", b)
    levers = {k: v for k, v in bench.resolve_levers("pallas").items()
              if v is not None}
    print(f"grid kernel config: schedule={schedule} levers={levers}",
          flush=True)

    # (phases, caps) — caps in words, rounded to the 128 tile inside.
    # Each distinct iteration budget is a separate ~2-6 min kernel
    # compile, so the grid reuses budgets: {6, 8, 12, 16, 50}.
    configs = [
        ((12,), (b * 3 // 16,)),              # round-2 tuned baseline
        ((6, 16), (b * 3 // 8, b // 8)),      # short head, mid tail
        ((8, 16), (b * 5 // 16, b // 8)),
        ((6, 12), (b * 3 // 8, b * 3 // 16)),
    ]

    built = []
    for phases, caps in configs:
        t0 = time.time()
        dec = make_staged_decoder_device(
            code, args.max_iters, phase1_iters=list(phases),
            redo_capacity=list(caps), engine="pallas",
            schedule=schedule, **levers,
            store_dtype=jnp.dtype(args.store))
        llr, _, _, _ = transmit(jax.random.key(hash(phases) % 2**31),
                                jnp.full((b,), args.snr, jnp.float32))
        out = jax.device_get(dec(llr))
        print(f"{phases}/{caps}: compiled+warm {time.time()-t0:.1f}s "
              f"nfail_final={int((~out[2].astype(bool)).sum())}",
              flush=True)
        built.append((phases, caps, dec))

    times = {i: [] for i in range(len(built))}
    for t in range(args.trials):
        for i, (phases, caps, dec) in enumerate(built):
            key = jax.random.fold_in(jax.random.key(101 + t), i)
            llr, _, _, _ = transmit(key,
                                    jnp.full((b,), args.snr, jnp.float32))
            llr = jax.device_put(llr)
            jax.device_get(llr)
            t0 = time.time()
            jax.device_get(dec(llr))
            dt = time.time() - t0
            times[i].append(dt)
            print(f"trial {t} cfg {phases}: {dt*1e3:8.1f} ms", flush=True)

    print(f"\n== summary (decode-only, B={b} @{args.snr} dB, "
          f"{args.store}) ==")
    for i, (phases, caps, _) in enumerate(built):
        best = min(times[i])
        print(f"{str(phases):>10} caps {str(caps):>16}: "
              f"best {best*1e3:8.1f} ms  "
              f"{b * code.n / best / 1e6:7.1f} Mbit/s")


if __name__ == "__main__":
    main()
