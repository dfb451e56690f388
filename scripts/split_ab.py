"""Same-session A/B: monolithic vs phase-split Pallas decoder.

Methodology mirrors scripts/sched_ab.py: one device session, distinct
inputs per trial, variants interleaved across trials so tunnel/clock
drift cancels, word-exactness asserted on a shared input before timing.

Run ON THE REAL CHIP:
    python scripts/split_ab.py [--batch 16384] [--mi 10] [--trials 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("LDPC_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["LDPC_TPU_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--mi", type=int, default=10)
    ap.add_argument("--snr", type=float, default=3.4)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--store", default="bfloat16")
    ap.add_argument("--code", default="near-earth")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--out", default="/root/repo/docs/split_ab.json")
    args = ap.parse_args()

    from ldpc_tpu.codes import near_earth_code, wifi_code
    from ldpc_tpu.ops.pallas_split import make_split_sweep_decoder
    from ldpc_tpu.ops.pallas_static import make_static_sweep_decoder
    from ldpc_tpu.sim.channel import transmit_zero_codeword

    code = wifi_code() if args.code == "wifi" else near_earth_code()
    sd = jnp.dtype(args.store)

    decs = {}
    for name, make in [("mono", make_static_sweep_decoder),
                       ("split", make_split_sweep_decoder)]:
        t0 = time.time()
        try:
            dec = make(code, max_iters=args.mi, store_dtype=sd,
                       interpret=args.interpret)
            noisy, _, _ = transmit_zero_codeword(
                jax.random.key(1000 + len(decs)), args.batch, code.n,
                args.snr)
            out = jax.device_get(dec(noisy))
        except Exception as e:  # noqa: BLE001 — compile-time rejection
            print(f"{name}: SKIPPED ({type(e).__name__}: {str(e)[:200]})",
                  flush=True)
            continue
        print(f"{name}: compiled+warm in {time.time()-t0:.1f} s, "
              f"nfail={int((~np.asarray(out[2]).astype(bool)).sum())}",
              flush=True)
        decs[name] = dec
    if len(decs) < 2:
        print("need both variants; nothing to compare", flush=True)
        return

    shared, _, _ = transmit_zero_codeword(jax.random.key(5), args.batch,
                                          code.n, args.snr)
    ref = [np.asarray(x) for x in jax.device_get(decs["mono"](shared))]
    got = [np.asarray(x) for x in jax.device_get(decs["split"](shared))]
    exact = all(np.array_equal(a, b) for a, b in zip(ref, got))
    print(f"shared-input exactness: "
          f"{'WORD-EXACT' if exact else 'MISMATCH'}", flush=True)
    if not exact:
        # Same gate as sched_ab: a broken split kernel must not produce
        # a citable timing artifact (advisor r3).
        print("ABORTING: timing is only meaningful for a word-exact "
              "variant; fix the split kernel first", flush=True)
        sys.exit(1)

    times = {n: [] for n in decs}
    for t in range(args.trials):
        for n, dec in decs.items():
            noisy, _, _ = transmit_zero_codeword(
                jax.random.key(7919 * t + (1 if n == "split" else 0)),
                args.batch, code.n, args.snr)
            noisy = jax.device_put(noisy)
            jax.device_get(noisy)
            t0 = time.time()
            jax.device_get(dec(noisy))
            dt = time.time() - t0
            times[n].append(dt)
            print(f"trial {t} {n:5s}: {dt*1e3:8.1f} ms", flush=True)

    ntile = max(1, args.batch // 128)
    print(f"\n== summary (best of trials, B={args.batch} mi={args.mi} "
          f"{args.store} @{args.snr:.1f} dB) ==")
    for n in decs:
        b = min(times[n])
        print(f"{n:5s}: best {b*1e3:8.1f} ms  "
              f"({b/args.mi/ntile*1e6:6.1f} us/128w-iter)  "
              f"vs mono: {b/min(times['mono']):.3f}x")

    if args.out and not args.interpret:
        from ldpc_tpu.utils.provenance import (kernel_source_hash,
                                               source_file_hash)
        art = {
            "context": {"batch": args.batch, "mi": args.mi,
                        "snr": args.snr, "code": args.code,
                        "store": args.store},
            "kernel_hash": kernel_source_hash(),
            # pallas_split.py is not in _KERNEL_SOURCES (adding it would
            # invalidate the recorded adoption artifacts), so the split
            # half of this A/B stamps its own hash (advisor r3)
            "split_kernel_hash": source_file_hash("ops/pallas_split.py"),
            "word_exact": bool(exact),
            "best_ms": {n: round(min(times[n]) * 1e3, 2) for n in decs},
            "speedup_split_vs_mono": round(
                min(times["mono"]) / min(times["split"]), 4),
        }
        with open(args.out, "w") as f:
            json.dump(art, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
