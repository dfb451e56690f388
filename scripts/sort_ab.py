"""Same-session A/B: straggler-aware sorted tiling vs unsorted (r4).

A Pallas tile runs until ALL 128 of its words converge, so one straggler
charges 127 converged lanemates full sweeps.  ``sort_words`` orders each
batch by uncoded error count before tiling (bit-identical per-word
outputs — permutation invariance), letting easy tiles exit early and
making stragglers share tiles.  This measures it at the bench
configuration (fused transmit + staged cascade, bf16, flooding).

Methodology mirrors scripts/sched_ab.py: one device session, distinct
inputs per trial, variants interleaved so tunnel/clock drift cancels,
word-exactness asserted on a shared input BEFORE timing (timing aborts
on mismatch).  Writes docs/sort_ab.json; bench.py adopts sort_words when
the artifact recommends it and is fresh (kernel-hash-stamped).

Run ON THE REAL CHIP:
    python scripts/sort_ab.py [--batch 32768] [--trials 4]
CPU smoke:
    LDPC_TPU_PLATFORM=cpu python scripts/sort_ab.py --batch 64 --mi 8 \
        --phases 4 --code wifi --trials 1
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
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--mi", type=int, default=50)
    ap.add_argument("--phases", default="12")
    ap.add_argument("--snrs", type=float, nargs="+",
                    default=[3.0, 3.2, 3.4, 3.6])
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--code", default="near-earth")
    ap.add_argument("--adopt-threshold", type=float, default=1.02,
                    help="adopt when the 3.4 dB speedup exceeds this")
    ap.add_argument("--out", default="/root/repo/docs/sort_ab.json")
    args = ap.parse_args()

    from ldpc_tpu.codes import near_earth_code, wifi_code
    from ldpc_tpu.sim.evaluate import make_staged_sweep_device

    on_cpu = os.environ.get("LDPC_TPU_PLATFORM") == "cpu"
    code = wifi_code() if args.code == "wifi" else near_earth_code()
    phases = [int(p) for p in args.phases.split(",") if int(p) < args.mi]
    caps = [max(128, args.batch * 3 // 16)] * len(phases)

    steps = {}
    for name, sort in [("unsorted", False), ("sorted", True)]:
        t0 = time.time()
        steps[name] = make_staged_sweep_device(
            code, args.mi, phase1_iters=phases, redo_capacity=caps,
            engine="pallas", sort_words=sort)
        out = jax.device_get(steps[name](
            jax.random.key(1), jnp.full((args.batch,), args.snrs[0],
                                        jnp.float32)))
        print(f"{name}: compiled+warm in {time.time() - t0:.1f} s "
              f"(nfail={int((~out['success'].astype(bool)).sum())})",
              flush=True)

    # exactness gate: shared key, every output array must be identical
    shared = jax.random.key(5)
    snr_mid = jnp.full((args.batch,), args.snrs[len(args.snrs) // 2],
                       jnp.float32)
    ref = jax.device_get(steps["unsorted"](shared, snr_mid))
    got = jax.device_get(steps["sorted"](shared, snr_mid))
    exact = all(np.array_equal(np.asarray(ref[k]), np.asarray(got[k]))
                for k in ref)
    print(f"shared-input exactness: "
          f"{'WORD-EXACT' if exact else 'MISMATCH'}", flush=True)
    if not exact:
        print("ABORTING: sort_words must be bit-identical", flush=True)
        sys.exit(1)

    results = {}
    for snr in args.snrs:
        times = {n: [] for n in steps}
        for t in range(args.trials):
            for n, step in steps.items():
                # deterministic per (trial, variant, snr) — Python hash()
                # is PYTHONHASHSEED-randomized and would make the artifact
                # non-reproducible (sched_ab/split_ab use integer keys too)
                key = jax.random.fold_in(
                    jax.random.key(7919 * t + (1 if n == "sorted" else 0)),
                    int(round(snr * 100)))
                t0 = time.time()
                jax.device_get(step(
                    key, jnp.full((args.batch,), snr, jnp.float32)))
                times[n].append(time.time() - t0)
        b_u, b_s = min(times["unsorted"]), min(times["sorted"])
        results[str(snr)] = {
            "unsorted_s": round(b_u, 4), "sorted_s": round(b_s, 4),
            "speedup": round(b_u / b_s, 4),
            "unsorted_bit_per_s": round(args.batch * code.n / b_u, 1),
            "sorted_bit_per_s": round(args.batch * code.n / b_s, 1),
        }
        print(f"@{snr}: unsorted {b_u * 1e3:8.1f} ms  sorted "
              f"{b_s * 1e3:8.1f} ms  speedup {b_u / b_s:.3f}x "
              f"({args.batch * code.n / b_s / 1e6:,.1f} Mbit/s sorted)",
              flush=True)

    head = results.get("3.4") or results[str(args.snrs[len(args.snrs) // 2])]
    adopt = bool(head["speedup"] >= args.adopt_threshold)
    print(f"\nrecommendation: sort_words={'ADOPT' if adopt else 'no'} "
          f"(headline speedup {head['speedup']}x, threshold "
          f"{args.adopt_threshold}x)", flush=True)

    if args.out and not on_cpu:
        from ldpc_tpu.utils.provenance import kernel_source_hash
        art = {
            "context": {"batch": args.batch, "mi": args.mi,
                        "phases": phases, "code": args.code,
                        "trials": args.trials},
            "kernel_hash": kernel_source_hash(),
            "word_exact": True,
            "points": results,
            "speedup_sorted_vs_unsorted": head["speedup"],
            "adopt": adopt,
        }
        with open(args.out, "w") as f:
            json.dump(art, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
