"""Layered-vs-flooding schedule A/B under the full bench protocol.

The static kernel's serial-C ("layered") schedule updates the variable
totals immediately after each block row, so later rows see fresh messages
within the same sweep — the standard production-decoder schedule,
converging in roughly half the sweeps of flooding at equal or better BER
(ops/pallas_static.py ``schedule="layered"``; opt-in because the
reference's decoders are all flooding, ldpc.py:288-324).

This measures what that is worth END TO END: the exact bench.py protocol
(near-earth, min-sum, max 50 iterations, fused transmit + staged cascade,
Eb/N0 sweep 3.0-3.6 dB) for a flooding baseline at the round-2 tuned
staging against layered cascades with proportionally shorter phase-1
budgets.  Trials interleave variants so tunnel/clock drift cancels, and
every trial uses distinct inputs (the tunnelled backend caches identical
(executable, input) calls).

Writes ``docs/layered_ab.json`` including an ``adopt`` verdict: layered
is recommended for the headline bench iff it is faster at 3.4 dB AND its
BER is within (or below) the flooding run's Monte-Carlo band at EVERY
point.  bench.py picks the recommendation up as its tuned default (env
overrides still win); the artifact is stamped with the kernel source
hash so a stale recommendation is ignored.

Run ON THE REAL CHIP:
    python scripts/layered_ab.py [--batch 32768] [--trials 3]
CPU smoke (timings meaningless):
    LDPC_TPU_PLATFORM=cpu python scripts/layered_ab.py --code wifi \
        --batch 256 --trials 1 --max-iters 12
"""

from __future__ import annotations

import argparse
import json
import math
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


def wilson(k: int, n: int) -> tuple[float, float]:
    """Wilson 95% interval (lo, hi) — canonical impl in sim/stats.py."""
    from ldpc_tpu.sim.stats import wilson_interval
    return wilson_interval(k, n)[1:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--snr", default="3.0,3.2,3.4,3.6")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--store", default="bfloat16")
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--code", default="near-earth",
                    help="near-earth (the production A/B) or wifi "
                         "(CPU smoke)")
    ap.add_argument("--out", default="/root/repo/docs/layered_ab.json")
    args = ap.parse_args()
    b = args.batch
    snrs = [float(s) for s in str(args.snr).split(",")]
    mi = args.max_iters

    from ldpc_tpu.codes import near_earth_code, wifi_code
    from ldpc_tpu.sim.evaluate import make_staged_sweep_device
    from ldpc_tpu.utils.provenance import kernel_source_hash

    code = wifi_code() if args.code == "wifi" else near_earth_code()

    def scale(fracs):
        # phase budgets as fractions of max_iters=50 reference values so
        # the wifi smoke (--max-iters 12) exercises the same flow
        return tuple(max(1, min(mi - 1, round(f * mi / 50))) for f in fracs)

    # caps as /16ths of the batch (bench.py reuses these fractions at its
    # own batch size)
    variants = [
        ("flooding", scale((12,)), (3,)),      # round-2 tuned baseline
        ("layered", scale((6,)), (3,)),        # ~2x faster convergence
        ("layered", scale((4, 12)), (6, 2)),   # short head + mid tail
    ]

    built = []
    for sched, phases, caps16 in variants:
        name = f"{sched}-p{'-'.join(map(str, phases))}"
        t0 = time.time()
        step = make_staged_sweep_device(
            code, mi, phase1_iters=list(phases),
            redo_capacity=[b * c // 16 for c in caps16],
            engine="pallas", schedule=sched,
            store_dtype=jnp.dtype(args.store))
        out = jax.device_get(step(jax.random.key(17),
                                  jnp.full((b,), snrs[-1], jnp.float32)))
        print(f"{name}: compiled+warm {time.time()-t0:.1f}s "
              f"nfail_final={int((out['success'] == 0).sum())}", flush=True)
        built.append((name, sched, phases, caps16, step))

    key = jax.random.key(7134066)
    results = {name: {} for name, *_ in built}
    for si, snr in enumerate(snrs):
        snr_arr = jnp.full((b,), snr, jnp.float32)
        pk = jax.random.fold_in(key, si)
        for name, _, _, _, step in built:   # untimed per-point warm pass
            jax.device_get(step(jax.random.fold_in(pk, 9999), snr_arr))
        acc = {name: dict(best=float("inf"), errs=0, frames=0, words=0,
                          iters=0.0) for name, *_ in built}
        for t in range(args.trials):
            for name, _, _, _, step in built:
                t0 = time.time()
                out = jax.device_get(step(jax.random.fold_in(pk, t),
                                          snr_arr))
                dt = time.time() - t0
                a = acc[name]
                a["best"] = min(a["best"], dt)
                # statistics from trial 0 only (identical keys across
                # variants -> identical channel draws, a paired BER test)
                if t == 0:
                    a["errs"] = int(out["errors_decoded"].sum())
                    a["frames"] = int((out["success"] == 0).sum())
                    a["words"] = b
                    a["iters"] = float(out["iterations"].mean())
                print(f"snr {snr} trial {t} {name:>16}: {dt*1e3:8.1f} ms",
                      flush=True)
        for name in results:
            a = acc[name]
            lo, hi = wilson(a["frames"], a["words"])
            results[name][str(snr)] = {
                "bit_per_s": b * code.n / a["best"],
                "ber": a["errs"] / (b * code.n),
                "fer": a["frames"] / a["words"],
                "fer_ci95": [lo, hi],
                "avg_iterations": a["iters"],
            }

    # ---- adoption verdict -------------------------------------------
    base = results[built[0][0]]
    target = str(3.4) if 3.4 in snrs else str(snrs[-1])
    candidates = []
    for name, sched, phases, caps16, _ in built[1:]:
        r = results[name]
        faster = r[target]["bit_per_s"] > base[target]["bit_per_s"]
        # BER parity: at every point the candidate's frame-error rate
        # must sit at or below the baseline's 95% upper band (same
        # channel draws -> paired comparison; bit BER tracks FER here)
        parity = all(
            r[str(s)]["fer"] <= base[str(s)]["fer_ci95"][1] + 1e-12
            for s in snrs)
        candidates.append((name, sched, phases, caps16, faster, parity,
                           r[target]["bit_per_s"]))
        print(f"{name}: faster@{target}={faster} ber_parity={parity} "
              f"{r[target]['bit_per_s']/1e6:.1f} Mbit/s "
              f"(baseline {base[target]['bit_per_s']/1e6:.1f})",
              flush=True)
    winners = [c for c in candidates if c[4] and c[5]]
    best = max(winners, key=lambda c: c[6]) if winners else None

    payload = {
        "code": args.code, "batch": b, "store": args.store,
        "max_iters": mi, "snr_points": snrs, "trials": args.trials,
        "kernel_hash": kernel_source_hash(),
        "baseline": built[0][0],
        "results": results,
        "adopt": best is not None,
    }
    if best is not None:
        payload["recommended"] = {
            "schedule": best[1], "phases": list(best[2]),
            "caps_16ths": list(best[3]),
        }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}  adopt={payload['adopt']}"
          + (f" -> {payload['recommended']}" if best else ""), flush=True)


if __name__ == "__main__":
    main()
