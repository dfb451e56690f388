"""Same-session A/B of Pallas kernel scheduling variants (ROADMAP item 1).

Measures the near-earth static kernel's whole-batch decode time for a list
of ``dep_stride`` values (rotation-hoist denial via optimization_barrier,
see ops/pallas_static.py) in ONE device session, interleaving the variants
across trials so tunnel/clock drift cancels.  Distinct inputs per trial
(the tunnelled backend caches identical (executable, input) calls).

Run ON THE REAL CHIP:
    python scripts/sched_ab.py [--strides 0,4,8] [--batch 16384] [--mi 10]
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
    ap.add_argument("--strides", default="0,4,8")
    ap.add_argument("--tile-bs", default="128",
                    help="comma list of kernel codeword tiles (lane axis, "
                         "multiples of 128); live set scales with tile, so "
                         "this is a second scheduling lever")
    ap.add_argument("--popcounts", default="0",
                    help="comma list of 0/1: derive the CN sign product "
                         "from the packed edge-sign bits (popcount parity) "
                         "instead of a stored plane — drops one VMEM plane "
                         "+ one per-edge select; bit-identical outputs")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--mi", type=int, default=10)
    ap.add_argument("--snr", type=float, default=3.4)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--store", default="bfloat16")
    ap.add_argument("--code", default="near-earth",
                    help="near-earth (the production A/B) or wifi")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke of the whole script flow (interpret-"
                         "mode kernels; timings meaningless)")
    ap.add_argument("--out", default="/root/repo/docs/sched_ab.json",
                    help="merging JSON artifact (bench.py adopts its "
                         "recommendation); empty string disables")
    args = ap.parse_args()
    strides = [int(s) for s in args.strides.split(",")]
    tiles = [int(t) for t in args.tile_bs.split(",")]
    pops = [bool(int(p)) for p in args.popcounts.split(",")]
    # variants = cartesian (stride, tile, popcount); tile 128 / stored-sign
    # first (familiar compile)
    variants = [(s, t, p) for p in pops for t in tiles for s in strides]

    from ldpc_tpu.codes import near_earth_code, wifi_code
    from ldpc_tpu.ops.pallas_static import make_static_sweep_decoder
    from ldpc_tpu.sim.channel import transmit_zero_codeword

    # Preflight: does optimization_barrier lower in Mosaic on this
    # jaxlib?  A [8,128] probe costs seconds; the near-earth kernel
    # compile costs minutes and has wedged the tunnel before.  When it
    # does NOT lower, stride>0 variants still run — the kernel builder
    # falls back to the value-exact mul-0 data-edge gate (see
    # ops/pallas_static.py:_barrier_lowers).
    from ldpc_tpu.ops.pallas_static import _barrier_lowers

    gate = "barrier" if (args.interpret or _barrier_lowers()) else "mul0"
    print(f"preflight: dep_stride gate = {gate}", flush=True)

    code = wifi_code() if args.code == "wifi" else near_earth_code()
    store = jnp.dtype(args.store)

    decs = {}
    for v in variants:
        s, tb, pc = v
        t0 = time.time()
        try:
            dec = make_static_sweep_decoder(code, max_iters=args.mi,
                                            store_dtype=store, dep_stride=s,
                                            tile_b=tb, popcount_sign=pc,
                                            interpret=args.interpret)
            # compile + warm with a distinct input
            noisy, _, _ = transmit_zero_codeword(
                jax.random.key(1000 + s + 31 * tb + 997 * pc), args.batch,
                code.n, args.snr)
            out = jax.device_get(dec(noisy))
        except Exception as e:  # noqa: BLE001 — e.g. a bigger tile's
            # schedule rejected by the scoped-VMEM ceiling (compile-time
            # failure, safe); keep the surviving variants comparable.
            print(f"stride {s} tile {tb} pop {pc:d}: SKIPPED "
                  f"({type(e).__name__}: {str(e)[:160]})", flush=True)
            continue
        print(f"stride {s} tile {tb} pop {pc:d}: compiled+warm in "
              f"{time.time()-t0:.1f} s, "
              f"nfail={int((~out[2].astype(bool)).sum())}", flush=True)
        decs[v] = dec
    variants = [v for v in variants if v in decs]
    if not variants:
        print("no variant compiled; nothing to measure", flush=True)
        return

    # shared-input exactness: every variant must be value-identical on
    # chip (dep_stride is a pure scheduling barrier; tile size only
    # regroups lanes and words are lane-independent — the tile-level
    # all_done predication skips work only when every lane has latched;
    # popcount-sign recomputes the same sign product from the same bits).
    shared, _, _ = transmit_zero_codeword(jax.random.key(5), args.batch,
                                          code.n, args.snr)
    ref = jax.device_get(decs[variants[0]](shared))
    exact = {variants[0]: True}
    for v in variants[1:]:
        out = jax.device_get(decs[v](shared))
        same = all(np.array_equal(a, b) for a, b in zip(ref, out))
        exact[v] = bool(same)
        print(f"stride {v[0]} tile {v[1]} pop {v[2]:d} exactness vs "
              f"{variants[0]}: "
              f"{'BIT-IDENTICAL' if same else 'MISMATCH'}", flush=True)

    times = {v: [] for v in variants}
    fails = {v: [] for v in variants}
    for t in range(args.trials):
        for v in variants:
            s, tb, pc = v
            noisy, _, _ = transmit_zero_codeword(
                jax.random.key(7919 * t + s + 31 * tb + 997 * pc + 1),
                args.batch, code.n, args.snr)
            noisy = jax.device_put(noisy)
            jax.device_get(noisy)          # stage input before timing
            t0 = time.time()
            out = jax.device_get(decs[v](noisy))
            dt = time.time() - t0
            times[v].append(dt)
            fails[v].append(int((~out[2].astype(bool)).sum()))
            print(f"trial {t} stride {s} tile {tb} pop {pc:d}: "
                  f"{dt*1e3:8.1f} ms  nfail={fails[v][-1]}", flush=True)

    print("\n== summary (best of trials, B=%d mi=%d %s @%.1f dB) ==" %
          (args.batch, args.mi, args.store, args.snr))
    base = min(times[variants[0]])
    for v in variants:
        s, tb, pc = v
        b = min(times[v])
        ntile = max(1, args.batch // 128)  # us/tile-iter per 128 words
        print(f"stride {s:3d} tile {tb:4d} pop {pc:d}: best {b*1e3:8.1f} ms"
              f"  ({b/args.mi/ntile*1e6:6.1f} us/128w-iter)  "
              f"vs {variants[0]}: {b/base:.3f}x  "
              f"nfail={sorted(set(fails[v]))}")

    if args.out and not args.interpret:
        write_artifact(args, variants, times, fails, exact)


def write_artifact(args, variants, times, fails, exact):
    """Merge this run's measurements into the tuning artifact.

    ``bench.py`` adopts the recommendation (fastest bit-identical
    bfloat16 variant, >=2% over the default levers) when the artifact's
    kernel hash matches the current sources — the round-end driver bench
    then runs the tuned configuration without env overrides.  int8
    entries are recorded for the log but never auto-recommended: the
    storage dtype changes numerics, so its adoption is adjudicated by
    the BER study (scripts/quantized_ber.py), not a timing A/B.
    """
    import json

    from ldpc_tpu.utils.provenance import kernel_source_hash

    khash = kernel_source_hash()
    context = {"batch": args.batch, "mi": args.mi, "snr": args.snr,
               "code": args.code}
    art = {"context": context, "kernel_hash": khash, "entries": {}}
    try:
        with open(args.out) as f:
            old = json.load(f)
        if old.get("kernel_hash") == khash and old.get("context") == context:
            art["entries"] = old.get("entries", {})
        else:
            print(f"artifact {args.out}: stale kernel/context, resetting",
                  flush=True)
    except (OSError, ValueError):
        pass
    for v in variants:
        s, tb, pc = v
        key = f"s{s}_t{tb}_p{int(pc)}_{args.store}"
        b = min(times[v])
        art["entries"][key] = {
            "dep_stride": s, "tile_b": tb, "popcount_sign": bool(pc),
            "store": args.store, "best_ms": round(b * 1e3, 2),
            "us_per_128w_iter": round(
                b / args.mi / max(1, args.batch // 128) * 1e6, 2),
            "exact": exact[v], "trials": args.trials,
            "nfail": sorted(set(fails[v])),
        }
    default_key = "s0_t128_p0_bfloat16"
    default = art["entries"].get(default_key)
    cands = [e for e in art["entries"].values()
             if e["store"] == "bfloat16" and e["exact"]]
    art["adopt"] = False
    if default and cands:
        best = min(cands, key=lambda e: e["best_ms"])
        speedup = default["best_ms"] / best["best_ms"]
        art["recommended"] = {
            "dep_stride": best["dep_stride"], "tile_b": best["tile_b"],
            "popcount_sign": best["popcount_sign"],
            "speedup_vs_default": round(speedup, 4),
        }
        art["adopt"] = bool(
            speedup >= 1.02 and (best["dep_stride"], best["tile_b"],
                                 best["popcount_sign"]) != (0, 128, False))
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"wrote {args.out} (adopt={art['adopt']}"
          + (", recommended=%s" % art["recommended"]
             if art.get("recommended") else "") + ")", flush=True)


if __name__ == "__main__":
    main()
