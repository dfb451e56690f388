"""int8 message-memory study: BER cost + throughput vs bf16/f32 storage.

Hardware LDPC decoders store messages in 6-8 bit fixed point; the Pallas
kernel's ``store_dtype=jnp.int8`` reproduces that (Q4.3 quantize-on-store,
ops/pallas_static.py).  This measures what the quantization costs in BER
across the near-earth waterfall and what the halved VMEM live set buys in
speed, writing ``docs/quantized_ber.{json,md}``.

Run ON THE REAL CHIP:
    python scripts/quantized_ber.py [--words 32768]
"""

from __future__ import annotations

import argparse
import os
import json
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


def adjudicate(results, snr_points, words):
    """Adoption verdict (mirrors layered_ab.py's role for the schedule).

    int8 may replace bfloat16 as the bench storage dtype only if, at
    EVERY point, its frame-error rate lies within the bf16 run's 95%
    Wilson CI (frames are iid; bits within a frame are not) and its BER
    does not exceed 1.1x where bf16 BER is nonzero (nor appear where
    bf16 is clean), AND it is faster at the 3.4 dB operating point.
    bench.py applies the verdict only under the flooding schedule —
    int8 x layered is a numerics combination no study has adjudicated.
    Stamps the kernel source hash so a stale verdict is ignored.
    """
    results["adopt"] = False
    if {"bfloat16", "int8"} <= set(results["stores"]):
        bf = results["stores"]["bfloat16"]
        i8 = results["stores"]["int8"]

        def wilson(k, n, z=1.96):
            p = k / n
            d = 1 + z * z / n
            c = p + z * z / (2 * n)
            h = z * ((p * (1 - p) + z * z / (4 * n)) / n) ** 0.5
            return (c - h) / d, (c + h) / d

        ok = True
        for pb, pi in zip(bf, i8):
            lo, hi = wilson(round(pb["fer"] * words), words)
            ok &= lo <= pi["fer"] <= hi
            if pb["ber"] > 0:
                ok &= pi["ber"] <= 1.1 * pb["ber"]
            else:
                ok &= pi["ber"] == 0
        op = min(range(len(snr_points)),
                 key=lambda i: abs(snr_points[i] - 3.4))
        faster = i8[op]["mbit_s"] > bf[op]["mbit_s"]
        results["adopt"] = bool(ok and faster)
        results["ber_within_band"] = bool(ok)
        results["faster_at_operating_point"] = bool(faster)
        if results["adopt"]:
            results["recommended"] = {"store_dtype": "int8"}
    from ldpc_tpu.utils.provenance import kernel_source_hash
    results["kernel_hash"] = kernel_source_hash()
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=32768)
    ap.add_argument("--snr", type=float, nargs="+",
                    default=[3.0, 3.2, 3.4, 3.6])
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--stores", nargs="+", default=["bfloat16", "int8"])
    ap.add_argument("--code", default="near-earth",
                    help="near-earth (production study) or wifi (CPU smoke)")
    ap.add_argument("--no-write", action="store_true",
                    help="skip writing docs/ artifacts (smoke runs)")
    args = ap.parse_args()
    b = args.words

    from ldpc_tpu.codes import near_earth_code, wifi_code
    from ldpc_tpu.sim.evaluate import (_transmit_fn,
                                       make_staged_decoder_device)

    code = wifi_code() if args.code == "wifi" else near_earth_code()
    transmit = _transmit_fn(code.n, scale_llr=False)
    key = jax.random.key(411)

    results: dict = {"words": b, "max_iters": args.max_iters, "stores": {}}
    for store in args.stores:
        dec = make_staged_decoder_device(
            code, args.max_iters, phase1_iters=12,
            redo_capacity=max(128, b * 3 // 16), engine="pallas",
            store_dtype=jnp.dtype(store))
        pts = []
        for snr in args.snr:
            # identical noise per (snr) across stores: same key
            llr, _, _, unc = transmit(
                jax.random.fold_in(key, int(snr * 10)),
                jnp.full((b,), snr, jnp.float32))
            llr = jax.device_put(llr)
            jax.device_get(llr)
            t0 = time.time()
            errs, iters, ok = map(np.asarray,
                                  jax.device_get(dec(llr)))
            dt = time.time() - t0
            pts.append({
                "snr_db": snr,
                "ber": float(errs.sum()) / (b * code.n),
                "fer": float(((errs > 0) | ~ok.astype(bool)).mean()),
                "avg_iters": float(iters.mean()),
                "mbit_s": b * code.n / dt / 1e6,
                "decode_s": dt,
            })
            print(f"[{store}] snr {snr}: BER {pts[-1]['ber']:.3e} "
                  f"FER {pts[-1]['fer']:.4f} {pts[-1]['mbit_s']:.0f} "
                  f"Mbit/s", flush=True)
        results["stores"][store] = pts

    adjudicate(results, args.snr, b)
    print(f"adopt={results['adopt']}", flush=True)

    if not args.no_write:
        with open("/root/repo/docs/quantized_ber.json", "w") as f:
            json.dump(results, f, indent=1)

    md = ["# int8 fixed-point message memory vs floating storage",
          "",
          f"{args.code} (n={code.n}), min-sum, max {args.max_iters} "
          f"iterations, {b} words/point, device-staged Pallas kernel, "
          "identical noise per point across storage dtypes.  int8 = "
          "Q4.3 quantize-on-store (step 1/8, saturate +-15.875) — the "
          "production-ASIC message format (ops/pallas_static.py).",
          "", "| store | " + " | ".join(
              f"BER@{s} | FER@{s} | Mbit/s@{s}" for s in args.snr) + " |",
          "|---|" + "---|" * (3 * len(args.snr))]
    for store, pts in results["stores"].items():
        cells = " | ".join(
            f"{p['ber']:.2e} | {p['fer']:.4f} | {p['mbit_s']:.0f}"
            for p in pts)
        md.append(f"| {store} | {cells} |")
    if not args.no_write:
        with open("/root/repo/docs/quantized_ber.md", "w") as f:
            f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
