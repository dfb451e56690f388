"""802.11n rate-family sum-product waterfall (VERDICT #6 / BASELINE #2).

Sweeps all four n=1944 WiFi rates (1/2, 2/3, 3/4, 5/6) with the XLA
sum-product decoder (the reference ships only the rate-5/6 table and a
min-sum CUDA decoder, wifiMatrices.py:6-9 / wifiCUDA.py) and writes the
waterfall artifact to ``docs/wifi_waterfall.{json,md,png}``.

SNR convention matches the reference channel (ldpc.py:51-60): sigma =
sqrt(0.5 / SNR) with SNR in dB, i.e. an Es/N0-style axis NOT normalized by
rate — the same axis its near-earth plots use, so curves of different
rates are directly comparable to reference-style plots.

Run on the real chip:  python scripts/wifi_waterfall.py [--words 4096]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=4096)
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--kind", default="sum-product")
    ap.add_argument("--engine", default="xla", choices=["xla", "pallas"],
                    help="pallas = the VMEM sum-product kernel "
                         "(per-edge phi stash); ~10x on hardware")
    ap.add_argument("--out-prefix", default="wifi_waterfall",
                    help="artifact basename under docs/ (smoke runs should "
                         "redirect, e.g. /tmp/wifi_smoke)")
    args = ap.parse_args()

    import jax
    import os
    if os.environ.get("LDPC_TPU_PLATFORM"):
        # sitecustomize registers the tunnelled backend before
        # JAX_PLATFORMS is honoured; the config route still works
        jax.config.update("jax_platforms", os.environ["LDPC_TPU_PLATFORM"])
    import jax.numpy as jnp

    from ldpc_tpu.analysis.plots import pam2_ber, plot_snr_vs_ber
    from ldpc_tpu.codes import wifi_code
    from ldpc_tpu.codes.wifi import wifi_rates
    from ldpc_tpu.ops.decoder import decoder_for_code
    from ldpc_tpu.sim.evaluate import _transmit_fn, make_staged_decoder_device

    # lower rates converge at lower SNR on this un-normalized axis
    # (grids tuned so each rate's waterfall is visible: first measured
    # sweep showed rate 1/2 and 2/3 already at BER 0 by 0.5/1.0 dB)
    snr_grids = {
        0.5: [-1.0, -0.5, 0.0, 0.5, 1.0],
        2 / 3: [0.0, 0.5, 1.0, 1.5],
        0.75: [1.0, 1.5, 2.0, 2.5],
        5 / 6: [2.0, 2.5, 3.0, 3.5, 4.0],
    }

    def out_path(ext):
        pre = args.out_prefix
        base = pre if "/" in pre else f"/root/repo/docs/{pre}"
        return f"{base}.{ext}"

    key = jax.random.key(80211)
    results: dict = {"words": args.words, "max_iters": args.max_iters,
                     "kind": args.kind, "rates": {}}
    curves = {}
    t0 = time.time()
    for rate in wifi_rates():
        code = wifi_code(rate=rate)
        transmit = _transmit_fn(code.n, scale_llr=(args.kind ==
                                                   "sum-product"))
        if args.engine == "pallas":
            staged = make_staged_decoder_device(
                code, args.max_iters, kind=args.kind, engine="pallas",
                store_dtype=jnp.float32)
        else:
            dec = decoder_for_code(code, max_iters=args.max_iters,
                                   kind=args.kind)
        pts = []
        for snr in snr_grids[min(snr_grids,
                                 key=lambda r: abs(r - rate))]:
            snr_arr = jnp.full((args.words,), float(snr), jnp.float32)
            llr, _, _, unc = transmit(
                jax.random.fold_in(key, int(rate * 100) * 100 +
                                   int(snr * 10)), snr_arr)
            if args.engine == "pallas":
                errs, iters, ok = map(np.asarray, jax.device_get(
                    staged(llr)))
            else:
                res = dec(llr)
                errs, iters, ok = map(np.asarray, jax.device_get(
                    (res.hard.sum(axis=1), res.iterations, res.success)))
            pts.append({
                "snr_db": snr,
                "ber": float(errs.sum()) / (args.words * code.n),
                "fer": float((errs > 0).mean()),
                "uncoded_ber": float(jax.device_get(jnp.sum(unc))) / (
                    args.words * code.n),
                "avg_iters": float(iters.mean()),
            })
            print(f"[wifi] rate {rate:.3f} snr {snr:.1f}: "
                  f"BER {pts[-1]['ber']:.3e} FER {pts[-1]['fer']:.4f} "
                  f"iters {pts[-1]['avg_iters']:.1f}",
                  file=sys.stderr, flush=True)
        results["rates"][f"{rate:.4f}"] = pts
        curves[rate] = ([p["snr_db"] for p in pts],
                        [p["ber"] for p in pts])
    results["elapsed_s"] = time.time() - t0

    with open(out_path("json"), "w") as f:
        json.dump(results, f, indent=1)

    # combined plot (waterfalls per rate vs uncoded PAM-2)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 5))
        grid = np.linspace(-1.0, 4.0, 60)
        ax.semilogy(grid, np.maximum(pam2_ber(grid), 1e-12), "k--",
                    label="uncoded PAM-2")
        for rate, (xs, ys) in sorted(curves.items()):
            ax.semilogy(xs, np.maximum(ys, 1e-7), marker="o",
                        label=f"rate {rate:.3g}")
        ax.set_xlabel("SNR (dB)")
        ax.set_ylabel("BER")
        ax.set_title(f"802.11n n=1944 {args.kind}, "
                     f"max {args.max_iters} iters, "
                     f"{args.words} words/point")
        ax.grid(True, which="both", alpha=0.3)
        ax.legend()
        fig.tight_layout()
        fig.savefig(out_path("png"), dpi=120)
        print(f"[wifi] wrote {out_path('png')}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — plotting is best-effort
        print(f"[wifi] plot skipped: {e}", file=sys.stderr)

    md = ["# 802.11n (n=1944, Z=81) sum-product waterfall",
          "",
          f"{args.kind}, max {args.max_iters} iterations, "
          f"{args.words} words/point, {args.engine} decoder on "
          f"{jax.devices()[0].platform} (reference ships rate 5/6 "
          "min-sum only: wifiMatrices.py:6-9, wifiCUDA.py).",
          "",
          "| rate | " + " | ".join("@%.1f dB" % s for s in
                                   [-1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0,
                                    2.5, 3.0, 3.5, 4.0]) +
          " |",
          "|---|" + "---|" * 11]
    for rate_s, pts in results["rates"].items():
        by_snr = {p["snr_db"]: p["ber"] for p in pts}
        cells = " | ".join(
            (f"{by_snr[s]:.2e}" if s in by_snr else "—")
            for s in [-1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0,
                      3.5, 4.0])
        md.append(f"| {float(rate_s):.3g} | {cells} |")
    md += ["", "![waterfall](wifi_waterfall.png)",
           f"", f"(elapsed {results['elapsed_s']:.0f}s)"]
    with open(out_path("md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
