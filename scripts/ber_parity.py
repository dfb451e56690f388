"""BER parity study: measured waterfall with confidence intervals (VERDICT #2).

The reference's published near-earth BER points are single 200-frame runs
recorded as plot constants (common.py:112-114, at *realized* SNRs
2.9914/3.1541/3.3076/3.4404 dB); round 1 compared them to our measurements
only in prose.  This script makes parity a checked artifact:

  * decode >=10k words/point on the TPU with the oracle-exact XLA f32
    engine (bit-identical semantics to the numpy/native golden decoders,
    tests/test_decoder.py) at the reference's own realized SNR points and
    at the bench's nominal points;
  * decode the same points with the headline Pallas bf16 kernel;
  * compute frame-clustered BER confidence intervals (errors arrive in
    per-frame bursts, so the binomial-on-bits CI would be ~20x too tight;
    the frame is the independent unit) and Wilson FER intervals;
  * cross-check the native C++ engine (ldpc_tpu/native) on a CPU-sized
    subsample — a fully independent implementation path;
  * overlay the reference's points and test whether each lies inside the
    combined two-run MC band (our CI + the implied spread of a 200-frame
    run, computed from OUR measured per-frame error distribution).

Writes docs/ber_parity.json (consumed by bench.py's parity gate) and
prints a markdown table for docs/ber_parity.md.

Run on the real chip:  python scripts/ber_parity.py [--words 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

# reference published points: (realized SNR dB, decoded BER), common.py:112-114
REFERENCE_POINTS = [
    (2.9914, 2.3539e-2),
    (3.1541, 1.3595e-2),
    (3.3076, 1.0794e-2),
    (3.4404, 0.0),
]
REFERENCE_FRAMES = 200  # transmissions per point in the reference run


from ldpc_tpu.sim.stats import (frame_ber_ci as frame_ci,
                                wilson_interval as wilson)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=16384)
    ap.add_argument("--native-words", type=int, default=384,
                    help="CPU native-engine cross-check sample (0 = skip)")
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--skip-pallas", action="store_true")
    args = ap.parse_args()

    import jax
    import os
    if os.environ.get("LDPC_TPU_PLATFORM"):
        # sitecustomize registers the tunnelled backend before
        # JAX_PLATFORMS is honoured; the config route still works
        jax.config.update("jax_platforms", os.environ["LDPC_TPU_PLATFORM"])
    import jax.numpy as jnp

    from ldpc_tpu.codes import near_earth_code
    from ldpc_tpu.sim.evaluate import _transmit_fn, make_staged_decoder_device
    from ldpc_tpu.utils.provenance import kernel_source_hash

    code = near_earth_code()
    transmit = _transmit_fn(code.n, scale_llr=False)
    key = jax.random.key(20260817)

    snr_points = sorted({p[0] for p in REFERENCE_POINTS} | {3.0, 3.2, 3.4, 3.6})
    engines = {"xla_f32": make_staged_decoder_device(
        code, args.max_iters, phase1_iters=12, engine="xla")}
    if not args.skip_pallas:
        engines["pallas_bf16"] = make_staged_decoder_device(
            code, args.max_iters, phase1_iters=12, engine="pallas")

    results: dict = {"words_per_point": args.words, "n": code.n,
                     "max_iters": args.max_iters,
                     # ties this artifact to the decode-path sources so
                     # bench.py can detect staleness (advisor r2 finding)
                     "kernel_hash": kernel_source_hash(),
                     "points": {}}
    per_frame_errs: dict = {}
    for snr in snr_points:
        snr_arr = jnp.full((args.words,), float(snr), jnp.float32)
        k = jax.random.fold_in(key, int(round(snr * 1e4)))
        llr, _, sigma_actual, unc = transmit(k, snr_arr)
        realized = float(jnp.mean(
            10.0 * jnp.log10(0.5 / jnp.mean(sigma_actual ** 2))))
        point: dict = {"realized_snr_db": realized,
                       "uncoded_ber": float(jnp.sum(unc)) / (
                           args.words * code.n)}
        for name, dec in engines.items():
            t0 = time.time()
            errs, iters, ok = map(np.asarray, jax.device_get(dec(llr)))
            dt = time.time() - t0
            ber, half = frame_ci(errs, code.n)
            fer, flo, fhi = wilson(int((errs > 0).sum()), args.words)
            point[name] = {
                "ber": ber, "ber_ci95_half": half,
                "fer": fer, "fer_ci95": [flo, fhi],
                "avg_iters": float(iters.mean()),
                "bit_per_s": args.words * code.n / dt,
            }
            if name == "xla_f32":
                per_frame_errs[snr] = errs
            print(f"[parity] snr {snr:.4f} (realized {realized:.4f}) "
                  f"{name}: BER {ber:.4e} ± {half:.1e}  FER {fer:.4f} "
                  f"[{flo:.4f},{fhi:.4f}]  {dt:.2f}s", file=sys.stderr)
        if "pallas_bf16" in point:
            x, p = point["xla_f32"], point["pallas_bf16"]
            # engines must agree within combined MC noise (same words, so
            # this is loose; converged words are bit-identical by test)
            point["engines_agree"] = bool(
                abs(x["ber"] - p["ber"]) <= x["ber_ci95_half"] +
                p["ber_ci95_half"] + 1e-9)
        results["points"][f"{snr:.4f}"] = point

    # --- reference overlay: is each published point inside the combined
    # band of (our CI) + (a 200-frame run's spread, from OUR per-frame
    # error distribution at the same realized SNR)? ---
    results["reference"] = []
    for snr, ref_ber in REFERENCE_POINTS:
        pt = results["points"][f"{snr:.4f}"]["xla_f32"]
        errs = per_frame_errs[snr]
        ref_spread = 1.96 * errs.std(ddof=1) / np.sqrt(REFERENCE_FRAMES) / \
            code.n
        gap = abs(pt["ber"] - ref_ber)
        band = pt["ber_ci95_half"] + ref_spread
        entry = {"snr_db": snr, "reference_ber": ref_ber,
                 "our_ber": pt["ber"], "our_ci95_half": pt["ber_ci95_half"],
                 "ref_run_ci95_half": float(ref_spread),
                 "within_band": bool(gap <= band)}
        if ref_ber == 0.0:
            # the zero point: probability a 200-frame run at our FER sees
            # zero frame errors
            fer = pt["fer"]
            entry["p_zero_in_200_frames"] = float((1 - fer) ** 200)
        results["reference"].append(entry)
        print(f"[parity] ref {snr:.4f} dB: ref {ref_ber:.4e} vs ours "
              f"{pt['ber']:.4e} ± {pt['ber_ci95_half']:.1e} "
              f"(200-frame spread ±{ref_spread:.1e}) -> "
              f"{'OK' if entry['within_band'] else 'GAP'}", file=sys.stderr)

    # --- independent-engine cross-check: native C++ on CPU ---
    if args.native_words:
        from ldpc_tpu import native
        if native.available():
            h = code.to_dense(np.int8)
            snr = 3.2
            snr_arr = jnp.full((args.native_words,), snr, jnp.float32)
            llr, _, _, _ = transmit(
                jax.random.fold_in(key, 777), snr_arr)
            llr_np = np.asarray(jax.device_get(llr), np.float64)
            t0 = time.time()
            hard, _, iters, ok = native.native_min_sum_decode(
                h, llr_np, args.max_iters)
            dt = time.time() - t0
            errs_nat = hard.sum(axis=1)
            ber_n, half_n = frame_ci(errs_nat.astype(np.float64), code.n)
            # decode the SAME words with the XLA engine -> bit parity rate
            errs_x, iters_x, ok_x = map(np.asarray, jax.device_get(
                engines["xla_f32"](llr)))
            agree = float(np.mean(errs_nat == errs_x))
            results["native_crosscheck"] = {
                "snr_db": snr, "words": args.native_words,
                "ber": ber_n, "ber_ci95_half": half_n,
                "xla_ber_same_words": float(errs_x.mean()) / code.n,
                "word_exact_agreement": agree,
                "iters_exact_agreement": float(np.mean(
                    iters == iters_x)),
                "cpu_seconds": dt,
            }
            print(f"[parity] native C++ {args.native_words} words @{snr}: "
                  f"BER {ber_n:.4e} vs xla {results['native_crosscheck']['xla_ber_same_words']:.4e}; "
                  f"word-exact {agree:.3f}  ({dt:.1f}s)", file=sys.stderr)
        else:
            results["native_crosscheck"] = "unavailable"

    # Preserve the reference_agreement adjudication (written by
    # scripts/reference_agreement.py — CPU-only, independent of the
    # kernel sources this artifact re-measures): the round-3 chip rerun
    # silently dropped it by rewriting the file wholesale.
    path = "/root/repo/docs/ber_parity.json"
    if os.path.exists(path):
        try:
            prior = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            prior = {}
        if "reference_agreement" in prior:
            results["reference_agreement"] = prior["reference_agreement"]
    with open(path, "w") as f:
        json.dump(results, f, indent=1)

    # --- markdown table ---
    rows = ["| SNR (dB) | realized | uncoded BER | XLA f32 BER (95% CI) | "
            "Pallas bf16 BER (95% CI) | FER (Wilson 95%) | avg iters |",
            "|---|---|---|---|---|---|---|"]
    for snr in snr_points:
        pt = results["points"][f"{snr:.4f}"]
        x = pt["xla_f32"]
        pal = pt.get("pallas_bf16")
        pal_s = (f"{pal['ber']:.3e} ± {pal['ber_ci95_half']:.1e}"
                 if pal else "—")
        rows.append(
            f"| {snr:.4f} | {pt['realized_snr_db']:.4f} | "
            f"{pt['uncoded_ber']:.3e} | "
            f"{x['ber']:.3e} ± {x['ber_ci95_half']:.1e} | {pal_s} | "
            f"{x['fer']:.4f} [{x['fer_ci95'][0]:.4f}, {x['fer_ci95'][1]:.4f}]"
            f" | {x['avg_iters']:.1f} |")
    print("\n".join(rows))
    ok_all = all(e["within_band"] for e in results["reference"]
                 if e["reference_ber"] > 0)
    print(f"\nreference-points-within-band: {ok_all}")


if __name__ == "__main__":
    main()
