"""Deep error-floor sweep: million-word BER/FER points past the waterfall.

The reference's published curve stops at 200 transmissions/point
(common.py:112-114 reports BER 0 at 3.44 dB actual — a resolution floor
of ~6e-7).  At ~0.7 Gbit/s decoded, a million near-earth words per point
is ~a minute of chip time, resolving BER to ~1e-10 and exposing whether
the code has an error floor in the 3.6-4.2 dB region (the question
200-word Monte-Carlo cannot answer).

Writes ``docs/error_floor.{json,md}`` with Wilson 95% CIs on FER and a
per-point bit-error tally.  Uses the resumable ``evaluate_code`` sweep
(checkpoint under /tmp) so a tunnel wedge mid-run loses at most one SNR
point.

Run ON THE REAL CHIP:
    python scripts/error_floor.py [--words 1048576] [--snr 3.6 3.8 4.0]
CPU smoke:
    LDPC_TPU_PLATFORM=cpu python scripts/error_floor.py --code wifi \
        --words 64 --snr 3.0 4.0 --batch 16 --no-write
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

import numpy as np


def wilson(k: int, n: int) -> tuple[float, float]:
    """Wilson 95% interval (lo, hi) — canonical impl in sim/stats.py."""
    from ldpc_tpu.sim.stats import wilson_interval
    return wilson_interval(k, n)[1:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=1 << 20)
    ap.add_argument("--snr", type=float, nargs="+",
                    default=[3.6, 3.8, 4.0, 4.2])
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--engine", default="pallas",
                    choices=["xla", "pallas"])
    ap.add_argument("--phase-iters", default="12")
    ap.add_argument("--code", default="near-earth",
                    help="near-earth (production study), wifi (CPU smoke) "
                         "or instance:<path> (a saved code instance, e.g. "
                         "the RL-discovered code)")
    ap.add_argument("--no-write", action="store_true",
                    help="skip writing docs/ artifacts (smoke runs)")
    ap.add_argument("--checkpoint",
                    default="/tmp/error_floor_checkpoint.npz")
    args = ap.parse_args()

    from ldpc_tpu.codes import near_earth_code, wifi_code
    from ldpc_tpu.sim.evaluate import evaluate_code

    if args.code.startswith("instance:"):
        from ldpc_tpu.codes.io import load_code_instance
        code = load_code_instance(args.code[len("instance:"):])[0]
        args.code = "instance:" + os.path.basename(
            args.code[len("instance:"):])[:24]
    elif args.code == "wifi":
        code = wifi_code()
    else:
        code = near_earth_code()
    t0 = time.time()
    stats = evaluate_code(
        code, args.snr, args.words, args.max_iters,
        seed=8146,
        batch_size=args.batch,
        staged=True,
        phase1_iters=[int(p) for p in args.phase_iters.split(",")],
        engine=args.engine,
        checkpoint_path=args.checkpoint,
        verbose=True)
    elapsed = time.time() - t0

    snr_col = np.asarray(stats.column("snr"))
    w_col = np.asarray(stats.column("weight"))
    errs_col = np.asarray(stats.column("errors_decoded"))
    fe_col = np.asarray(stats.column("frame_errors"))
    points = []
    for snr in args.snr:
        m = snr_col == snr
        words = int(w_col[m].sum())
        bit_errs = int(errs_col[m].sum())
        # frame error = residual bit errors OR non-convergence
        # (stats.py add_batch semantics)
        frame_errs = int(fe_col[m].sum())
        lo, hi = wilson(frame_errs, words)
        points.append({
            "snr_db": snr,
            "words": words,
            "bits": words * code.n,
            "bit_errors": bit_errs,
            "ber": bit_errs / (words * code.n) if words else None,
            "frame_errors": frame_errs,
            "fer": frame_errs / words if words else None,
            "fer_wilson95": [lo, hi],
        })
        print(f"[floor] {snr} dB: {words} words, BER "
              f"{points[-1]['ber']:.3e}, FER {points[-1]['fer']:.3e} "
              f"(95% CI {lo:.2e}-{hi:.2e})", flush=True)

    out = {
        "code": args.code, "n": code.n, "max_iters": args.max_iters,
        "engine": args.engine, "elapsed_s": elapsed, "points": points,
    }
    if args.code.startswith("instance:"):
        # per-instance artifact name: never clobber another instance's
        # floor study (the z_Mb_Nb_sha prefix is unique per code)
        stem = args.code[len("instance:"):].split("_")[-1][:12]
        out_base = f"/root/repo/docs/error_floor_instance_{stem}"
    else:
        out_base = "/root/repo/docs/error_floor"
    if not args.no_write:
        with open(out_base + ".json", "w") as f:
            json.dump(out, f, indent=1)
        md = [
            "# Deep error-floor sweep (beyond the reference's resolution)",
            "",
            f"{args.code} (n={code.n}), min-sum, max {args.max_iters} "
            f"iterations, {args.words:,} words per Eb/N0 point decoded by "
            f"the device-staged {args.engine} engine "
            f"({elapsed:,.0f} s total).  The reference's published curve "
            "uses 200 words/point (common.py:112-114), a BER resolution "
            "floor of ~6e-7; a million words resolve ~1e-10 and make the "
            "error-floor question answerable.",
            "",
            "| Eb/N0 (dB) | words | bit errors | BER | frame errors | FER "
            "| FER 95% CI |",
            "|---|---|---|---|---|---|---|",
        ]
        for p in points:
            lo, hi = p["fer_wilson95"]
            md.append(
                f"| {p['snr_db']} | {p['words']:,} | {p['bit_errors']} | "
                f"{p['ber']:.3e} | {p['frame_errors']} | {p['fer']:.3e} | "
                f"{lo:.2e} – {hi:.2e} |")
        with open(out_base + ".md", "w") as f:
            f.write("\n".join(md) + "\n")
    print(json.dumps(out["points"][-1]))


if __name__ == "__main__":
    main()
