"""Regenerate the discovery-chain waterfall figure from measured JSONs.

Replaces the ad-hoc r4 plot: reads the per-code BER/FER points straight
from the published waterfall artifacts (each carries a ``codes`` mapping
of name -> measured points with CI bands) and redraws
``docs/discovery_chain_waterfalls.png``.  Sources, best-first:

  docs/floor_topk_code.json      near_earth + the r4 flagship (topk)
  docs/discovered_code.json      s47
  docs/boot_code.json            boot_s52
  docs/floor2_code.json          the r5 floor2 winner (if present)

Pure matplotlib on committed artifacts — no chip needed; rerun after any
waterfall refresh.  Mirrors the overlay style of the reference's
plotSNRvsBER (common.py:103-139) with Wilson CI bands instead of point
markers alone.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")

# (json file, key inside its `codes` dict, legend label, color)
SERIES = [
    ("floor_topk_code.json", "near_earth", "near-earth (CCSDS)", "#555555"),
    ("discovered_code.json", "discovered", "s47 (wide search)", "#1f77b4"),
    ("boot_code.json", "discovered", "boot_s52 (bootstrapped)", "#2ca02c"),
    ("floor_topk_code.json", "discovered", "topk 08c6d7b (floor, r4 flagship)",
     "#d62728"),
    ("floor2_code.json", "discovered", "floor2 (multi-point λ, r5)",
     "#9467bd"),
]


def main(out=os.path.join(DOCS, "discovery_chain_waterfalls.png")):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.4), sharex=True)
    for fname, key, label, color in SERIES:
        path = os.path.join(DOCS, fname)
        if not os.path.exists(path):
            print(f"[chain_figure] skip {label}: no {fname}")
            continue
        codes = json.load(open(path))["codes"]
        if key not in codes:
            # older artifacts name the discovered code by instance hash
            key = next(k for k in codes if k != "near_earth")
        pts = codes[key]
        snr = [p["snr_db"] for p in pts]
        for ax, field in zip(axes, ("ber", "fer")):
            y = [max(p[field], 1e-9) for p in pts]
            ax.semilogy(snr, y, "o-", color=color, label=label, ms=4)
            if field == "fer":
                lo = [max(p["fer_wilson95"][0], 1e-9) for p in pts]
                hi = [max(p["fer_wilson95"][1], 1e-9) for p in pts]
                ax.fill_between(snr, lo, hi, color=color, alpha=0.18, lw=0)
            else:
                lo = [max(p["ber"] - p.get("ber_ci95_half", 0.0), 1e-9)
                      for p in pts]
                hi = [p["ber"] + p.get("ber_ci95_half", 0.0) for p in pts]
                ax.fill_between(snr, lo, hi, color=color, alpha=0.18, lw=0)
    for ax, title in zip(axes, ("BER", "FER")):
        ax.set_xlabel("Eb/N0 [dB]")
        ax.set_ylabel(title)
        ax.grid(True, which="both", alpha=0.3)
    axes[0].legend(fontsize=8, loc="lower left")
    fig.suptitle("Discovery chain — measured waterfalls "
                 "(min-sum, 50 iters, CI bands)")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"[chain_figure] wrote {out}")


if __name__ == "__main__":
    main()
