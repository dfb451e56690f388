"""Reward-vs-floor frontier across every deeply re-evaluated candidate.

The discovery chain's open question is whether high plain reward
(waterfall steepness over 3.0-3.8 dB) and a low FER floor @3.8 dB are
jointly achievable in the near-earth QC neighborhood.  Every top-K
selection pass re-scores candidates at high fidelity (reward at 256 tx
x seeds, floor at >=65,536 words) — this script pools those records
from the selection artifacts and draws the measured frontier:

  x = FER@3.8 (Wilson-CI bars, log scale)     y = plain re-eval reward

with the chain members (near_earth, s47, boot_s52, topk flagship)
highlighted.  A point strictly above-and-left of s47 would be the
"repaired floor" winner VERDICT r4 #1 asks for; absent one, the plot IS
the finding — the measured Pareto frontier of this code family under
the reference's own figure of merit (ldpc_env.py:319-345).

Off-chip: reads committed JSONs only.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")

# selection artifacts carrying re-evaluated candidate tables
SELECTIONS = [
    ("rl_search_floor_topk.json", "r4 floor search top-K", "#1f77b4"),
    ("../docs/experiments/search_floor2/summary.json",
     "r5 floor2 (annealed multi-point λ)", "#d62728"),
    ("../docs/experiments/search_floor2_late/summary.json",
     "r5 floor2 late-epoch pool", "#9467bd"),
]

# chain members: (label, plain reward, FER@3.8 mean, lo, hi)
CHAIN = [
    ("near_earth", 0.80592, 0.0, 0.0, 1.5e-5),
    ("s47", 0.81596, 1.9073486328125e-06, 5.230529985815068e-07,
     6.9552521231674595e-06),          # megaword, error_floor_discovered
    ("boot_s52", 0.82011, 2.79e-4, 2.2e-4, 3.5e-4),
    ("topk (r4 flagship)", 0.82492, 2.90e-4, 1.9e-4, 4.5e-4),
]

_FLOOR_SNR = 3.8


def _candidates(path):
    d = json.load(open(path))
    sel = d.get("selection", d)           # summary.json nests candidates
    for c in sel.get("candidates", []):
        if "fer_floor" in c:              # r4 schema: single floor point
            yield (c["reward_mean"], c["fer_floor"], c["fer_wilson95"])
        else:                             # r5 schema: floors list
            fl = [f for f in c.get("floors", [])
                  if f["snr_db"] == _FLOOR_SNR]
            if fl:
                yield (c["reward_mean"], fl[0]["fer"],
                       fl[0]["fer_wilson95"])


def main(out=os.path.join(DOCS, "reward_floor_frontier.png")):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.6))
    floor_clip = 3e-6                     # log-x display floor

    for fname, label, color in SELECTIONS:
        path = os.path.join(DOCS, fname)
        if not os.path.exists(path):
            print(f"[frontier] skip {label}: no {fname}")
            continue
        pts = list(_candidates(path))
        if not pts:
            continue
        xs = [max(p[1], floor_clip) for p in pts]
        ys = [p[0] for p in pts]
        xerr_lo = [max(x - max(p[2][0], floor_clip), 0.0)
                   for x, p in zip(xs, pts)]
        xerr_hi = [max(p[2][1], floor_clip) - x for x, p in zip(xs, pts)]
        ax.errorbar(xs, ys, xerr=[xerr_lo, xerr_hi], fmt="o", ms=4,
                    color=color, label=label, alpha=0.75, lw=1,
                    capsize=2)

    for name, r, fer, lo, hi in CHAIN:
        x = max(fer, floor_clip)
        ax.errorbar([x], [r], xerr=[[max(x - max(lo, floor_clip), 0.0)],
                                    [max(hi, floor_clip) - x]],
                    fmt="*", ms=13, color="#222222", capsize=3, lw=1)
        ax.annotate(name, (x, r), textcoords="offset points",
                    xytext=(6, 5), fontsize=8)

    ax.set_xscale("log")
    ax.set_xlabel(f"FER @ {_FLOOR_SNR} dB (Wilson 95% CI; "
                  f"clipped at {floor_clip:g})")
    ax.set_ylabel("plain re-evaluated reward (∫(1−fit), 3.0-3.8 dB)")
    ax.set_title("Reward vs floor — every deeply re-evaluated candidate")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend(fontsize=8, loc="lower right")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"[frontier] wrote {out}")


if __name__ == "__main__":
    main()
