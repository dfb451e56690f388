"""Adjudicate the floor-aware search (r4): plain reward AND floor FER.

The search_floor run optimizes ``fitted-line reward − 30 · FER@3.8 dB``
(FER measured on 2,048 words/step — the asymmetric-evaluation trick).
This script scores the whole discovery chain under BOTH objectives at
high fidelity:

* plain reward: the rl_search_wide re-eval protocol (512 tx x 5 SNR x
  5 seeds, ∫(1−fit));
* floor: FER at 3.8 dB from a deep sweep (default 262,144 words,
  staged Pallas engine — ~3 s/code) with Wilson 95% CIs;
* penalized objective = reward − 30 · FER.

Codes scored: near-earth, the s47 discovery, the s52 bootstrapped code
(the floor run's start state) and the floor run's best.  Writes
docs/rl_search_floor.{md,json} + saves the best code instance.

Run ON THE REAL CHIP after the search:
    python scripts/floor_search_analysis.py
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

import numpy as np

EXP = "/root/repo/docs/experiments"
S47 = (f"{EXP}/search_wide/"
       "511_2_16_16123b65b457c89a5b712ce85de02b65db6e6c14727c7ebb44c35579"
       ".npz")
BOOT = (f"{EXP}/search_boot/"
        "511_2_16_da7e58a2185d4759f150fc6ab51ade423d720b1a7e1eb71305b3f68d"
        ".npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-tsv",
                    default=f"{EXP}/search_floor/search_floor_s64/"
                            "steps.tsv")
    ap.add_argument("--penalty", type=float, default=30.0)
    ap.add_argument("--floor-snr", type=float, default=3.8)
    ap.add_argument("--floor-words", type=int, default=262144)
    ap.add_argument("--reeval-tx", type=int, default=512)
    ap.add_argument("--reeval-seeds", type=int, nargs="+",
                    default=[11, 12, 13, 14, 15])
    ap.add_argument("--snr", type=float, nargs="+",
                    default=[3.0, 3.2, 3.4, 3.6, 3.8])
    ap.add_argument("--out", default="/root/repo/docs/rl_search_floor")
    args = ap.parse_args()

    from ldpc_tpu.analysis.postprocess import (_read_steps,
                                               action_heatmaps,
                                               learning_windows)
    from ldpc_tpu.codes import near_earth_code, uncompress
    from ldpc_tpu.codes.io import load_code_instance, save_code_instance
    from ldpc_tpu.sim.evaluate import evaluate_code
    from ldpc_tpu.sim.stats import wilson_interval
    sys.path.insert(0, "/root/repo/scripts")
    from rl_search_wide import reeval_reward

    df = _read_steps(args.steps_tsv)
    n_ep = int(df["epoch"].max()) + 1
    windows = learning_windows(df)
    best = df.loc[df["reward"].idxmax()]
    obs = np.frombuffer(bytes.fromhex(best["observation_hex"]), np.uint8)
    floor_code = uncompress(obs, 2, 16, 511, name="rl_discovered_floor_s64")
    if os.environ.get("LDPC_TPU_PLATFORM") != "cpu":
        action_heatmaps(args.steps_tsv, save_figures=True)

    codes = {
        "near_earth": near_earth_code(),
        "s47": load_code_instance(S47)[0],
        "boot_s52": load_code_instance(BOOT)[0],
        "floor_best": floor_code,
    }
    out = {"penalty": args.penalty, "floor_snr_db": args.floor_snr,
           "floor_words": args.floor_words, "epochs": n_ep,
           "train_best_penalized_reward": float(best["reward"]),
           "windows": windows, "codes": {}}
    for name, code in codes.items():
        t0 = time.time()
        rm, rs, _ = reeval_reward(code, tuple(args.snr), args.reeval_tx,
                                  50, args.reeval_seeds)
        stats = evaluate_code(code, [args.floor_snr], args.floor_words,
                              50, seed=515151, batch_size=16384,
                              staged=True, engine="pallas", verbose=True)
        sel = stats.column("snr") == args.floor_snr
        fe = int(stats.column("frame_errors")[sel].sum())
        words = int(stats.column("weight")[sel].sum())
        fer, flo, fhi = wilson_interval(fe, words)
        out["codes"][name] = {
            "reward_mean": rm, "reward_std": rs,
            "fer_floor": fer, "fer_wilson95": [flo, fhi],
            "frame_errors": fe, "words": words,
            "penalized": rm - args.penalty * fer,
            "seconds": time.time() - t0,
        }
        print(f"[{name}] reward {rm:.5f} ± {rs:.5f}  FER@{args.floor_snr} "
              f"{fer:.3e} [{flo:.1e},{fhi:.1e}]  penalized "
              f"{out['codes'][name]['penalized']:.5f}", flush=True)

    if os.environ.get("LDPC_TPU_PLATFORM") == "cpu":
        print("CPU smoke only — not writing artifacts", flush=True)
        return
    inst = save_code_instance(floor_code, f"{EXP}/search_floor")
    out["code_instance"] = os.path.basename(inst)
    with open(args.out + ".json", "w") as f:
        json.dump(out, f, indent=1)

    rows = ["# Floor-aware code search (reward − 30·FER@3.8 dB)", "",
            f"{n_ep} epochs x 32 steps, start state = the s52 bootstrapped "
            "code (best waterfall, worst floor), objective = fitted-line "
            f"reward − {args.penalty}·FER@{args.floor_snr} dB with FER "
            "measured on 2,048 words/step (deep high-SNR evaluation is "
            "nearly free: those words converge in ~4-6 iterations).  "
            "Training was interrupted at epoch 50 and RESUMED with the "
            "host-staged env decode — the round-4 checkpoint/resume stack "
            "in production.", "",
            "| window | mean step reward | max | fraction > 0 |",
            "|---|---|---|---|"]
    for win in windows:
        rows.append(f"| {win['window']} | {win['mean']:.3f} | "
                    f"{win['max']:.3f} | {win['frac_positive']:.2f} |")
    rows += ["", "## The chain under both objectives (high-fidelity "
             "re-eval)", "",
             f"| code | plain reward | FER@{args.floor_snr} (Wilson 95%) "
             "| penalized objective |", "|---|---|---|---|"]
    for name, c in out["codes"].items():
        rows.append(
            f"| {name} | {c['reward_mean']:.5f} ± {c['reward_std']:.5f} | "
            f"{c['fer_floor']:.3e} [{c['fer_wilson95'][0]:.1e}, "
            f"{c['fer_wilson95'][1]:.1e}] | {c['penalized']:.5f} |")
    rows += ["", f"Best-found instance: `experiments/search_floor/"
             f"{out['code_instance']}`."]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {args.out}.json / .md + {inst}", flush=True)


if __name__ == "__main__":
    main()
