"""Publish the RL-discovered code: full BER/FER waterfall vs near-earth.

The wide-window PPO search (docs/rl_search_wide.md) discovered a code
re-evaluating at reward 0.8160 vs near-earth's 0.8059 (8x the re-eval
noise).  Reward is the env's fitted-line integral — the DOMAIN claim needs
a waterfall (VERDICT r3 #6, matching the re-eval protocol of the
reference's postProcessing.py:27-49).  This script:

1. recovers the best code from the search's steps.tsv (the same
   max-reward observation the re-eval used),
2. measures BER/FER waterfalls for it and near-earth — 16k+ words/point,
   50 iterations, frame-clustered 95% CIs (BER) and Wilson CIs (FER),
3. saves the code as a content-addressed instance
   (``save_code_instance``, fileHandler.py:203 equivalent) and writes
   docs/discovered_code.{json,md}.

Run ON THE REAL CHIP:  python scripts/discovered_code_waterfall.py
CPU smoke:  LDPC_TPU_PLATFORM=cpu python scripts/discovered_code_waterfall.py \
    --words 16 --iters 8 --snrs 3.0 4.0 --engine xla
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

DEFAULT_STEPS_TSV = ("/root/repo/docs/experiments/search_wide/"
                     "search_wide_s47/steps.tsv")


from ldpc_tpu.sim.stats import (frame_ber_ci as frame_ci,
                                wilson_interval as wilson)


def load_best_code(steps_tsv, name):
    import pandas as pd

    from ldpc_tpu.codes import uncompress
    df = pd.read_csv(steps_tsv, sep="\t",
                     dtype={"observation_hex": str})
    best = df.loc[df["reward"].idxmax()]
    obs = np.frombuffer(bytes.fromhex(best["observation_hex"]), np.uint8)
    return uncompress(obs, 2, 16, 511, name=name), float(best["reward"])


def sweep(code, snrs, words, iters, engine, seed):
    from ldpc_tpu.sim.evaluate import evaluate_code
    t0 = time.time()
    stats = evaluate_code(
        code, snrs, words, iters, seed=seed,
        batch_size=min(16384, words), staged=(iters > 12),
        engine=engine, verbose=True)
    points = []
    for snr in snrs:
        sel = stats.column("snr") == snr
        errs = stats.column("errors_decoded")[sel].astype(np.float64)
        fe = int(stats.column("frame_errors")[sel].sum())
        w = int(sel.sum())
        ber, half = frame_ci(errs, code.n)
        fer, flo, fhi = wilson(fe, w)
        points.append({
            "snr_db": snr, "words": w, "ber": ber, "ber_ci95_half": half,
            "fer": fer, "fer_wilson95": [flo, fhi],
            "avg_iters": float(stats.column("iterations")[sel].mean()),
        })
    return points, time.time() - t0, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--snrs", type=float, nargs="+",
                    default=[3.0, 3.2, 3.4, 3.6, 3.8, 4.0])
    ap.add_argument("--engine", default="pallas")
    ap.add_argument("--seed", type=int, default=424242)
    ap.add_argument("--out", default="/root/repo/docs/discovered_code")
    ap.add_argument("--steps-tsv", default=DEFAULT_STEPS_TSV,
                    help="search log to take the max-reward code from")
    ap.add_argument("--instance", default=None,
                    help="saved code instance to measure INSTEAD of the "
                         "steps-tsv max-reward code (e.g. a top-K-selected "
                         "code)")
    ap.add_argument("--provenance-json", default=None,
                    help="selection artifact (a search summary.json or "
                         "rl_search_floor_topk.json) to copy the measured "
                         "code's provenance from: parent experiment, "
                         "selection method, train/re-eval rewards.  "
                         "REQUIRED with --instance — the r4 flagship doc "
                         "recorded the wrong steps.tsv because the "
                         "default path was written unconditionally "
                         "(VERDICT r4 weak #2)")
    ap.add_argument("--name", default="rl_discovered_wide_s47")
    ap.add_argument("--baseline", default="near-earth",
                    help="near-earth or instance:<path> (compare a new "
                         "discovery against a previous one)")
    ap.add_argument("--save-dir", default=None,
                    help="where to save the stats-stamped instance "
                         "(default: alongside --instance when given, "
                         "else the search_wide experiment dir)")
    args = ap.parse_args()

    from ldpc_tpu.codes import near_earth_code
    from ldpc_tpu.codes.io import save_code_instance

    on_cpu = os.environ.get("LDPC_TPU_PLATFORM") == "cpu"
    # Provenance (VERDICT r4 #2): record the code's ACTUAL source — the
    # instance + its selection artifact when --instance is used, the
    # steps.tsv only when the code really came from it.  Re-eval reward
    # constants are read from the selection artifact, never hardcoded.
    provenance = {}
    if args.provenance_json:
        with open(args.provenance_json) as f:
            sel_art = json.load(f)
        if "selection" in sel_art:        # a search summary.json
            sel = sel_art["selection"]
            cand = (sel.get("candidates") or [{}])[0]
            provenance = {
                "selection_artifact": args.provenance_json,
                "experiment": sel_art.get("exp_name"),
                "selection_method": sel.get("method"),
                "steps_tsv": sel.get("steps_tsv"),
                "train_reward": cand.get("train_reward"),
                "reeval_reward": sel_art.get("best_found"),
                "baseline_reeval": sel_art.get("start_code"),
            }
        else:                              # rl_search_floor_topk.json
            cand = (sel_art.get("candidates") or [{}])[0]
            provenance = {
                "selection_artifact": args.provenance_json,
                "selection_method": "topk_reevaluated",
                "train_reward": cand.get("train_reward"),
                "reeval_reward": {"mean": cand.get("reward_mean"),
                                  "std": cand.get("reward_std"),
                                  "penalized": cand.get("penalized")},
            }
    if args.instance:
        from ldpc_tpu.codes.io import load_code_instance
        best_code = load_code_instance(args.instance)[0]
        train_reward = float(provenance.get("train_reward", float("nan"))
                             or float("nan"))
        provenance["instance"] = args.instance
        if not args.provenance_json:
            print("WARNING: --instance without --provenance-json — the "
                  "published doc cannot trace the code to its selection "
                  "step", file=sys.stderr)
    else:
        best_code, train_reward = load_best_code(args.steps_tsv, args.name)
        provenance.setdefault("steps_tsv", args.steps_tsv)
        provenance["selection_method"] = provenance.get(
            "selection_method", "argmax_train_reward")
        provenance["train_reward"] = train_reward
    if args.baseline.startswith("instance:"):
        from ldpc_tpu.codes.io import load_code_instance
        base_name = "baseline_instance"
        base = load_code_instance(args.baseline[len("instance:"):])[0]
    else:
        base_name, base = "near_earth", near_earth_code()
    diff = [(mb, nb) for mb in range(2) for nb in range(16)
            if best_code.shifts[mb][nb] != base.shifts[mb][nb]]
    print(f"discovered code: train reward {train_reward:.4f}, differs "
          f"from {base_name} in blocks {diff}", flush=True)

    out = {"train_reward": train_reward,
           "provenance": provenance, "baseline": args.baseline,
           "blocks_changed": diff, "max_iters": args.iters,
           "words_per_point": args.words, "engine": args.engine,
           "codes": {}}
    if provenance.get("reeval_reward"):
        out["reeval_reward"] = {
            "best": provenance["reeval_reward"],
            "baseline": provenance.get("baseline_reeval"),
            "source": args.provenance_json}
    stats_best = None
    for name, code in [(base_name, base), ("discovered", best_code)]:
        pts, dt, stats = sweep(code, args.snrs, args.words, args.iters,
                               args.engine, args.seed)
        out["codes"][name] = pts
        if name == "discovered":
            stats_best = stats
        for p in pts:
            print(f"[{name}] @{p['snr_db']}: BER {p['ber']:.4e} ± "
                  f"{p['ber_ci95_half']:.1e}  FER {p['fer']:.4e} "
                  f"[{p['fer_wilson95'][0]:.1e}, "
                  f"{p['fer_wilson95'][1]:.1e}]  iters "
                  f"{p['avg_iters']:.1f}", flush=True)
        print(f"[{name}] swept in {dt:.1f} s", flush=True)

    # where does the discovered code actually win?
    wins = []
    for a, b in zip(out["codes"][base_name], out["codes"]["discovered"]):
        better = (b["ber"] + b["ber_ci95_half"]
                  < a["ber"] - a["ber_ci95_half"])
        worse = (b["ber"] - b["ber_ci95_half"]
                 > a["ber"] + a["ber_ci95_half"])
        wins.append({"snr_db": a["snr_db"],
                     "verdict": ("discovered" if better else
                                 base_name if worse else "tie")})
    out["per_point_verdicts"] = wins
    print("verdicts:", json.dumps(wins), flush=True)

    if on_cpu:
        print("CPU smoke only — not writing artifacts", flush=True)
        return
    save_dir = args.save_dir or (
        os.path.dirname(os.path.abspath(args.instance)) if args.instance
        else "/root/repo/docs/experiments/search_wide")
    inst = save_code_instance(best_code, save_dir, stats=stats_best)
    out["code_instance"] = os.path.basename(inst)
    with open(args.out + ".json", "w") as f:
        json.dump(out, f, indent=1)

    if args.instance:
        src_line = (f"Instance `{args.instance}` — "
                    f"{provenance.get('selection_method', 'unknown')} "
                    f"selection of experiment "
                    f"`{provenance.get('experiment', '?')}` "
                    f"(artifact `{args.provenance_json}`)")
    else:
        src_line = f"Max-reward code of `{args.steps_tsv}`"
    rows = [f"# {args.name}: BER/FER waterfall vs {base_name}",
            "",
            f"{src_line} (differs from "
            f"{base_name} in blocks {diff}), re-measured at "
            f"{args.words} words/point, "
            f"{args.iters} iterations ({args.engine} engine).  Saved as "
            f"`{out['code_instance']}` "
            "(content-addressed, fileHandler.saveCodeInstance schema).", "",
            f"| Eb/N0 (dB) | {base_name} BER (95% CI) | discovered BER "
            f"(95% CI) | {base_name} FER | discovered FER | verdict |",
            "|---|---|---|---|---|---|"]
    for a, b, v in zip(out["codes"][base_name],
                       out["codes"]["discovered"], wins):
        rows.append(
            f"| {a['snr_db']} | {a['ber']:.4e} ± {a['ber_ci95_half']:.1e}"
            f" | {b['ber']:.4e} ± {b['ber_ci95_half']:.1e} | "
            f"{a['fer']:.4e} | {b['fer']:.4e} | {v['verdict']} |")
    if "reeval_reward" in out:
        rr = out["reeval_reward"]["best"] or {}
        bb = out["reeval_reward"].get("baseline") or {}
        line = "Re-evaluated reward (selection artifact "
        line += f"`{out['reeval_reward']['source']}`): discovered "
        if isinstance(rr, dict) and "mean" in rr:
            line += f"{rr['mean']:.5f} ± {rr.get('std', 0):.5f}"
            if rr.get("penalized") is not None:
                line += f" (penalized {rr['penalized']:.5f})"
        if isinstance(bb, dict) and "mean" in bb:
            line += (f" vs start code {bb['mean']:.5f} ± "
                     f"{bb.get('std', 0):.5f}")
            if bb.get("penalized") is not None:
                line += f" (penalized {bb['penalized']:.5f})"
        rows += ["", line + "."]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {args.out}.json / .md + {inst}", flush=True)


if __name__ == "__main__":
    main()
