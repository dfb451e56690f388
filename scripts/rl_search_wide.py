"""Wide-window PPO code search: train + post-mortem + artifact, turnkey.

Round 2's 100-epoch search used the env's default 3.0-3.4 dB reward
window (published near-earth baseline 0.3965, postProcessing.py:19).
This runs the OTHER published window — 3.0-3.8 dB, baseline
0.7958451612664468 (postProcessing.py:18) — end-to-end: PPO training on
the code-search env, learning-curve summary, per-head action heatmaps,
and a high-fidelity multi-seed re-evaluation of the best discovered code
against the near-earth start state, written to
``docs/rl_search_wide.md`` + ``docs/experiments/<exp>/``.

Run ON THE REAL CHIP:
    python scripts/rl_search_wide.py [--epochs 150] [--steps 32]
CPU smoke:
    LDPC_TPU_PLATFORM=cpu python scripts/rl_search_wide.py --smoke
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
    # sitecustomize registers the tunnelled backend before JAX_PLATFORMS
    # is honoured; the config route still works (see ldpc_tpu/cli.py)
    jax.config.update("jax_platforms", os.environ["LDPC_TPU_PLATFORM"])

import numpy as np

WIDE_BASELINE = 0.7958451612664468   # postProcessing.py:18 (3.0-3.8 dB)


def reeval_reward(code, snr_points, num_transmissions, max_iters, seeds):
    """The env's reward computation (code_search.py step semantics) at
    high fidelity: per-seed sweep -> scatter -> recursive fit -> ∫(1-fit)."""
    from ldpc_tpu.sim import calc_reward, evaluate_code

    rewards = []
    for seed in seeds:
        stats = evaluate_code(code, list(snr_points), num_transmissions,
                              max_iters, seed=seed)
        scatter_snr, scatter_ber, *_ = stats.get_stats_v2()
        rewards.append(calc_reward(scatter_snr, scatter_ber, snr_points))
    return float(np.mean(rewards)), float(np.std(rewards)), rewards


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--num-transmissions", type=int, nargs="+",
                    default=[64],
                    help="one value for all SNR points, or one per point")
    ap.add_argument("--floor-penalty", type=float, default=0.0)
    ap.add_argument("--phase1-iterations", type=int, default=None)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--snr", type=float, nargs="+",
                    default=[3.0, 3.2, 3.4, 3.6, 3.8])
    ap.add_argument("--exp-name", default="search_wide")
    ap.add_argument("--data-dir", default="/root/repo/docs/experiments")
    ap.add_argument("--start-instance", default=None,
                    help="saved code instance to START the search from "
                         "(bootstrap); re-eval baseline becomes this code")
    ap.add_argument("--num-envs", type=int, default=1,
                    help="parallel rollout envs (ppo num_envs; steps is "
                         "PER ENV, so transitions/epoch = envs * steps)")
    ap.add_argument("--reeval-transmissions", type=int, default=512)
    ap.add_argument("--reeval-seeds", type=int, nargs="+",
                    default=[11, 12, 13, 14, 15])
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU run: wifi env, 2 epochs x 2 steps")
    args = ap.parse_args()

    from ldpc_tpu.analysis.postprocess import _read_steps, action_heatmaps
    from ldpc_tpu.codes import near_earth_code, uncompress
    from ldpc_tpu.rl import train

    run_dir = f"{args.data_dir}/{args.exp_name}"
    tsv = f"{run_dir}/{args.exp_name}_s{args.seed}/steps.tsv"

    t0 = time.time()
    if args.smoke:
        # tiny env end-to-end (wifi code keeps CPU decode feasible)
        from ldpc_tpu.envs.code_search import LdpcCodeSearchEnv
        from ldpc_tpu.rl.ppo import PPOConfig, ppo
        from ldpc_tpu.codes import wifi_code
        from ldpc_tpu.utils.logging import EpochLogger

        logger = EpochLogger(
            output_dir=f"{run_dir}/{args.exp_name}_s{args.seed}",
            exp_name=args.exp_name)
        ppo(lambda: LdpcCodeSearchEnv(
                code=wifi_code(), snr_points=(3.0, 3.5, 4.0),
                num_transmissions=4, num_iterations=8, seed=args.seed,
                dmax_cn_cap=24, dmax_vn_cap=8),
            PPOConfig(steps_per_epoch=2, epochs=2, seed=args.seed,
                      entropy_bonus=True),
            logger=logger)
        block_rows, block_cols, z = 4, 24, 81
        reeval_tx, reeval_seeds, reeval_iters = 8, [11, 12], 8
        base_code = wifi_code()
    else:
        train.main([
            "--epochs", str(args.epochs), "--steps", str(args.steps),
            "--num_transmissions", *[str(t) for t in args.num_transmissions],
            "--floor_penalty", str(args.floor_penalty),
            *(["--phase1_iterations", str(args.phase1_iterations)]
              if args.phase1_iterations else []),
            "--entropy_bonus", "--seed", str(args.seed),
            "--num_envs", str(args.num_envs),
            "--exp_name", args.exp_name, "--data_dir", args.data_dir,
            "--snr", *[str(s) for s in args.snr]]
            + (["--start_instance", args.start_instance]
               if args.start_instance else []))
        block_rows, block_cols, z = 2, 16, 511
        reeval_tx, reeval_seeds, reeval_iters = (
            args.reeval_transmissions, args.reeval_seeds, 50)
        if args.start_instance:
            from ldpc_tpu.codes.io import load_code_instance
            base_code = load_code_instance(args.start_instance)[0]
        else:
            base_code = near_earth_code()
    train_s = time.time() - t0

    # --- learning curve summary + heatmaps ---
    from ldpc_tpu.analysis.postprocess import learning_windows
    df = _read_steps(tsv)
    n_ep = df["epoch"].max() + 1
    windows = learning_windows(df)
    action_heatmaps(tsv, save_figures=True)

    # --- re-evaluate the best code vs the start state ---
    best_row = df.loc[df["reward"].idxmax()]
    obs = np.frombuffer(bytes.fromhex(best_row["observation_hex"]),
                        np.uint8)
    best_code = uncompress(obs, block_rows, block_cols, z)
    snrs = (3.0, 3.5, 4.0) if args.smoke else tuple(args.snr)
    base_m, base_s, _ = reeval_reward(base_code, snrs, reeval_tx,
                                      reeval_iters, reeval_seeds)
    best_m, best_s, _ = reeval_reward(best_code, snrs, reeval_tx,
                                      reeval_iters, reeval_seeds)

    out = {
        "exp_name": args.exp_name, "epochs": int(n_ep),
        "steps_per_epoch": args.steps, "snr_points": list(snrs),
        "train_seconds": train_s, "windows": windows,
        "train_best_reward": float(best_row["reward"]),
        "published_wide_baseline": WIDE_BASELINE,
        "reeval": {
            "transmissions": reeval_tx, "seeds": list(reeval_seeds),
            "start_code": {"mean": base_m, "std": base_s},
            "best_found": {"mean": best_m, "std": best_s},
        },
    }
    with open(f"{run_dir}/summary.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))

    if not args.smoke:
        md = [
            "# PPO code search, wide reward window (3.0-3.8 dB)",
            "",
            f"{n_ep} epochs x {args.steps} steps on the near-earth "
            f"code-search env, "
            f"{'/'.join(str(t) for t in args.num_transmissions)} "
            "transmissions per "
            f"(SNR, step) over SNR {list(args.snr)} dB, 50 decode "
            "iterations, standard entropy bonus, seed "
            f"{args.seed} ({train_s:,.0f} s on one chip).  Reward = "
            "∫(1 − fitted BER line) over 3.0-3.8 dB; the reference's "
            f"published near-earth constant is {WIDE_BASELINE:.4f} "
            "(postProcessing.py:18).  Artifacts in "
            f"`experiments/{args.exp_name}/`.",
            "", "## Learning", "",
            "| window | mean step reward | max | fraction > 0 |",
            "|---|---|---|---|",
        ]
        for win in windows:
            md.append(f"| {win['window']} | {win['mean']:.3f} | "
                      f"{win['max']:.3f} | {win['frac_positive']:.2f} |")
        md += [
            "", "## Best discovered code, re-evaluated", "",
            f"High-fidelity re-eval ({reeval_tx} transmissions x "
            f"{len(snrs)} SNR x {len(reeval_seeds)} seeds):", "",
            "| code | reward (mean ± std) |",
            "|---|---|",
            f"| CCSDS near-earth (start state) | {base_m:.5f} ± "
            f"{base_s:.5f} |",
            f"| best found | **{best_m:.5f} ± {best_s:.5f}** |",
        ]
        md_path = ("/root/repo/docs/rl_search_wide.md"
                   if args.exp_name == "search_wide"
                   else f"/root/repo/docs/rl_{args.exp_name}.md")
        with open(md_path, "w") as f:
            f.write("\n".join(md) + "\n")
        print(f"wrote {md_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
