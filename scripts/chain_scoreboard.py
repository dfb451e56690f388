"""Score an arbitrary set of code instances under the chain protocol.

The discovery chain's figure of merit (docs/discovery_chain.md) is the
r4 protocol: plain fitted-line reward (512 tx x 5 SNR x 5 seeds,
∫(1−fit) over 3.0-3.8 dB — the reference's reward of
gym-ldpc/gym_ldpc/envs/ldpc_env.py:319-345) plus a deep FER floor term
(default 262,144 words @3.8 dB, staged Pallas engine) giving the
penalized objective ``reward − λ·FER``.  Unlike
``floor_search_analysis.py`` (pinned to the r4 chain), this takes any
``name=instance.npz`` pairs — the turnkey scoreboard for adjudicating a
new chain member against its ancestors.

Run ON THE REAL CHIP:
    python scripts/chain_scoreboard.py \
        s47=docs/experiments/search_wide/511_2_16_16123b65….npz \
        floor2=docs/experiments/search_floor2/511_2_16_<new>.npz
CPU smoke:
    LDPC_TPU_PLATFORM=cpu python scripts/chain_scoreboard.py --smoke
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("codes", nargs="*",
                    help="name=instance.npz pairs (near_earth is always "
                         "included as the root baseline)")
    ap.add_argument("--penalty", type=float, default=30.0)
    ap.add_argument("--floor-snr", type=float, default=3.8)
    ap.add_argument("--floor-words", type=int, default=262144)
    ap.add_argument("--reeval-tx", type=int, default=512)
    ap.add_argument("--reeval-seeds", type=int, nargs="+",
                    default=[11, 12, 13, 14, 15])
    ap.add_argument("--snr", type=float, nargs="+",
                    default=[3.0, 3.2, 3.4, 3.6, 3.8])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--out", default="/root/repo/docs/chain_scoreboard")
    ap.add_argument("--no-near-earth", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU pass on the wifi code only")
    args = ap.parse_args(argv)

    from ldpc_tpu.analysis.postprocess import reeval_reward
    from ldpc_tpu.codes import near_earth_code, wifi_code
    from ldpc_tpu.codes.io import load_code_instance
    from ldpc_tpu.sim.evaluate import evaluate_code
    from ldpc_tpu.sim.stats import wilson_interval

    on_cpu = os.environ.get("LDPC_TPU_PLATFORM") == "cpu"
    if args.smoke:
        codes = {"wifi": wifi_code()}
        args.snr, args.floor_snr = [2.0, 2.6, 3.2], 3.2
        args.reeval_tx, args.reeval_seeds = 4, [11]
        args.floor_words, args.iters = 32, 10
    else:
        codes = {} if args.no_near_earth else {
            "near_earth": near_earth_code()}
        instances = {}
        for pair in args.codes:
            name, path = pair.split("=", 1)
            codes[name] = load_code_instance(path)[0]
            instances[name] = path

    eval_kw = {} if on_cpu else dict(batch_size=16384, staged=True,
                                     engine="pallas")
    out = {"penalty": args.penalty, "floor_snr_db": args.floor_snr,
           "floor_words": args.floor_words, "snr_points": args.snr,
           "reeval": {"transmissions": args.reeval_tx,
                      "seeds": args.reeval_seeds},
           "instances": {} if args.smoke else instances,
           "codes": {}}
    for name, code in codes.items():
        t0 = time.time()
        rm, rs, _ = reeval_reward(code, tuple(args.snr), args.reeval_tx,
                                  args.iters, args.reeval_seeds)
        stats = evaluate_code(code, [args.floor_snr], args.floor_words,
                              args.iters, seed=515151, **eval_kw)
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

    if on_cpu or args.smoke:
        print("CPU smoke only — not writing artifacts", flush=True)
        return out
    with open(args.out + ".json", "w") as f:
        json.dump(out, f, indent=1)
    rows = [f"# Chain scoreboard (λ={args.penalty} @{args.floor_snr} dB, "
            f"{args.floor_words:,} floor words)", "",
            f"| code | plain reward | FER@{args.floor_snr} (Wilson 95%) "
            "| penalized objective |", "|---|---|---|---|"]
    for name, c in sorted(out["codes"].items(),
                          key=lambda kv: -kv[1]["penalized"]):
        rows.append(
            f"| {name} | {c['reward_mean']:.5f} ± {c['reward_std']:.5f} | "
            f"{c['fer_floor']:.3e} [{c['fer_wilson95'][0]:.1e}, "
            f"{c['fer_wilson95'][1]:.1e}] | {c['penalized']:.5f} |")
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {args.out}.json / .md", flush=True)
    return out


if __name__ == "__main__":
    main()
