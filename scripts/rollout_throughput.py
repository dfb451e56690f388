"""Measured env-steps/s for the parallel PPO rollout (VERDICT r3 #1).

Drives EnvironmentVector at 1 / 4 / 8 envs with random legal actions
(the randomAgent action distribution: uniform block coords, 3-7 hot
bits) and reports wall-clock env-steps/s on the default env config
(near-earth, SNR {3.0, 3.2, 3.4} x 10 transmissions, 50 iterations,
dynamic-plan decoder).  Both vector modes are measured:

* sequential (batched=False) — one decode dispatch per env per step,
  the mode ``ppo(num_envs=N)`` uses on a single chip;
* fused (batched=True) — all envs' candidate decodes in ONE vmapped
  dispatch (pays off when the candidate axis is sharded over a mesh;
  on one chip the per-candidate gathers lower worse, see envs/vector.py).

Writes docs/rollout_throughput.json (+ .md table).

Run ON THE REAL CHIP:  python scripts/rollout_throughput.py
CPU smoke:  LDPC_TPU_PLATFORM=cpu python scripts/rollout_throughput.py \
    --steps 2 --warm 1 --envs 1 2 --code wifi
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


def random_actions(envs, rng, hot=(3, 7)):
    """One legal-ish action per env, the randomAgent distribution
    (randomAgent.py:35-131: uniform i/j, 3-7 hot bits)."""
    acts = []
    for e in envs:
        x = rng.randint(0, e.state.block_rows)
        y = rng.randint(0, e.state.block_cols)
        k = rng.randint(hot[0], hot[1] + 1)
        row = np.zeros(e.z, np.int32)
        row[rng.choice(e.z, size=k, replace=False)] = 1
        xb = [int(b) for b in np.binary_repr(x, e.x_bits)]
        yb = [int(b) for b in np.binary_repr(y, e.y_bits)]
        acts.append(np.concatenate([xb, yb, row]).astype(np.int32))
    return acts


def measure(n_envs, batched, steps, warm, code, seed, tx):
    from ldpc_tpu.envs import LdpcCodeSearchEnv
    from ldpc_tpu.envs.vector import EnvironmentVector

    kw = dict(num_transmissions=tx)
    if code is not None:
        kw["code"] = code
        kw.update(num_iterations=8, dmax_cn_cap=32, dmax_vn_cap=12)
    vec = EnvironmentVector(
        [lambda i=i: LdpcCodeSearchEnv(seed=seed + 10000 * i, **kw)
         for i in range(n_envs)], batched=batched if n_envs > 1 else None)
    vec.reset()
    rng = np.random.RandomState(seed)
    for _ in range(warm):
        vec.step(random_actions(vec.envs, rng))
    t0 = time.time()
    legal = 0
    for _ in range(steps):
        _, _, _, infos = vec.step(random_actions(vec.envs, rng))
        legal += sum(1 for i in infos if i["legal"])
    dt = time.time() - t0
    return {"envs": n_envs, "mode": ("fused" if batched else "sequential"),
            "steps": steps, "legal_fraction": legal / (steps * n_envs),
            "wall_s": round(dt, 3),
            "env_steps_per_s": round(steps * n_envs / dt, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--tx", type=int, default=10)
    ap.add_argument("--seed", type=int, default=97)
    ap.add_argument("--code", default="near-earth")
    ap.add_argument("--out", default="/root/repo/docs/rollout_throughput")
    args = ap.parse_args()

    code = None
    if args.code == "wifi":
        from ldpc_tpu.codes import wifi_code
        code = wifi_code()

    rows = []
    for n in args.envs:
        modes = [False] if n == 1 else [False, True]
        for batched in modes:
            r = measure(n, batched, args.steps, args.warm, code,
                        args.seed, args.tx)
            rows.append(r)
            print(json.dumps(r), flush=True)

    if os.environ.get("LDPC_TPU_PLATFORM") == "cpu":
        print("CPU smoke only — not writing artifacts", flush=True)
        return
    base = next((r["env_steps_per_s"] for r in rows if r["envs"] == 1),
                rows[0]["env_steps_per_s"])
    out = {"config": {"code": args.code, "tx": args.tx,
                      "steps": args.steps}, "rows": rows,
           "single_env_steps_per_s": base}
    with open(args.out + ".json", "w") as f:
        json.dump(out, f, indent=1)
    md = ["# Parallel rollout throughput (env-steps/s, one chip)", "",
          f"Near-earth code-search env (SNR 3.0/3.2/3.4 x {args.tx} "
          "transmissions, 50 iterations, dynamic-plan decoder), random "
          "legal actions, measured wall clock.  ``ppo(num_envs=N)`` uses "
          "the sequential vector mode on a single chip; the fused mode "
          "is the mesh-sharded path's single-device fallback.", "",
          "| envs | mode | env-steps/s | vs 1 env |", "|---|---|---|---|"]
    for r in rows:
        md.append(f"| {r['envs']} | {r['mode']} | "
                  f"{r['env_steps_per_s']:.3f} | "
                  f"{r['env_steps_per_s'] / base:.2f}x |")
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"wrote {args.out}.json / .md", flush=True)


if __name__ == "__main__":
    main()
