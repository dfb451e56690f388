"""Training entry point + multi-chip dry run.

``main`` is the ``python openAIppo.py`` equivalent (openAIppo.py:546-576)
with argparse defaults matching the reference CLI.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from .model import ActorCriticConfig, init_params
from .ppo import PPOConfig, make_update_fns, ppo

__all__ = ["main", "dryrun_train_step"]


def dryrun_train_step(mesh) -> None:
    """One PPO policy + value update on tiny shapes, batch sharded over
    the mesh (called by __graft_entry__.dryrun_multichip)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    ndev = int(np.prod(list(mesh.shape.values())))
    cfg = ActorCriticConfig(obs_dim=64, hidden=16, row_range=2, col_range=4,
                            z=31, max_hot=3)
    ppo_cfg = PPOConfig(steps_per_epoch=2 * ndev)
    actor_params, critic_params = init_params(cfg, seed=0)
    pi_opt, vf_opt, pi_update, v_update = make_update_fns(
        cfg, ppo_cfg, mesh=mesh)
    pi_state, vf_state = pi_opt.init(actor_params), vf_opt.init(critic_params)

    b = 2 * ndev
    data = NamedSharding(mesh, P(DATA_AXIS))
    key = jax.random.key(0)
    obs = jax.device_put(
        jax.random.uniform(key, (b, cfg.obs_dim)), data)
    act = jax.device_put(jnp.concatenate([
        jnp.zeros((b, 2), jnp.int32),
        jnp.ones((b, 1), jnp.int32),
        jnp.zeros((b, cfg.max_hot), jnp.int32)], axis=-1), data)
    adv = jax.device_put(jnp.ones((b,), jnp.float32), data)
    ret = jax.device_put(jnp.ones((b,), jnp.float32), data)
    logp = jax.device_put(jnp.full((b,), -3.0, jnp.float32), data)

    actor_params, pi_state, extras = pi_update(
        actor_params, pi_state, obs, act, adv, logp)
    critic_params, vf_state, v_l = v_update(critic_params, vf_state, obs,
                                            ret)
    jax.block_until_ready((extras["kl"], v_l))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="PPO code search (openAIppo.py equivalent)")
    parser.add_argument("--hid", type=int, default=64)
    parser.add_argument("--gamma", type=float, default=0.99)
    parser.add_argument("--seed", "-s", type=int, default=30)
    parser.add_argument("--steps", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--entropyCoefficient", type=float, default=0.01)
    parser.add_argument("--entropy_bonus", action="store_true",
                        help="standard entropy bonus (explore) instead of "
                             "the reference's penalty sign, openAIppo.py:337")
    parser.add_argument("--policyCoefficient", type=float, default=1.0)
    parser.add_argument("--exp_name", type=str, default="ppo")
    parser.add_argument("--data_dir", type=str,
                        default=f"/tmp/experiments/{int(time.time())}")
    parser.add_argument("--num_transmissions", type=int, nargs="+",
                        default=[10],
                        help="per (SNR, step); one value applies to every "
                             "SNR point, N values give each point its own "
                             "count (deep floor points are nearly free — "
                             "high-SNR words converge in ~4-6 iterations)")
    parser.add_argument("--phase1_iterations", type=int, default=None,
                        help="host-staged env decode: phase-1 cap; only "
                             "failures pay the full budget (identical "
                             "results, big win for deep floor points)")
    parser.add_argument("--floor_penalty", type=float, nargs="+",
                        default=[0.0],
                        help="subtract penalty_i * FER(floor point i) "
                             "from the reward (floor-aware search; the "
                             "plain integral is waterfall-dominated); one "
                             "value per --floor_snr_index entry")
    parser.add_argument("--floor_snr_index", type=int, nargs="+",
                        default=[-1],
                        help="indices into --snr of the floor-penalty "
                             "points (default: the highest point)")
    parser.add_argument("--floor_penalty_final", type=float, default=None,
                        help="anneal the floor-penalty SCALE linearly "
                             "from 1.0 at epoch 0 to final/initial at the "
                             "last epoch (initial = the largest "
                             "--floor_penalty term); resume recomputes "
                             "the schedule from the epoch number")
    parser.add_argument("--snr", type=float, nargs="+", default=None,
                        help="env SNR points (default 3.0 3.2 3.4, "
                             "ldpc_env.py:88; e.g. 3.0 3.2 3.4 3.6 3.8 "
                             "searches the reference's wide reward window, "
                             "postProcessing.py:18)")
    parser.add_argument("--num_envs", "--cpu", type=int, default=1,
                        help="parallel rollout envs (the reference's "
                             "mpi_fork rank count, openAIppo.py:564; "
                             "replicas are reseeded seed + 10000*i)")
    parser.add_argument("--resume", action="store_true",
                        help="restore the latest checkpoint (params, "
                             "optimizer states, PRNG key, env states) and "
                             "continue; progress/steps logs are appended")
    parser.add_argument("--start_instance", default=None,
                        help="path to a saved code instance (.npz/.mat) "
                             "to use as the search start state instead of "
                             "CCSDS near-earth — e.g. bootstrap a new "
                             "search from a previously discovered code")
    parser.add_argument("--start_code", default=None,
                        choices=["near-earth", "wifi"],
                        help="named start state: 'wifi' searches the "
                             "802.11n rate-5/6 shape (4x24, Z=81) — the "
                             "env/decoder/encoder are code-agnostic, so "
                             "the MDP generalizes beyond the reference's "
                             "hardcoded near-earth family "
                             "(wifiMatrices.py:6-34 + ldpc_env.py:82-90)")
    parser.add_argument("--dmax_cn_cap", type=int, default=None,
                        help="check-degree cap for the dynamic decoder "
                             "(default: env default 48; wifi uses 24)")
    parser.add_argument("--dmax_vn_cap", type=int, default=None,
                        help="variable-degree cap (default 18; wifi 8)")
    args = parser.parse_args(argv)

    from ..envs.code_search import LdpcCodeSearchEnv
    from ..utils.logging import EpochLogger

    ppo_cfg = PPOConfig(
        steps_per_epoch=args.steps, epochs=args.epochs, gamma=args.gamma,
        seed=args.seed, entropy_coefficient=args.entropyCoefficient,
        entropy_bonus=args.entropy_bonus,
        policy_coefficient=args.policyCoefficient)
    logger = EpochLogger(
        output_dir=f"{args.data_dir}/{args.exp_name}/"
                   f"{args.exp_name}_s{args.seed}",
        exp_name=args.exp_name, append=args.resume)
    env_kw = {} if args.snr is None else {"snr_points": tuple(args.snr)}
    tx = (args.num_transmissions[0] if len(args.num_transmissions) == 1
          else tuple(args.num_transmissions))
    if any(args.floor_penalty):
        env_kw["floor_penalty"] = (
            args.floor_penalty[0] if len(args.floor_penalty) == 1
            else tuple(args.floor_penalty))
        env_kw["floor_snr_index"] = (
            args.floor_snr_index[0] if len(args.floor_snr_index) == 1
            else tuple(args.floor_snr_index))
    epoch_callback = None
    if args.floor_penalty_final is not None and any(args.floor_penalty):
        initial = max(args.floor_penalty)
        ratio = args.floor_penalty_final / initial
        last = max(1, args.epochs - 1)

        def epoch_callback(epoch, envs):  # noqa: F811 — the anneal hook
            scale = 1.0 + (ratio - 1.0) * min(epoch, last) / last
            for e in envs:
                e.floor_penalty_scale = scale
    if args.phase1_iterations:
        env_kw["phase1_iterations"] = args.phase1_iterations
    if args.start_instance:
        from ..codes.io import load_code_instance
        env_kw["code"] = load_code_instance(args.start_instance)[0]
    elif args.start_code == "wifi":
        from ..codes import wifi_code
        env_kw["code"] = wifi_code()
        env_kw.setdefault("dmax_cn_cap", 24)
        env_kw.setdefault("dmax_vn_cap", 8)
    if args.dmax_cn_cap:
        env_kw["dmax_cn_cap"] = args.dmax_cn_cap
    if args.dmax_vn_cap:
        env_kw["dmax_vn_cap"] = args.dmax_vn_cap
    return ppo(lambda: LdpcCodeSearchEnv(
        seed=args.seed, num_transmissions=tx, **env_kw),
        ppo_cfg, logger=logger, num_envs=args.num_envs, resume=args.resume,
        checkpoint_dir=f"{args.data_dir}/{args.exp_name}/checkpoints",
        epoch_callback=epoch_callback)


if __name__ == "__main__":
    main()
