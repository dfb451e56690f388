"""DDPG (and its TD3 extension) — JAX versions of the vendored Spinning Up
algorithms (``spinup/algos/pytorch/ddpg``, ``.../td3``; SURVEY.md §2 L4).

One module implements both: ``td3=True`` enables the three TD3 additions —
twin critics with min-target, target-policy smoothing noise, delayed
policy updates — over the DDPG baseline (deterministic actor, single/twin
Q, polyak target networks, uniform replay, Gaussian exploration noise).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.logging import EpochLogger
from .continuous import (DeterministicActor, QCritic, ReplayBuffer,
                         polyak_update)

__all__ = ["DDPGConfig", "ddpg", "td3"]


@dataclasses.dataclass
class DDPGConfig:
    steps_per_epoch: int = 256
    epochs: int = 10
    replay_size: int = 100_000
    gamma: float = 0.99
    polyak: float = 0.995
    pi_lr: float = 1e-3
    q_lr: float = 1e-3
    batch_size: int = 64
    start_steps: int = 256      # uniform-random warmup actions
    update_after: int = 256
    update_every: int = 32
    act_noise: float = 0.1
    # TD3 extras (spinup td3 defaults)
    target_noise: float = 0.2
    noise_clip: float = 0.5
    policy_delay: int = 2
    seed: int = 0


def ddpg(env_fn: Callable, cfg: DDPGConfig | None = None, *,
         td3_mode: bool = False, logger: EpochLogger | None = None,
         output_dir=None):
    """Run DDPG (or TD3 with td3_mode=True); returns (params dict, logger)."""
    cfg = cfg or DDPGConfig()
    env = env_fn()
    obs_dim, act_dim = env.obs_dim, env.act_dim
    act_limit = getattr(env, "act_limit", 1.0)
    rng_np = np.random.RandomState(cfg.seed)
    key = jax.random.key(cfg.seed)

    actor = DeterministicActor(act_dim, act_limit)
    q1 = QCritic()
    q2 = QCritic()
    obs0 = jnp.zeros((1, obs_dim))
    act0 = jnp.zeros((1, act_dim))
    k1, k2, k3 = jax.random.split(key, 3)
    pi_params = actor.init(k1, obs0)
    q1_params = q1.init(k2, obs0, act0)
    q2_params = q2.init(k3, obs0, act0)
    targ = {"pi": pi_params, "q1": q1_params, "q2": q2_params}

    pi_opt = optax.adam(cfg.pi_lr)
    q_opt = optax.adam(cfg.q_lr)
    pi_state = pi_opt.init(pi_params)
    q_state = q_opt.init((q1_params, q2_params))

    @jax.jit
    def q_update(qp, q_state, targ, batch, noise_key):
        def loss(qp):
            q1p, q2p = qp
            a2 = actor.apply(targ["pi"], batch["obs2"])
            if td3_mode:
                eps = jnp.clip(
                    cfg.target_noise * jax.random.normal(noise_key,
                                                         a2.shape),
                    -cfg.noise_clip, cfg.noise_clip)
                a2 = jnp.clip(a2 + eps, -act_limit, act_limit)
            qt1 = q1.apply(targ["q1"], batch["obs2"], a2)
            if td3_mode:
                qt2 = q2.apply(targ["q2"], batch["obs2"], a2)
                qt = jnp.minimum(qt1, qt2)
            else:
                qt = qt1
            backup = batch["rew"] + cfg.gamma * (1 - batch["done"]) * qt
            backup = jax.lax.stop_gradient(backup)
            l1 = jnp.mean((q1.apply(q1p, batch["obs"], batch["act"]) -
                           backup) ** 2)
            l2 = jnp.mean((q2.apply(q2p, batch["obs"], batch["act"]) -
                           backup) ** 2) if td3_mode else 0.0
            return l1 + l2

        l, grads = jax.value_and_grad(loss)(qp)
        updates, q_state = q_opt.update(grads, q_state, qp)
        return optax.apply_updates(qp, updates), q_state, l

    @jax.jit
    def pi_update(pi_params, pi_state, q1_params, batch):
        def loss(p):
            a = actor.apply(p, batch["obs"])
            return -jnp.mean(q1.apply(q1_params, batch["obs"], a))

        l, grads = jax.value_and_grad(loss)(pi_params)
        updates, pi_state = pi_opt.update(grads, pi_state, pi_params)
        return optax.apply_updates(pi_params, updates), pi_state, l

    @jax.jit
    def polyak_all(targ, pi_params, q1_params, q2_params):
        return {
            "pi": polyak_update(targ["pi"], pi_params, cfg.polyak),
            "q1": polyak_update(targ["q1"], q1_params, cfg.polyak),
            "q2": polyak_update(targ["q2"], q2_params, cfg.polyak),
        }

    act_fn = jax.jit(lambda p, o: actor.apply(p, o))

    logger = logger or EpochLogger(output_dir=output_dir,
                                   exp_name="td3" if td3_mode else "ddpg")
    buf = ReplayBuffer(obs_dim, act_dim, cfg.replay_size)
    obs = env.reset()
    ep_ret, ep_len = 0.0, 0
    total_steps = cfg.steps_per_epoch * cfg.epochs
    start = time.time()
    updates_done = 0
    q_l = pi_l = 0.0

    for t in range(total_steps):
        if t < cfg.start_steps:
            a = rng_np.uniform(-act_limit, act_limit, act_dim)
        else:
            a = np.asarray(act_fn(pi_params, obs[None]))[0]
            a = np.clip(a + cfg.act_noise * rng_np.randn(act_dim),
                        -act_limit, act_limit)
        obs2, r, done, _ = env.step(a)
        buf.store(obs, a, r, obs2, done)
        obs = obs2
        ep_ret += r
        ep_len += 1
        if done:
            logger.store(EpRet=ep_ret, EpLen=ep_len)
            obs = env.reset()
            ep_ret, ep_len = 0.0, 0

        if t >= cfg.update_after and t % cfg.update_every == 0:
            for j in range(cfg.update_every):
                batch = {k: jnp.asarray(v) for k, v in
                         buf.sample(rng_np, cfg.batch_size).items()}
                key, nk = jax.random.split(key)
                (q1_params, q2_params), q_state, q_l = q_update(
                    (q1_params, q2_params), q_state, targ, batch, nk)
                if not td3_mode or updates_done % cfg.policy_delay == 0:
                    pi_params, pi_state, pi_l = pi_update(
                        pi_params, pi_state, q1_params, batch)
                    targ = polyak_all(targ, pi_params, q1_params, q2_params)
                updates_done += 1

        if (t + 1) % cfg.steps_per_epoch == 0:
            logger.log_tabular("Epoch", (t + 1) // cfg.steps_per_epoch)
            logger.log_tabular("EpRet", with_min_and_max=True)
            logger.log_tabular("EpLen", average_only=True)
            logger.log_tabular("LossQ", float(q_l))
            logger.log_tabular("LossPi", float(pi_l))
            logger.log_tabular("Time", time.time() - start)
            logger.dump_tabular()

    return {"pi": pi_params, "q1": q1_params, "q2": q2_params}, logger


def td3(env_fn: Callable, cfg: DDPGConfig | None = None, **kw):
    """TD3 = DDPG + twin critics + target smoothing + delayed policy
    updates (spinup/algos/pytorch/td3)."""
    return ddpg(env_fn, cfg, td3_mode=True, **kw)
