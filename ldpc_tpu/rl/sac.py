"""Soft Actor-Critic — JAX version of the vendored Spinning Up SAC
(``spinup/algos/pytorch/sac``; SURVEY.md §2 L4).

Squashed-Gaussian actor with reparameterized sampling, twin Q critics with
min-target, entropy-regularized backup, polyak target critics, uniform
replay.  Temperature ``alpha`` is fixed by default (as in the vendored
copy) or tuned automatically (``auto_alpha=True``): ``log_alpha`` is a
learned parameter minimizing ``-log_alpha * (logp + target_entropy)``,
driving the policy entropy toward ``target_entropy`` (default
``-act_dim``, the SAC-v2 heuristic) — a capability the reference lacks.
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
from .continuous import (QCritic, ReplayBuffer, SquashedGaussianActor,
                         polyak_update)

__all__ = ["SACConfig", "sac"]


@dataclasses.dataclass
class SACConfig:
    steps_per_epoch: int = 256
    epochs: int = 10
    replay_size: int = 100_000
    gamma: float = 0.99
    polyak: float = 0.995
    lr: float = 1e-3
    alpha: float = 0.2
    batch_size: int = 64
    start_steps: int = 256
    update_after: int = 256
    update_every: int = 32
    seed: int = 0
    auto_alpha: bool = False
    target_entropy: float | None = None   # default: -act_dim


def sac(env_fn: Callable, cfg: SACConfig | None = None, *,
        logger: EpochLogger | None = None, output_dir=None):
    cfg = cfg or SACConfig()
    env = env_fn()
    obs_dim, act_dim = env.obs_dim, env.act_dim
    act_limit = getattr(env, "act_limit", 1.0)
    rng_np = np.random.RandomState(cfg.seed)
    key = jax.random.key(cfg.seed)

    actor = SquashedGaussianActor(act_dim, act_limit)
    q1, q2 = QCritic(), QCritic()
    obs0 = jnp.zeros((1, obs_dim))
    act0 = jnp.zeros((1, act_dim))
    k1, k2, k3 = jax.random.split(key, 3)
    pi_params = actor.init(k1, obs0)
    q1_params = q1.init(k2, obs0, act0)
    q2_params = q2.init(k3, obs0, act0)
    targ = {"q1": q1_params, "q2": q2_params}

    pi_opt = optax.adam(cfg.lr)
    q_opt = optax.adam(cfg.lr)
    pi_state = pi_opt.init(pi_params)
    q_state = q_opt.init((q1_params, q2_params))
    target_entropy = (cfg.target_entropy if cfg.target_entropy is not None
                      else -float(act_dim))
    log_alpha = jnp.asarray(np.log(cfg.alpha), jnp.float32)
    alpha_opt = optax.adam(cfg.lr)
    alpha_state = alpha_opt.init(log_alpha)

    @jax.jit
    def q_update(qp, q_state, targ, pi_params, alpha, batch, rng):
        def loss(qp):
            q1p, q2p = qp
            a2, logp2 = actor.apply(pi_params, batch["obs2"], rng)
            qt = jnp.minimum(q1.apply(targ["q1"], batch["obs2"], a2),
                             q2.apply(targ["q2"], batch["obs2"], a2))
            backup = batch["rew"] + cfg.gamma * (1 - batch["done"]) * (
                qt - alpha * logp2)
            backup = jax.lax.stop_gradient(backup)
            l1 = jnp.mean((q1.apply(q1p, batch["obs"], batch["act"]) -
                           backup) ** 2)
            l2 = jnp.mean((q2.apply(q2p, batch["obs"], batch["act"]) -
                           backup) ** 2)
            return l1 + l2

        l, grads = jax.value_and_grad(loss)(qp)
        updates, q_state = q_opt.update(grads, q_state, qp)
        return optax.apply_updates(qp, updates), q_state, l

    @jax.jit
    def pi_update(pi_params, pi_state, qp, alpha, batch, rng):
        q1p, q2p = qp

        def loss(p):
            a, logp = actor.apply(p, batch["obs"], rng)
            q = jnp.minimum(q1.apply(q1p, batch["obs"], a),
                            q2.apply(q2p, batch["obs"], a))
            return jnp.mean(alpha * logp - q), jnp.mean(logp)

        (l, mean_logp), grads = jax.value_and_grad(
            loss, has_aux=True)(pi_params)
        updates, pi_state = pi_opt.update(grads, pi_state, pi_params)
        return (optax.apply_updates(pi_params, updates), pi_state, l,
                mean_logp)

    @jax.jit
    def alpha_update(log_alpha, alpha_state, mean_logp):
        def loss(la):
            return -la * jax.lax.stop_gradient(mean_logp + target_entropy)

        l, g = jax.value_and_grad(loss)(log_alpha)
        updates, alpha_state = alpha_opt.update(g, alpha_state, log_alpha)
        return optax.apply_updates(log_alpha, updates), alpha_state

    @jax.jit
    def polyak_targ(targ, q1_params, q2_params):
        return {"q1": polyak_update(targ["q1"], q1_params, cfg.polyak),
                "q2": polyak_update(targ["q2"], q2_params, cfg.polyak)}

    act_fn = jax.jit(lambda p, o, r: actor.apply(p, o, r)[0])
    act_det = jax.jit(
        lambda p, o: actor.apply(p, o, deterministic=True)[0])

    logger = logger or EpochLogger(output_dir=output_dir, exp_name="sac")
    buf = ReplayBuffer(obs_dim, act_dim, cfg.replay_size)
    obs = env.reset()
    ep_ret, ep_len = 0.0, 0
    start = time.time()
    q_l = pi_l = ent = 0.0

    for t in range(cfg.steps_per_epoch * cfg.epochs):
        if t < cfg.start_steps:
            a = rng_np.uniform(-act_limit, act_limit, act_dim)
        else:
            key, ak = jax.random.split(key)
            a = np.asarray(act_fn(pi_params, obs[None], ak))[0]
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
            for _ in range(cfg.update_every):
                batch = {k: jnp.asarray(v) for k, v in
                         buf.sample(rng_np, cfg.batch_size).items()}
                key, k_q, k_pi = jax.random.split(key, 3)
                alpha = jnp.exp(log_alpha)
                (q1_params, q2_params), q_state, q_l = q_update(
                    (q1_params, q2_params), q_state, targ, pi_params,
                    alpha, batch, k_q)
                pi_params, pi_state, pi_l, mean_logp = pi_update(
                    pi_params, pi_state, (q1_params, q2_params), alpha,
                    batch, k_pi)
                ent = -mean_logp
                if cfg.auto_alpha:
                    log_alpha, alpha_state = alpha_update(
                        log_alpha, alpha_state, mean_logp)
                targ = polyak_targ(targ, q1_params, q2_params)

        if (t + 1) % cfg.steps_per_epoch == 0:
            logger.log_tabular("Epoch", (t + 1) // cfg.steps_per_epoch)
            logger.log_tabular("EpRet", with_min_and_max=True)
            logger.log_tabular("LossQ", float(q_l))
            logger.log_tabular("LossPi", float(pi_l))
            logger.log_tabular("Entropy", float(ent))
            logger.log_tabular("Alpha", float(jnp.exp(log_alpha)))
            logger.log_tabular("Time", time.time() - start)
            logger.dump_tabular()

    params = {"pi": pi_params, "q1": q1_params, "q2": q2_params,
              "log_alpha": log_alpha}
    return params, logger, act_det
