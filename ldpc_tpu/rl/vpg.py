"""Vanilla Policy Gradient for LDPC code search.

The reference vendors the full Spinning Up algorithm suite
(``spinup/algos/pytorch/vpg``, SURVEY.md §2 L4) though only PPO is wired to
the LDPC env.  This VPG is wired: same autoregressive actor-critic, GAE
buffer and logging as ``rl/ppo.py``, with the plain policy-gradient loss
``-E[logp * adv]`` (one policy step per epoch) and multiple value steps.
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
from .buffer import PPOBuffer
from .model import (ActorCriticConfig, Critic, action_to_env_action,
                    evaluate_actions, init_params, sample_step)

__all__ = ["VPGConfig", "vpg"]


@dataclasses.dataclass
class VPGConfig:
    steps_per_epoch: int = 64
    epochs: int = 50
    gamma: float = 0.99
    pi_lr: float = 3e-4
    vf_lr: float = 1e-3
    train_v_iters: int = 80
    lam: float = 0.97
    seed: int = 30
    max_ep_len: int = 1000


def vpg(env_fn: Callable, cfg: VPGConfig | None = None,
        ac_cfg: ActorCriticConfig | None = None, *,
        logger: EpochLogger | None = None, output_dir=None):
    """Run VPG; returns (actor_params, critic_params, logger)."""
    cfg = cfg or VPGConfig()
    env = env_fn()
    obs_dim = env.observation_space.shape[0]
    if ac_cfg is None:
        ac_cfg = ActorCriticConfig(obs_dim=obs_dim,
                                   row_range=env.state.block_rows,
                                   col_range=env.state.block_cols,
                                   z=env.z)
    logger = logger or EpochLogger(output_dir=output_dir, exp_name="vpg")
    logger.save_config({"vpg": dataclasses.asdict(cfg),
                        "model": dataclasses.asdict(ac_cfg)})

    rng = jax.random.key(cfg.seed)
    actor_params, critic_params = init_params(ac_cfg, cfg.seed)
    pi_opt = optax.adam(cfg.pi_lr)
    vf_opt = optax.adam(cfg.vf_lr)
    pi_state = pi_opt.init(actor_params)
    vf_state = vf_opt.init(critic_params)

    @jax.jit
    def pi_update(params, opt_state, obs, act, adv):
        def loss(p):
            out = evaluate_actions(ac_cfg, p, obs, act)
            return -jnp.mean(out["logp"] * adv), out

        (l, out), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = pi_opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    @jax.jit
    def v_update(params, opt_state, obs, ret):
        def loss(p):
            v = Critic(ac_cfg).apply(p, obs)
            return jnp.mean((v - ret) ** 2)

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = vf_opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    sample_jit = jax.jit(
        lambda ap, cp, obs, key: sample_step(ac_cfg, ap, cp, obs, key))
    critic_apply = jax.jit(lambda cp, obs: Critic(ac_cfg).apply(cp, obs))

    buf = PPOBuffer(obs_dim, ac_cfg.buffer_action_dim, cfg.steps_per_epoch,
                    cfg.gamma, cfg.lam,
                    num_entropy_heads=ac_cfg.num_entropy_heads)
    start = time.time()
    obs = env.reset().astype(np.float32)
    ep_ret, ep_len = 0.0, 0

    for epoch in range(cfg.epochs):
        for t in range(cfg.steps_per_epoch):
            rng, key = jax.random.split(rng)
            ba, v, logp, ent = jax.device_get(sample_jit(
                actor_params, critic_params, obs[None], key))
            ba, v, logp = ba[0], float(v[0]), float(logp[0])
            next_obs, reward, done, info = env.step(
                action_to_env_action(ac_cfg, ba))
            buf.store(obs, ba, reward, v, logp, float(ent[0].sum()),
                      np.asarray(ent[0]))
            logger.store(VVals=v, Reward=reward)
            obs = next_obs.astype(np.float32)
            ep_ret += reward
            ep_len += 1
            terminal = done or ep_len == cfg.max_ep_len
            if terminal or t == cfg.steps_per_epoch - 1:
                last_v = 0.0 if done else float(jax.device_get(
                    critic_apply(critic_params, obs[None]))[0])
                buf.finish_path(last_v)
                if terminal:
                    logger.store(EpRet=ep_ret, EpLen=ep_len)
                    obs = env.reset().astype(np.float32)
                    ep_ret, ep_len = 0.0, 0

        data = buf.get()
        obs_b = jnp.asarray(data["obs"])
        act_b = jnp.asarray(data["act"])
        adv_b = jnp.asarray(data["adv"])
        ret_b = jnp.asarray(data["ret"])
        actor_params, pi_state, pi_l = pi_update(actor_params, pi_state,
                                                 obs_b, act_b, adv_b)
        for _ in range(cfg.train_v_iters):
            critic_params, vf_state, v_l = v_update(critic_params, vf_state,
                                                    obs_b, ret_b)
        logger.log_tabular("Epoch", epoch)
        logger.log_tabular("EpRet", with_min_and_max=True)
        logger.log_tabular("Reward", average_only=True)
        logger.log_tabular("VVals", average_only=True)
        logger.log_tabular("LossPi", float(pi_l))
        logger.log_tabular("LossV", float(v_l))
        logger.log_tabular("Time", time.time() - start)
        logger.dump_tabular()
    return actor_params, critic_params, logger
