"""TRPO — JAX version of the vendored Spinning Up TRPO
(``spinup/algos/tf1/trpo``; SURVEY.md §2 L4 — the reference only ships the
tf1 backend, per its ``DEFAULT_BACKEND``, user_config.py).

Natural-gradient policy step: the surrogate gradient is preconditioned by
the inverse Fisher matrix via conjugate gradients on Hessian-vector
products of the mean KL (clean with ``jax.jvp`` over ``jax.grad``),
followed by a backtracking line search enforcing the KL trust region and
surrogate improvement.  GAE advantages and a fitted value baseline reuse
the PPO buffer machinery.
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
from .continuous import GaussianActor, ValueCritic

__all__ = ["TRPOConfig", "trpo"]


@dataclasses.dataclass
class TRPOConfig:
    steps_per_epoch: int = 256
    epochs: int = 10
    gamma: float = 0.99
    lam: float = 0.97
    delta: float = 0.01          # KL trust region
    vf_lr: float = 1e-3
    train_v_iters: int = 40
    cg_iters: int = 10
    backtrack_iters: int = 10
    backtrack_coeff: float = 0.8
    damping: float = 0.1
    seed: int = 0
    max_ep_len: int = 64


def _flat(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([jnp.ravel(l) for l in leaves])


def _unflat(flat, tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out, i = [], 0
    for l in leaves:
        n = l.size
        out.append(flat[i:i + n].reshape(l.shape))
        i += n
    return jax.tree_util.tree_unflatten(treedef, out)


def trpo(env_fn: Callable, cfg: TRPOConfig | None = None, *,
         logger: EpochLogger | None = None, output_dir=None):
    cfg = cfg or TRPOConfig()
    env = env_fn()
    obs_dim, act_dim = env.obs_dim, env.act_dim
    key = jax.random.key(cfg.seed)

    actor = GaussianActor(act_dim)
    critic = ValueCritic()
    obs0 = jnp.zeros((1, obs_dim))
    k1, k2 = jax.random.split(key)
    pi_params = actor.init(k1, obs0)
    vf_params = critic.init(k2, obs0)
    vf_opt = optax.adam(cfg.vf_lr)
    vf_state = vf_opt.init(vf_params)

    def surrogate(p, obs, act, adv, logp_old):
        mu, log_std = actor.apply(p, obs)
        logp = GaussianActor.log_prob(mu, log_std, act)
        return jnp.mean(jnp.exp(logp - logp_old) * adv)

    def mean_kl(p, p_old, obs):
        mu0, ls0 = actor.apply(p_old, obs)
        mu1, ls1 = actor.apply(p, obs)
        return jnp.mean(GaussianActor.kl(
            jax.lax.stop_gradient(mu0), jax.lax.stop_gradient(ls0),
            mu1, ls1))

    @jax.jit
    def fvp(p, obs, v_flat):
        """Fisher-vector product: H_kl(p) @ v (+ damping)."""
        def klg(p_):
            return _flat(jax.grad(mean_kl)(p_, p, obs))

        _, hv = jax.jvp(klg, (p,), (_unflat(v_flat, p),))
        return hv + cfg.damping * v_flat

    @jax.jit
    def surrogate_grad(p, obs, act, adv, logp_old):
        g = jax.grad(surrogate)(p, obs, act, adv, logp_old)
        return _flat(g)

    surrogate_jit = jax.jit(surrogate)
    kl_jit = jax.jit(mean_kl)

    @jax.jit
    def v_update(vp, vs, obs, ret):
        def loss(vp):
            return jnp.mean((critic.apply(vp, obs) - ret) ** 2)

        l, grads = jax.value_and_grad(loss)(vp)
        updates, vs = vf_opt.update(grads, vs, vp)
        return optax.apply_updates(vp, updates), vs, l

    @jax.jit
    def sample_action(p, obs, rng):
        mu, log_std = actor.apply(p, obs)
        a = mu + jnp.exp(log_std) * jax.random.normal(rng, mu.shape)
        return a, GaussianActor.log_prob(mu, log_std, a)

    value_jit = jax.jit(lambda vp, o: critic.apply(vp, o))

    def conjugate_gradient(Ax, b):
        x = jnp.zeros_like(b)
        r = b.copy()
        p = b.copy()
        rr = jnp.dot(r, r)
        for _ in range(cfg.cg_iters):
            Ap = Ax(p)
            alpha = rr / (jnp.dot(p, Ap) + 1e-8)
            x = x + alpha * p
            r = r - alpha * Ap
            rr_new = jnp.dot(r, r)
            p = r + (rr_new / (rr + 1e-10)) * p
            rr = rr_new
        return x

    logger = logger or EpochLogger(output_dir=output_dir, exp_name="trpo")
    buf = PPOBuffer(obs_dim, act_dim, cfg.steps_per_epoch, cfg.gamma,
                    cfg.lam, num_entropy_heads=1)
    obs = env.reset()
    ep_ret, ep_len = 0.0, 0
    start = time.time()

    for epoch in range(cfg.epochs):
        for t in range(cfg.steps_per_epoch):
            key, ak = jax.random.split(key)
            a, logp = jax.device_get(sample_action(pi_params, obs[None],
                                                   ak))
            v = float(jax.device_get(value_jit(vf_params, obs[None]))[0])
            obs2, r, done, _ = env.step(np.asarray(a)[0])
            buf.store(obs, np.asarray(a)[0], r, v, float(logp[0]), 0.0,
                      np.zeros(1))
            obs = obs2
            ep_ret += r
            ep_len += 1
            terminal = done or ep_len >= cfg.max_ep_len
            if terminal or t == cfg.steps_per_epoch - 1:
                last_v = 0.0 if done else float(jax.device_get(
                    value_jit(vf_params, obs[None]))[0])
                buf.finish_path(last_v)
                if terminal:
                    logger.store(EpRet=ep_ret, EpLen=ep_len)
                    obs = env.reset()
                    ep_ret, ep_len = 0.0, 0

        data = buf.get()
        obs_b = jnp.asarray(data["obs"])
        act_b = jnp.asarray(data["act"])
        adv_b = jnp.asarray(data["adv"])
        ret_b = jnp.asarray(data["ret"])
        logp_b = jnp.asarray(data["logp"])

        g = surrogate_grad(pi_params, obs_b, act_b, adv_b, logp_b)
        x = conjugate_gradient(lambda v: fvp(pi_params, obs_b, v), g)
        shs = jnp.dot(x, fvp(pi_params, obs_b, x))
        step_scale = jnp.sqrt(2 * cfg.delta / (shs + 1e-8))
        full_step = step_scale * x
        old_sur = float(surrogate_jit(pi_params, obs_b, act_b, adv_b,
                                      logp_b))

        accepted = False
        coeff = 1.0
        for _ in range(cfg.backtrack_iters):
            cand = _unflat(_flat(pi_params) + coeff * full_step, pi_params)
            kl = float(kl_jit(cand, pi_params, obs_b))
            sur = float(surrogate_jit(cand, obs_b, act_b, adv_b, logp_b))
            if kl <= cfg.delta and sur >= old_sur:
                pi_params = cand
                accepted = True
                break
            coeff *= cfg.backtrack_coeff
        for _ in range(cfg.train_v_iters):
            vf_params, vf_state, v_l = v_update(vf_params, vf_state,
                                                obs_b, ret_b)

        logger.log_tabular("Epoch", epoch)
        logger.log_tabular("EpRet", with_min_and_max=True)
        logger.log_tabular("KL", kl)
        logger.log_tabular("Surrogate", sur)
        logger.log_tabular("BacktrackAccepted", int(accepted))
        logger.log_tabular("LossV", float(v_l))
        logger.log_tabular("Time", time.time() - start)
        logger.dump_tabular()

    return pi_params, vf_params, logger
