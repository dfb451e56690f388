"""PPO for LDPC code search (reference ``openAIppo.py:135-544``, JAX).

Faithful to the reference algorithm: clipped surrogate objective
(openAIppo.py:303-339), optional entropy coefficient applied to the i-head
entropy only (:337 — note the reference ADDS ``coef * iEntropy`` to the
minimized loss; we keep that sign and the default coef 0.01), KL early stop
at ``1.5 * target_kl`` (:390-392), separate Adam optimizers and iteration
counts for policy and value (:342-348, 406-412), GAE buffer with
normalized advantages, bootstrap on epoch truncation (:471-483), model/env
checkpoints every ``save_freq`` epochs (:507-508).

TPU-native: the policy/value updates are jitted; with a ``mesh`` the update
batch is sharded across devices and XLA's all-reduce of the mean-loss
gradients replaces ``mpi_avg_grads`` (mpi_pytorch.py:20-27).  The rollout
loop is host-driven because each env step runs a Monte-Carlo decode on the
accelerator already (see ``envs/code_search.py``).

The reference's known-broken tail (a live debug ``env.step`` inside
``update()``, openAIppo.py:399) is intentionally not reproduced.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.logging import EpochLogger, TsvLogger
from .buffer import PPOBuffer
from .model import (Actor, ActorCriticConfig, Critic, action_to_env_action,
                    evaluate_actions, init_params, sample_step)

__all__ = ["PPOConfig", "ppo", "make_update_fns"]


@dataclasses.dataclass
class PPOConfig:
    steps_per_epoch: int = 64      # openAIppo.py:137
    epochs: int = 50
    gamma: float = 0.99
    clip_ratio: float = 0.2
    pi_lr: float = 3e-4
    vf_lr: float = 1e-3
    train_pi_iters: int = 80
    train_v_iters: int = 80
    lam: float = 0.97
    target_kl: float = 0.01
    entropy_coefficient: float = 0.01   # CLI default, openAIppo.py:560
    # The reference ADDS coef * iEntropy to the MINIMIZED loss
    # (openAIppo.py:337) — an entropy *penalty*.  The default keeps that
    # sign for parity; set entropy_bonus=True for the standard
    # exploration bonus (entropy subtracted from the loss), which is
    # what a long search should use.
    entropy_bonus: bool = False
    policy_coefficient: float = 1.0
    seed: int = 30
    save_freq: int = 10
    max_ep_len: int = 1000


def make_update_fns(cfg: ActorCriticConfig, ppo_cfg: PPOConfig,
                    mesh=None):
    """Jitted (pi_update, v_update) steps.

    With a mesh, batch inputs are sharded along the leading axis and
    gradients of the mean losses are globally averaged by XLA (the pmean
    replacing mpi_avg_grads).
    """
    pi_opt = optax.adam(ppo_cfg.pi_lr)
    vf_opt = optax.adam(ppo_cfg.vf_lr)

    def pi_loss(actor_params, obs, act, adv, logp_old):
        out = evaluate_actions(cfg, actor_params, obs, act)
        logp = out["logp"]
        ratio = jnp.exp(logp - logp_old)
        clip_adv = jnp.clip(ratio, 1 - ppo_cfg.clip_ratio,
                            1 + ppo_cfg.clip_ratio) * adv
        loss_pi = -jnp.mean(jnp.minimum(ratio * adv, clip_adv))
        i_entropy = jnp.mean(out["entropy_per_head"][..., 0])
        ent_sign = -1.0 if ppo_cfg.entropy_bonus else 1.0
        total = (ppo_cfg.policy_coefficient * loss_pi +
                 ent_sign * ppo_cfg.entropy_coefficient * i_entropy)
        approx_kl = jnp.mean(logp_old - logp)
        clipped = (ratio > 1 + ppo_cfg.clip_ratio) | (
            ratio < 1 - ppo_cfg.clip_ratio)
        extras = {"kl": approx_kl, "entropy": jnp.mean(out["entropy"]),
                  "i_entropy": i_entropy, "loss_pi": loss_pi,
                  "clipfrac": jnp.mean(clipped.astype(jnp.float32))}
        return total, extras

    def pi_update(actor_params, opt_state, obs, act, adv, logp_old):
        (_, extras), grads = jax.value_and_grad(pi_loss, has_aux=True)(
            actor_params, obs, act, adv, logp_old)
        updates, opt_state = pi_opt.update(grads, opt_state, actor_params)
        return optax.apply_updates(actor_params, updates), opt_state, extras

    def v_loss(critic_params, obs, ret):
        v = Critic(cfg).apply(critic_params, obs)
        return jnp.mean((v - ret) ** 2)

    def v_update(critic_params, opt_state, obs, ret):
        loss, grads = jax.value_and_grad(v_loss)(critic_params, obs, ret)
        updates, opt_state = vf_opt.update(grads, opt_state, critic_params)
        return optax.apply_updates(critic_params, updates), opt_state, loss

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS
        data = NamedSharding(mesh, P(DATA_AXIS))
        repl = NamedSharding(mesh, P())
        pi_update = jax.jit(pi_update, in_shardings=(
            repl, repl, data, data, data, data), out_shardings=repl)
        v_update = jax.jit(v_update, in_shardings=(repl, repl, data, data),
                           out_shardings=repl)
    else:
        pi_update = jax.jit(pi_update)
        v_update = jax.jit(v_update)
    return pi_opt, vf_opt, pi_update, v_update


def ppo(env_fn: Callable, ppo_cfg: PPOConfig | None = None,
        ac_cfg: ActorCriticConfig | None = None, *, mesh=None,
        logger: EpochLogger | None = None, output_dir=None,
        checkpoint_dir=None, deterministic_eval: bool = False):
    """Run PPO; returns (actor_params, critic_params, logger).

    ``env_fn() -> env`` with the LdpcCodeSearchEnv interface
    (reset/step/action_space/observation_space), like the reference's
    ``gym.make`` thunk (openAIppo.py:573).
    """
    ppo_cfg = ppo_cfg or PPOConfig()
    env = env_fn()
    obs_dim = env.observation_space.shape[0]
    if ac_cfg is None:
        ac_cfg = ActorCriticConfig(
            obs_dim=obs_dim,
            row_range=env.state.block_rows,
            col_range=env.state.block_cols,
            z=env.z)
    logger = logger or EpochLogger(output_dir=output_dir, exp_name="ppo")
    logger.save_config({"ppo": dataclasses.asdict(ppo_cfg),
                        "model": dataclasses.asdict(ac_cfg)})
    # Per-step TSV: the experiment.txt equivalent consumed by
    # analysis.postprocess (postProcessing.py:27-49 reads Reward,
    # Observation, epochNumber, i/j/kAction).  Observations are stored as
    # hex so post-mortem can uncompress the exact visited codes.
    tsv = TsvLogger(
        ["epoch", "step", "reward", "value", "logp", "i", "j", "k",
         "observation_hex"],
        path=(None if logger.output_dir is None
              else logger.output_dir / "steps.tsv"),
        print_rows=False)

    rng = jax.random.key(ppo_cfg.seed)
    actor_params, critic_params = init_params(ac_cfg, ppo_cfg.seed)
    pi_opt, vf_opt, pi_update, v_update = make_update_fns(
        ac_cfg, ppo_cfg, mesh=mesh)
    pi_opt_state = pi_opt.init(actor_params)
    vf_opt_state = vf_opt.init(critic_params)

    sample_jit = jax.jit(
        lambda ap, cp, obs, key: sample_step(ac_cfg, ap, cp, obs, key))
    critic_apply = jax.jit(
        lambda cp, obs: Critic(ac_cfg).apply(cp, obs))

    buf = PPOBuffer(obs_dim, ac_cfg.buffer_action_dim,
                    ppo_cfg.steps_per_epoch, ppo_cfg.gamma, ppo_cfg.lam,
                    num_entropy_heads=ac_cfg.num_entropy_heads)

    start_time = time.time()
    obs = env.reset().astype(np.float32)
    ep_ret, ep_len = 0.0, 0

    for epoch in range(ppo_cfg.epochs):
        for t in range(ppo_cfg.steps_per_epoch):
            rng, key = jax.random.split(rng)
            ba, v, logp, ent_heads = jax.device_get(sample_jit(
                actor_params, critic_params, obs[None], key))
            ba, v, logp, ent_heads = ba[0], float(v[0]), float(logp[0]), \
                np.asarray(ent_heads[0])
            env_action = action_to_env_action(ac_cfg, ba)
            next_obs, reward, done, info = env.step(env_action)
            ep_ret += reward
            ep_len += 1
            buf.store(obs, ba, reward, v, logp, float(ent_heads.sum()),
                      ent_heads)
            logger.store(VVals=v, Reward=reward,
                         IEntropy=float(ent_heads[0]),
                         JEntropy=float(ent_heads[1]),
                         KEntropy=float(ent_heads[2]))
            tsv.log(epoch=epoch, step=t, reward=reward, value=v, logp=logp,
                    i=int(ba[0]), j=int(ba[1]), k=int(ba[2]),
                    observation_hex=bytes(
                        np.asarray(next_obs, np.uint8)).hex())
            obs = next_obs.astype(np.float32)

            timeout = ep_len == ppo_cfg.max_ep_len
            terminal = done or timeout
            epoch_ended = t == ppo_cfg.steps_per_epoch - 1
            if terminal or epoch_ended:
                if timeout or epoch_ended:
                    last_v = float(jax.device_get(
                        critic_apply(critic_params, obs[None]))[0])
                else:
                    last_v = 0.0
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
        logp_b = jnp.asarray(data["logp"])

        stop_iter = ppo_cfg.train_pi_iters
        # defaults cover train_pi_iters=0 / train_v_iters=0 (the loops
        # below then never bind extras / v_l)
        extras = {"loss_pi": np.nan, "kl": 0.0, "clipfrac": np.nan}
        v_l = np.nan
        for i in range(ppo_cfg.train_pi_iters):
            actor_params, pi_opt_state, extras = pi_update(
                actor_params, pi_opt_state, obs_b, act_b, adv_b, logp_b)
            kl = float(extras["kl"])
            if kl > 1.5 * ppo_cfg.target_kl:
                logger.log(f"Early stopping at step {i} due to reaching "
                           f"max kl.")
                stop_iter = i
                break
        for _ in range(ppo_cfg.train_v_iters):
            critic_params, vf_opt_state, v_l = v_update(
                critic_params, vf_opt_state, obs_b, ret_b)

        if checkpoint_dir is not None and (
                epoch % ppo_cfg.save_freq == 0 or
                epoch == ppo_cfg.epochs - 1):
            from ..utils.checkpoint import save_checkpoint
            save_checkpoint(checkpoint_dir, epoch, {
                "actor": jax.device_get(actor_params),
                "critic": jax.device_get(critic_params),
                "code_first_rows": env.state.first_rows(),
                "epoch": np.int64(epoch),
            })

        logger.log_tabular("Epoch", epoch)
        logger.log_tabular("EpRet", with_min_and_max=True)
        logger.log_tabular("EpLen", average_only=True)
        logger.log_tabular("VVals", with_min_and_max=True)
        logger.log_tabular("Reward", average_only=True)
        logger.log_tabular("IEntropy", average_only=True)
        logger.log_tabular("JEntropy", average_only=True)
        logger.log_tabular("KEntropy", average_only=True)
        logger.log_tabular("LossPi", float(extras["loss_pi"]))
        logger.log_tabular("LossV", float(v_l))
        logger.log_tabular("KL", float(extras["kl"]))
        logger.log_tabular("ClipFrac", float(extras["clipfrac"]))
        logger.log_tabular("StopIter", stop_iter)
        logger.log_tabular("TotalEnvInteracts",
                           (epoch + 1) * ppo_cfg.steps_per_epoch)
        logger.log_tabular("Time", time.time() - start_time)
        logger.dump_tabular()

    return actor_params, critic_params, logger
