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

Data-parallel rollout (the reference's headline ``mpi_fork(args.cpu)``
training mode, mpi_tools.py:6-39 + buffer.py:110-181): ``num_envs > 1``
drives an :class:`~ldpc_tpu.envs.vector.EnvironmentVector` — one
PPOBuffer per env merged by :class:`BufferContainer` at update time.
Action sampling is a single vmapped dispatch over per-env PRNG keys, so
per-env action/reward streams are IDENTICAL to stepping the same envs
sequentially with the same keys (each env also draws channel noise from
its own RandomState).  With ``env_mesh`` the candidate decodes of one
vector step shard over devices (the reference's one-env-per-GPU,
envContainer.py:10-27, without process pools).

Advantage normalization uses globally-reduced statistics when the JAX
runtime is multi-process (``statistics_scalar(distributed=True)``), the
``mpi_statistics_scalar`` contract of the reference (buffer.py:97).

Checkpoints (every ``save_freq`` epochs and at the end) hold the FULL
training state — params, both optimizer states, the PRNG key, every env's
code/budgets/RandomState, per-env episode accumulators and the current
observations — so ``ppo(..., resume=True)`` continues an interrupted
search exactly where it stopped (the reference saves a pickle but has no
resume logic, openAIppo.py:507-508 / SURVEY.md §5).

The reference's known-broken tail (a live debug ``env.step`` inside
``update()``, openAIppo.py:399) is intentionally not reproduced.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.logging import EpochLogger, TsvLogger, statistics_scalar
from .buffer import BufferContainer
from .model import (Actor, ActorCriticConfig, Critic, action_to_env_action,
                    evaluate_actions, init_params, sample_step)

__all__ = ["PPOConfig", "ppo", "make_update_fns"]


@dataclasses.dataclass
class PPOConfig:
    steps_per_epoch: int = 64      # PER ENV (openAIppo.py:137; an epoch
    epochs: int = 50               # collects num_envs * steps_per_epoch)
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


def _env_checkpoint_state(envs, obs, ep_ret, ep_len) -> dict:
    """Pytree-of-arrays snapshot of every env's full mutable state."""
    rows = np.stack([np.asarray(e.state.first_rows()) for e in envs])
    rstates = [e.rng.get_state() for e in envs]
    return {
        "first_rows": rows.astype(np.int32),
        "acc_time": np.array([e.accumulated_evaluation_time for e in envs],
                             np.float64),
        "acc_iters": np.array([e.accumulated_iterations for e in envs],
                              np.int64),
        # numpy MT19937 state: ('MT19937', keys[624] u32, pos, has_gauss,
        # cached_gaussian) — stored as plain arrays
        "rng_keys": np.stack([s[1] for s in rstates]).astype(np.uint32),
        "rng_pos": np.array([s[2] for s in rstates], np.int64),
        "rng_has_gauss": np.array([s[3] for s in rstates], np.int64),
        "rng_cached": np.array([s[4] for s in rstates], np.float64),
        "obs": np.asarray(obs, np.float32),
        "ep_ret": np.asarray(ep_ret, np.float64),
        "ep_len": np.asarray(ep_len, np.int64),
    }


def _restore_env_state(envs, st) -> tuple:
    """Inverse of :func:`_env_checkpoint_state`; returns (obs, ep_ret,
    ep_len)."""
    from ..codes.qc import QCCode

    for i, e in enumerate(envs):
        ref = e.reset_value
        e.state = QCCode.from_first_rows(
            np.asarray(st["first_rows"][i]), name=ref.name,
            message_size=ref.message_size)
        e.accumulated_evaluation_time = float(st["acc_time"][i])
        e.accumulated_iterations = int(st["acc_iters"][i])
        e.rng.set_state(("MT19937",
                         np.asarray(st["rng_keys"][i], np.uint32),
                         int(st["rng_pos"][i]),
                         int(st["rng_has_gauss"][i]),
                         float(st["rng_cached"][i])))
        e.observed_state = e.compress()
    return (np.asarray(st["obs"], np.float32),
            np.asarray(st["ep_ret"], np.float64).copy(),
            np.asarray(st["ep_len"], np.int64).copy())


def ppo(env_fn: Callable | Sequence[Callable],
        ppo_cfg: PPOConfig | None = None,
        ac_cfg: ActorCriticConfig | None = None, *, num_envs: int = 1,
        mesh=None, env_mesh=None, env_batched: bool | None = None,
        logger: EpochLogger | None = None, output_dir=None,
        checkpoint_dir=None, resume: bool = False,
        deterministic_eval: bool = False, epoch_callback=None):
    """Run PPO; returns (actor_params, critic_params, logger).

    ``env_fn`` is a thunk ``() -> env`` with the LdpcCodeSearchEnv
    interface, like the reference's ``gym.make`` thunk (openAIppo.py:573),
    or a sequence of such thunks (one per env).  With a single thunk and
    ``num_envs > 1`` the envs are replicas reseeded ``seed + 10000 * i``
    — the reference's per-rank seeding (openAIppo.py:264).

    ``num_envs`` parallel envs collect ``num_envs * steps_per_epoch``
    transitions per epoch through an EnvironmentVector (``env_mesh`` /
    ``env_batched`` forwarded — a mesh shards one vector step's candidate
    decodes over devices); ``mesh`` shards the UPDATE batch.

    ``resume=True`` restores the latest checkpoint in ``checkpoint_dir``
    (params, optimizer states, PRNG key, env states, episode accumulators)
    and continues from the next epoch; pass a logger/output_dir opened in
    append mode to keep one contiguous progress/steps log.

    ``epoch_callback(epoch, envs)`` (optional) runs before each epoch's
    rollout — the hook for schedules that mutate env knobs per epoch
    (e.g. annealing ``floor_penalty_scale`` on the code-search env).  It
    must be a pure function of ``epoch`` for resume to reproduce the
    schedule (it is re-invoked at the resumed epoch, not replayed).
    """
    ppo_cfg = ppo_cfg or PPOConfig()
    from ..envs.vector import EnvironmentVector
    if callable(env_fn):
        env_fns = [env_fn] * num_envs
        reseed = num_envs > 1
    else:
        env_fns = list(env_fn)
        num_envs = len(env_fns)
        reseed = False
    vec = EnvironmentVector(env_fns, batched=env_batched, mesh=env_mesh)
    if reseed:
        base = getattr(vec.envs[0], "seed_value", ppo_cfg.seed)
        vec.seed([base + 10000 * i for i in range(num_envs)])
    env0 = vec.envs[0]
    obs_dim = vec.observation_space.shape[0]
    if ac_cfg is None:
        ac_cfg = ActorCriticConfig(
            obs_dim=obs_dim,
            row_range=env0.state.block_rows,
            col_range=env0.state.block_cols,
            z=env0.z)
    logger = logger or EpochLogger(output_dir=output_dir, exp_name="ppo",
                                   append=resume)
    if not resume:
        logger.save_config({"ppo": dataclasses.asdict(ppo_cfg),
                            "model": dataclasses.asdict(ac_cfg),
                            "num_envs": num_envs})
    rng = jax.random.key(ppo_cfg.seed)
    actor_params, critic_params = init_params(ac_cfg, ppo_cfg.seed)
    pi_opt, vf_opt, pi_update, v_update = make_update_fns(
        ac_cfg, ppo_cfg, mesh=mesh)
    pi_opt_state = pi_opt.init(actor_params)
    vf_opt_state = vf_opt.init(critic_params)

    # One vmapped dispatch samples every env's action from ITS OWN key —
    # per-env draws identical to sequential per-env sampling.
    def _sample_one(ap, cp, obs1, key):
        ba, v, logp, ent = sample_step(ac_cfg, ap, cp, obs1[None], key,
                                       deterministic=deterministic_eval)
        return ba[0], v[0], logp[0], ent[0]

    sample_vec = jax.jit(jax.vmap(_sample_one, in_axes=(None, None, 0, 0)))
    critic_apply = jax.jit(
        lambda cp, obs: Critic(ac_cfg).apply(cp, obs))

    bufs = BufferContainer(obs_dim, ac_cfg.buffer_action_dim,
                           ppo_cfg.steps_per_epoch, num_envs,
                           ppo_cfg.gamma, ppo_cfg.lam,
                           num_entropy_heads=ac_cfg.num_entropy_heads)

    # Cross-process advantage normalization (buffer.py:97 ->
    # mpi_statistics_scalar): global when the runtime is multi-process,
    # local otherwise.  Safe here because every process runs the same
    # epoch loop (symmetric collective).
    def stat_fn(a):
        return statistics_scalar(a, distributed=jax.process_count() > 1)

    start_epoch = 0
    obs = vec.reset().astype(np.float32)
    ep_ret = np.zeros(num_envs, np.float64)
    ep_len = np.zeros(num_envs, np.int64)

    if resume:
        if checkpoint_dir is None:
            raise ValueError("resume=True needs a checkpoint_dir")
        from ..utils.checkpoint import restore_checkpoint
        template = {
            "actor": jax.device_get(actor_params),
            "critic": jax.device_get(critic_params),
            "pi_opt": jax.device_get(pi_opt_state),
            "vf_opt": jax.device_get(vf_opt_state),
            "rng": np.asarray(jax.random.key_data(rng)),
            "epoch": np.asarray(0, np.int64),
            "code_first_rows": np.asarray(env0.state.first_rows()),
            "env": _env_checkpoint_state(vec.envs, obs, ep_ret, ep_len),
        }
        state = restore_checkpoint(checkpoint_dir, template=template)
        actor_params = state["actor"]
        critic_params = state["critic"]
        pi_opt_state = state["pi_opt"]
        vf_opt_state = state["vf_opt"]
        rng = jax.random.wrap_key_data(jnp.asarray(state["rng"]))
        obs, ep_ret, ep_len = _restore_env_state(vec.envs, state["env"])
        start_epoch = int(state["epoch"]) + 1
        logger.log(f"Resumed from epoch {int(state['epoch'])} in "
                   f"{checkpoint_dir}")
        # A crash BETWEEN checkpoints leaves log rows for epochs newer
        # than the restored state; those epochs re-run now, so drop their
        # rows to keep one row per (epoch, step, env) in the merged logs.
        logger.drop_epochs_after(int(state["epoch"]))

    def _truncate_steps_tsv(path, max_epoch):
        lines = path.read_text().splitlines()
        kept = lines[:1] + [ln for ln in lines[1:]
                            if int(ln.split("\t")[0]) <= max_epoch]
        path.write_text("\n".join(kept) + ("\n" if kept else ""))

    # Per-step TSV: the experiment.txt equivalent consumed by
    # analysis.postprocess (postProcessing.py:27-49 reads Reward,
    # Observation, epochNumber, i/j/kAction).  Observations are stored as
    # hex so post-mortem can uncompress the exact visited codes.
    tsv_path = (None if logger.output_dir is None
                else logger.output_dir / "steps.tsv")
    if resume and tsv_path is not None and tsv_path.exists():
        _truncate_steps_tsv(tsv_path, start_epoch - 1)
    tsv = TsvLogger(
        ["epoch", "step", "env", "reward", "value", "logp", "i", "j", "k",
         "observation_hex"],
        path=tsv_path, print_rows=False, append=resume)

    def save(epoch):
        from ..utils.checkpoint import save_checkpoint
        save_checkpoint(checkpoint_dir, epoch, {
            "actor": jax.device_get(actor_params),
            "critic": jax.device_get(critic_params),
            "pi_opt": jax.device_get(pi_opt_state),
            "vf_opt": jax.device_get(vf_opt_state),
            "rng": np.asarray(jax.random.key_data(rng)),
            "epoch": np.asarray(epoch, np.int64),
            # env 0's code alone, for legacy post-mortem consumers
            "code_first_rows": np.asarray(vec.envs[0].state.first_rows()),
            "env": _env_checkpoint_state(vec.envs, obs, ep_ret, ep_len),
        })

    start_time = time.time()

    for epoch in range(start_epoch, ppo_cfg.epochs):
        if epoch_callback is not None:
            epoch_callback(epoch, vec.envs)
        for t in range(ppo_cfg.steps_per_epoch):
            rng, key = jax.random.split(rng)
            keys = jax.random.split(key, num_envs)
            ba, v, logp, ent_heads = jax.device_get(sample_vec(
                actor_params, critic_params, jnp.asarray(obs), keys))
            env_actions = [action_to_env_action(ac_cfg, ba[e])
                           for e in range(num_envs)]
            next_obs, rewards, dones, infos = vec.step(env_actions)
            ep_ret += rewards
            ep_len += 1
            for e in range(num_envs):
                bufs[e].store(obs[e], ba[e], rewards[e], float(v[e]),
                              float(logp[e]), float(ent_heads[e].sum()),
                              ent_heads[e])
                logger.store(VVals=float(v[e]), Reward=float(rewards[e]),
                             IEntropy=float(ent_heads[e][0]),
                             JEntropy=float(ent_heads[e][1]),
                             KEntropy=float(ent_heads[e][2]))
                tsv.log(epoch=epoch, step=t, env=e,
                        reward=float(rewards[e]), value=float(v[e]),
                        logp=float(logp[e]), i=int(ba[e][0]),
                        j=int(ba[e][1]), k=int(ba[e][2]),
                        observation_hex=bytes(
                            np.asarray(next_obs[e], np.uint8)).hex())
            obs = next_obs.astype(np.float32)

            timeouts = ep_len == ppo_cfg.max_ep_len
            epoch_ended = t == ppo_cfg.steps_per_epoch - 1
            if dones.any() or timeouts.any() or epoch_ended:
                last_vs = np.asarray(jax.device_get(
                    critic_apply(critic_params, jnp.asarray(obs))))
                for e in range(num_envs):
                    terminal = bool(dones[e]) or bool(timeouts[e])
                    if not (terminal or epoch_ended):
                        continue
                    # bootstrap on truncation, zero on true termination
                    # (openAIppo.py:471-483 semantics)
                    last_v = (float(last_vs[e])
                              if (timeouts[e] or epoch_ended) else 0.0)
                    bufs[e].finish_path(last_v)
                    if terminal:
                        logger.store(EpRet=float(ep_ret[e]),
                                     EpLen=int(ep_len[e]))
                        obs[e] = vec.envs[e].reset().astype(np.float32)
                        ep_ret[e], ep_len[e] = 0.0, 0

        data = bufs.get(stat_fn=stat_fn)
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
            save(epoch)

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
                           (epoch + 1) * ppo_cfg.steps_per_epoch * num_envs)
        logger.log_tabular("Time", time.time() - start_time)
        logger.dump_tabular()

    return actor_params, critic_params, logger
