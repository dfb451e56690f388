"""Tests for layer L4: model, buffer, PPO update, random agent, end-to-end.

Mirrors the reference's model smoke test (test_ldpc.py:35,
models.testActorCritic) plus real learning-machinery checks the reference
lacks: gradient flow, KL early-stop, buffer GAE math, and a tiny
end-to-end PPO run against the wifi env.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes import wifi_code
from ldpc_tpu.rl import (ActorCriticConfig, PPOBuffer, PPOConfig,
                         action_to_env_action, discount_cumsum,
                         evaluate_actions, init_params, make_update_fns,
                         ppo, run_random_agent, sample_step)

CFG = ActorCriticConfig(obs_dim=32, hidden=16, row_range=2, col_range=4,
                        z=31, max_hot=3)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=1)


def test_sample_step_shapes_and_ranges(params):
    ap, cp = params
    obs = jnp.zeros((5, CFG.obs_dim))
    ba, v, logp, ent = sample_step(CFG, ap, cp, obs, jax.random.key(0))
    assert ba.shape == (5, CFG.buffer_action_dim)
    assert v.shape == (5,) and logp.shape == (5,)
    assert ent.shape == (5, CFG.num_entropy_heads)
    ba = np.asarray(ba)
    assert (ba[:, 0] < CFG.row_range).all()
    assert (ba[:, 1] < CFG.col_range).all()
    assert (1 <= ba[:, 2]).all() and (ba[:, 2] <= CFG.max_hot).all()
    assert (ba[:, 3:] < CFG.z).all()


def test_sample_matches_evaluate_logp(params):
    """log-prob of a sampled action re-evaluated via the evaluate path
    must equal the sampling-path log-prob (same autoregressive chain)."""
    ap, cp = params
    obs = jax.random.uniform(jax.random.key(3), (4, CFG.obs_dim))
    ba, v, logp, ent = sample_step(CFG, ap, cp, obs, jax.random.key(7))
    out = evaluate_actions(CFG, ap, obs, ba)
    np.testing.assert_allclose(np.asarray(out["logp"]), np.asarray(logp),
                               rtol=1e-5, atol=1e-5)


def test_deterministic_mode_is_deterministic(params):
    ap, cp = params
    obs = jax.random.uniform(jax.random.key(5), (2, CFG.obs_dim))
    a1 = sample_step(CFG, ap, cp, obs, jax.random.key(1),
                     deterministic=True)[0]
    a2 = sample_step(CFG, ap, cp, obs, jax.random.key(2),
                     deterministic=True)[0]
    assert np.array_equal(np.asarray(a1), np.asarray(a2))


def test_action_to_env_action():
    ba = np.array([1, 2, 2, 7, 19, 3])
    env_a = action_to_env_action(CFG, ba)
    assert env_a.shape == (CFG.x_bits + CFG.y_bits + CFG.z,)
    assert env_a[:CFG.x_bits].tolist() == [1]
    assert env_a[CFG.x_bits:CFG.x_bits + CFG.y_bits].tolist() == [1, 0]
    vec = env_a[CFG.x_bits + CFG.y_bits:]
    assert set(np.flatnonzero(vec)) == {7, 19}  # only first k=2 coords


def test_discount_cumsum():
    x = np.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(discount_cumsum(x, 0.5), [1.75, 1.5, 1.0])


def test_buffer_gae():
    buf = PPOBuffer(obs_dim=2, act_dim=3, size=3, gamma=0.5, lam=1.0,
                    num_entropy_heads=2)
    for t in range(3):
        buf.store(np.zeros(2), np.zeros(3), rew=1.0, val=0.0, logp=-1.0,
                  ent=0.1, entropy_heads=np.zeros(2))
    buf.finish_path(last_val=0.0)
    data = buf.get(stat_fn=lambda a: (0.0, 1.0))
    np.testing.assert_allclose(data["ret"], [1.75, 1.5, 1.0])
    np.testing.assert_allclose(data["adv"], [1.75, 1.5, 1.0])


@pytest.mark.slow
def test_ppo_update_reduces_kl_objective(params):
    """After several clipped-surrogate steps on a fixed batch the policy
    must move (KL > 0) and the value loss must decrease."""
    ap, cp = params
    ppo_cfg = PPOConfig(train_pi_iters=5, train_v_iters=5)
    pi_opt, vf_opt, pi_update, v_update = make_update_fns(CFG, ppo_cfg)
    pi_state, vf_state = pi_opt.init(ap), vf_opt.init(cp)
    key = jax.random.key(0)
    obs = jax.random.uniform(key, (8, CFG.obs_dim))
    ba, v, logp, ent = sample_step(CFG, ap, cp, obs, key)
    adv = jnp.linspace(-1, 1, 8)
    ret = jnp.ones(8)
    kls = []
    v_losses = []
    for i in range(5):
        ap, pi_state, extras = pi_update(ap, pi_state, obs,
                                         ba.astype(jnp.float32), adv, logp)
        kls.append(float(extras["kl"]))
        cp, vf_state, v_l = v_update(cp, vf_state, obs, ret)
        v_losses.append(float(v_l))
    assert abs(kls[0]) < 1e-5          # first step: policy unchanged yet
    assert abs(kls[-1]) > 1e-6         # policy moved
    assert v_losses[-1] < v_losses[0]  # value is learning


def test_random_agent_on_wifi_env():
    from ldpc_tpu.envs import LdpcCodeSearchEnv
    env = LdpcCodeSearchEnv(code=wifi_code(), snr_points=(3.0, 3.5),
                            num_transmissions=3, num_iterations=8, seed=0,
                            dmax_cn_cap=32, dmax_vn_cap=12)
    rewards, env = run_random_agent(env, num_steps=3, seed=5,
                                    hot_bits_range=(2, 3))
    assert len(rewards) == 3
    assert all(np.isfinite(r) for r in rewards)


def test_ppo_end_to_end_tiny(tmp_path):
    """Two epochs of PPO against the wifi env: the full reference call
    stack 3.3 (rollout -> buffer -> update -> logging -> checkpoint)."""
    from ldpc_tpu.envs import LdpcCodeSearchEnv
    from ldpc_tpu.utils.checkpoint import restore_checkpoint

    def env_fn():
        return LdpcCodeSearchEnv(code=wifi_code(), snr_points=(3.0, 3.5),
                                 num_transmissions=2, num_iterations=5,
                                 seed=1, dmax_cn_cap=32, dmax_vn_cap=12)

    ppo_cfg = PPOConfig(steps_per_epoch=3, epochs=2, train_pi_iters=2,
                        train_v_iters=2, save_freq=1)
    ac_cfg = ActorCriticConfig(obs_dim=env_fn().observation_space.shape[0],
                               hidden=16, row_range=4, col_range=24, z=81,
                               max_hot=4)
    ap, cp, logger = ppo(env_fn, ppo_cfg, ac_cfg,
                         output_dir=tmp_path / "exp",
                         checkpoint_dir=tmp_path / "ckpt")
    progress = (tmp_path / "exp" / "progress.txt").read_text().splitlines()
    assert len(progress) == 3  # header + 2 epochs
    assert "AverageEpRet" in progress[0] or "Epoch" in progress[0]
    state = restore_checkpoint(tmp_path / "ckpt")
    assert state["epoch"] == 1
    assert state["code_first_rows"].shape == (4, 24, 81)


def _tiny_env_fn(seed=1):
    from ldpc_tpu.envs import LdpcCodeSearchEnv
    return lambda: LdpcCodeSearchEnv(
        code=wifi_code(), snr_points=(3.0, 3.5), num_transmissions=2,
        num_iterations=5, seed=seed, dmax_cn_cap=32, dmax_vn_cap=12)


_TINY_AC = dict(hidden=16, row_range=4, col_range=24, z=81, max_hot=4)


def test_ppo_vector_rollout_matches_sequential(tmp_path):
    """num_envs=2 parallel rollout (VERDICT r3 #1): fills 2 x steps
    transitions, and each env's (action, reward) stream is IDENTICAL to
    stepping the same envs sequentially with the same per-env keys and
    seeds (the reference's mpi_fork N-rank rollout, mpi_tools.py:6-39)."""
    ppo_cfg = PPOConfig(steps_per_epoch=3, epochs=1, train_pi_iters=0,
                        train_v_iters=0, seed=5)
    env_fn = _tiny_env_fn(seed=3)
    ac_cfg = ActorCriticConfig(obs_dim=env_fn().observation_space.shape[0],
                               **_TINY_AC)
    ppo(env_fn, ppo_cfg, ac_cfg, num_envs=2, output_dir=tmp_path / "vec")
    rows = (tmp_path / "vec" / "steps.tsv").read_text().splitlines()
    header, data = rows[0].split("\t"), [r.split("\t") for r in rows[1:]]
    assert len(data) == 2 * ppo_cfg.steps_per_epoch  # 2 envs x steps
    col = {k: i for i, k in enumerate(header)}

    # sequential comparator: same policy params, same rng chain, same
    # per-env keys, same env seeding rule (base + 10000 * i)
    ap, cp = init_params(ac_cfg, ppo_cfg.seed)
    envs = [env_fn(), env_fn()]
    base = envs[0].seed_value
    for i, e in enumerate(envs):
        e.seed(base + 10000 * i)
    obs = [e.reset().astype(np.float32) for e in envs]
    rng = jax.random.key(ppo_cfg.seed)
    for t in range(ppo_cfg.steps_per_epoch):
        rng, key = jax.random.split(rng)
        keys = jax.random.split(key, 2)
        for e in range(2):
            ba, v, logp, ent = sample_step(ac_cfg, ap, cp, obs[e][None],
                                           keys[e])
            ba = np.asarray(ba)[0]
            env_a = action_to_env_action(ac_cfg, ba)
            next_obs, reward, done, info = envs[e].step(env_a)
            obs[e] = next_obs.astype(np.float32)
            row = [r for r in data
                   if r[col["step"]] == str(t) and r[col["env"]] == str(e)]
            assert len(row) == 1
            row = row[0]
            assert float(row[col["reward"]]) == float(reward)
            assert (int(row[col["i"]]), int(row[col["j"]]),
                    int(row[col["k"]])) == (int(ba[0]), int(ba[1]),
                                            int(ba[2]))
            assert row[col["observation_hex"]] == bytes(
                np.asarray(next_obs, np.uint8)).hex()


def test_ppo_resume_exact(tmp_path):
    """Full-state checkpoints (VERDICT r3 #2): kill a run at epoch k,
    resume, and the merged steps.tsv is IDENTICAL to an uninterrupted
    run's — params, optimizer states, PRNG key, env code/budgets/
    RandomState and episode accumulators all restore exactly."""
    env_fn = _tiny_env_fn(seed=2)
    ac_cfg = ActorCriticConfig(obs_dim=env_fn().observation_space.shape[0],
                               **_TINY_AC)

    def run(epochs, out, ckpt, resume=False):
        cfg = PPOConfig(steps_per_epoch=2, epochs=epochs, train_pi_iters=2,
                        train_v_iters=2, save_freq=1, seed=9)
        ppo(env_fn, cfg, ac_cfg, output_dir=out, checkpoint_dir=ckpt,
            resume=resume)

    run(4, tmp_path / "full", tmp_path / "ckpt_full")
    run(2, tmp_path / "split", tmp_path / "ckpt_split")
    run(4, tmp_path / "split", tmp_path / "ckpt_split", resume=True)

    full = (tmp_path / "full" / "steps.tsv").read_text()
    split = (tmp_path / "split" / "steps.tsv").read_text()
    assert split == full
    # the resumed run's final checkpoint equals the uninterrupted one's
    from ldpc_tpu.utils.checkpoint import restore_checkpoint
    a = restore_checkpoint(tmp_path / "ckpt_full")
    b = restore_checkpoint(tmp_path / "ckpt_split")
    assert int(a["epoch"]) == int(b["epoch"]) == 3
    np.testing.assert_array_equal(a["code_first_rows"],
                                  b["code_first_rows"])
    np.testing.assert_array_equal(a["rng"], b["rng"])
    jax.tree.map(np.testing.assert_array_equal, a["actor"], b["actor"])
    jax.tree.map(np.testing.assert_array_equal, a["pi_opt"], b["pi_opt"])


def test_ppo_resume_exact_multi_env(tmp_path):
    """Resume exactness with num_envs=2: the stacked per-env state
    (codes, budgets, MT19937 states, episode accumulators) restores."""
    env_fn = _tiny_env_fn(seed=6)
    ac_cfg = ActorCriticConfig(obs_dim=env_fn().observation_space.shape[0],
                               **_TINY_AC)

    def run(epochs, out, ckpt, resume=False):
        cfg = PPOConfig(steps_per_epoch=2, epochs=epochs, train_pi_iters=1,
                        train_v_iters=1, save_freq=1, seed=13)
        ppo(env_fn, cfg, ac_cfg, num_envs=2, output_dir=out,
            checkpoint_dir=ckpt, resume=resume)

    run(3, tmp_path / "full", tmp_path / "ckpt_full")
    run(1, tmp_path / "split", tmp_path / "ckpt_split")
    run(3, tmp_path / "split", tmp_path / "ckpt_split", resume=True)
    assert (tmp_path / "split" / "steps.tsv").read_text() == \
        (tmp_path / "full" / "steps.tsv").read_text()


def test_ppo_resume_between_checkpoints_truncates_logs(tmp_path):
    """A crash BETWEEN checkpoints leaves steps.tsv/progress.txt rows for
    epochs newer than the restored state; resume must drop them so the
    merged logs hold exactly one row per (epoch, step) — and the re-run
    epochs must reproduce the uninterrupted run exactly."""
    import shutil

    env_fn = _tiny_env_fn(seed=8)
    ac_cfg = ActorCriticConfig(obs_dim=env_fn().observation_space.shape[0],
                               **_TINY_AC)

    def run(epochs, out, ckpt, resume=False):
        cfg = PPOConfig(steps_per_epoch=2, epochs=epochs, train_pi_iters=1,
                        train_v_iters=1, save_freq=1, seed=21)
        ppo(env_fn, cfg, ac_cfg, output_dir=out, checkpoint_dir=ckpt,
            resume=resume)

    run(4, tmp_path / "full", tmp_path / "ckpt_full")
    run(3, tmp_path / "split", tmp_path / "ckpt_split")
    # simulate a crash after epoch 1's checkpoint: epochs 2 was logged
    # but its checkpoint is "lost"
    for step in ("2",):
        shutil.rmtree(tmp_path / "ckpt_split" / step)
    run(4, tmp_path / "split", tmp_path / "ckpt_split", resume=True)

    full = (tmp_path / "full" / "steps.tsv").read_text()
    split = (tmp_path / "split" / "steps.tsv").read_text()
    assert split == full  # no duplicated epoch-2 rows, exact continuation
    prog = (tmp_path / "split" / "progress.txt").read_text().splitlines()
    epochs_logged = [row.split("\t")[0] for row in prog[1:]]
    assert epochs_logged == ["0", "1", "2", "3"]
