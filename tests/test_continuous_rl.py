"""Integration tests for the continuous-control suite (trpo/ddpg/td3/sac).

The reference vendors these algorithms (spinup/algos) with a CartPole
integration test (spinningup/test/OLDtest_ppo.py); here each algorithm must
improve the return on the built-in point-mass env.
"""

import numpy as np
import pytest

from ldpc_tpu.rl.continuous import (GaussianActor, PointMassEnv,
                                    ReplayBuffer)
from ldpc_tpu.utils.logging import EpochLogger


def eval_policy(env, act_fn, episodes=5):
    rets = []
    for _ in range(episodes):
        obs = env.reset()
        total = 0.0
        done = False
        while not done:
            obs, r, done, _ = env.step(act_fn(obs))
            total += r
        rets.append(total)
    return float(np.mean(rets))


def random_baseline(seed=123):
    env = PointMassEnv(seed=seed)
    rng = np.random.RandomState(0)
    return eval_policy(env, lambda o: rng.uniform(-1, 1, 1))


def quiet_logger(tmp_path, name):
    import io
    from contextlib import redirect_stdout
    with redirect_stdout(io.StringIO()):
        return EpochLogger(output_dir=tmp_path / name)


def test_replay_buffer_fifo():
    buf = ReplayBuffer(2, 1, size=4)
    for i in range(6):
        buf.store(np.full(2, i), [i], i, np.full(2, i + 1), i % 2)
    assert buf.size == 4
    batch = buf.sample(np.random.RandomState(0), 8)
    assert batch["obs"].shape == (8, 2)
    assert set(batch["rew"]).issubset({2.0, 3.0, 4.0, 5.0})


def test_gaussian_kl_zero_for_identical():
    mu = np.zeros((3, 2))
    ls = np.full((3, 2), -0.5)
    kl = GaussianActor.kl(mu, ls, mu, ls)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


@pytest.mark.parametrize("algo", ["ddpg", "td3"])
def test_ddpg_td3_improve_over_random(tmp_path, algo):
    import jax
    from ldpc_tpu.rl.ddpg import DDPGConfig, ddpg, td3

    fn = td3 if algo == "td3" else ddpg
    cfg = DDPGConfig(steps_per_epoch=256, epochs=8, start_steps=256,
                     update_after=256, seed=1)
    params, logger = fn(lambda: PointMassEnv(seed=1), cfg,
                        logger=quiet_logger(tmp_path, algo))
    from ldpc_tpu.rl.continuous import DeterministicActor
    actor = DeterministicActor(1, 1.0)
    act = jax.jit(lambda o: actor.apply(params["pi"], o[None])[0])
    score = eval_policy(PointMassEnv(seed=77), lambda o: np.asarray(act(o)))
    assert score > random_baseline() + 2.0


def test_sac_improves_over_random(tmp_path):
    from ldpc_tpu.rl.sac import SACConfig, sac

    cfg = SACConfig(steps_per_epoch=256, epochs=4, start_steps=128,
                    update_after=128, seed=2)
    params, logger, act_det = sac(lambda: PointMassEnv(seed=2), cfg,
                                  logger=quiet_logger(tmp_path, "sac"))
    score = eval_policy(
        PointMassEnv(seed=77),
        lambda o: np.asarray(act_det(params["pi"], o[None]))[0])
    assert score > random_baseline() + 2.0


def test_trpo_improves_and_respects_trust_region(tmp_path):
    import jax
    from ldpc_tpu.rl.trpo import TRPOConfig, trpo
    from ldpc_tpu.rl.continuous import GaussianActor

    cfg = TRPOConfig(steps_per_epoch=256, epochs=6, seed=3)
    pi_params, vf_params, logger = trpo(
        lambda: PointMassEnv(seed=3), cfg,
        logger=quiet_logger(tmp_path, "trpo"))
    actor = GaussianActor(1)
    act = jax.jit(lambda o: actor.apply(pi_params, o[None])[0][0])
    score = eval_policy(PointMassEnv(seed=77), lambda o: np.asarray(act(o)))
    assert score > random_baseline() + 1.0
    # every epoch's KL stayed within ~the trust region
    progress = None
    for p in (tmp_path / "trpo").glob("progress.txt"):
        progress = p.read_text().splitlines()
    assert progress is not None
    header = progress[0].split("\t")
    kl_col = header.index("KL")
    kls = [float(row.split("\t")[kl_col]) for row in progress[1:]]
    assert max(kls) < 5 * cfg.delta


def test_sac_auto_alpha_tunes_temperature(tmp_path):
    """auto_alpha=True learns log_alpha: it must move from its init and
    training must still improve over random."""
    from ldpc_tpu.rl.sac import SACConfig, sac

    cfg = SACConfig(steps_per_epoch=256, epochs=4, start_steps=128,
                    update_after=128, seed=2, auto_alpha=True, alpha=0.2)
    params, logger, act_det = sac(lambda: PointMassEnv(seed=2), cfg,
                                  logger=quiet_logger(tmp_path, "sac_aa"))
    assert abs(float(params["log_alpha"]) - np.log(0.2)) > 1e-3
    score = eval_policy(
        PointMassEnv(seed=77),
        lambda o: np.asarray(act_det(params["pi"], o[None]))[0])
    assert score > random_baseline() + 2.0


def test_gymnasium_adapter_api(tmp_path):
    """The adapter exposes the flat API on a real gymnasium Box env and a
    short SAC run on it executes end-to-end."""
    gymnasium = pytest.importorskip("gymnasium")
    from ldpc_tpu.rl.continuous import GymnasiumAdapter
    from ldpc_tpu.rl.sac import SACConfig, sac

    env = GymnasiumAdapter(gymnasium.make("Pendulum-v1"))
    assert env.obs_dim == 3 and env.act_dim == 1 and env.act_limit == 2.0
    obs = env.reset()
    assert obs.shape == (3,)
    obs2, r, done, info = env.step(np.zeros(1))
    assert obs2.shape == (3,) and isinstance(r, float)
    assert "truncated" in info

    cfg = SACConfig(steps_per_epoch=64, epochs=1, start_steps=32,
                    update_after=32, update_every=16, seed=0)
    params, _, act_det = sac(
        lambda: GymnasiumAdapter(gymnasium.make("Pendulum-v1")), cfg,
        logger=quiet_logger(tmp_path, "gym_sac"))
    a = np.asarray(act_det(params["pi"], obs[None]))[0]
    assert a.shape == (1,) and abs(float(a[0])) <= 2.0
