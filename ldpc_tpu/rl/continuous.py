"""Shared machinery for the continuous-control algorithms.

The reference vendors the whole Spinning Up suite (``spinup/algos``:
ppo/vpg/trpo/ddpg/td3/sac, SURVEY.md §2 L4) although only PPO is wired to
the LDPC env.  This module provides the JAX equivalents of Spinning Up's
``core.py`` building blocks used by our trpo/ddpg/td3/sac: MLP actors
(deterministic, Gaussian, squashed-Gaussian), twin Q critics, a uniform
replay buffer and polyak averaging.  A tiny built-in point-mass env serves
as the integration-test environment (the vendored copy used CartPole /
MuJoCo, unavailable here).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MLP", "DeterministicActor", "GaussianActor",
           "SquashedGaussianActor", "QCritic", "ValueCritic",
           "ReplayBuffer", "polyak_update", "PointMassEnv",
           "GymnasiumAdapter"]

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


class MLP(nn.Module):
    features: Sequence[int]
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = {"relu": jax.nn.relu, "tanh": jnp.tanh}[self.activation]
        for f in self.features[:-1]:
            x = act(nn.Dense(f)(x))
        return nn.Dense(self.features[-1])(x)


class DeterministicActor(nn.Module):
    """tanh-squashed deterministic policy (DDPG/TD3)."""

    act_dim: int
    act_limit: float = 1.0
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        out = MLP([*self.hidden, self.act_dim])(obs)
        return self.act_limit * jnp.tanh(out)


class GaussianActor(nn.Module):
    """Diagonal Gaussian policy with state-independent log-std (TRPO/VPG
    style, spinup core.MLPGaussianActor)."""

    act_dim: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        mu = MLP([*self.hidden, self.act_dim], activation="tanh")(obs)
        log_std = self.param("log_std", lambda k: -0.5 * jnp.ones(
            self.act_dim))
        return mu, jnp.broadcast_to(log_std, mu.shape)

    @staticmethod
    def log_prob(mu, log_std, act):
        pre = -0.5 * (((act - mu) / jnp.exp(log_std)) ** 2 +
                      2 * log_std + jnp.log(2 * jnp.pi))
        return jnp.sum(pre, axis=-1)

    @staticmethod
    def kl(mu0, log_std0, mu1, log_std1):
        """KL(pi0 || pi1), diagonal Gaussians, summed over dims."""
        v0, v1 = jnp.exp(2 * log_std0), jnp.exp(2 * log_std1)
        return jnp.sum(log_std1 - log_std0 +
                       (v0 + (mu0 - mu1) ** 2) / (2 * v1) - 0.5, axis=-1)


class SquashedGaussianActor(nn.Module):
    """tanh-squashed Gaussian with reparameterized sampling (SAC,
    spinup core.SquashedGaussianMLPActor)."""

    act_dim: int
    act_limit: float = 1.0
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs, rng=None, deterministic: bool = False):
        net = MLP([*self.hidden, self.hidden[-1]])(obs)
        net = jax.nn.relu(net)
        mu = nn.Dense(self.act_dim)(net)
        log_std = jnp.clip(nn.Dense(self.act_dim)(net),
                           LOG_STD_MIN, LOG_STD_MAX)
        std = jnp.exp(log_std)
        if deterministic or rng is None:
            pre = mu
        else:
            pre = mu + std * jax.random.normal(rng, mu.shape)
        logp = jnp.sum(
            -0.5 * (((pre - mu) / std) ** 2 + 2 * log_std +
                    jnp.log(2 * jnp.pi)), axis=-1)
        # tanh correction (spinup sac core, numerically-stable form)
        logp = logp - jnp.sum(
            2 * (jnp.log(2.0) - pre - jax.nn.softplus(-2 * pre)), axis=-1)
        return self.act_limit * jnp.tanh(pre), logp


class QCritic(nn.Module):
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        return MLP([*self.hidden, 1])(x)[..., 0]


class ValueCritic(nn.Module):
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        return MLP([*self.hidden, 1])(obs)[..., 0]


class ReplayBuffer:
    """Uniform FIFO replay buffer (spinup ddpg/core ReplayBuffer)."""

    def __init__(self, obs_dim: int, act_dim: int, size: int):
        self.obs = np.zeros((size, obs_dim), np.float32)
        self.obs2 = np.zeros((size, obs_dim), np.float32)
        self.act = np.zeros((size, act_dim), np.float32)
        self.rew = np.zeros(size, np.float32)
        self.done = np.zeros(size, np.float32)
        self.ptr, self.size, self.max_size = 0, 0, size

    def store(self, obs, act, rew, obs2, done):
        i = self.ptr
        self.obs[i], self.obs2[i] = obs, obs2
        self.act[i], self.rew[i], self.done[i] = act, rew, float(done)
        self.ptr = (self.ptr + 1) % self.max_size
        self.size = min(self.size + 1, self.max_size)

    def sample(self, rng: np.random.RandomState, batch_size: int) -> dict:
        idx = rng.randint(0, self.size, batch_size)
        return dict(obs=self.obs[idx], obs2=self.obs2[idx],
                    act=self.act[idx], rew=self.rew[idx],
                    done=self.done[idx])


def polyak_update(target, online, rho: float):
    """target <- rho * target + (1 - rho) * online, leafwise."""
    return jax.tree_util.tree_map(
        lambda t, o: rho * t + (1.0 - rho) * o, target, online)


@dataclasses.dataclass
class PointMassEnv:
    """1-D point mass: drive position+velocity to the origin.

    obs = [pos, vel]; act in [-1, 1]; reward = -(pos^2 + 0.1 vel^2 +
    0.01 act^2); 64-step episodes.  The built-in stand-in for the gym
    classic-control envs the vendored algorithms were demoed on.
    """

    seed: int = 0
    horizon: int = 64
    obs_dim: int = 2
    act_dim: int = 1
    act_limit: float = 1.0

    def __post_init__(self):
        self.rng = np.random.RandomState(self.seed)
        self.reset()

    def reset(self):
        self.state = self.rng.uniform(-1, 1, 2).astype(np.float32)
        self.t = 0
        return self.state.copy()

    def step(self, action):
        a = float(np.clip(np.asarray(action).reshape(-1)[0], -1, 1))
        pos, vel = self.state
        vel = np.clip(0.95 * vel + 0.2 * a, -3.0, 3.0)
        pos = np.clip(pos + 0.2 * vel, -3.0, 3.0)
        self.state = np.array([pos, vel], np.float32)
        reward = -(pos ** 2 + 0.1 * vel ** 2 + 0.01 * a ** 2)
        self.t += 1
        done = self.t >= self.horizon
        return self.state.copy(), float(reward), bool(done), {}


class GymnasiumAdapter:
    """Adapt a gymnasium ``Env`` to the flat API the continuous suite
    uses (``obs_dim``/``act_dim``/``act_limit`` attributes,
    ``reset() -> obs``, ``step(a) -> (obs2, r, done, info)``).

    The vendored Spinning Up algorithms consumed classic gym 0.15 envs
    (spinup core / ddpg.py etc.); gymnasium changed reset/step signatures
    (5-tuple step, (obs, info) reset).  This shim lets
    ddpg/td3/sac/trpo/vpg here train on any gymnasium Box env:

        import gymnasium
        env_fn = lambda: GymnasiumAdapter(gymnasium.make("Pendulum-v1"))
        sac(env_fn)
    """

    def __init__(self, env):
        self.env = env
        space, aspace = env.observation_space, env.action_space
        self.obs_dim = int(np.prod(space.shape))
        self.act_dim = int(np.prod(aspace.shape))
        high = np.asarray(aspace.high).reshape(-1)
        self.act_limit = float(high[0])

    def reset(self):
        obs, _info = self.env.reset()
        return np.asarray(obs, np.float32).reshape(-1)

    def step(self, action):
        obs2, r, terminated, truncated, info = self.env.step(
            np.asarray(action).reshape(self.env.action_space.shape))
        # Spinning Up treats time-limit truncation as done for episode
        # bookkeeping; the algorithms here bootstrap only on env dones,
        # so expose `terminated` as done and flag truncation in info.
        info = dict(info)
        info["truncated"] = bool(truncated)
        done = bool(terminated or truncated)
        return (np.asarray(obs2, np.float32).reshape(-1), float(r),
                done, info)
