"""Vectorized environments (reference ``envContainer.py`` equivalent).

The reference pins one env per CUDA device and steps them through a
``ProcessPoolExecutor`` (envContainer.py:10-57).  On TPU each env step is
already a single batched device call that can saturate the chip (and shard
across a mesh), so the vector container is plain sequential composition —
no process pools, no pickling; the accelerator parallelism lives inside
each step.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from .code_search import LdpcCodeSearchEnv

__all__ = ["EnvironmentVector"]


class EnvironmentVector:
    """N independent envs with batched step/reset (envContainer semantics).

    ``step`` takes one action per env and returns stacked observations,
    rewards, dones and an info list — the interface of
    ``multiDeviceEnvironment.step`` (envContainer.py:38-56).
    """

    def __init__(self, env_fns: Sequence[Callable[[], LdpcCodeSearchEnv]]
                 | int = 1, **env_kwargs):
        if isinstance(env_fns, int):
            self.envs = [LdpcCodeSearchEnv(**env_kwargs)
                         for _ in range(env_fns)]
        else:
            self.envs = [fn() for fn in env_fns]

    def __len__(self):
        return len(self.envs)

    @property
    def action_space(self):
        return self.envs[0].action_space

    @property
    def observation_space(self):
        return self.envs[0].observation_space

    def reset(self) -> np.ndarray:
        return np.stack([e.reset() for e in self.envs])

    def step(self, actions):
        results = [e.step(a) for e, a in zip(self.envs, actions)]
        obs = np.stack([r[0] for r in results])
        rewards = np.array([r[1] for r in results], np.float64)
        dones = np.array([r[2] for r in results], bool)
        infos = [r[3] for r in results]
        return obs, rewards, dones, infos

    def seed(self, seeds=None):
        if seeds is None:
            seeds = range(len(self.envs))
        for e, s in zip(self.envs, seeds):
            e.seed(int(s))
