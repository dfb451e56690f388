"""RL layer (L4): autoregressive actor-critic, GAE buffer, PPO, baselines."""

from .model import (Actor, ActorCriticConfig, Critic, action_to_env_action,
                    evaluate_actions, init_params, sample_step)
from .buffer import BufferContainer, PPOBuffer, discount_cumsum
from .ppo import PPOConfig, make_update_fns, ppo
from .random_agent import run_random_agent
from .vpg import VPGConfig, vpg
from .ddpg import DDPGConfig, ddpg, td3
from .sac import SACConfig, sac
from .trpo import TRPOConfig, trpo
from .continuous import PointMassEnv, ReplayBuffer

__all__ = [
    "Actor", "ActorCriticConfig", "Critic", "action_to_env_action",
    "evaluate_actions", "init_params", "sample_step",
    "BufferContainer", "PPOBuffer", "discount_cumsum",
    "PPOConfig", "make_update_fns", "ppo",
    "run_random_agent",
    "VPGConfig", "vpg",
    "DDPGConfig", "ddpg", "td3", "SACConfig", "sac",
    "TRPOConfig", "trpo", "PointMassEnv", "ReplayBuffer",
]
