"""Autoregressive actor-critic for QC-LDPC code search (flax).

Replicates the reference policy structure (``models.py:278-513``):

* an MLP encoder over the 2048-byte packed observation;
* an autoregressive chain of categorical heads — block row ``i`` (2-way),
  block col ``j`` (16-way, conditioned on i), hot-bit count ``k``
  (``max_hot``-way, sampled value offset by +1 so k >= 1,
  models.py:363-372), then ``max_hot`` coordinate choices from a 511-way
  categorical whose logits feed back additively into its own input
  (``setEncodedStuff = setEncodedStuff + logits``, models.py:398-430);
* a separate MLP critic over the raw observation (models.py:456).

Like the reference, the total log-prob sums ALL ``max_hot`` coordinate
heads (even the unused ones beyond k, models.py:437-447), and per-head
entropies are returned so PPO can apply its entropy bonus to the i-head
only (openAIppo.py:337).

Divergences (documented):
* hidden activations default to tanh — the reference's ``explicitMLP``
  defaults every activation to ``nn.Identity`` (models.py:83), collapsing
  its MLPs to linear maps; pass ``activation="identity"`` to reproduce.
* coordinates are sampled with one categorical draw each (the reference
  draws k twice and discards the first draw, models.py:367-369 — a bug
  with no effect on semantics beyond RNG stream position).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ActorCriticConfig", "Actor", "Critic", "sample_step",
           "evaluate_actions", "action_to_env_action", "init_params"]

_ACTIVATIONS = {"tanh": jnp.tanh, "relu": jax.nn.relu,
                "identity": lambda x: x}


@dataclasses.dataclass(frozen=True)
class ActorCriticConfig:
    obs_dim: int = 2048
    hidden: int = 64              # hiddenEncoderSize (openAIppo.py:288)
    row_range: int = 2
    col_range: int = 16
    z: int = 511
    max_hot: int = 15             # MAXIMUM_NUMBER_OF_HOT_BITS
    activation: str = "tanh"

    @property
    def x_bits(self) -> int:
        return max(1, (self.row_range - 1).bit_length())

    @property
    def y_bits(self) -> int:
        return max(1, (self.col_range - 1).bit_length())

    @property
    def buffer_action_dim(self) -> int:
        """[i, j, k, coords...] as stored in the PPO buffer
        (models.py:489)."""
        return 3 + self.max_hot

    @property
    def env_action_dim(self) -> int:
        return self.x_bits + self.y_bits + self.z

    @property
    def num_entropy_heads(self) -> int:
        return 3 + self.max_hot


class MLP(nn.Module):
    """explicitMLP equivalent (models.py:77-103): hidden stack + linear out."""

    features: Sequence[int]
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x):
        act = _ACTIVATIONS[self.activation]
        for f in self.features[:-1]:
            x = act(nn.Dense(f)(x))
        return nn.Dense(self.features[-1])(x)


class Actor(nn.Module):
    """Autoregressive policy.  ``__call__(obs, action)`` evaluates the
    given buffer actions; ``sample``/``mode`` draw new ones."""

    cfg: ActorCriticConfig

    def setup(self):
        c = self.cfg
        a = c.activation
        self.encoder = MLP([c.hidden, c.hidden, c.hidden], a)
        self.i_head = MLP([64, c.row_range], a)
        self.j_head = MLP([64, c.col_range], a)
        self.k_head = MLP([64, c.max_hot], a)
        self.encoder2 = MLP([64, c.z], a)
        self.coord_head = MLP([64, c.z], a)

    def _heads(self, obs, i, j, k):
        """Logits of the i/j/k heads given (partial) previous choices."""
        enc = self.encoder(obs)
        logits_i = self.i_head(enc)
        enc_i = jnp.concatenate([enc, i[..., None].astype(jnp.float32)], -1)
        logits_j = self.j_head(enc_i)
        enc_ij = jnp.concatenate(
            [enc_i, j[..., None].astype(jnp.float32)], -1)
        logits_k = self.k_head(enc_ij)
        enc_ijk = jnp.concatenate(
            [enc_ij, k[..., None].astype(jnp.float32)], -1)
        set_encoded = self.encoder2(enc_ijk)
        return enc, logits_i, logits_j, logits_k, set_encoded

    def _coord_scan(self, set_encoded, sampler):
        """max_hot sequential coordinate draws with additive logit
        feedback (models.py:398-430).  ``sampler(logits, t) -> coord``."""
        coords, logps, ents = [], [], []
        carry = set_encoded
        for t in range(self.cfg.max_hot):
            logits = self.coord_head(carry)
            logp_all = jax.nn.log_softmax(logits)
            coord = sampler(logits, t)
            logps.append(jnp.take_along_axis(
                logp_all, coord[..., None], -1)[..., 0])
            p = jax.nn.softmax(logits)
            ents.append(-jnp.sum(p * logp_all, -1))
            coords.append(coord)
            carry = carry + logits
        return (jnp.stack(coords, -1), jnp.stack(logps, -1),
                jnp.stack(ents, -1))

    def __call__(self, obs, action):
        """Evaluate log-probs/entropies of given buffer actions
        [i, j, k, coords...] (the `action is not None` mode,
        models.py:312-447)."""
        i = action[..., 0].astype(jnp.int32)
        j = action[..., 1].astype(jnp.int32)
        k = action[..., 2].astype(jnp.int32)
        coords = action[..., 3:].astype(jnp.int32)
        _, li, lj, lk, set_enc = self._heads(
            obs, i.astype(jnp.float32), j.astype(jnp.float32),
            k.astype(jnp.float32))
        _, logp_coords, ent_coords = self._coord_scan(
            set_enc, lambda logits, t: coords[..., t])
        return self._pack(li, lj, lk, i, j, k, logp_coords, ent_coords)

    def sample(self, obs):
        """Sample an action (training mode, models.py:351-430)."""
        rng = self.make_rng("action")
        r_i, r_j, r_k, r_c = jax.random.split(rng, 4)
        enc = self.encoder(obs)
        li = self.i_head(enc)
        i = jax.random.categorical(r_i, li)
        enc_i = jnp.concatenate([enc, i[..., None].astype(jnp.float32)], -1)
        lj = self.j_head(enc_i)
        j = jax.random.categorical(r_j, lj)
        enc_ij = jnp.concatenate(
            [enc_i, j[..., None].astype(jnp.float32)], -1)
        lk = self.k_head(enc_ij)
        # k can't be 0: sampled index + 1 (models.py:367-369)
        k = jax.random.categorical(r_k, lk) + 1
        enc_ijk = jnp.concatenate(
            [enc_ij, k[..., None].astype(jnp.float32)], -1)
        set_enc = self.encoder2(enc_ijk)
        keys = jax.random.split(r_c, self.cfg.max_hot)

        def sampler(logits, t):
            return jax.random.categorical(keys[t], logits)

        coords, logp_coords, ent_coords = self._coord_scan(set_enc, sampler)
        return self._pack(li, lj, lk, i, j, k, logp_coords, ent_coords,
                          coords=coords)

    def mode(self, obs):
        """Most probable action (eval mode, models.py:357-359,426-430)."""
        enc = self.encoder(obs)
        li = self.i_head(enc)
        i = jnp.argmax(li, -1)
        enc_i = jnp.concatenate([enc, i[..., None].astype(jnp.float32)], -1)
        lj = self.j_head(enc_i)
        j = jnp.argmax(lj, -1)
        enc_ij = jnp.concatenate(
            [enc_i, j[..., None].astype(jnp.float32)], -1)
        lk = self.k_head(enc_ij)
        k = jnp.argmax(lk, -1) + 1
        enc_ijk = jnp.concatenate(
            [enc_ij, k[..., None].astype(jnp.float32)], -1)
        set_enc = self.encoder2(enc_ijk)
        coords, logp_coords, ent_coords = self._coord_scan(
            set_enc, lambda logits, t: jnp.argmax(logits, -1))
        return self._pack(li, lj, lk, i, j, k, logp_coords, ent_coords,
                          coords=coords)

    def _pack(self, li, lj, lk, i, j, k, logp_coords, ent_coords,
              coords=None):
        def cat_logp(logits, value):
            return jnp.take_along_axis(
                jax.nn.log_softmax(logits), value[..., None], -1)[..., 0]

        def cat_ent(logits):
            p = jax.nn.softmax(logits)
            return -jnp.sum(p * jax.nn.log_softmax(logits), -1)

        # k is stored offset by +1; log-prob evaluated at k-1
        # (models.py:440-441)
        logp_heads = jnp.stack(
            [cat_logp(li, i), cat_logp(lj, j),
             cat_logp(lk, jnp.maximum(k - 1, 0))], -1)
        ent_heads = jnp.stack([cat_ent(li), cat_ent(lj), cat_ent(lk)], -1)
        logp_all = jnp.concatenate([logp_heads, logp_coords], -1)
        ent_all = jnp.concatenate([ent_heads, ent_coords], -1)
        out = {
            "i": i, "j": j, "k": k,
            "logp": jnp.sum(logp_all, -1),
            "logp_per_head": logp_all,
            "entropy": jnp.sum(ent_all, -1),
            "entropy_per_head": ent_all,
        }
        if coords is not None:
            out["coords"] = coords
        return out


class Critic(nn.Module):
    """Value MLP over the raw observation (models.py:456)."""

    cfg: ActorCriticConfig

    @nn.compact
    def __call__(self, obs):
        v = MLP([self.cfg.hidden, self.cfg.hidden, 1],
                self.cfg.activation)(obs)
        return v[..., 0]


def init_params(cfg: ActorCriticConfig, seed: int = 0):
    """Initialise (actor_params, critic_params)."""
    actor, critic = Actor(cfg), Critic(cfg)
    obs = jnp.zeros((1, cfg.obs_dim), jnp.float32)
    dummy_action = jnp.zeros((1, cfg.buffer_action_dim), jnp.int32)
    k1, k2 = jax.random.split(jax.random.key(seed))
    ap = actor.init({"params": k1, "action": k1}, obs, dummy_action)
    cp = critic.init(k2, obs)
    return ap, cp


def sample_step(cfg: ActorCriticConfig, actor_params, critic_params, obs,
                rng, deterministic: bool = False):
    """One acting step: (buffer_action, value, logp, entropies) —
    the openAIActorCritic.step contract (models.py:476-513)."""
    actor, critic = Actor(cfg), Critic(cfg)
    method = Actor.mode if deterministic else Actor.sample
    out = actor.apply(actor_params, obs, method=method,
                      rngs={"action": rng})
    v = critic.apply(critic_params, obs)
    buffer_action = jnp.concatenate(
        [jnp.stack([out["i"], out["j"], out["k"]], -1),
         out["coords"]], -1).astype(jnp.int32)
    return buffer_action, v, out["logp"], out["entropy_per_head"]


def evaluate_actions(cfg: ActorCriticConfig, actor_params, obs, actions):
    """Log-probs/entropies of stored actions (PPO update path)."""
    return Actor(cfg).apply(actor_params, obs, actions)


def action_to_env_action(cfg: ActorCriticConfig, buffer_action) -> np.ndarray:
    """[i, j, k, coords...] -> 516-bit env action
    (models.py:301-310,486-497): big-endian x/y bits + k-hot vector from
    the first k coordinates."""
    a = np.asarray(buffer_action).reshape(-1)
    i, j, k = int(a[0]), int(a[1]), int(a[2])
    coords = a[3:3 + k]
    vec = np.zeros(cfg.z, np.int32)
    vec[coords] = 1
    xb = [int(b) for b in np.binary_repr(i, cfg.x_bits)]
    yb = [int(b) for b in np.binary_repr(j, cfg.y_bits)]
    return np.concatenate([xb, yb, vec]).astype(np.int32)
