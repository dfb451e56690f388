"""Systematic encoding: c = [m | m . A] mod 2 (G = [I | A]).

The reference's encoder is vestigial — ``codeword = G.dot(message) % 2``
only when a generator is supplied (``ldpc.py:409-414``); the all-zero
codeword is its default Monte-Carlo path.  Here encoding is a first-class
batched op: the parity block is one MXU matmul ``[B, k] x [k, n-k]`` in
float32 (row sums <= k < 2^24, so the mod-2 reduction is exact) — for
near-earth that is a 7154x1022 dense A, ~15 MFLOP per codeword.

``encoder_for_code`` knows the shipped CCSDS generator; arbitrary codes can
supply their own dense A or generator rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .qc import QCCode

__all__ = ["make_encoder", "encoder_for_code", "encode"]


def make_encoder(a_dense: np.ndarray):
    """Jitted systematic encoder from the dense parity part A [k, n-k].

    Returns ``encode(messages[B, k] int) -> codewords[B, n] int8``.
    """
    a = jnp.asarray(np.asarray(a_dense, np.float32))

    @jax.jit
    def encode_fn(messages):
        m = jnp.asarray(messages, jnp.float32)
        parity = jnp.dot(m, a, preferred_element_type=jnp.float32)
        parity = jnp.mod(parity, 2.0)
        return jnp.concatenate(
            [m.astype(jnp.int8), parity.astype(jnp.int8)], axis=-1)

    return encode_fn


@functools.lru_cache(maxsize=8)
def encoder_for_code(code: QCCode):
    """Encoder for a shipped code (near-earth today).

    Raises ValueError when no generator is known for the code — mirroring
    the reference's G='None' path (ldpc.py:409).
    """
    from .ccsds import K, N, near_earth_code, near_earth_generator_dense
    if code.shifts == near_earth_code().shifts:
        g = near_earth_generator_dense()
        return make_encoder(g[:, K:])
    raise ValueError(
        f"no generator matrix known for code {code.name!r}; "
        "use make_encoder with an explicit parity part")


def encode(code: QCCode, messages) -> jax.Array:
    """One-shot systematic encode (batched)."""
    return encoder_for_code(code)(messages)
