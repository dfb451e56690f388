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

__all__ = ["make_encoder", "encoder_for_code", "encode",
           "parity_part_from_h"]


def parity_part_from_h(h: np.ndarray) -> np.ndarray:
    """Derive the systematic parity part A [k, m] from a dense H [m, n].

    Splits H = [H1 | H2] (information | parity columns), inverts H2 over
    GF(2) and returns A = (H2^-1 H1)^T so that ``c = [msg | msg . A]``
    satisfies ``H c^T = 0``.  Raises ValueError when H2 is singular.
    The reference never does this — its encoder needs a pre-computed
    generator file (ldpc.py:409-414, fileHandler.py:234); here any code
    whose parity square is invertible (e.g. the 802.11n dual-diagonal
    family) is encodable directly from H.
    """
    h = np.asarray(h, np.uint8) & 1
    m, n = h.shape
    k = n - m
    h1, h2 = h[:, :k].copy(), h[:, k:].copy()
    # Gauss-Jordan over GF(2): reduce [H2 | H1] -> [I | H2^-1 H1]
    aug = np.concatenate([h2, h1], axis=1)
    for col in range(m):
        piv_rows = np.nonzero(aug[col:, col])[0]
        if piv_rows.size == 0:
            raise ValueError(f"parity part singular at column {col}")
        piv = col + int(piv_rows[0])
        if piv != col:
            aug[[col, piv]] = aug[[piv, col]]
        elim = np.nonzero(aug[:, col])[0]
        elim = elim[elim != col]
        aug[elim] ^= aug[col]
    return np.ascontiguousarray(aug[:, m:].T)


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
    """Encoder for any systematically-encodable code.

    Near-earth uses the shipped CCSDS generator; every other code derives
    its parity part from H over GF(2) (:func:`parity_part_from_h`) — in
    particular the whole 802.11n dual-diagonal family.  Raises ValueError
    only when the parity square of H is singular — the analog of the
    reference's G='None' path (ldpc.py:409), which simply cannot encode.
    """
    from .ccsds import K, N, near_earth_code, near_earth_generator_dense
    if code.shifts == near_earth_code().shifts:
        g = near_earth_generator_dense()
        return make_encoder(g[:, K:])
    try:
        a = parity_part_from_h(code.to_dense())
    except ValueError as e:
        raise ValueError(
            f"code {code.name!r} is not systematically encodable ({e}); "
            "use make_encoder with an explicit parity part") from e
    return make_encoder(a)


def encode(code: QCCode, messages) -> jax.Array:
    """One-shot systematic encode (batched)."""
    return encoder_for_code(code)(messages)
