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
           "parity_part_from_h", "systematic_encoder_from_h"]


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

    Returns ``encode(messages[B, k] int) -> codewords[B, n] int8``; the
    function carries ``k_eff`` (message bits it consumes).
    """
    a = jnp.asarray(np.asarray(a_dense, np.float32))

    @jax.jit
    def encode_fn(messages):
        m = jnp.asarray(messages, jnp.float32)
        parity = jnp.dot(m, a, preferred_element_type=jnp.float32)
        parity = jnp.mod(parity, 2.0)
        return jnp.concatenate(
            [m.astype(jnp.int8), parity.astype(jnp.int8)], axis=-1)

    encode_fn.k_eff = int(a_dense.shape[0])
    return encode_fn


def systematic_encoder_from_h(h: np.ndarray):
    """General systematic encoder for ANY dense parity matrix H [m, n].

    Row-reduces H over GF(2) with COLUMN pivoting, so it works where
    :func:`parity_part_from_h` cannot: the pivot columns (an invertible
    column set that always exists, wherever it sits) become the parity
    positions and the remaining ``n - rank`` columns carry the message.
    Rank-deficient H (redundant checks — e.g. dense near-earth H has
    GF(2) rank 1020 of 1022) is handled by dropping the dependent rows:
    ``k_eff = n - rank``.

    Returns a jitted ``encode(messages[B, k_eff]) -> codewords[B, n]
    int8`` carrying ``k_eff``, ``info_positions`` and ``parity_positions``
    attributes.  The parity block is one MXU matmul (row sums < 2^24 in
    float32, exact).
    """
    h = np.asarray(h, np.uint8) & 1
    m, n = h.shape
    hb = h.copy()
    pivots = []
    r = 0
    for c in range(n):
        piv = np.nonzero(hb[r:, c])[0]
        if piv.size == 0:
            continue
        p = r + int(piv[0])
        if p != r:
            hb[[r, p]] = hb[[p, r]]
        elim = np.nonzero(hb[:, c])[0]
        elim = elim[elim != r]
        hb[elim] ^= hb[r]
        pivots.append(c)
        r += 1
        if r == m:
            break
    rank = r
    if rank == 0:
        raise ValueError("H has rank 0 — nothing to encode against")
    pivots = np.asarray(pivots, np.int64)
    info = np.setdiff1d(np.arange(n), pivots)
    # reduced row r reads: c[pivots[r]] + sum_j M[r, j] * c[info[j]] = 0
    mt = jnp.asarray(hb[:rank][:, info].T, jnp.float32)  # [k_eff, rank]
    info_j = jnp.asarray(info)
    piv_j = jnp.asarray(pivots)

    @jax.jit
    def encode_fn(messages):
        msgs = jnp.asarray(messages, jnp.float32)
        parity = jnp.mod(
            jnp.dot(msgs, mt, preferred_element_type=jnp.float32), 2.0)
        cw = jnp.zeros((msgs.shape[0], n), jnp.int8)
        cw = cw.at[:, info_j].set(msgs.astype(jnp.int8))
        cw = cw.at[:, piv_j].set(parity.astype(jnp.int8))
        return cw

    encode_fn.k_eff = int(n - rank)
    encode_fn.info_positions = info
    encode_fn.parity_positions = pivots
    return encode_fn


@functools.lru_cache(maxsize=8)
def encoder_for_code(code: QCCode):
    """Encoder for ANY code.

    Near-earth uses the shipped CCSDS generator; other codes derive the
    parity part from H over GF(2): first the message-prefix layout
    (:func:`parity_part_from_h` — the 802.11n dual-diagonal family), and
    when that parity square is singular, the general column-pivoted
    encoder (:func:`systematic_encoder_from_h`) — so unlike the
    reference's G='None' dead end (ldpc.py:409) every H is encodable.
    The returned function carries ``k_eff``, which may differ from
    ``code.k`` for rank-deficient H (redundant checks).
    """
    from .ccsds import K, N, near_earth_code, near_earth_generator_dense
    if code.shifts == near_earth_code().shifts:
        g = near_earth_generator_dense()
        return make_encoder(g[:, K:])
    h = code.to_dense()
    try:
        return make_encoder(parity_part_from_h(h))
    except ValueError:
        return systematic_encoder_from_h(h)


def encode(code: QCCode, messages) -> jax.Array:
    """One-shot systematic encode (batched)."""
    return encoder_for_code(code)(messages)
