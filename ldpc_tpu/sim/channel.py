"""BPSK modulation, AWGN channel and LLR computation (batched, jittable).

Reference semantics (``ldpc.py:43-66``): ``modulate`` maps bit 0 -> -1.0,
bit 1 -> +1.0; ``addAWGN`` converts Eb/N0-style dB to ``sigma =
sqrt(0.5 / 10^(SNRdb/10))`` and also reports the *realized* sigma of the
drawn noise; ``slicer`` maps soft > 0 -> 1 else 0.  The reference feeds the
raw noisy samples straight into its min-sum decoder (scale-invariant);
sum-product needs true LLRs ``2 y / sigma^2`` — both are provided.

TPU-first: everything is vectorized over a [B, n] batch and built on
``jax.random`` (counter-based threefry: reproducible, splittable, identical
across hosts given the same key — unlike the reference's process-global
``np.random.RandomState`` whose seeding is inconsistent, ldpc.py:24,372).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "snr_db_to_sigma",
    "modulate",
    "slicer",
    "awgn",
    "transmit_zero_codeword",
    "llr_from_channel",
    "epsilon_probe",
]


def snr_db_to_sigma(snr_db) -> jax.Array:
    """sigma = sqrt(0.5 / SNR_linear) — ldpc.py:51-55 definition."""
    snr = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    return jnp.sqrt(0.5 / snr)


def modulate(bits) -> jax.Array:
    """BPSK: 0 -> -1.0, 1 -> +1.0 (ldpc.py:62-66)."""
    bits = jnp.asarray(bits)
    return jnp.where(bits == 0, -1.0, 1.0).astype(jnp.float32)


def slicer(soft) -> jax.Array:
    """Hard decision: > 0 -> 1, <= 0 -> 0 (ldpc.py:43-48)."""
    return (jnp.asarray(soft) > 0).astype(jnp.int8)


def awgn(key: jax.Array, modulated: jax.Array, snr_db):
    """Add white Gaussian noise at the given SNR (dB).

    Returns (noisy, sigma, sigma_actual) where sigma_actual is the realized
    RMS of the drawn noise per batch row (ldpc.py:58 reports the same).
    ``snr_db`` may be scalar or [B] (one SNR per codeword — the sweep
    harness packs different SNR points into one batch).
    """
    modulated = jnp.asarray(modulated)
    sigma = snr_db_to_sigma(snr_db)
    sigma_b = jnp.broadcast_to(jnp.atleast_1d(sigma), modulated.shape[:1])
    noise = sigma_b[:, None] * jax.random.normal(
        key, modulated.shape, jnp.float32)
    sigma_actual = jnp.sqrt(jnp.mean(noise * noise, axis=-1))
    return modulated + noise, sigma_b, sigma_actual


def llr_from_channel(noisy: jax.Array, sigma) -> jax.Array:
    """True channel LLRs for BPSK/AWGN with the reference sign convention.

    Positive => bit 1 (reference slicer), so llr = 2 y / sigma^2 with y the
    noisy sample (+1 for bit 1).  Min-sum is invariant to the positive
    scale; sum-product requires this scaling.
    """
    sigma = jnp.atleast_1d(jnp.asarray(sigma, jnp.float32))
    return 2.0 * noisy / (sigma[:, None] ** 2)


def transmit_zero_codeword(key: jax.Array, batch: int, n: int, snr_db):
    """The reference's default path: all-zero codeword through BPSK + AWGN.

    (``ldpc.py:364-372``: G is rarely supplied; the all-zero codeword is
    the standard Monte-Carlo trick for linear codes.)
    Returns (noisy [batch, n], sigma [batch], sigma_actual [batch]).
    """
    clean = jnp.full((batch, n), -1.0, jnp.float32)  # modulate(0) == -1
    return awgn(key, clean, snr_db)


def transmit_codewords(key: jax.Array, codewords, snr_db):
    """BPSK + AWGN for explicit codewords (the reference's G-based path,
    ldpc.py:409-416: encode, modulate, add noise).

    Returns (noisy, sigma, sigma_actual)."""
    return awgn(key, modulate(codewords), snr_db)


def epsilon_probe(n: int, flips=(0,), epsilon: float = 0.0) -> jax.Array:
    """Deterministic probe: modulated all-zero word with sign-flipped bits.

    Reproduces the reference's debug/diagnostic inputs: the single-bit-flip
    senseword of ``ldpc.py:417-418`` and the epsilon perturbation of
    ``evaluateMatrixAndEpsilon`` (ldpcCUDA.py:677-828).  Returns a [1, n]
    batch.
    """
    v = jnp.full((n,), -1.0, jnp.float32) + epsilon
    v = v.at[jnp.asarray(flips)].multiply(-1.0)
    return v[None, :]
