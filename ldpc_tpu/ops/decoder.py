"""Batched QC-LDPC belief-propagation decoders (min-sum family + sum-product).

TPU-first architecture (NOT a port)
-----------------------------------
The reference implements flooding BP three ways: a per-edge Python object
graph (``ldpc.py:223-337``), ~11 CUDA kernel launches + a host sync per
iteration over a dense 1022x8176 message matrix for ONE codeword
(``ldpcCUDA.py:576-664``), and a dense TF prototype (``ldpcTF.py:101-161``).
Here the decoder is a single fused XLA ``lax.while_loop``:

* Messages live per *block edge* of the QC structure — ``[S, Z, B]`` where
  ``S = Mb * Dmax`` slots, ``Z`` the circulant size (sublane axis) and ``B``
  the codeword batch (minor/lane axis).  A near-earth batch keeps
  ``64 x 511 x B`` floats instead of B dense 1022x8176 matrices — 25x less
  memory and every op is a dense vector op.
* Circulant alignment (check frame <-> variable frame) is a static
  ``jnp.roll`` along the Z axis per slot — XLA turns each into two sublane
  slices + concat, no gathers, no scatter.
* The check-node update is the extrinsic two-min rule of
  ``ldpc.py:174-202``: total sign product x per-edge sign, minimum magnitude
  everywhere except the argmin slot which gets the second minimum.  Ties
  need no special handling: a duplicated minimum forces min1 == min2, so
  the output is independent of tie order (the reference's stable
  ``np.argsort`` pick, ``ldpc.py:183``, is value-equivalent).
* Convergence is handled *per codeword inside the loop*: every iteration
  computes the syndrome (``ldpc.py:249-268`` semantics: slice at >0, H
  product mod 2), latches hard bits + iteration count for newly-converged
  words, and the loop exits when every word in the batch converged or
  ``max_iters`` is reached.  No host round-trips (the reference CUDA path
  reads a device flag on host every 6 iterations, ``ldpcCUDA.py:637``).

LLR sign convention follows the reference slicer (``ldpc.py:43-48``):
positive soft value => bit 1.  Min-sum is scale-invariant so raw noisy BPSK
samples can be fed directly (as the reference does); sum-product requires
true LLRs (see ``ldpc_tpu.sim.channel.llr_from_channel``).

Odd-degree-check correctness note
---------------------------------
In this inverted convention (sign +1 <=> bit 1) the plain sign-product CN
rule the reference uses (``ldpc.py:135-141``) asserts the wrong bit for
checks of odd degree: the correct message sign is ``product * (-1)^deg``.
The reference only operates on the near-earth code whose checks all have
even degree 32, so the bug is invisible there — but it silently breaks the
802.11n code (81 checks of degree 19; the reference's wifi path is
"decommissioned", ldpc.py:505).  This decoder therefore runs BP internally
in the standard convention (inputs negated on entry, outputs negated on
exit).  For even-degree codes this is *exactly* equivalent (min-sum is odd;
all messages simply negate), so near-earth trajectories still match the
reference bit for bit, while odd-degree codes decode correctly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.qc import QCCode
from .plan import DecodePlan

__all__ = ["DecodeResult", "make_decoder", "decode", "decoder_for_code"]

_PHI_MIN = 1e-9    # clamp for sum-product phi stability
_PHI_MAX = 38.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DecodeResult:
    """Batched decode output (pytree).

    Attributes:
      hard: [B, n] int8 hard decisions (reference `binaryVector`).
      iterations: [B] int32 — iterations until convergence, or max_iters
        (reference `decoderMainLoop` return `i`, ldpc.py:326-337).
      success: [B] bool — syndrome satisfied (reference status == 'Codeword').
      soft: [B, n] soft values at the successful check (or after the last
        iteration), present only when the decoder was built with
        ``keep_soft=True``; else a [B, 0] placeholder.
    """

    hard: jax.Array
    iterations: jax.Array
    success: jax.Array
    soft: jax.Array


def _roll_each(x: jax.Array, shifts: np.ndarray) -> jax.Array:
    """Roll x[s] by shifts[s] along axis 1 (the Z axis). Static unroll.

    Slots sharing a shift are rolled together (one concat per distinct
    shift) — for structured codes this collapses many slots.
    """
    shifts = np.asarray(shifts)
    z = x.shape[1]
    uniq = {}
    for s, sh in enumerate(shifts):
        uniq.setdefault(int(sh) % z, []).append(s)
    if len(uniq) == 1:
        ((sh, _),) = uniq.items()
        return jnp.roll(x, sh, axis=1) if sh else x
    parts = []
    order = []
    for sh, slots in uniq.items():
        grp = x[np.asarray(slots)]
        parts.append(jnp.roll(grp, sh, axis=1) if sh else grp)
        order.extend(slots)
    out = jnp.concatenate(parts, axis=0)
    inv = np.argsort(np.asarray(order))
    return out[inv]


def _check_node_update(v: jax.Array, valid: jax.Array, kind: str,
                       alpha, beta) -> jax.Array:
    """Extrinsic CN update over axis 1 (block-row degree axis).

    v: [Mb, D, Z, B] variable->check messages (check frame).
    Returns c2v messages of the same shape, zeroed on invalid slots.
    """
    big = jnp.asarray(jnp.finfo(v.dtype).max, v.dtype)
    absv = jnp.where(valid, jnp.abs(v), big)
    # sign of 0 is +1, matching ldpc.py:135-141 (`< 0` -> -1).
    sgn = jnp.where(v < 0, -1.0, 1.0).astype(v.dtype)
    sgn = jnp.where(valid, sgn, 1.0)
    sprod = jnp.prod(sgn, axis=1, keepdims=True)
    ext_sign = sprod * sgn  # product of all signs except own (sgn^2 == 1)

    if kind == "sum-product":
        # phi(x) = -log(tanh(x/2)); self-involution. Log-domain product rule.
        x = jnp.clip(jnp.where(valid, jnp.abs(v), 0.0), _PHI_MIN, _PHI_MAX)
        phi = -jnp.log(jnp.tanh(x * 0.5))
        phi = jnp.where(valid, phi, 0.0)
        total = jnp.sum(phi, axis=1, keepdims=True)
        rest = jnp.clip(total - phi, _PHI_MIN, _PHI_MAX)
        mag = -jnp.log(jnp.tanh(rest * 0.5))
    else:
        m1 = jnp.min(absv, axis=1, keepdims=True)
        am = jnp.argmin(absv, axis=1)  # first occurrence, [Mb, Z, B]
        d_iota = jax.lax.broadcasted_iota(jnp.int32, absv.shape, 1)
        is_am = d_iota == am[:, None]
        m2 = jnp.min(jnp.where(is_am, big, absv), axis=1, keepdims=True)
        mag = jnp.where(is_am, m2, m1)
        if kind == "normalized-min-sum":
            mag = mag * jnp.asarray(alpha, v.dtype)
        elif kind == "offset-min-sum":
            mag = jnp.maximum(mag - jnp.asarray(beta, v.dtype), 0.0)
        elif kind != "min-sum":
            raise ValueError(f"unknown decoder kind: {kind}")

    out = ext_sign * mag
    return jnp.where(valid, out, 0.0)


# DecodePlan holds ndarrays (unhashable), so the build cache is keyed on the
# plan's structural bytes (plan.cache_key()); LRU-bounded so a long RL
# search mutating codes across shape families cannot leak executables.
from ..utils.cache import BoundedCache

_BUILD_CACHE: dict = BoundedCache(64)


def _build(plan: DecodePlan, max_iters: int, kind: str, alpha, beta,
           dtype_name: str, keep_soft: bool) -> Callable:
    key = (plan.cache_key(), max_iters, kind, alpha, beta, dtype_name,
           keep_soft)
    hit = _BUILD_CACHE.get(key)
    if hit is not None:
        return hit
    dtype = jnp.dtype(dtype_name)
    mb_n, nb_n, z = plan.block_rows, plan.block_cols, plan.z
    d_cn, d_vn = plan.dmax_cn, plan.dmax_vn
    s_n = plan.num_slots

    cn_nb = np.reshape(plan.cn_nb, (s_n,))
    cn_shift = np.reshape(plan.cn_shift, (s_n,))
    cn_valid = jnp.asarray(
        np.reshape(plan.cn_valid, (mb_n, d_cn, 1, 1)))
    vn_slot = np.reshape(plan.vn_slot, (nb_n * d_vn,))
    vn_shift = np.reshape(plan.vn_shift, (nb_n * d_vn,))
    vn_valid = jnp.asarray(
        np.reshape(plan.vn_valid, (nb_n, d_vn, 1, 1)))

    def decode_fn(llr: jax.Array) -> DecodeResult:
        if llr.ndim != 2 or llr.shape[1] != plan.n:
            raise ValueError(f"llr must be [B, {plan.n}], got {llr.shape}")
        b = llr.shape[0]
        # [B, n] -> [Nb, Z, B]: batch minor so VPU lanes span codewords.
        # Negated on entry: internally positive <=> bit 0 (standard BP
        # convention) so the sign-product rule is exact for any check
        # degree; see module docstring.
        channel = -jnp.transpose(
            llr.astype(dtype).reshape(b, nb_n, z), (1, 2, 0))

        def body(state):
            (it, totals, c2v, done, iters, hard_latch, soft_latch,
             final_hard, final_soft) = state
            # ---- check frame: gather + roll totals ----
            t_cn = _roll_each(totals[cn_nb], -cn_shift)       # [S, Z, B]
            # internal negative <=> external positive <=> bit 1
            hard_vn = totals < 0                               # [Nb, Z, B]
            hard_cn = (t_cn < 0).reshape(mb_n, d_cn, z, b)
            # ---- syndrome: parity of connected hard bits per check ----
            par = jnp.sum(
                jnp.where(cn_valid, hard_cn, False).astype(jnp.int32),
                axis=1) % 2                                    # [Mb, Z, B]
            ok = ~jnp.any(par.astype(bool), axis=(0, 1))       # [B]
            newly = ok & ~done
            iters = jnp.where(newly, it, iters)
            hard_latch = jnp.where(newly[None, None, :], hard_vn, hard_latch)
            # Latch the pre-update state too: the body at it == max_iters
            # performs one (discarded) extra message update after its check,
            # and non-converged words must report the state after exactly
            # max_iters updates (reference decoderMainLoop return,
            # ldpc.py:326-337).
            final_hard = hard_vn
            if keep_soft:
                soft_latch = jnp.where(newly[None, None, :], totals,
                                       soft_latch)
                final_soft = totals
            done = done | ok
            # ---- message update (flooding schedule) ----
            v2c = (t_cn - c2v).reshape(mb_n, d_cn, z, b)
            c2v_new = _check_node_update(v2c, cn_valid, kind, alpha, beta)
            c2v_new = c2v_new.reshape(s_n, z, b)
            # ---- variable frame: accumulate into totals ----
            vr = _roll_each(c2v_new[vn_slot], vn_shift)
            vr = vr.reshape(nb_n, d_vn, z, b)
            totals = channel + jnp.sum(
                jnp.where(vn_valid, vr, 0.0), axis=1)
            return (it + 1, totals, c2v_new, done, iters, hard_latch,
                    soft_latch, final_hard, final_soft)

        def cond(state):
            it, _, _, done = state[:4]
            return (it <= max_iters) & ~jnp.all(done)

        soft0 = (jnp.zeros((nb_n, z, b), dtype) if keep_soft
                 else jnp.zeros((0,), dtype))
        init = (
            jnp.int32(0),
            channel,
            jnp.zeros((s_n, z, b), dtype),
            jnp.zeros((b,), bool),
            jnp.full((b,), max_iters, jnp.int32),
            jnp.zeros((nb_n, z, b), bool),
            soft0,
            jnp.zeros((nb_n, z, b), bool),
            soft0,
        )
        (_, _, _, done, iters, hard_latch, soft_latch, final_hard,
         final_soft) = jax.lax.while_loop(cond, body, init)

        # Non-converged words report the state after exactly max_iters
        # updates (reference decoderMainLoop's last softVector/binaryVector).
        hard = jnp.where(done[None, None, :], hard_latch, final_hard)
        hard_bn = jnp.transpose(hard, (2, 0, 1)).reshape(b, plan.n)
        if keep_soft:
            soft = jnp.where(done[None, None, :], soft_latch, final_soft)
            # negate back to the external (reference) sign convention
            soft_bn = -jnp.transpose(soft, (2, 0, 1)).reshape(b, plan.n)
        else:
            soft_bn = jnp.zeros((b, 0), dtype)
        return DecodeResult(hard=hard_bn.astype(jnp.int8),
                            iterations=iters, success=done, soft=soft_bn)

    built = jax.jit(decode_fn)
    _BUILD_CACHE[key] = built
    return built


def make_decoder(plan: DecodePlan, max_iters: int = 50, *,
                 kind: str = "min-sum", alpha: float = 0.75,
                 beta: float = 0.15, dtype=jnp.float32,
                 keep_soft: bool = False) -> Callable[[jax.Array], DecodeResult]:
    """Build (and cache) a jitted batched decoder for a decode plan.

    Args:
      plan: static code structure (``DecodePlan.from_code``).
      max_iters: flooding iterations cap (reference default 50).
      kind: 'min-sum' (reference rule), 'normalized-min-sum',
        'offset-min-sum', or 'sum-product'.
      alpha/beta: scaling/offset for the normalized/offset variants.
      dtype: message dtype (float32 default; bfloat16 for throughput).
      keep_soft: also return soft values (tests/analysis; costs memory).

    Returns: ``decode_fn(llr[B, n]) -> DecodeResult``, jit-compiled per
    (plan, batch shape).
    """
    a = float(alpha) if kind == "normalized-min-sum" else None
    b = float(beta) if kind == "offset-min-sum" else None
    return _build(plan, int(max_iters), kind, a, b,
                  jnp.dtype(dtype).name, bool(keep_soft))


@functools.lru_cache(maxsize=64)
def _plan_for_code(code: QCCode) -> DecodePlan:
    return DecodePlan.from_code(code)


def decoder_for_code(code: QCCode, max_iters: int = 50, **kw):
    """Convenience: QCCode -> jitted decoder (plan built & memoised)."""
    return make_decoder(_plan_for_code(code), max_iters, **kw)


def decode(code: QCCode, llr, max_iters: int = 50, **kw) -> DecodeResult:
    """One-shot decode of a [B, n] batch with a given code."""
    return decoder_for_code(code, max_iters, **kw)(jnp.asarray(llr))
