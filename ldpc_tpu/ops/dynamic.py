"""Structure-generic decoder: QC shift tables as *runtime* device arrays.

Why this exists (TPU-first design)
----------------------------------
The RL code search mutates the parity structure every environment step
(``LdpcEnv.replaceCirculant``, ldpc_env.py:293-317).  The reference pays a
CUDA-kernel recompile per evaluation call, serialized under a process-wide
compiler lock (``ldpcCUDA.py:21-24,112``).  A static-shift XLA decoder
(``ops/decoder.py``) would similarly recompile per mutated code — tens of
seconds per RL step on TPU.

Here the plan tables (block-col ids, circulant shifts, validity masks) are
*data*, not constants: one compiled program serves every code in a shape
family (Mb, Nb, Z, padded degree caps).  Circulant alignment becomes a
gather along the Z axis with runtime index vectors instead of static rolls.
The update rule is identical to ``ops/decoder.py`` (same min-sum family,
same convention fix, same per-word convergence latching).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.qc import QCCode
from .decoder import DecodeResult, _check_node_update
from .plan import DecodePlan

__all__ = ["DynamicPlan", "make_dynamic_decoder", "dynamic_plan",
           "make_multi_dynamic_decoder", "stack_plans"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DynamicPlan:
    """Device-array decode plan (pytree).  Shapes:

    cn_nb/cn_shift/cn_valid: [Mb, D]   (D = padded block-row degree cap)
    vn_slot/vn_shift/vn_valid: [Nb, DV] (slot indexes into flattened Mb*D)
    """

    cn_nb: jax.Array
    cn_shift: jax.Array
    cn_valid: jax.Array
    vn_slot: jax.Array
    vn_shift: jax.Array
    vn_valid: jax.Array

    @property
    def shape_key(self):
        mb, d = self.cn_nb.shape
        nb, dv = self.vn_slot.shape
        return (mb, nb, d, dv)


def dynamic_plan(code: QCCode, dmax_cn: int | None = None,
                 dmax_vn: int | None = None) -> DynamicPlan:
    """Build a DynamicPlan, optionally padded to fixed degree caps.

    Fixed caps let one compiled decoder serve every mutated variant of a
    code as long as its degrees stay under the caps (the env rejects
    actions exceeding them).
    """
    base = DecodePlan.from_code(code)
    d = dmax_cn if dmax_cn is not None else base.dmax_cn
    dv = dmax_vn if dmax_vn is not None else base.dmax_vn
    if base.dmax_cn > d or base.dmax_vn > dv:
        raise ValueError(
            f"code degrees ({base.dmax_cn}, {base.dmax_vn}) exceed caps "
            f"({d}, {dv})")
    mb, nb = base.block_rows, base.block_cols

    def pad(a, shape, fill=0):
        out = np.full(shape, fill, a.dtype)
        out[:a.shape[0], :a.shape[1]] = a
        return out

    # vn_slot indexes the flattened [Mb * D] slot axis; re-index for the
    # padded D.
    vslot = base.vn_slot.copy()
    rows, cols = np.divmod(vslot, base.dmax_cn)
    vslot = rows * d + cols
    return DynamicPlan(
        cn_nb=jnp.asarray(pad(base.cn_nb, (mb, d))),
        cn_shift=jnp.asarray(pad(base.cn_shift, (mb, d))),
        cn_valid=jnp.asarray(pad(base.cn_valid, (mb, d), False)),
        vn_slot=jnp.asarray(pad(vslot, (nb, dv))),
        vn_shift=jnp.asarray(pad(base.vn_shift, (nb, dv))),
        vn_valid=jnp.asarray(pad(base.vn_valid, (nb, dv), False)),
    )


@functools.lru_cache(maxsize=32)
def _make_decode_fn(z: int, block_rows: int, block_cols: int,
                    dmax_cn: int, dmax_vn: int, max_iters: int = 50,
                    *, kind: str = "min-sum", alpha: float = 0.75,
                    beta: float = 0.15, dtype_name: str = "float32",
                    keep_soft: bool = False):
    """Untraced ``decode(plan, llr[B, n]) -> DecodeResult`` for one shape
    family (jitted/vmapped by the public constructors below)."""
    dtype = jnp.dtype(dtype_name)
    mb_n, nb_n, d_cn, d_vn = block_rows, block_cols, dmax_cn, dmax_vn
    s_n = mb_n * d_cn
    n = nb_n * z
    a = float(alpha) if kind == "normalized-min-sum" else None
    bta = float(beta) if kind == "offset-min-sum" else None

    def decode_fn(plan: DynamicPlan, llr: jax.Array) -> DecodeResult:
        b = llr.shape[0]
        channel = -jnp.transpose(
            llr.astype(dtype).reshape(b, nb_n, z), (1, 2, 0))

        cn_nb = plan.cn_nb.reshape(s_n)
        cn_shift = plan.cn_shift.reshape(s_n)
        cn_valid = plan.cn_valid.reshape(mb_n, d_cn, 1, 1)
        vn_slot = plan.vn_slot.reshape(nb_n * d_vn)
        vn_shift = plan.vn_shift.reshape(nb_n * d_vn)
        vn_valid = plan.vn_valid.reshape(nb_n, d_vn, 1, 1)

        jz = jax.lax.broadcasted_iota(jnp.int32, (1, z), 1)
        # t_cn[s, i] = totals[cn_nb[s], (i + shift_s) % z]
        cn_idx = (jz + cn_shift[:, None]) % z            # [S, Z]
        # vn_aligned[e, j] = c2v[vn_slot[e], (j - shift_e) % z]
        vn_idx = (jz - vn_shift[:, None]) % z            # [Nb*DV, Z]

        def body(state):
            (it, totals, c2v, done, iters, hard_latch, soft_latch,
             final_hard, final_soft) = state
            t_cn = jnp.take_along_axis(
                totals[cn_nb], cn_idx[:, :, None], axis=1)   # [S, Z, B]
            hard_vn = totals < 0
            hard_cn = (t_cn < 0).reshape(mb_n, d_cn, z, b)
            par = jnp.sum(
                jnp.where(cn_valid, hard_cn, False).astype(jnp.int32),
                axis=1) % 2
            ok = ~jnp.any(par.astype(bool), axis=(0, 1))
            newly = ok & ~done
            iters = jnp.where(newly, it, iters)
            hard_latch = jnp.where(newly[None, None, :], hard_vn, hard_latch)
            final_hard = hard_vn
            if keep_soft:
                soft_latch = jnp.where(newly[None, None, :], totals,
                                       soft_latch)
                final_soft = totals
            done = done | ok

            v2c = (t_cn - c2v).reshape(mb_n, d_cn, z, b)
            c2v_new = _check_node_update(v2c, cn_valid, kind, a, bta)
            c2v_new = c2v_new.reshape(s_n, z, b)
            vr = jnp.take_along_axis(
                c2v_new[vn_slot], vn_idx[:, :, None], axis=1)
            vr = vr.reshape(nb_n, d_vn, z, b)
            totals = channel + jnp.sum(jnp.where(vn_valid, vr, 0.0), axis=1)
            return (it + 1, totals, c2v_new, done, iters, hard_latch,
                    soft_latch, final_hard, final_soft)

        def cond(state):
            it, _, _, done = state[:4]
            return (it <= max_iters) & ~jnp.all(done)

        soft0 = (jnp.zeros((nb_n, z, b), dtype) if keep_soft
                 else jnp.zeros((0,), dtype))
        init = (jnp.int32(0), channel, jnp.zeros((s_n, z, b), dtype),
                jnp.zeros((b,), bool), jnp.full((b,), max_iters, jnp.int32),
                jnp.zeros((nb_n, z, b), bool), soft0,
                jnp.zeros((nb_n, z, b), bool), soft0)
        (_, _, _, done, iters, hard_latch, soft_latch, final_hard,
         final_soft) = jax.lax.while_loop(cond, body, init)

        hard = jnp.where(done[None, None, :], hard_latch, final_hard)
        hard_bn = jnp.transpose(hard, (2, 0, 1)).reshape(b, n)
        if keep_soft:
            soft = jnp.where(done[None, None, :], soft_latch, final_soft)
            soft_bn = -jnp.transpose(soft, (2, 0, 1)).reshape(b, n)
        else:
            soft_bn = jnp.zeros((b, 0), dtype)
        return DecodeResult(hard=hard_bn.astype(jnp.int8), iterations=iters,
                            success=done, soft=soft_bn)

    return decode_fn


@functools.lru_cache(maxsize=32)
def make_dynamic_decoder(z: int, block_rows: int, block_cols: int,
                         dmax_cn: int, dmax_vn: int, max_iters: int = 50,
                         *, kind: str = "min-sum", alpha: float = 0.75,
                         beta: float = 0.15, dtype_name: str = "float32",
                         keep_soft: bool = False):
    """Jitted ``decode(plan: DynamicPlan, llr[B, n]) -> DecodeResult``.

    Compiled once per (shape family, batch size); the plan is a runtime
    argument, so mutated codes decode with zero recompilation.
    """
    return jax.jit(_make_decode_fn(
        z, block_rows, block_cols, dmax_cn, dmax_vn, max_iters,
        kind=kind, alpha=alpha, beta=beta, dtype_name=dtype_name,
        keep_soft=keep_soft))


def stack_plans(plans) -> DynamicPlan:
    """Stack N same-shape-family plans into one [N, ...] pytree."""
    keys = {p.shape_key for p in plans}
    if len(keys) != 1:
        raise ValueError(f"plans span several shape families: {keys}")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *plans)


@functools.lru_cache(maxsize=32)
def make_multi_dynamic_decoder(z: int, block_rows: int, block_cols: int,
                               dmax_cn: int, dmax_vn: int,
                               max_iters: int = 50, *,
                               kind: str = "min-sum", alpha: float = 0.75,
                               beta: float = 0.15,
                               dtype_name: str = "float32",
                               keep_soft: bool = False):
    """Jitted ``decode(plans: DynamicPlan[N, ...], llr[N, B, n])``.

    One dispatch evaluates N mutated codes, each over its own [B]-word
    Monte-Carlo batch — the RL search's candidate axis becomes a tensor
    axis instead of a Python loop over env steps (the reference steps one
    candidate per process-pool submit, envContainer.py:38-56 ->
    ldpc_env.py:353-377).  Per-candidate results are identical to N
    separate :func:`make_dynamic_decoder` calls (same update rule; the
    batched ``while_loop`` runs until every candidate's words converge,
    and per-word latching makes extra trailing iterations invisible).
    """
    decode_fn = _make_decode_fn(
        z, block_rows, block_cols, dmax_cn, dmax_vn, max_iters,
        kind=kind, alpha=alpha, beta=beta, dtype_name=dtype_name,
        keep_soft=keep_soft)
    return jax.jit(jax.vmap(decode_fn))
