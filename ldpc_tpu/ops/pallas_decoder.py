"""Fused Pallas TPU kernel: whole min-sum decode in VMEM.

Why: the XLA-composed decoder (``ops/decoder.py``) streams the [S, Z, B]
message tensor through HBM several times per iteration (~6 passes x 50
iterations).  This kernel holds ALL decoder state in VMEM for a tile of
codewords and loops on-chip, so HBM traffic collapses to: channel LLRs in,
(error counts, iteration counts, success flags) out.  That is the
speed-of-light memory profile for this workload.

Structure per grid program (one batch tile TB, lane axis):
  * the QC slot tables (block col, shift per block edge) are scalar-
    prefetched into SMEM; the per-iteration work is ``fori_loop``s over
    slots with *dynamic* circulant rotations (``tpu.dynamic_rotate``) and
    dynamic VMEM indexing — a fully unrolled variant exceeds the Mosaic
    compiler's capacity for near-earth (64 slots x [511, 128] vregs).
  * scratch ``c2v`` [S, Z, TB]: check->variable messages for every block
    edge.  Phase A overwrites it in place with variable->check values,
    phase B with the new outgoing messages — one buffer serves both
    directions.
  * phase A per block row: align totals into check frame, stash v2c,
    accumulate the syndrome parity of the pre-update hard decisions.
  * phase B per block row: one pass over the stashed v2c recovers the
    running (min1, min2, argmin, sign-product) — the streaming form of the
    reference two-min rule (ldpc.py:174-202) — and a second pass emits the
    extrinsic messages and accumulates variable totals (reset from the
    channel).
  * convergence: per-word done/iterations/error latches exactly like the
    XLA decoder (first-success latch; non-converged words report the state
    after max_iters updates); the update is predicated off once the whole
    tile converged.

Sign conventions follow ``ops/decoder.py`` (inputs negated on entry so the
sign-product rule is exact for odd-degree checks).  Storage dtype for the
big state arrays is configurable (bfloat16 default — near-earth state only
fits the ~16 MB VMEM of a v5e that way); arithmetic runs in float32.

The kernel returns per-word (bit errors vs the all-zero codeword,
iterations, success) — the quantities the Monte-Carlo sweep needs.  Use the
XLA decoder when full hard/soft outputs are required.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.qc import QCCode
from .plan import DecodePlan

__all__ = ["make_pallas_sweep_decoder", "pallas_decode_counts"]


def _build_kernel(plan: DecodePlan, max_iters: int, tile_b: int,
                  msg_dtype, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    z = plan.z
    # All DMA'd shapes must be storage-tile aligned: the host pads Z up and
    # the kernel statically slices the real Z rows back out.
    z_pad = -(-z // 16) * 16
    mb_n, nb_n = plan.block_rows, plan.block_cols
    d_cn = plan.dmax_cn
    s_n = mb_n * d_cn
    f32 = jnp.float32

    # Per-slot tables, padded row-major [Mb * D].  Padding slots point at
    # block col 0 / shift 0 but are masked out of every reduction.
    nb_tab = np.zeros(s_n, np.int32)
    sh_fwd = np.zeros(s_n, np.int32)   # roll amount, variable-frame align
    sh_bwd = np.zeros(s_n, np.int32)   # (z - s) % z: check-frame align
    valid = np.zeros(s_n, np.int32)
    for mb in range(mb_n):
        for d in range(d_cn):
            k = mb * d_cn + d
            if plan.cn_valid[mb, d]:
                nb_tab[k] = plan.cn_nb[mb, d]
                s = int(plan.cn_shift[mb, d]) % z
                sh_fwd[k] = s
                sh_bwd[k] = (z - s) % z
                valid[k] = 1

    def kernel(nb_ref, shf_ref, shb_ref, val_ref, llr_hbm,
               errors_ref, iters_ref, success_ref,
               chan, c2v, totals, hard_latch, err_latch, done, iters,
               dma_sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(llr_hbm.at[i], chan, dma_sem)
        cp.start()
        cp.wait()
        for nb in range(nb_n):
            totals[nb] = -chan[nb, :z, :]
        c2v[...] = jnp.zeros((s_n, z, tile_b), msg_dtype)
        done[...] = jnp.zeros((1, tile_b), jnp.int32)
        iters[...] = jnp.full((1, tile_b), max_iters, jnp.int32)
        err_latch[...] = jnp.zeros((1, tile_b), jnp.int32)
        hard_latch[...] = jnp.zeros((1, tile_b), jnp.int32)

        def body(it, _):
            all_done = jnp.sum(done[0, :]) == tile_b

            @pl.when(jnp.logical_not(all_done))
            def _():
                # ---- Phase A: check-frame align, stash v2c, syndrome ----
                bad = jnp.zeros((1, tile_b), jnp.int32)
                for mb in range(mb_n):
                    def a_body(d, par, mb=mb):
                        k = mb * d_cn + d
                        nb = nb_ref[k]
                        t = pltpu.roll(totals[nb].astype(f32), shb_ref[k],
                                       axis=0)
                        v = t - c2v[k].astype(f32)
                        c2v[k] = v.astype(msg_dtype)
                        live = val_ref[k] > 0
                        flip = jnp.logical_and(live, t < 0)
                        return par ^ flip.astype(jnp.int32)

                    par = jax.lax.fori_loop(
                        0, d_cn, a_body,
                        jnp.zeros((z, tile_b), jnp.int32))
                    bad = bad | jnp.sum(par, axis=0,
                                        keepdims=True).astype(jnp.int32)
                ok = (bad == 0).astype(jnp.int32)
                newly = ok * (1 - done[...])
                iters[...] = jnp.where(newly == 1, it, iters[...])
                errs = jnp.zeros((1, tile_b), jnp.int32)
                for nb in range(nb_n):
                    errs = errs + jnp.sum(
                        (totals[nb].astype(f32) < 0).astype(jnp.int32),
                        axis=0, keepdims=True)
                err_latch[...] = jnp.where(newly == 1, errs, err_latch[...])
                hard_latch[...] = jnp.where(done[...] == 1, hard_latch[...],
                                            errs)
                done[...] = done[...] | ok

                # ---- Phase B: two-min from stashed v2c, emit, accumulate -
                for nb in range(nb_n):
                    totals[nb] = -chan[nb, :z, :]
                big = jnp.full((z, tile_b), f32(3.0e38))
                for mb in range(mb_n):
                    def stats_body(d, carry, mb=mb):
                        m1, m2, am, sp = carry
                        k = mb * d_cn + d
                        v = c2v[k].astype(f32)
                        live = val_ref[k] > 0
                        a = jnp.where(live, jnp.abs(v), f32(3.0e38))
                        newmin = a < m1
                        m2 = jnp.where(newmin, m1, jnp.minimum(m2, a))
                        am = jnp.where(newmin, d.astype(f32), am)
                        m1 = jnp.minimum(m1, a)
                        neg = jnp.logical_and(live, v < 0)
                        sp = jnp.where(neg, -sp, sp)
                        return m1, m2, am, sp

                    m1, m2, am, sp = jax.lax.fori_loop(
                        0, d_cn, stats_body,
                        (big, big, jnp.zeros((z, tile_b), f32),
                         jnp.ones((z, tile_b), f32)))

                    def out_body(d, carry, mb=mb):
                        m1, m2, am, sp = carry
                        k = mb * d_cn + d
                        nb = nb_ref[k]
                        v = c2v[k].astype(f32)
                        sgn = jnp.where(v < 0, -sp, sp)
                        mag = jnp.where(am == d.astype(f32), m2, m1)
                        out = sgn * mag
                        c2v[k] = out.astype(msg_dtype)
                        live = (val_ref[k] > 0).astype(f32)
                        totals[nb] = (
                            totals[nb].astype(f32) +
                            live * pltpu.roll(out, shf_ref[k], axis=0)
                        ).astype(msg_dtype)
                        return carry

                    jax.lax.fori_loop(0, d_cn, out_body, (m1, m2, am, sp))
            return 0

        jax.lax.fori_loop(0, max_iters + 1, body, 0)

        errors_ref[...] = jnp.where(done[...] == 1, err_latch[...],
                                    hard_latch[...])
        iters_ref[...] = iters[...]
        success_ref[...] = done[...]

    def call(llr_tiles: jax.Array):
        # llr_tiles: [nprog, Nb, Z_pad, TB]
        nprog = llr_tiles.shape[0]
        b = nprog * tile_b
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nprog,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=[
                pl.BlockSpec((1, tile_b), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_b), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_b), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((nb_n, z_pad, tile_b), msg_dtype),   # chan
                pltpu.VMEM((s_n, z, tile_b), msg_dtype),        # c2v
                pltpu.VMEM((nb_n, z, tile_b), msg_dtype),       # totals
                pltpu.VMEM((1, tile_b), jnp.int32),             # hard_latch
                pltpu.VMEM((1, tile_b), jnp.int32),             # err_latch
                pltpu.VMEM((1, tile_b), jnp.int32),             # done
                pltpu.VMEM((1, tile_b), jnp.int32),             # iters
                pltpu.SemaphoreType.DMA(()),                    # dma_sem
            ],
        )
        out_shape = [
            jax.ShapeDtypeStruct((1, b), jnp.int32),  # errors
            jax.ShapeDtypeStruct((1, b), jnp.int32),  # iterations
            jax.ShapeDtypeStruct((1, b), jnp.int32),  # success
        ]
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray(nb_tab), jnp.asarray(sh_fwd), jnp.asarray(sh_bwd),
          jnp.asarray(valid), llr_tiles)

    return call


_CACHE: dict = {}


def make_pallas_sweep_decoder(code: QCCode, max_iters: int = 50, *,
                              tile_b: int = 128, msg_dtype=jnp.bfloat16,
                              interpret: bool = False):
    """Build the fused sweep decoder for a code.

    Returns ``decode_counts(llr[B, n]) -> (errors[B], iterations[B],
    success[B])`` (jitted).  ``B`` must be a multiple of ``tile_b``
    (which must be a multiple of 128 on real hardware).
    """
    plan = DecodePlan.from_code(code)
    key = (plan.cache_key(), max_iters, tile_b, jnp.dtype(msg_dtype).name,
           interpret)
    if key in _CACHE:
        return _CACHE[key]
    kernel_call = _build_kernel(plan, max_iters, tile_b,
                                jnp.dtype(msg_dtype), interpret)
    nb_n, z = plan.block_cols, plan.z

    @jax.jit
    def decode_counts(llr):
        b = llr.shape[0]
        if b % tile_b:
            raise ValueError(f"batch {b} not a multiple of tile_b={tile_b}")
        z_pad = -(-z // 16) * 16
        llr_t = jnp.transpose(
            llr.astype(msg_dtype).reshape(b // tile_b, tile_b, nb_n, z),
            (0, 2, 3, 1))
        llr_t = jnp.pad(llr_t, ((0, 0), (0, 0), (0, z_pad - z), (0, 0)))
        errors, iters, success = kernel_call(llr_t)
        return errors[0], iters[0], success[0].astype(bool)

    _CACHE[key] = decode_counts
    return decode_counts


def pallas_decode_counts(code: QCCode, llr, max_iters: int = 50, **kw):
    """One-shot convenience wrapper."""
    return make_pallas_sweep_decoder(code, max_iters, **kw)(jnp.asarray(llr))
