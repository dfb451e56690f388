"""Phase-split Pallas decoder: row/column passes as separate kernels.

Scheduling experiment (docs/kernel_roofline.md, round-3 section): the
monolithic kernel (`ops/pallas_static.py`) measures ~1.5-2x above its
elementwise bound because Mosaic's stack scheduler hoists the unrolled
rotation set (~12 MB) and spills the fold state around it — and every
in-kernel lever (dep_stride gating, popcount sign, tile_b, int8, VMEM
hoist budget) measured neutral-or-worse on chip.  This module tests the
one structural idea left: split phase A (check update + latching) and
phase B (totals) into two pallas_calls whose compressed state
round-trips HBM, with the iteration loop at XLA level
(``lax.while_loop``).  Each kernel's live set roughly halves, giving
the scheduler slack for its 64-rotation hoist; the price is
~10 MB/tile-iteration of HBM state traffic, which the Pallas grid
pipeline hides while per-tile compute exceeds per-tile DMA.

Word-exact to the monolithic flooding kernel at matched
(max_iters, store_dtype): same nb-grouped edge order (fold identities in
pallas_static.py notes), same check-BEFORE-update latching (reference
``ldpc.py:326-337`` semantics), same two-min compressed check state.
Min-sum flooding, float storage only (the headline configuration).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..codes.qc import QCCode
from .plan import DecodePlan
from .pallas_static import _BIG, _SCHED_BUDGET_KIB, _SCOPED_VMEM_KIB


def _build_kernels(plan: DecodePlan, tile_b: int, store_dtype,
                   interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    z = plan.z
    zp = -(-z // 8) * 8
    mb_n, nb_n = plan.block_rows, plan.block_cols
    f32, i32 = jnp.float32, jnp.int32
    sd = jnp.dtype(store_dtype)
    if jnp.issubdtype(sd, jnp.integer):
        raise NotImplementedError("pallas_split is float-storage only")

    # identical edge tables (and hence fold order) to the monolithic
    # kernel — required for word-exactness
    row_edges = [
        sorted(((int(plan.cn_nb[mb, d]), int(plan.cn_shift[mb, d]) % z, d)
                for d in range(plan.dmax_cn) if plan.cn_valid[mb, d]),
               key=lambda e: e[0])
        for mb in range(mb_n)
    ]
    col_edges: list[list[tuple[int, int, int]]] = [[] for _ in range(nb_n)]
    for mb, edges in enumerate(row_edges):
        for (nb, s, d) in edges:
            col_edges[nb].append((mb, d, s))
    n_sw = -(-plan.dmax_cn // 32)

    def _make_rot(i_row):
        def _rot(x, s):
            s = s % z
            if s == 0:
                return x
            if zp == z:
                return pltpu.roll(x, zp - s, axis=0)
            a = pltpu.roll(x, zp - s, axis=0)
            b = pltpu.roll(x, z - s, axis=0)
            return jnp.where(i_row < z - s, a, b)
        return _rot

    def _recon(stats, d):
        m1, m2, am, sp, bits = stats
        bit = (bits[d // 32] >> (d % 32)) & 1
        sgn = sp * (1.0 - 2.0 * bit.astype(f32))
        mag = jnp.where(am == f32(d), m2, m1)
        return sgn * mag

    # ---- kernel R: phase A (check update) + convergence latching ----
    def kernel_r(it_ref, totals, m1i, m2i, ami, spi, bitsi,
                 erri, iti, succi,
                 m1o, m2o, amo, spo, bitso, erro, ito, succo):
        i_row = jax.lax.broadcasted_iota(i32, (zp, tile_b), 0)
        row_lt_z = i_row < z
        _rot = _make_rot(i_row)
        all_done = jnp.sum(succi[...]) == tile_b

        @pl.when(jnp.logical_not(all_done))
        def _():
            parsum = jnp.zeros((zp, tile_b), i32)
            for mb in range(mb_n):
                olds = (m1i[mb].astype(f32), m2i[mb].astype(f32),
                        ami[mb].astype(f32), spi[mb].astype(f32),
                        tuple(bitsi[mb * n_sw + w] for w in range(n_sw)))
                par = jnp.zeros((zp, tile_b), i32)
                m1n = jnp.full((zp, tile_b), f32(_BIG))
                m2n = jnp.full((zp, tile_b), f32(_BIG))
                amn = jnp.zeros((zp, tile_b), f32)
                spn = jnp.ones((zp, tile_b), f32)
                bitsn = [jnp.zeros((zp, tile_b), i32) for _ in range(n_sw)]
                last_nb, tot_nb = None, None
                for (nb, s, d) in row_edges[mb]:
                    if nb != last_nb:
                        last_nb, tot_nb = nb, totals[nb].astype(f32)
                    t = _rot(tot_nb, s)
                    par = par ^ jnp.where(t < 0, 1, 0)
                    v = t - _recon(olds, d)
                    a = jnp.abs(v)
                    newmin = a < m1n
                    m2n = jnp.where(newmin, m1n, jnp.minimum(m2n, a))
                    amn = jnp.where(newmin, f32(d), amn)
                    m1n = jnp.minimum(m1n, a)
                    neg = v < 0
                    w, r = divmod(d, 32)
                    bitsn[w] = bitsn[w] | jnp.where(
                        neg, i32(np.int32(np.uint32(1 << r))), 0)
                    spn = jnp.where(neg, -spn, spn)
                parsum = parsum + par
                m1o[mb] = m1n.astype(sd)
                m2o[mb] = m2n.astype(sd)
                amo[mb] = amn.astype(sd)
                spo[mb] = spn.astype(sd)
                for w in range(n_sw):
                    bitso[mb * n_sw + w] = bitsn[w]
            bad = jnp.sum(jnp.where(row_lt_z, parsum, 0),
                          axis=0, keepdims=True)
            # check-BEFORE-update latching (pallas_static._latches)
            ok = jnp.where(bad == 0, 1, 0)
            newly = ok * (1 - succi[...])
            ito[...] = jnp.where(newly == 1, it_ref[0, 0], iti[...])
            neg = jnp.zeros((zp, tile_b), i32)
            for nb in range(nb_n):
                neg = neg + jnp.where(totals[nb].astype(f32) < 0, 1, 0)
            errs = jnp.sum(jnp.where(row_lt_z, neg, 0),
                           axis=0, keepdims=True)
            erro[...] = jnp.where(succi[...] == 1, erri[...], errs)
            succo[...] = succi[...] | ok

        @pl.when(all_done)
        def _():
            # converged tile: state is never read again — only the
            # latches must survive
            for mb in range(mb_n):
                m1o[mb] = m1i[mb]
                m2o[mb] = m2i[mb]
                amo[mb] = ami[mb]
                spo[mb] = spi[mb]
            for e in range(mb_n * n_sw):
                bitso[e] = bitsi[e]
            erro[...] = erri[...]
            ito[...] = iti[...]
            succo[...] = succi[...]

    # ---- kernel C: phase B (totals from compressed state) ----
    def kernel_c(totals_i, chan, m1i, m2i, ami, spi, bitsi, succi,
                 totals_o):
        i_row = jax.lax.broadcasted_iota(i32, (zp, tile_b), 0)
        _rot = _make_rot(i_row)
        all_done = jnp.sum(succi[...]) == tile_b

        @pl.when(jnp.logical_not(all_done))
        def _():
            all_stats = [
                (m1i[mb].astype(f32), m2i[mb].astype(f32),
                 ami[mb].astype(f32), spi[mb].astype(f32),
                 tuple(bitsi[mb * n_sw + w] for w in range(n_sw)))
                for mb in range(mb_n)]
            for nb in range(nb_n):
                tot = -chan[nb].astype(f32)
                for (mb, d, s) in col_edges[nb]:
                    tot = tot + _rot(_recon(all_stats[mb], d), (z - s) % z)
                totals_o[nb] = tot.astype(sd)

        @pl.when(all_done)
        def _():
            # converged tile: totals are never read again (kernel R
            # skips), but the aliased output block must still be written
            for nb in range(nb_n):
                totals_o[nb] = totals_i[nb]

    # ---- pallas_call wrappers (grid over codeword tiles) ----
    tot_spec = pl.BlockSpec((None, nb_n, zp, tile_b), lambda i: (i, 0, 0, 0))
    st_spec = pl.BlockSpec((None, mb_n, zp, tile_b), lambda i: (i, 0, 0, 0))
    bt_spec = pl.BlockSpec((None, mb_n * n_sw, zp, tile_b),
                           lambda i: (i, 0, 0, 0))
    lt_spec = pl.BlockSpec((None, 1, tile_b), lambda i: (i, 0, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=_SCHED_BUDGET_KIB * 1024)

    def shapes(nprog):
        st = jax.ShapeDtypeStruct((nprog, mb_n, zp, tile_b), sd)
        bt = jax.ShapeDtypeStruct((nprog, mb_n * n_sw, zp, tile_b), i32)
        lt = jax.ShapeDtypeStruct((nprog, 1, tile_b), i32)
        tot = jax.ShapeDtypeStruct((nprog, nb_n, zp, tile_b), sd)
        return st, bt, lt, tot

    def run_r(it, totals, m1, m2, am, sp, bits, err, itr, succ):
        nprog = totals.shape[0]
        st, bt, lt, _ = shapes(nprog)
        return pl.pallas_call(
            kernel_r,
            grid=(nprog,),
            in_specs=[smem_spec, tot_spec, st_spec, st_spec, st_spec,
                      st_spec, bt_spec, lt_spec, lt_spec, lt_spec],
            out_specs=[st_spec, st_spec, st_spec, st_spec, bt_spec,
                       lt_spec, lt_spec, lt_spec],
            out_shape=[st, st, st, st, bt, lt, lt, lt],
            # in-place state update: without donation XLA promotes the
            # big loop-carried outputs into scoped VMEM (117 MB stack,
            # compile-rejected); aliasing keeps them HBM-resident and
            # halves the state traffic
            input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3, 6: 4,
                                  7: 5, 8: 6, 9: 7},
            compiler_params=params,
            interpret=interpret,
        )(jnp.full((1, 1), it, i32), totals, m1, m2, am, sp, bits,
          err, itr, succ)

    def run_c(totals, chan, m1, m2, am, sp, bits, succ):
        nprog = chan.shape[0]
        _, _, _, tot = shapes(nprog)
        return pl.pallas_call(
            kernel_c,
            grid=(nprog,),
            in_specs=[tot_spec, tot_spec, st_spec, st_spec, st_spec,
                      st_spec, bt_spec, lt_spec],
            out_specs=tot_spec,
            out_shape=tot,
            input_output_aliases={0: 0},
            compiler_params=params,
            interpret=interpret,
        )(totals, chan, m1, m2, am, sp, bits, succ)

    return run_r, run_c, (zp, mb_n, nb_n, n_sw)


from ..utils.cache import BoundedCache

_CACHE: dict = BoundedCache(16)


def make_split_sweep_decoder(code: QCCode, max_iters: int = 50, *,
                             tile_b: int = 128,
                             store_dtype=jnp.bfloat16,
                             interpret: bool = False,
                             jit: bool = True):
    """Phase-split decoder with the same contract as
    ``make_static_sweep_decoder``: ``decode_counts(llr[B, n]) ->
    (errors[B], iterations[B], success[B])``, word-exact to the
    monolithic flooding min-sum kernel at matched config."""
    plan = DecodePlan.from_code(code)
    key = (plan.cache_key(), max_iters, tile_b,
           jnp.dtype(store_dtype).name, interpret, jit)
    if key in _CACHE:
        return _CACHE[key]
    run_r, run_c, (zp, mb_n, nb_n, n_sw) = _build_kernels(
        plan, tile_b, store_dtype, interpret)
    z = plan.z
    sd = jnp.dtype(store_dtype)
    f32, i32 = jnp.float32, jnp.int32

    def decode_counts(llr):
        b = llr.shape[0]
        if b % tile_b:
            raise ValueError(f"batch {b} not a multiple of tile_b={tile_b}")
        nprog = b // tile_b
        chan = jnp.transpose(
            llr.astype(sd).reshape(nprog, tile_b, nb_n, z), (0, 2, 3, 1))
        chan = jnp.pad(chan, ((0, 0), (0, 0), (0, zp - z), (0, 0)))
        totals = (-chan.astype(f32)).astype(sd)   # == _st(-_ld(chan))
        zeros_st = jnp.zeros((nprog, mb_n, zp, tile_b), sd)
        state = (jnp.asarray(0, i32), totals,
                 zeros_st, zeros_st, zeros_st,                # m1 m2 am
                 jnp.ones((nprog, mb_n, zp, tile_b), sd),     # sp
                 jnp.zeros((nprog, mb_n * n_sw, zp, tile_b), i32),
                 jnp.zeros((nprog, 1, tile_b), i32),          # errors
                 jnp.full((nprog, 1, tile_b), max_iters, i32),
                 jnp.zeros((nprog, 1, tile_b), i32))          # success

        def cond(c):
            it, *_, succ = c
            return jnp.logical_and(it < max_iters + 1,
                                   jnp.sum(succ) < b)

        def body(c):
            it, totals, m1, m2, am, sp, bits, err, itr, succ = c
            m1, m2, am, sp, bits, err, itr, succ = run_r(
                it, totals, m1, m2, am, sp, bits, err, itr, succ)
            totals = run_c(totals, chan, m1, m2, am, sp, bits, succ)
            return (it + 1, totals, m1, m2, am, sp, bits, err, itr, succ)

        (_, _, _, _, _, _, _, err, itr, succ) = jax.lax.while_loop(
            cond, body, state)
        return (err[:, 0, :].reshape(b), itr[:, 0, :].reshape(b),
                succ[:, 0, :].reshape(b).astype(bool))

    if jit:
        opts = (None if interpret else
                {"xla_tpu_scoped_vmem_limit_kib": str(_SCOPED_VMEM_KIB)})
        decode_counts = jax.jit(decode_counts, compiler_options=opts)
    _CACHE[key] = decode_counts
    return decode_counts
