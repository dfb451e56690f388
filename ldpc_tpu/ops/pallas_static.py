"""Fully-unrolled Pallas TPU min-sum decoder with compressed check state.

This is the near-earth-capable successor of ``ops/pallas_decoder.py``'s
loop-based kernel.  Design notes (all empirically measured on the current
Mosaic toolchain; history in ROADMAP.md):

* ``tpu.dynamic_rotate`` does not lower for odd sublane counts (z=511) and
  hangs the compiler even for 512 — but **static** ``pltpu.roll`` on a
  power-of-two [512, 128] f32 tile compiles in seconds and runs at full
  VPU speed (~10 ns per rotation; earlier "slow rotate" readings were
  per-call dispatch overhead of the tunnelled backend).  QC circulant
  shifts are compile-time constants, so the decoder fully unrolls over
  block edges with static rotations.  The mod-z rotate on a z-padded-to-zp
  buffer is exact via two static rolls + an iota select (see ``_rot``).
* Rotates are 32-bit-only, so arithmetic is float32 throughout; VMEM
  footprint is cut by **compressed check-node state** instead: min-sum
  check->variable messages are fully determined by (min1, min2, argmin,
  sign-product, per-edge signs) per check — the classic hardware-LDPC
  compression, with per-edge signs bit-packed into int32 lanes per
  check (ceil(degree/32) words).  The loop-based kernel's [S, Z, B] per-edge
  message stash is never materialised.
* The Mosaic stack scheduler hoists all unrolled rotations (an extra
  ~12 MB live set).  That still fits: the default 16 MiB scoped-vmem
  budget is raised per-compile with ``xla_tpu_scoped_vmem_limit_kib``
  (a proto-backed XLA flag the TPU compiler honours) — physical VMEM
  comfortably covers the ~18-22 MB schedules this kernel gets.

Per grid program (one tile of ``tile_b`` codewords, lane axis):
  phase A (per block row, check frame): rotate totals into check frame,
    accumulate syndrome parity, reconstruct the previous c2v from the
    compressed state, form v2c = t - c2v, and fold it into fresh
    (min1, min2, argmin, signs) SSA registers; the state planes are
    rewritten only after every old-state read (no double buffer).
  phase B (per block col, variable frame): reconstruct the new outgoing
    messages straight from the compressed state — magnitude is min1 (or
    min2 at the argmin edge), sign is sign_product * edge_sign — rotate
    each into variable frame and accumulate totals = -channel + sum.
  convergence: the output refs' latches (success = done flags, iters =
    first-success iteration, errors = bit errors at first success or at
    the final pre-update state; ``where(done, keep, errs)`` covers both
    latch cases in one buffer).  Check runs BEFORE each update and
    non-converged words report the state after exactly ``max_iters``
    updates (reference ``decoderMainLoop``, ldpc.py:326-337).  The body
    is predicated off once the whole tile converged.

Sign conventions follow ``ops/decoder.py`` (inputs negated on entry so the
sign-product rule is exact for odd-degree checks; reference slicer
convention ldpc.py:43-48 outside).  Returns per-word (bit errors vs the
all-zero codeword, iterations, success) like the loop-based kernel.

Equivalence contract vs the XLA decoder (tests/test_pallas_static.py):
converged words match the XLA decoder exactly on (errors, iterations,
success); non-converged words may differ by a few bits because totals
accumulate in a different f32 order (the XLA path reduces the block-col
axis with ``jnp.sum``; the reference's CPU/CUDA paths differ from each
other the same way).  BER/FER statistics agree to Monte-Carlo precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.qc import QCCode
from .plan import DecodePlan

__all__ = ["make_static_sweep_decoder", "static_decode_counts"]

_BIG = 3.0e38
# Sum-product phi clamp, matching ops/decoder.py (_PHI_MIN/_PHI_MAX).
# phi(x) = -log(tanh(x/2)) is a self-involution; in f32 phi(38.0) is
# EXACTLY 0.0 (tanh(19) rounds to 1.0f), which the init exploits: seeding
# the per-check phi total at _PHI_MAX makes the first reconstructed
# check->variable message exactly zero, like the XLA decoder's zero-init.
_PHI_MIN = 1e-9
_PHI_MAX = 38.0
# Fixed-point scale for integer store dtypes (int8 message memory):
# stored = round(value * _QUANT_SCALE), saturating.  8 = Q4.3 (step 1/8,
# range +-15.875) — the classic hardware min-sum quantization.
_QUANT_SCALE = float(__import__("os").environ.get(
    "LDPC_TPU_PALLAS_QUANT_SCALE", 8.0))
# Scoped-VMEM ceiling handed to the TPU compiler (KiB).  The scheduler's
# rotation-hoisting schedules need ~18 MB (bf16 flooding) / ~20.3 MB
# (bf16 layered) > the 16 MiB default.  21 MiB admits those while
# rejecting the ~22 MB f32 schedules at COMPILE time — executing one of
# those at bench scale wedged the device (physical VMEM is evidently
# just above 22 MB on v5e).
_SCOPED_VMEM_KIB = 21 * 1024
# The kernel-level vmem_limit_bytes acts as the stack scheduler's
# HOISTING BUDGET (it hoists unrolled rotations until the budget is
# spent) while the XLA flag above is the hard check ceiling.  The budget
# is tunable independently for scheduling experiments; values below the
# live-set floor fail at compile time, which is safe (only over-ceiling
# EXECUTION wedges the device).
_SCHED_BUDGET_KIB = int(__import__("os").environ.get(
    "LDPC_TPU_PALLAS_VMEM_BUDGET_KIB", _SCOPED_VMEM_KIB))
# Rotation-hoist denial (scheduling experiment, ROADMAP "Open items" #1):
# the stack scheduler computes every unrolled rotation of a phase up
# front (~12 MB extra live set) and spills the fold state.  With
# dep_stride = k > 0 an ``optimization_barrier`` ties every k-th
# rotation input to the running fold/accumulator state, capping the
# in-flight rotation window at k planes while leaving values (and hence
# trajectories) bit-identical.  0 disables gating (production default
# until a measured win on hardware).
_DEP_STRIDE = int(__import__("os").environ.get(
    "LDPC_TPU_PALLAS_DEP_STRIDE", 0))
# Sign-product storage (ROADMAP "parked kernel micro-opt"): the per-check
# sign product is the popcount parity of the packed edge-sign bits, so the
# dedicated sp plane and its per-edge fold are redundant — popcount mode
# derives it with a 5-op xor-shift fold per row instead (bit-identical
# trajectories; drops one [Mb, zp, tile_b] VMEM plane + one select per
# edge in phase A).  Opt-in until measured on hardware.
_POPCOUNT_SIGN = bool(int(__import__("os").environ.get(
    "LDPC_TPU_PALLAS_POPCOUNT_SIGN", 0)))

# Whether ``jax.lax.optimization_barrier`` lowers inside a Mosaic TC
# kernel on the current toolchain.  Probed lazily with a [8, 128] kernel
# (seconds, vs minutes for the decoder) because jaxlib builds differ:
# when it does not lower (NotImplementedError at compile time), the
# dep_stride gate falls back to a ``dep * 0.0`` data edge — exact for
# the kernel's clipped-finite fold states (no inf/nan reaches a gate, so
# ``x + dep*0.0 == x`` bar sign-of-zero, which no downstream comparison
# observes) and not foldable by the compiler without fast-math.
_BARRIER_OK: bool | None = None


def _barrier_lowers() -> bool:
    global _BARRIER_OK
    if _BARRIER_OK is None:
        from jax.experimental import pallas as pl

        def probe(x_ref, o_ref):
            a = x_ref[...]
            b = jnp.abs(a)
            a, b = jax.lax.optimization_barrier((a, b))
            o_ref[...] = a + b

        x = np.linspace(-1.0, 1.0, 8 * 128,
                        dtype=np.float32).reshape(8, 128)
        try:
            got = jax.device_get(pl.pallas_call(
                probe,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(
                    jnp.asarray(x)))
            # value-exactness assertion (the old sched_ab preflight): a
            # barrier that lowers but corrupts values must NOT be chosen.
            _BARRIER_OK = bool(np.array_equal(got, x + np.abs(x)))
        except Exception as e:  # noqa: BLE001 — classified below
            msg = f"{type(e).__name__}: {e}"
            lowering = isinstance(e, NotImplementedError) or any(
                s in msg for s in ("lower", "Lower", "Mosaic", "mosaic",
                                   "not implemented", "Unsupported",
                                   "unsupported"))
            if lowering:
                _BARRIER_OK = False  # barrier doesn't lower: cache it
            else:
                # transient device/tunnel error — do NOT cache a verdict
                # (the mul-0 fallback is value-exact, so failing open for
                # THIS call is safe; the next call re-probes)
                import warnings
                warnings.warn(
                    "optimization_barrier probe failed with a non-lowering "
                    f"error ({msg[:200]}); using the mul-0 gate for this "
                    "call without caching the verdict")
                return False
    return _BARRIER_OK


def _build_kernel(plan: DecodePlan, max_iters: int, tile_b: int,
                  store_dtype, schedule: str, kind: str, alpha: float,
                  beta: float, interpret: bool, dep_stride: int = 0,
                  popcount_sign: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    z = plan.z
    zp = -(-z // 8) * 8          # f32 sublane tile = 8
    mb_n, nb_n = plan.block_rows, plan.block_cols
    f32, i32 = jnp.float32, jnp.int32
    sd = jnp.dtype(store_dtype)
    quant = jnp.issubdtype(sd, jnp.integer)

    gate_env = __import__("os").environ.get("LDPC_TPU_PALLAS_GATE", "auto")
    if dep_stride and (gate_env == "mul0" or (
            gate_env == "auto" and not interpret and not _barrier_lowers())):
        def _gate(val, dep):
            # mul-0 data edge (see _barrier_lowers): schedules `val`'s
            # consumers after `dep` exists, value-exact for finite dep.
            return val + dep * f32(0.0), dep
    else:
        def _gate(val, dep):
            return jax.lax.optimization_barrier((val, dep))

    if quant:
        # Fixed-point message memory (the 6-8 bit storage every hardware
        # LDPC decoder uses): quantize on STORE only — arithmetic stays
        # f32 (rotates are 32-bit anyway).  Q4.3 semantics for int8:
        # step 1/8, saturate at +-15.875.  The sign product (+-1)
        # round-trips the scale exactly; the argmin plane holds indices
        # 0..31 and is stored UNscaled (_st_raw).  min-sum's _BIG
        # saturates to the clip — standard saturating min-sum.
        # Scales are plain Python floats (a jnp scalar here would be
        # captured as a pallas_call constant); the clip is symmetric
        # (-q_hi, not iinfo.min) so int negation (the totals init) can
        # never hit the two's-complement wrap at -128.
        q_scale = float(_QUANT_SCALE)
        q_hi = float(np.iinfo(sd.type).max)
        q_lo = -q_hi

        def _st(x):
            return jnp.clip(jnp.round(x.astype(f32) * q_scale),
                            q_lo, q_hi).astype(sd)

        def _ld(x):
            return x.astype(f32) * (1.0 / q_scale)

        def _st_raw(x):           # small exact integers (argmin plane)
            return jnp.clip(jnp.round(x.astype(f32)),
                            q_lo, q_hi).astype(sd)

        def _ld_raw(x):
            return x.astype(f32)
    else:
        def _st(x):
            return x.astype(sd)

        def _ld(x):
            return x.astype(f32)

        _st_raw, _ld_raw = _st, _ld

    # Static edge tables (Python lists -> fully unrolled kernel code).
    # Row edges are grouped by block column so each totals plane pays its
    # load+convert once per (row, column) group instead of once per edge
    # (QC codes put several shifts in one block).  Reordering edges within
    # a row is exact: the two-min/sign/parity folds are order-independent
    # as set operations, and an argmin tie implies min1 == min2, so the
    # reconstruction cannot observe which edge won (ROADMAP.md, decoder
    # semantics notes).
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
    # Edge signs are bit-packed 32 per int32 plane; high-degree checks
    # (high-rate codes) simply use ceil(dmax/32) planes per block row.
    n_sw = -(-plan.dmax_cn // 32)
    # The argmin plane stores the slot index d as a number in the storage
    # dtype; it must round-trip exactly or reconstruction silently breaks.
    am_limit = {"int8": 127, "bfloat16": 256}.get(sd.name, 1 << 24)
    if plan.dmax_cn > am_limit:
        raise NotImplementedError(
            f"check degree {plan.dmax_cn} exceeds the exact integer range "
            f"of the {sd.name} argmin plane ({am_limit}); use a wider "
            f"store_dtype")
    # Sum-product keeps a per-block-edge phi stash (one [zp, tile_b]
    # plane per edge) instead of the two-min compressed state; edge_ix
    # maps (block row, slot) -> stash plane.
    sum_product = kind == "sum-product"
    edge_ix = {}
    for mb, edges in enumerate(row_edges):
        for (nb, s, d) in edges:
            edge_ix[(mb, d)] = len(edge_ix)
    n_edges = len(edge_ix)

    def kernel(llr_hbm, errors_hbm, iters_hbm, success_hbm, *refs):
        if sum_product:
            (chan, totals, s_ref, sp_ref, bits_ref, phi_ref,
             errors_ref, iters_ref, success_ref, dma_sem) = refs
            m1_ref = m2_ref = am_ref = None
        elif popcount_sign:
            (chan, totals, m1_ref, m2_ref, am_ref, bits_ref,
             errors_ref, iters_ref, success_ref, dma_sem) = refs
            sp_ref = s_ref = phi_ref = None
        else:
            (chan, totals, m1_ref, m2_ref, am_ref, sp_ref, bits_ref,
             errors_ref, iters_ref, success_ref, dma_sem) = refs
            s_ref = phi_ref = None
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(llr_hbm.at[i], chan, dma_sem)
        cp.start()
        cp.wait()
        i_row = jax.lax.broadcasted_iota(i32, (zp, tile_b), 0)
        row_lt_z = i_row < z

        def _rot(x, s):
            """roll_z(x, s)[i] = x[(i + s) mod z] on a [zp, tile_b] buffer.

            For zp == z a single static roll suffices.  For zp > z:
            pltpu.roll(x, zp - s)[i] = x[(i + s) mod zp] which is correct
            for i + s < z; for i in [z - s, z) the wanted row is
            x[i + s - z] = pltpu.roll(x, z - s)[i].  Both variants only
            ever read rows < z, so the pad rows never contaminate live
            lanes.
            """
            s = s % z
            if s == 0:
                return x
            if zp == z:
                return pltpu.roll(x, zp - s, axis=0)
            a = pltpu.roll(x, zp - s, axis=0)
            b = pltpu.roll(x, z - s, axis=0)
            return jnp.where(i_row < z - s, a, b)
        def _bits_read(mb):
            """The packed edge-sign planes of block row mb (n_sw words)."""
            return tuple(bits_ref[mb * n_sw + w] for w in range(n_sw))

        def _bits_write(mb, words):
            for w in range(n_sw):
                bits_ref[mb * n_sw + w] = words[w]

        def _bit_of(words, d):
            return (words[d // 32] >> (d % 32)) & 1

        for nb in range(nb_n):
            # negate in f32: Mosaic cannot legalize i8 vector subi, and
            # quantize(-dequantize(x)) == -x exactly (symmetric clip)
            totals[nb] = _st(-_ld(chan[nb]))
        for mb in range(mb_n):
            if sp_ref is not None:
                sp_ref[mb] = _st(jnp.ones((zp, tile_b), f32))
            _bits_write(mb, (jnp.zeros((zp, tile_b), i32),) * n_sw)
            if sum_product:
                # S = _PHI_MAX with phi stash 0 reconstructs c2v == 0.0
                # exactly on the first iteration (see _PHI_MAX note).
                s_ref[mb] = jnp.full((zp, tile_b), sd.type(_PHI_MAX))
            else:
                m1_ref[mb] = jnp.zeros((zp, tile_b), sd)  # recon c2v == 0
                m2_ref[mb] = jnp.zeros((zp, tile_b), sd)
                am_ref[mb] = jnp.zeros((zp, tile_b), sd)
        if sum_product:
            for e in range(n_edges):
                phi_ref[e] = jnp.zeros((zp, tile_b), sd)
        success_ref[...] = jnp.zeros((1, tile_b), i32)          # done
        iters_ref[...] = jnp.full((1, tile_b), max_iters, i32)
        errors_ref[...] = jnp.zeros((1, tile_b), i32)

        def _recon(stats, d):
            """c2v message of edge d from compressed stats
            (m1, m2, am, sp, bits).

            The min-sum variants act on the reconstruction only: the
            normalized rule scales the outgoing magnitude by alpha, the
            offset rule subtracts beta with a floor at zero
            (ops/decoder.py applies the same rules to its materialised
            messages) — the compressed state stays the raw two-min.
            """
            m1, m2, am, sp, bits = stats
            bit = _bit_of(bits, d)
            sgn = sp * (1.0 - 2.0 * bit.astype(f32))
            mag = jnp.where(am == f32(d), m2, m1)
            if kind == "normalized-min-sum":
                mag = mag * f32(alpha)
            elif kind == "offset-min-sum":
                mag = jnp.maximum(mag - f32(beta), 0.0)
            return sgn * mag

        def _sign_from_bits(bits):
            """Sign product (+-1) as popcount parity of the packed edge
            signs: one 5-op xor-shift fold per row replaces the stored sp
            plane and its per-edge fold.  Arithmetic right shifts are fine
            — only bits below each fold width survive to bit 0."""
            x = bits[0]
            for w in range(1, n_sw):
                x = x ^ bits[w]
            x = x ^ (x >> 16)
            x = x ^ (x >> 8)
            x = x ^ (x >> 4)
            x = x ^ (x >> 2)
            x = x ^ (x >> 1)
            return 1.0 - 2.0 * (x & 1).astype(f32)

        def _phi(x):
            """phi(x) = -log(tanh(x/2)) on a pre-clipped argument — the
            self-involutive log-domain transform of the sum-product CN
            rule (ops/decoder.py:132-139 semantics)."""
            return -jnp.log(jnp.tanh(x * 0.5))

        def _recon_sp(s_tot, sp, bits, phi_d, d):
            """c2v message of edge d from the phi total + its own phi."""
            bit = _bit_of(bits, d)
            sgn = sp * (1.0 - 2.0 * bit.astype(f32))
            rest = jnp.clip(s_tot - phi_d, f32(_PHI_MIN), f32(_PHI_MAX))
            return sgn * _phi(rest)

        def _row_pass_sp(mb):
            """Sum-product phase A for block row mb: syndrome parity +
            fresh (phi total, sign product, edge signs); the per-edge phi
            stash is rewritten in place (each plane is read for its own
            edge before being written, so no double buffer)."""
            s_old = _ld(s_ref[mb])
            sp_old = _ld(sp_ref[mb])
            bits_old = _bits_read(mb)
            par = jnp.zeros((zp, tile_b), i32)
            s_new = jnp.zeros((zp, tile_b), f32)
            spn = jnp.ones((zp, tile_b), f32)
            bitsn = [jnp.zeros((zp, tile_b), i32) for _ in range(n_sw)]
            last_nb, tot_nb = None, None
            for ei, (nb, s, d) in enumerate(row_edges[mb]):
                if nb != last_nb:
                    last_nb, tot_nb = nb, _ld(totals[nb])
                tin = tot_nb
                if dep_stride and ei and ei % dep_stride == 0:
                    tin, s_new = _gate(tot_nb, s_new)
                t = _rot(tin, s)
                par = par ^ jnp.where(t < 0, 1, 0)
                e = edge_ix[(mb, d)]
                v = t - _recon_sp(s_old, sp_old, bits_old,
                                  _ld(phi_ref[e]), d)
                ph = _phi(jnp.clip(jnp.abs(v), f32(_PHI_MIN),
                                   f32(_PHI_MAX)))
                phi_ref[e] = _st(ph)
                s_new = s_new + ph
                neg = v < 0
                w, r = divmod(d, 32)
                bitsn[w] = bitsn[w] | jnp.where(
                    neg, i32(np.int32(np.uint32(1 << r))), 0)
                spn = jnp.where(neg, -spn, spn)
            s_ref[mb] = _st(s_new)
            sp_ref[mb] = _st(spn)
            _bits_write(mb, bitsn)
            return par

        def _row_stats(mb, olds):
            """Scan block row mb: on-the-fly syndrome parity + fresh
            compressed stats from v2c = rot(totals) - recon(old).

            Edges are nb-grouped (see row_edges), so the totals plane of
            a block column is loaded/converted once per group."""
            par = jnp.zeros((zp, tile_b), i32)
            m1n = jnp.full((zp, tile_b), f32(_BIG))
            m2n = jnp.full((zp, tile_b), f32(_BIG))
            amn = jnp.zeros((zp, tile_b), f32)
            spn = jnp.ones((zp, tile_b), f32)
            bitsn = [jnp.zeros((zp, tile_b), i32) for _ in range(n_sw)]
            last_nb, tot_nb = None, None
            for ei, (nb, s, d) in enumerate(row_edges[mb]):
                if nb != last_nb:
                    last_nb, tot_nb = nb, _ld(totals[nb])
                tin = tot_nb
                if dep_stride and ei and ei % dep_stride == 0:
                    # Deny the rotation hoist: the rotation input may not
                    # be scheduled before the fold state of the previous
                    # edge group exists.  The gate is a value identity.
                    tin, m1n = _gate(tot_nb, m1n)
                t = _rot(tin, s)
                # pad rows (>= z) accumulate roll garbage; masked once at
                # the fold in flooding_body instead of per edge
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
                if not popcount_sign:
                    spn = jnp.where(neg, -spn, spn)
            bitsn = tuple(bitsn)
            if popcount_sign:
                spn = _sign_from_bits(bitsn)
            return par, (m1n, m2n, amn, spn, bitsn)

        def _read_stats(mb):
            bits = _bits_read(mb)
            sp = (_sign_from_bits(bits) if popcount_sign
                  else _ld(sp_ref[mb]))
            return (_ld(m1_ref[mb]), _ld(m2_ref[mb]), _ld_raw(am_ref[mb]),
                    sp, bits)

        def _write_stats(mb, stats):
            m1n, m2n, amn, spn, bitsn = stats
            m1_ref[mb] = _st(m1n)
            m2_ref[mb] = _st(m2n)
            am_ref[mb] = _st_raw(amn)   # a slot index, never scaled
            if not popcount_sign:
                sp_ref[mb] = _st(spn)
            _bits_write(mb, bitsn)

        def _latches(it, bad):
            """Check-BEFORE-update convergence latching (ldpc.py:326-337
            semantics: non-converged words report the final state).

            The error popcount folds all Nb sign planes into ONE plane
            and pays a single masked sublane reduction — reductions
            dominate this latch (a [zp, 1] fold is ~10x an elementwise
            op), so one reduce instead of Nb is the cheap formulation.
            """
            ok = jnp.where(bad == 0, 1, 0)
            newly = ok * (1 - success_ref[...])
            iters_ref[...] = jnp.where(newly == 1, it, iters_ref[...])
            neg = jnp.zeros((zp, tile_b), i32)
            for nb in range(nb_n):
                # NB the compare must be in f32: an i1 mask derived from a
                # bf16 plane has a 16-bit-packed layout Mosaic cannot
                # relayout into the select ("replicated in destination
                # but not in source")
                neg = neg + jnp.where(_ld(totals[nb]) < 0, 1, 0)
            errs = jnp.sum(jnp.where(row_lt_z, neg, 0),
                           axis=0, keepdims=True)
            errors_ref[...] = jnp.where(success_ref[...] == 1,
                                        errors_ref[...], errs)
            success_ref[...] = success_ref[...] | ok

        def flooding_body(it, _):
            all_done = jnp.sum(success_ref[0, :]) == tile_b

            @pl.when(jnp.logical_not(all_done))
            def _():
                # ---- phase A: syndrome + new compressed check state ----
                parsum = jnp.zeros((zp, tile_b), i32)
                for mb in range(mb_n):
                    if sum_product:
                        par = _row_pass_sp(mb)
                    else:
                        par, news = _row_stats(mb, _read_stats(mb))
                        _write_stats(mb, news)
                    parsum = parsum + par
                bad = jnp.sum(jnp.where(row_lt_z, parsum, 0),
                              axis=0, keepdims=True)
                _latches(it, bad)
                # ---- phase B: totals from compressed state ----
                # All rows' stats planes are loaded/converted ONCE before
                # the column loop (they are read-only in phase B) instead
                # of once per edge; accumulation order per column is
                # unchanged, so trajectories are bit-identical to the
                # per-edge-load formulation in every storage dtype.
                if sum_product:
                    all_sp = [(_ld(s_ref[mb]), _ld(sp_ref[mb]),
                               _bits_read(mb)) for mb in range(mb_n)]
                else:
                    all_stats = [_read_stats(mb) for mb in range(mb_n)]
                ei = 0
                for nb in range(nb_n):
                    tot = -_ld(chan[nb])
                    for (mb, d, s) in col_edges[nb]:
                        if sum_product:
                            s_tot, spv, bitsv = all_sp[mb]
                            phi_d = _ld(phi_ref[edge_ix[(mb, d)]])
                            if dep_stride and ei and ei % dep_stride == 0:
                                phi_d, tot = _gate(phi_d, tot)
                            msg = _recon_sp(s_tot, spv, bitsv, phi_d, d)
                        else:
                            st = all_stats[mb]
                            if dep_stride and ei and ei % dep_stride == 0:
                                # Same hoist denial for the recon+rotate
                                # chain: gate the stats plane on the
                                # accumulator of the previous edge group.
                                m1g, tot = _gate(st[0], tot)
                                st = (m1g,) + st[1:]
                            msg = _recon(st, d)
                        tot = tot + _rot(msg, (z - s) % z)
                        ei += 1
                    totals[nb] = _st(tot)
            return 0

        def layered_body(it, _):
            # Serial-C (layered) schedule: each block row's fresh messages
            # update the totals IMMEDIATELY (delta = new c2v - old c2v,
            # rotated to variable frame), so later rows see them within
            # the same sweep — ~2x fewer sweeps to converge than flooding
            # at equal or better BER (standard production-decoder
            # schedule; not a reference behaviour, hence opt-in).  The
            # convergence check stays exact: a dedicated syndrome pass
            # over the start-of-sweep totals.
            all_done = jnp.sum(success_ref[0, :]) == tile_b

            @pl.when(jnp.logical_not(all_done))
            def _():
                parsum = jnp.zeros((zp, tile_b), i32)
                for mb in range(mb_n):
                    par = jnp.zeros((zp, tile_b), i32)
                    last_nb, tot_nb = None, None
                    for (nb, s, d) in row_edges[mb]:
                        if nb != last_nb:
                            last_nb, tot_nb = nb, _ld(totals[nb])
                        par = par ^ jnp.where(_rot(tot_nb, s) < 0, 1, 0)
                    parsum = parsum + par
                bad = jnp.sum(jnp.where(row_lt_z, parsum, 0),
                              axis=0, keepdims=True)
                _latches(it, bad)
                for mb in range(mb_n):
                    olds = _read_stats(mb)
                    _, news = _row_stats(mb, olds)
                    _write_stats(mb, news)
                    for (nb, s, d) in row_edges[mb]:
                        delta = _recon(news, d) - _recon(olds, d)
                        totals[nb] = _st(
                            _ld(totals[nb]) + _rot(delta, (z - s) % z))
            return 0

        body = flooding_body if schedule == "flooding" else layered_body

        jax.lax.fori_loop(0, max_iters + 1, body, 0)

        for latch, hbm in ((errors_ref, errors_hbm), (iters_ref, iters_hbm),
                           (success_ref, success_hbm)):
            out_cp = pltpu.make_async_copy(
                latch, hbm.at[:, pl.ds(i * tile_b, tile_b)], dma_sem)
            out_cp.start()
            out_cp.wait()

    def call(llr_tiles: jax.Array):
        # llr_tiles: [nprog, Nb, zp, tile_b] in the storage dtype
        nprog = llr_tiles.shape[0]
        b = nprog * tile_b
        out_shape = [
            jax.ShapeDtypeStruct((1, b), i32),  # errors
            jax.ShapeDtypeStruct((1, b), i32),  # iterations
            jax.ShapeDtypeStruct((1, b), i32),  # success
        ]
        return pl.pallas_call(
            kernel,
            grid=(nprog,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=(
                [
                    pltpu.VMEM((nb_n, zp, tile_b), sd),    # chan
                    pltpu.VMEM((nb_n, zp, tile_b), sd),    # totals
                ] + ([
                    pltpu.VMEM((mb_n, zp, tile_b), sd),    # phi total S
                    pltpu.VMEM((mb_n, zp, tile_b), sd),    # sign product
                    pltpu.VMEM((mb_n * n_sw, zp, tile_b), i32),  # sign bits
                    pltpu.VMEM((n_edges, zp, tile_b), sd),  # phi stash
                ] if sum_product else [
                    pltpu.VMEM((mb_n, zp, tile_b), sd),    # m1
                    pltpu.VMEM((mb_n, zp, tile_b), sd),    # m2
                    pltpu.VMEM((mb_n, zp, tile_b), sd),    # argmin
                ] + ([] if popcount_sign else [
                    pltpu.VMEM((mb_n, zp, tile_b), sd),    # sign product
                ]) + [
                    pltpu.VMEM((mb_n * n_sw, zp, tile_b), i32),  # sign bits
                ]) + [
                    pltpu.VMEM((1, tile_b), i32),          # errors latch
                    pltpu.VMEM((1, tile_b), i32),          # iters latch
                    pltpu.VMEM((1, tile_b), i32),          # done latch
                    pltpu.SemaphoreType.DMA(()),
                ]
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_SCHED_BUDGET_KIB * 1024),
            interpret=interpret,
        )(llr_tiles)

    return call


from ..utils.cache import BoundedCache

# LRU-bounded: pallas executables are the heaviest artifacts in the
# process (minutes of compile, MBs of constants); a long search across
# shape families must not pin every stale one (advisor r3).
_CACHE: dict = BoundedCache(16)


def make_static_sweep_decoder(code: QCCode, max_iters: int = 50, *,
                              tile_b: int = 128, store_dtype=jnp.bfloat16,
                              schedule: str = "flooding",
                              kind: str = "min-sum", alpha: float = 0.75,
                              beta: float = 0.15,
                              interpret: bool = False,
                              jit: bool = True,
                              dep_stride: int | None = None,
                              popcount_sign: bool | None = None):
    """Build the unrolled fused sweep decoder for a code.

    Returns ``decode_counts(llr[B, n]) -> (errors[B], iterations[B],
    success[B])`` (jitted).  ``B`` must be a multiple of ``tile_b``
    (itself a multiple of 128).

    Arithmetic is float32 throughout (rotates are 32-bit-only in the
    current Mosaic); ``store_dtype`` controls the VMEM-resident state
    (channel/totals/compressed stats).  bfloat16 (default, ~18 MB scoped
    schedule) is the stable choice; float32 measures ~16% faster at small
    batches (per-access converts cost more than the bandwidth they save)
    but its ~22 MB schedule sits at the edge of physical VMEM — a large
    f32 staged run wedged the device outright, so f32 is opt-in.
    ``jnp.int8`` selects fixed-point message memory (quantize on store,
    Q4.3: step 1/8 saturating at +-15.875, scale via
    ``LDPC_TPU_PALLAS_QUANT_SCALE``) — the storage format of production
    hardware LDPC decoders; a distinct decoder variant (BER cost is
    measurable, not a bit-exact reference path) that also halves the
    bf16 live set.  Min-sum family only.

    ``schedule``: "flooding" reproduces the reference semantics
    (ldpc.py flooding BP); "layered" (serial-C) applies each block row's
    messages immediately — typically ~2x fewer sweeps to converge at
    equal or better BER (iterations then count sweeps).

    ``kind``: "min-sum" (reference rule), "normalized-min-sum" (magnitude
    scaled by ``alpha``), "offset-min-sum" (magnitude offset by ``beta``,
    floored at 0) or "sum-product" — same variants as the XLA decoder.
    Sum-product messages are not reconstructible from the two-min state,
    so that kind swaps the compressed stats for a per-block-edge phi
    stash (one [zp, tile_b] plane per edge; flooding schedule only) —
    still far below the dense per-edge message matrix, and VMEM-resident
    for every shipped code.  Sum-product needs true LLR inputs
    (``sim.channel.llr_from_channel``) and a tight enough store dtype
    costs BER: phi spans ~[1e-17, 21], so bf16 storage is usable but f32
    is the fidelity choice for small codes.

    ``jit=False`` returns the untraced function for embedding in a larger
    jitted program (``compiler_options`` may only sit on a top-level jit;
    such callers must set ``xla_tpu_scoped_vmem_limit_kib`` >=
    ``_SCOPED_VMEM_KIB`` themselves on TPU).

    ``dep_stride`` (default: ``LDPC_TPU_PALLAS_DEP_STRIDE`` env var, 0)
    gates every k-th unrolled rotation behind an ``optimization_barrier``
    on the fold/accumulator state, capping the scheduler's in-flight
    rotation window (values and trajectories are bit-identical; purely a
    VMEM-scheduling lever).

    ``popcount_sign`` (default: ``LDPC_TPU_PALLAS_POPCOUNT_SIGN`` env var,
    off) derives each check's sign product from the packed edge-sign bits
    by a 5-op xor-shift parity fold instead of storing it — drops one
    [Mb, zp, tile_b] VMEM plane and one select per edge in phase A;
    trajectories are bit-identical (min-sum family only; sum-product keeps
    its stored sign).
    """
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule: {schedule}")
    if kind not in ("min-sum", "normalized-min-sum", "offset-min-sum",
                    "sum-product"):
        raise ValueError(f"unsupported kernel kind: {kind}")
    if kind == "sum-product" and schedule != "flooding":
        raise ValueError("sum-product kernel supports flooding only")
    if kind == "sum-product" and jnp.issubdtype(jnp.dtype(store_dtype),
                                                jnp.integer):
        raise ValueError("integer message memory supports the min-sum "
                         "family only (phi spans ~[1e-17, 21]; Q4.3 "
                         "saturation would destroy it)")
    a = float(alpha) if kind == "normalized-min-sum" else 0.0
    b_off = float(beta) if kind == "offset-min-sum" else 0.0
    ds = _DEP_STRIDE if dep_stride is None else int(dep_stride)
    ps = (_POPCOUNT_SIGN if popcount_sign is None
          else bool(popcount_sign)) and kind != "sum-product"
    plan = DecodePlan.from_code(code)
    key = (plan.cache_key(), max_iters, tile_b,
           jnp.dtype(store_dtype).name, schedule, kind, a, b_off,
           interpret, jit, ds, ps,
           # gate choice is env-driven and per-process deterministic
           # ("auto" resolves via the one-shot _barrier_lowers probe)
           __import__("os").environ.get("LDPC_TPU_PALLAS_GATE", "auto")
           if ds else "")
    if key in _CACHE:
        return _CACHE[key]
    kernel_call = _build_kernel(plan, max_iters, tile_b, store_dtype,
                                schedule, kind, a, b_off, interpret,
                                dep_stride=ds, popcount_sign=ps)
    nb_n, z = plan.block_cols, plan.z
    zp = -(-z // 8) * 8
    sd = jnp.dtype(store_dtype)

    def decode_counts(llr):
        b = llr.shape[0]
        if b % tile_b:
            raise ValueError(f"batch {b} not a multiple of tile_b={tile_b}")
        # Sanitize non-finite LLRs at kernel entry (advisor r3): a user-
        # supplied +-inf (punctured/known bits) would otherwise reach the
        # dep_stride mul-0 gate as inf * 0.0 = NaN — and since the gate
        # choice is toolchain-dependent ("auto" probes the barrier), the
        # same config would be exact on one jaxlib and NaN-producing on
        # another.  NaN -> 0 (erasure), +-inf -> +-1e30: a magnitude
        # beyond any real channel LLR yet small enough that no fold or
        # totals accumulation (<= ~60 terms) can overflow f32.  Finite
        # inputs below 1e30 — every real channel — are untouched, so the
        # bit-exactness contracts vs the XLA engine are unaffected.
        llr = jnp.clip(jnp.nan_to_num(llr, nan=0.0, posinf=1e30,
                                      neginf=-1e30), -1e30, 1e30)
        if jnp.issubdtype(sd, jnp.integer):
            hi = float(np.iinfo(sd.type).max)
            llr = jnp.clip(jnp.round(llr.astype(jnp.float32) *
                                     _QUANT_SCALE), -hi, hi)
        llr_t = jnp.transpose(
            llr.astype(sd).reshape(b // tile_b, tile_b, nb_n, z),
            (0, 2, 3, 1))
        llr_t = jnp.pad(llr_t, ((0, 0), (0, 0), (0, zp - z), (0, 0)))
        errors, iters, success = kernel_call(llr_t)
        return errors[0], iters[0], success[0].astype(bool)

    if jit:
        opts = (None if interpret else
                {"xla_tpu_scoped_vmem_limit_kib": str(_SCOPED_VMEM_KIB)})
        decode_counts = jax.jit(decode_counts, compiler_options=opts)
    _CACHE[key] = decode_counts
    return decode_counts


def static_decode_counts(code: QCCode, llr, max_iters: int = 50, **kw):
    """One-shot convenience wrapper."""
    return make_static_sweep_decoder(code, max_iters, **kw)(jnp.asarray(llr))
