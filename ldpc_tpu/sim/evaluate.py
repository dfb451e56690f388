"""Monte-Carlo BER/FER evaluation: batched SNR sweeps on TPU.

Reference equivalents: ``evaluateCode`` / ``evaluateCodeAtSingleTransmission``
(``ldpc.py:350-430``), ``evaluateCodeCuda``'s (SNR x transmission) loop
(``ldpcCUDA.py:576-664``) and the multi-device wrapper
(``evaluateCodeCudaWrapper``, ``ldpcCUDA.py:891-932``).

TPU-first design: the reference decodes ONE codeword per GPU invocation with
~11 kernel launches and a host sync per iteration; here each *step* decodes a
[B]-codeword batch inside one fused XLA loop, and a sweep is a handful of
steps.  Multi-chip scaling needs no process pools: the batch axis is sharded
over a ``jax.sharding.Mesh`` (data-parallel over ICI/DCN) and every chip
decodes its shard of codewords; per-word outputs come back as one sharded
array (the `psum`-style stat merge happens in `ldpc_tpu.parallel`).

Also provides the deterministic ``evaluate_epsilon_probe`` mirroring
``evaluateMatrixAndEpsilon`` (ldpcCUDA.py:677-828) — the reproducibility /
bit-exactness entry point.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.qc import QCCode
from ..ops.decoder import decoder_for_code
from .channel import (awgn, epsilon_probe, llr_from_channel, modulate,
                      slicer, snr_db_to_sigma)
from .stats import BerStatistics

__all__ = ["evaluate_code", "evaluate_epsilon_probe", "sweep_step",
           "random_codeword_sweep_step", "staged_decode_counts",
           "make_staged_decoder_device", "make_staged_sweep_device"]


def staged_decode_counts(code: QCCode, llr, max_iters: int = 50, *,
                         phase1_iters: int = 12, pad_to: int = 256,
                         kind: str = "min-sum", dtype=jnp.float32,
                         engine: str = "xla", **decoder_kw):
    """Two-phase decode with EXACTLY the semantics of a single
    ``max_iters`` decode, ~3x faster at operating SNRs.

    Phase 1 decodes the whole batch with a small iteration cap; the few
    words that fail are re-decoded from scratch with the full cap.  Because
    convergence is latched per word, a word converging within phase 1
    returns bit-identical results, and a failed word's phase-2 decode is
    the deterministic full-cap decode of the same LLRs — so the merged
    (errors, iterations, success) equal the single-pass outputs, while the
    batch no longer pays ``max_iters`` for every straggler (the reference
    CUDA decoder pays the full budget per word serially,
    ldpcCUDA.py:614-645).

    ``engine``: "xla" uses the fused while-loop decoder
    (``ops/decoder.py``); "pallas" uses the VMEM-resident unrolled kernel
    (``ops/pallas_static.py``, full kind family incl. sum-product, ~1-2
    orders of magnitude faster on TPU hardware; batches are padded to
    the 128-word tile).

    Returns (bit_errors[B], iterations[B], success[B]) as numpy arrays.
    """
    import numpy as np

    llr = jnp.asarray(llr)
    b = llr.shape[0]
    make = _engine_counts_fn
    c1 = make(code, phase1_iters, kind, jnp.dtype(dtype).name, engine,
              tuple(sorted(decoder_kw.items())))
    e1, it1, ok1 = jax.device_get(c1(llr))
    errors = e1.astype(np.int64)
    iters = it1.copy()
    success = ok1.copy()
    failed = np.flatnonzero(~success)
    if failed.size:
        c2 = make(code, max_iters, kind, jnp.dtype(dtype).name, engine,
                  tuple(sorted(decoder_kw.items())))
        if failed.size > 0.25 * b:
            # Below the waterfall most words miss phase 1; re-decoding the
            # whole batch beats gather/pad bookkeeping (and the phase-1
            # attempt is the only waste).
            e2, it2, ok2 = jax.device_get(c2(llr))
            redo = ~success
            errors[redo] = e2[redo]
            iters[redo] = it2[redo]
            success[redo] = ok2[redo]
        else:
            # Fixed-size chunks: exactly ONE phase-2 batch shape ever
            # compiles (variable padding would trigger a recompile per
            # new failure count).
            chunk = min(pad_to, b)
            for lo in range(0, failed.size, chunk):
                part = failed[lo:lo + chunk]
                idx = np.concatenate(
                    [part, np.zeros(chunk - part.size, np.int64)])
                e2, it2, ok2 = jax.device_get(
                    c2(jnp.take(llr, jnp.asarray(idx), axis=0)))
                errors[part] = e2[:part.size]
                iters[part] = it2[:part.size]
                success[part] = ok2[:part.size]
    return errors, iters, success


def make_staged_decoder_device(code: QCCode, max_iters: int = 50, *,
                               phase1_iters: int | Sequence[int] = 12,
                               redo_capacity=None,
                               kind: str = "min-sum", dtype=jnp.float32,
                               store_dtype=None, schedule: str = "flooding",
                               engine: str = "xla", **decoder_kw):
    """Single-dispatch staged decode: the whole multi-phase logic runs on
    device, so one host round trip covers a batch.

    ``staged_decode_counts`` does its phase-2 bookkeeping on host — fine
    when dispatch is cheap, but through a high-latency link (a tunnelled
    TPU, or any remote executor) each round trip costs more than the
    decode itself.  Here the failed-word gather, re-decode and scatter
    merge are jitted: ``lax.cond`` picks between re-decoding the gathered
    failures (capacity ``redo_capacity``, default B/4 rounded to the
    kernel tile) and re-decoding the entire batch (below-waterfall case
    where most words fail).  Results are identical to the host-staged and
    single-pass decoders (per-word convergence latching).

    ``phase1_iters`` may be a single int (the classic two-phase decode)
    or an ascending sequence, e.g. ``(6, 16)`` for a three-stage cascade
    6 -> 16 -> ``max_iters``: each stage re-decodes the survivors of the
    previous one from scratch with a bigger budget, so most words pay
    only a few iterations and only the hard tail pays ``max_iters``.
    Per-word latching makes every cascade exactly equivalent to the
    single-pass decode.  ``redo_capacity`` then accepts a matching
    sequence (one capacity per re-decode stage; each defaults to B/4).

    ``dtype`` is the XLA engine's compute dtype; ``store_dtype`` is the
    Pallas engine's VMEM storage dtype (default bfloat16) and
    ``schedule`` its message schedule — all phases share it, so a
    staged "layered" decode equals a single-pass layered decode by the
    same per-word latching argument (pallas engine only; see
    ``ops/pallas_static.py``).

    Returns a jitted ``fn(llr[B, n]) -> (errors, iterations, success)``.
    """
    core = _staged_core_builder(
        code, max_iters, phase1_iters=phase1_iters,
        redo_capacity=redo_capacity, kind=kind, dtype=dtype,
        store_dtype=store_dtype, schedule=schedule, engine=engine,
        **decoder_kw)
    cache: dict = {}

    def staged(llr):
        llr = jnp.asarray(llr)
        b = llr.shape[0]
        if b not in cache:
            cache[b] = jax.jit(
                core(b), compiler_options=_pallas_compiler_options(engine))
        return cache[b](llr)

    return staged


def make_staged_sweep_device(code: QCCode, max_iters: int = 50, *,
                             scale_llr: bool = False, **staged_kw):
    """Single-dispatch Monte-Carlo step: transmit + staged decode fused.

    Composes :func:`_transmit_fn`'s channel (all-zero codeword, BPSK +
    AWGN, reference default path ldpc.py:409-411) with the on-device
    staged cascade of :func:`make_staged_decoder_device` inside ONE jit,
    so a whole (transmit, decode, count) batch costs a single host
    dispatch — through a high-latency tunnelled backend the second
    dispatch and the [B, n] float32 LLR round trip through HBM are pure
    overhead.  Per-word decode results are identical to transmitting and
    staged-decoding separately with the same key (the channel math is the
    same traced code).

    Accepts every :func:`make_staged_decoder_device` keyword.  Returns a
    jitted ``fn(key, snr_db[B]) -> dict`` with the :func:`sweep_step`
    contract (errors_uncoded, errors_decoded, iterations, success, sigma,
    sigma_actual).
    """
    engine = staged_kw.get("engine", "xla")
    core = _staged_core_builder(code, max_iters, **staged_kw)
    transmit = _transmit_fn(code.n, scale_llr)
    cache: dict = {}

    def build(b):
        decode = core(b)

        def fn(key, snr_db):
            llr, sigma, sigma_actual, unc = transmit(key, snr_db)
            errors, iters, success = decode(llr)
            return {
                "errors_uncoded": unc,
                "errors_decoded": errors,
                "iterations": iters,
                "success": success,
                "sigma": sigma,
                "sigma_actual": sigma_actual,
            }

        return jax.jit(fn, compiler_options=_pallas_compiler_options(engine))

    def step(key, snr_db):
        snr_db = jnp.asarray(snr_db)
        b = snr_db.shape[0]
        if b not in cache:
            cache[b] = build(b)
        return cache[b](key, snr_db)

    return step


def _staged_core_builder(code: QCCode, max_iters: int, *,
                         phase1_iters: int | Sequence[int] = 12,
                         redo_capacity=None, kind: str = "min-sum",
                         dtype=jnp.float32, store_dtype=None,
                         schedule: str = "flooding", engine: str = "xla",
                         tile_b: int | None = None,
                         dep_stride: int | None = None,
                         popcount_sign: bool | None = None,
                         sort_words: bool = False, **decoder_kw):
    """Shared staged-cascade builder: returns ``core(b)`` producing the
    UNJITTED ``fn(llr[b, n]) -> (errors, iterations, success)`` (callers
    jit it, composing extra work into the same dispatch — see
    :func:`make_staged_decoder_device` / :func:`make_staged_sweep_device`
    for the semantics and parameter docs).  ``tile_b`` overrides the
    Pallas kernel's codeword tile (lane axis; scheduling lever).

    ``sort_words`` (straggler-aware tiling, VERDICT r3 #3): sort the
    batch by a cheap difficulty proxy — the uncoded error count — before
    decoding, and scatter the per-word outputs back afterwards.  A Pallas
    tile runs until ALL of its words converge, so one straggler charges
    its 127 converged lanemates full sweeps; difficulty-sorting groups
    easy words into tiles that exit early and makes stragglers share
    tiles.  Per-word outputs are permutation-invariant (lanes are
    independent in the kernel; the XLA decoder is per-word independent
    too), so results are BIT-IDENTICAL to the unsorted decode — purely a
    scheduling lever.  The cascade composes: the failed-word gather is a
    stable sort by success, so within the re-decode the difficulty order
    is preserved."""
    del decoder_kw  # engine fns take no extra kwargs today
    if schedule != "flooding" and engine != "pallas":
        raise ValueError("schedules other than flooding need the pallas "
                         "engine")
    if engine != "pallas" and (dep_stride is not None
                               or popcount_sign is not None):
        raise ValueError("dep_stride/popcount_sign are pallas-kernel "
                         "scheduling levers")
    phases = ([int(phase1_iters)] if isinstance(phase1_iters, int)
              else [int(p) for p in phase1_iters])
    if sorted(phases) != phases or (phases and phases[-1] >= max_iters):
        raise ValueError(f"phase iteration budgets must ascend below "
                         f"max_iters: {phases} vs {max_iters}")
    caps_in = (list(redo_capacity)
               if isinstance(redo_capacity, (list, tuple))
               else [redo_capacity] * len(phases))
    if len(caps_in) != len(phases):
        raise ValueError("redo_capacity sequence must have one entry per "
                         "re-decode stage")
    kw_key = tuple(
        kv for kv in (
            ("store_dtype", jnp.dtype(store_dtype).name)
            if store_dtype is not None else None,
            ("schedule", schedule) if schedule != "flooding" else None,
            ("tile_b", int(tile_b)) if tile_b is not None else None,
            # bit-identical kernel scheduling levers (None defers to the
            # kernel's env-var defaults, ops/pallas_static.py)
            ("dep_stride", int(dep_stride))
            if dep_stride is not None else None,
            ("popcount_sign", bool(popcount_sign))
            if popcount_sign is not None else None)
        if kv is not None)

    def build(b):
        def round_cap(c):
            c = c or max(1, b // 4)
            if engine == "pallas":
                t = int(tile_b) if tile_b else 128
                c = max(t, -(-c // t) * t)
            return min(c, b)

        caps = [round_cap(c) for c in caps_in]
        cfns = [_engine_counts_fn(code, it, kind, jnp.dtype(dtype).name,
                                  engine, kw_key, nested=True)
                for it in phases + [max_iters]]

        def fix_stage(cfn, cap, args):
            e1, it1, ok1, llr = args
            nfail = jnp.sum(~ok1)

            def few(args):
                e1, it1, ok1, llr = args
                # stable gather of failed rows (failures first); padding
                # entries gather row 0 but scatter to an out-of-range
                # index with mode="drop" — writing index 0 instead would
                # race the live write when word 0 itself failed (scatter
                # duplicate order is unspecified).
                order = jnp.argsort(ok1, stable=True)
                idx = order[:cap]
                live = jnp.arange(cap) < nfail
                gather_idx = jnp.where(live, idx, 0)
                scatter_idx = jnp.where(live, idx, e1.shape[0])
                e2, it2, ok2 = cfn(jnp.take(llr, gather_idx, axis=0))
                e = e1.at[scatter_idx].set(e2, mode="drop")
                it = it1.at[scatter_idx].set(it2, mode="drop")
                ok = ok1.at[scatter_idx].set(ok2, mode="drop")
                return e, it, ok

            def many(args):
                e1, it1, ok1, llr = args
                e2, it2, ok2 = cfn(llr)
                keep = ok1
                return (jnp.where(keep, e1, e2),
                        jnp.where(keep, it1, it2),
                        jnp.where(keep, ok1, ok2))

            return jax.lax.cond(nfail <= cap, few, many,
                                (e1, it1, ok1, llr))

        def fn(llr):
            if sort_words:
                # difficulty proxy: hard-decision error count vs the
                # all-zero word (one elementwise pass + row sum — noise
                # vs the decode's dozens of sweeps over the same bytes)
                unc = jnp.sum((llr > 0).astype(jnp.int32), axis=1)
                order = jnp.argsort(unc)
                inv = jnp.argsort(order)
                llr = jnp.take(llr, order, axis=0)
            out = cfns[0](llr)
            for cfn, cap in zip(cfns[1:], caps):
                out = fix_stage(cfn, cap, out + (llr,))
            if sort_words:
                out = tuple(jnp.take(x, inv, axis=0) for x in out)
            return out

        return fn

    return build


# Single capability probe shared by all engines (sim, parallel, bench).
from ..utils.device import on_tpu_hardware as _on_tpu_hardware  # noqa: E402


from ..utils.cache import BoundedCache  # noqa: E402

_COUNTS_CACHE: dict = BoundedCache(64)


def _counts_fn(code: QCCode, max_iters: int, kind: str, dtype_name: str,
               kw_key):
    """Jitted decode-to-counts: D2H ships only [B] vectors, never the
    [B, n] hard-decision tensor."""
    # QCCode is a frozen dataclass — structurally hashable, so two codes
    # with equal shift tables share one compiled decoder and a GC'd code
    # can never alias a new one (id() keys could).
    key = (code, max_iters, kind, dtype_name, kw_key)
    fn = _COUNTS_CACHE.get(key)
    if fn is None:
        dec = decoder_for_code(code, max_iters, kind=kind,
                               dtype=jnp.dtype(dtype_name),
                               **dict(kw_key))

        @jax.jit
        def fn(llr):
            res = dec(llr)
            return (jnp.sum(res.hard.astype(jnp.int32), axis=1),
                    res.iterations, res.success)

        _COUNTS_CACHE[key] = fn
    return fn


def _engine_counts_fn(code: QCCode, max_iters: int, kind: str,
                      dtype_name: str, engine: str, kw_key, *,
                      nested: bool = False):
    """Counts backend dispatch: the XLA while-loop decoder or the
    VMEM-resident Pallas kernel (same (errors, iters, success) contract).

    ``nested=True`` returns a function safe to embed in an enclosing jit
    (the pallas engine's compiler options must then sit on that top-level
    jit — see :func:`_pallas_compiler_options`).
    """
    if engine == "xla":
        return _counts_fn(code, max_iters, kind, dtype_name, kw_key)
    if engine != "pallas":
        raise ValueError(f"unknown decode engine: {engine}")
    if kind not in ("min-sum", "normalized-min-sum", "offset-min-sum",
                    "sum-product"):
        raise ValueError(f"unknown decoder kind for pallas engine: {kind}")
    # ``dtype`` is the XLA engine's compute dtype; the Pallas kernel
    # always computes in f32 and its VMEM storage dtype is a separate
    # knob (kw ``store_dtype``; default bfloat16 — f32 storage does not
    # fit the scoped-VMEM ceiling for large codes).
    kw = dict(kw_key)
    store = jnp.dtype(kw.pop("store_dtype", jnp.bfloat16))
    schedule = kw.pop("schedule", "flooding")
    alpha = float(kw.pop("alpha", 0.75))
    beta = float(kw.pop("beta", 0.15))
    tile_b = kw.pop("tile_b", None)
    # scheduling levers (None defers to the kernel's env-var defaults)
    dep_stride = kw.pop("dep_stride", None)
    popcount_sign = kw.pop("popcount_sign", None)
    if kw:
        raise ValueError(
            f"unsupported pallas engine options: {sorted(kw)}")
    key = ("pallas", code, max_iters, store.name, schedule,
           kind, alpha, beta, tile_b, dep_stride, popcount_sign, nested)
    fn = _COUNTS_CACHE.get(key)
    if fn is None:
        from ..ops.pallas_static import make_static_sweep_decoder
        interp = not _on_tpu_hardware()
        # tile_b is the kernel's lane (codeword) axis: a scheduling lever
        # on hardware (live set scales with it), a multiple of 128.
        tile = (int(tile_b) if tile_b else 4 if interp else 128)
        dec = make_static_sweep_decoder(code, max_iters, tile_b=tile,
                                        store_dtype=store,
                                        schedule=schedule, kind=kind,
                                        alpha=alpha, beta=beta,
                                        interpret=interp,
                                        dep_stride=dep_stride,
                                        popcount_sign=popcount_sign,
                                        jit=not nested)

        def fn(llr):
            b = llr.shape[0]
            pad = (-b) % tile
            if pad:
                llr = jnp.concatenate(
                    [llr, jnp.broadcast_to(llr[:1], (pad, llr.shape[1]))])
            e, it, ok = dec(llr)
            return e[:b], it[:b], ok[:b]

        _COUNTS_CACHE[key] = fn
    return fn


def _pallas_compiler_options(engine: str):
    """Top-level-jit compiler options required by the pallas engine."""
    if engine != "pallas" or not _on_tpu_hardware():
        return None
    from ..ops.pallas_static import _SCOPED_VMEM_KIB
    return {"xla_tpu_scoped_vmem_limit_kib": str(_SCOPED_VMEM_KIB)}


def sweep_step(code: QCCode, max_iters: int = 50, *, kind: str = "min-sum",
               scale_llr: bool = False, dtype=jnp.float32, **decoder_kw):
    """Build the jitted Monte-Carlo step: (key, snr_db[B]) -> per-word stats.

    The step transmits the all-zero codeword (the reference's default path,
    ldpc.py:409-411) through BPSK+AWGN and decodes it.  ``snr_db`` is a
    per-word vector so one batch can mix SNR points.  With
    ``scale_llr=True`` the decoder sees true LLRs 2y/sigma^2 (needed for
    sum-product); min-sum variants are scale-invariant and use raw samples
    like the reference.

    Returns a function producing a dict of [B] arrays:
    errors_uncoded, errors_decoded, iterations, success, sigma,
    sigma_actual.
    """
    transmit = _transmit_fn(code.n, scale_llr)
    decode_fn = decoder_for_code(code, max_iters, kind=kind, dtype=dtype,
                                 **decoder_kw)

    @jax.jit
    def step(key, snr_db):
        llr, sigma, sigma_actual, unc = transmit(key, snr_db)
        res = decode_fn(llr)
        return {
            "errors_uncoded": unc,
            "errors_decoded": jnp.sum(
                res.hard.astype(jnp.int32), axis=-1),
            "iterations": res.iterations,
            "success": res.success,
            "sigma": sigma,
            "sigma_actual": sigma_actual,
        }

    return step


def random_codeword_sweep_step(code: QCCode, max_iters: int = 50, *,
                               kind: str = "min-sum",
                               scale_llr: bool = False,
                               dtype=jnp.float32, **decoder_kw):
    """Monte-Carlo step transmitting RANDOM codewords (not all-zero).

    The reference's G-based path done right (ldpc.py:409-416: encode,
    modulate, add noise — vestigial there, the all-zero word is its
    default): draw uniform messages, systematically encode
    (``codes/encode.py``, one MXU matmul), BPSK+AWGN, decode, and count
    bit errors against the TRANSMITTED word.  This validates the all-zero
    Monte-Carlo protocol end-to-end — encoder, channel symmetry and
    decoder together — instead of assuming linearity + channel symmetry.

    Uses the XLA engine (needs ``res.hard`` to compare against the true
    codeword; the Pallas kernel counts errors against zero on device —
    its decode math is sign-symmetric, so this validation covers the
    protocol for both engines).  Same output contract as
    :func:`sweep_step`.
    """
    from ..codes.encode import encoder_for_code
    enc = encoder_for_code(code)
    # the encoder's true message size: differs from code.k for
    # rank-deficient H (redundant checks) or column-pivoted layouts
    k = getattr(enc, "k_eff", code.k)
    decode_fn = decoder_for_code(code, max_iters, kind=kind, dtype=dtype,
                                 **decoder_kw)

    @jax.jit
    def step(key, snr_db):
        b = snr_db.shape[0]
        key_msg, key_noise = jax.random.split(key)
        msgs = jax.random.bernoulli(key_msg, 0.5, (b, k)).astype(jnp.int8)
        cw = enc(msgs)
        noisy, sigma, sigma_actual = awgn(key_noise, modulate(cw), snr_db)
        llr = llr_from_channel(noisy, sigma) if scale_llr else noisy
        unc = jnp.sum((slicer(noisy) != cw).astype(jnp.int32), axis=-1)
        res = decode_fn(llr)
        errs = jnp.sum(
            (res.hard.astype(jnp.int8) != cw).astype(jnp.int32), axis=-1)
        return {
            "errors_uncoded": unc,
            "errors_decoded": errs,
            "iterations": res.iterations,
            "success": res.success,
            "sigma": sigma,
            "sigma_actual": sigma_actual,
        }

    return step


def _transmit_fn(n: int, scale_llr: bool):
    """Jitted channel: (key, snr_db[B]) -> (llr, sigma, sigma_actual,
    uncoded error counts)."""

    @jax.jit
    def fn(key, snr_db):
        b = snr_db.shape[0]
        clean = jnp.full((b, n), -1.0, jnp.float32)
        noisy, sigma, sigma_actual = awgn(key, clean, snr_db)
        llr = llr_from_channel(noisy, sigma) if scale_llr else noisy
        unc = jnp.sum((noisy > 0).astype(jnp.int32), axis=-1)
        return llr, sigma, sigma_actual, unc

    return fn


def evaluate_code(code: QCCode,
                  snr_points: Sequence[float],
                  num_transmissions: int,
                  max_iters: int = 50,
                  *,
                  seed: int = 7134066,
                  batch_size: int = 256,
                  kind: str = "min-sum",
                  scale_llr: bool = False,
                  dtype=jnp.float32,
                  staged: bool = False,
                  phase1_iters: int = 12,
                  engine: str = "xla",
                  store_dtype=None,
                  schedule: str = "flooding",
                  tile_b: int | None = None,
                  sort_words: bool = False,
                  codewords: str = "zero",
                  early_abort_ber: float | None = None,
                  stats: BerStatistics | None = None,
                  checkpoint_path=None,
                  verbose: bool = False) -> BerStatistics:
    """Run a full SNR sweep; returns mergeable BerStatistics.

    ``early_abort_ber``: stop the sweep if a finished SNR point's BER
    exceeds this reference value (the reference's early abort,
    ldpc.py:473-475 / the env's budget guard).

    ``staged=True`` decodes each batch in phases with transmit + the
    whole gather/re-decode/merge fused into ONE jitted dispatch per batch
    (see :func:`make_staged_sweep_device`) — bit-identical statistics,
    ~3x faster at operating SNRs and round-trip-free through high-latency
    links.  ``engine="pallas"`` additionally routes the decodes through
    the VMEM-resident kernel (``ops/pallas_static.py``) whose message
    ``schedule`` may be ``"flooding"`` (reference semantics) or
    ``"layered"`` (serial-C production schedule, ~2x fewer sweeps to
    converge; adjudicated on chip by ``scripts/layered_ab.py``).

    ``codewords``: "zero" (default — the reference's all-zero Monte-Carlo
    path, ldpc.py:409-411) or "random" — draw uniform messages,
    systematically encode and count errors against the transmitted word
    (validates the all-zero protocol; XLA engine, unstaged).

    ``checkpoint_path``: save the accumulated statistics after every SNR
    point and, on restart, resume by skipping points already completed
    with at least ``num_transmissions`` words (the reference has no sweep
    resume, SURVEY.md §5).

    The default seed matches the reference's global PRNG seed
    (``LDPC_LOCAL_PRNG``, ldpc.py:24) in spirit; statistics agree within
    Monte-Carlo error, not sample-for-sample (different PRNG family).
    """
    # One builder covers both modes: ``staged=False`` is the empty
    # cascade (single full-budget pass), so ``engine``/``store_dtype``/
    # ``schedule`` are honored either way instead of being silently
    # dropped on the unstaged path.
    if tile_b is not None and engine != "pallas":
        raise ValueError("tile_b is a pallas-engine scheduling lever")
    if codewords == "random":
        # the G-based validation path: random messages, systematic
        # encode, errors counted against the TRANSMITTED word (see
        # :func:`random_codeword_sweep_step`)
        if staged or engine != "xla" or sort_words:
            raise ValueError(
                "codewords='random' uses the XLA engine unstaged, without "
                "sort_words (the Pallas kernel counts errors against the "
                "all-zero word on device; this path exists to validate "
                "that protocol)")
        step = random_codeword_sweep_step(
            code, max_iters, kind=kind, scale_llr=scale_llr, dtype=dtype)
    elif codewords != "zero":
        raise ValueError(f"unknown codewords mode: {codewords!r}")
    else:
        step = make_staged_sweep_device(
            code, max_iters, scale_llr=scale_llr,
            phase1_iters=phase1_iters if staged else [], kind=kind,
            dtype=dtype, engine=engine, store_dtype=store_dtype,
            schedule=schedule, tile_b=tile_b, sort_words=sort_words)
    if stats is None:
        import os
        if checkpoint_path is not None and os.path.exists(checkpoint_path):
            stats = BerStatistics.load(checkpoint_path)
        else:
            stats = BerStatistics(code.n)
    root = jax.random.key(seed)
    for s_idx, snr in enumerate(snr_points):
        already = int(stats.column("weight")[
            stats.column("snr") == snr].sum()) if len(stats) else 0
        if already >= num_transmissions:
            continue  # resumed past this point
        t0 = time.time()
        # Resume mid-point without double counting: the checkpointed
        # batches used keys fold_in(.., 0..already-1), so starting
        # done_words there continues with fresh draws.  Seed the running
        # error count from the checkpointed entries so the verbose BER
        # and the early-abort comparison cover the WHOLE point, not just
        # the post-resume batches.
        done_words = already
        point_errs = int(stats.column("errors_decoded")[
            stats.column("snr") == snr].sum()) if already else 0
        # Pipeline the point's batches: dispatch ALL of them (jax dispatch
        # is async; in-flight state is just the tiny (key, snr) inputs and
        # [B] outputs) and only then drain with device_get, so decode and
        # the host round trip (~33 ms through a tunnelled backend) overlap
        # instead of serializing per batch.  Keys and accumulation order
        # are unchanged, so statistics are identical to the blocking loop.
        futures = []
        while done_words < num_transmissions:
            b = min(batch_size, num_transmissions - done_words)
            key = jax.random.fold_in(jax.random.fold_in(root, s_idx),
                                     done_words)
            futures.append((b, step(key, jnp.full((b,), snr, jnp.float32))))
            done_words += b
        for b, fut in futures:
            out = jax.device_get(fut)
            stats.add_batch(
                snr=np.full(b, snr), sigma=out["sigma"],
                sigma_actual=out["sigma_actual"],
                errors_uncoded=out["errors_uncoded"],
                errors_decoded=out["errors_decoded"],
                iterations=out["iterations"], max_iterations=max_iters,
                success=out["success"])
            point_errs += int(out["errors_decoded"].sum())
        if verbose:
            dt = time.time() - t0
            bits = num_transmissions * code.n
            print(f"[evaluate] snr {snr}: {dt:.3f}s, "
                  f"{bits / dt:,.0f} bit/s decoded, "
                  f"BER {point_errs / bits:.3e}")
        if checkpoint_path is not None:
            stats.save(checkpoint_path)
        if early_abort_ber is not None:
            ber = point_errs / (num_transmissions * code.n)
            if ber > early_abort_ber:
                break
    return stats


def evaluate_epsilon_probe(code: QCCode, epsilon: float = 1e-2,
                           flips: Sequence[int] = (0,),
                           max_iters: int = 50, return_time: bool = False,
                           **decoder_kw):
    """Deterministic single-vector probe (ldpcCUDA.py:677-828 equivalent).

    Decodes ``modulate(zeros) + epsilon`` with the given hard sign flips;
    no PRNG involved.  Returns (errors_uncoded, errors_decoded,
    iterations, success), plus the decode wall time in seconds when
    ``return_time=True`` — matching the reference's five return values
    (berUncoded, berDecoded, iterations, time; ldpcCUDA.py:826-828).
    """
    probe = epsilon_probe(code.n, flips=flips, epsilon=epsilon)
    dec = decoder_for_code(code, max_iters, **decoder_kw)
    t0 = time.time()
    res = dec(probe)
    hard = np.asarray(res.hard)  # device_get: the completion barrier
    wall = time.time() - t0
    errors_uncoded = int(np.asarray(probe > 0).sum())
    out = (errors_uncoded,
           int(hard.sum()),
           int(res.iterations[0]),
           bool(res.success[0]))
    return out + (wall,) if return_time else out
