"""Mesh-sharded Monte-Carlo evaluation: the multi-chip/multi-host sweep.

Replaces the reference's multi-GPU fan-out (`evaluateCodeCudaWrapper`,
``ldpcCUDA.py:891-932``: one OS process per CUDA device, transmissions split
``T // n_devices``, results merged by unpickling ``berStatistics`` objects)
with XLA SPMD: the per-word batch axis is sharded over a 1-D device mesh,
every chip decodes its shard inside the same jitted program, and the
reductions to scalar counters are global sums that XLA lowers to `psum`
collectives over ICI/DCN.  One compiled program, zero process pools, zero
pickling.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codes.qc import QCCode
from ..ops.decoder import decoder_for_code
from ..sim.channel import awgn, llr_from_channel, snr_db_to_sigma
from ..sim.stats import BerStatistics
from .mesh import DATA_AXIS, make_mesh

__all__ = ["sharded_sweep_step", "sharded_staged_sweep_step",
           "evaluate_code_sharded"]


def _batch_axes(mesh: Mesh):
    """Mesh axes the batch dimension shards over: the flat data axis, or
    ALL axes of a hierarchical (dcn, ici) mesh (dcn-major)."""
    if DATA_AXIS in mesh.axis_names:
        return DATA_AXIS
    return tuple(mesh.axis_names)


def sharded_sweep_step(code: QCCode, mesh: Mesh, max_iters: int = 50, *,
                       kind: str = "min-sum", scale_llr: bool = False,
                       dtype=jnp.float32, engine: str = "xla",
                       pallas_tile_b: int = 128,
                       schedule: str = "flooding", **decoder_kw):
    """Jitted step with the batch axis sharded over the mesh.

    (key, snr_db[B]) -> dict of pre-reduced scalars: frames, bit errors
    (uncoded/decoded), iteration sum, success count, frame errors, mean
    realized sigma.  All reductions are global (cross-chip psum inserted by
    XLA), so the outputs are replicated scalars safe to read on any host.

    ``engine="pallas"`` runs the VMEM-resident unrolled kernel
    (``ops/pallas_static.py``) per device via ``shard_map`` — the Pallas
    call is manually partitioned (XLA cannot auto-partition custom
    kernels), each device decoding its local batch shard, which must be a
    multiple of ``pallas_tile_b``.  On a CPU mesh the kernel runs in
    interpret mode (sharding validation without TPU hardware).
    """
    n = code.n
    batch_axes = _batch_axes(mesh)
    data_sh = NamedSharding(mesh, P(batch_axes))
    repl = NamedSharding(mesh, P())
    opts = None
    if schedule != "flooding" and engine != "pallas":
        raise ValueError("schedules other than flooding need the pallas "
                         "engine")
    if engine == "pallas":
        from ..ops.pallas_static import _SCOPED_VMEM_KIB, \
            make_static_sweep_decoder
        shard_map = jax.shard_map
        if kind not in ("min-sum", "normalized-min-sum",
                        "offset-min-sum", "sum-product"):
            raise ValueError(
                f"unknown decoder kind for pallas engine: {kind}")
        from ..utils.device import on_tpu_hardware
        interp = not on_tpu_hardware()
        # jit=False: the kernel is traced inside the outer jitted step,
        # and its compiler options may only sit on a TOP-LEVEL jit (they
        # are attached to the outer jax.jit below).  The storage dtype is
        # the kernel's own default (bfloat16) — the sim-level compute
        # dtype is a different knob and f32 storage does not fit the
        # scoped-VMEM ceiling for large codes.
        pall = make_static_sweep_decoder(
            code, max_iters, tile_b=pallas_tile_b, kind=kind,
            schedule=schedule, interpret=interp, jit=False)
        counts_fn = shard_map(
            lambda llr: pall(llr), mesh=mesh,
            in_specs=P(batch_axes, None),
            out_specs=(P(batch_axes), P(batch_axes), P(batch_axes)),
            check_vma=False)
        if not interp:
            opts = {"xla_tpu_scoped_vmem_limit_kib": str(_SCOPED_VMEM_KIB)}
        # (on non-TPU backends interpret mode needs no options)
    else:
        decode_fn = decoder_for_code(code, max_iters, kind=kind,
                                     dtype=dtype, **decoder_kw)

    def step(key, snr_db):
        b = snr_db.shape[0]
        clean = jnp.full((b, n), -1.0, jnp.float32)
        noisy, sigma, sigma_actual = awgn(key, clean, snr_db)
        llr = llr_from_channel(noisy, sigma) if scale_llr else noisy
        if engine == "pallas":
            errs, iterations, success = counts_fn(llr)
        else:
            res = decode_fn(llr)
            errs = jnp.sum(res.hard.astype(jnp.int32), axis=-1)
            iterations, success = res.iterations, res.success
        frame_err = (errs > 0) | ~success
        return {
            "frames": jnp.int32(b),
            "errors_uncoded": jnp.sum((noisy > 0).astype(jnp.int64)),
            "errors_decoded": jnp.sum(errs.astype(jnp.int64)),
            "iterations_sum": jnp.sum(iterations.astype(jnp.int64)),
            "success_count": jnp.sum(success.astype(jnp.int64)),
            "frame_errors": jnp.sum(frame_err.astype(jnp.int64)),
            "sigma_actual_mean": jnp.mean(sigma_actual),
        }

    return jax.jit(step, in_shardings=(repl, data_sh),
                   out_shardings=repl, compiler_options=opts)


def sharded_staged_sweep_step(code: QCCode, mesh: Mesh,
                              max_iters: int = 50, *,
                              phase1_iters=12, redo_capacity=None,
                              kind: str = "min-sum",
                              scale_llr: bool = False,
                              dtype=jnp.float32, store_dtype=None,
                              tile_b: int | None = None,
                              schedule: str = "flooding",
                              engine: str = "xla",
                              sort_words: bool = False):
    """Mesh-sharded Monte-Carlo step with the staged cascade ON DEVICE.

    The single-device staged path (``sim.evaluate.make_staged_sweep_device``)
    measured ~3x at operating SNRs from letting most words stop at a small
    iteration budget; without it the sharded path — the production pod
    driver — pays ``max_iters`` for every word.  Here each device runs the
    full gather/re-decode/merge cascade on its LOCAL batch shard under
    ``shard_map`` (the cascade's argsort/scatter bookkeeping must never
    cross ICI), while the channel is computed at the global jit level —
    partitionable threefry makes the noise draws identical to the
    single-device path for the same key, and per-word convergence latching
    makes every cascade exactly equivalent to a straight ``max_iters``
    decode, so the aggregate statistics are bit-identical to
    ``evaluate_code(staged=True)`` with matched batching.

    Same (key, snr_db[B]) -> pre-reduced replicated scalars contract as
    :func:`sharded_sweep_step`; accepts the staged knobs of
    ``make_staged_decoder_device`` (``phase1_iters`` cascade,
    ``redo_capacity``, pallas ``store_dtype``/``tile_b``).
    """
    from ..sim.evaluate import _pallas_compiler_options, _staged_core_builder

    n = code.n
    batch_axes = _batch_axes(mesh)
    ndev = int(np.prod(list(mesh.shape.values())))
    data_sh = NamedSharding(mesh, P(batch_axes))
    repl = NamedSharding(mesh, P())
    core = _staged_core_builder(
        code, max_iters, phase1_iters=phase1_iters,
        redo_capacity=redo_capacity, kind=kind, dtype=dtype,
        store_dtype=store_dtype, tile_b=tile_b, schedule=schedule,
        engine=engine, sort_words=sort_words)
    opts = _pallas_compiler_options(engine)
    # Bounded like the other executable caches (utils/cache.py): a stale
    # per-batch-size entry pins a compiled shard_map executable and its
    # constants, and a long-lived pod driver can touch many batch sizes.
    from ..utils.cache import BoundedCache
    cache: dict = BoundedCache(16)

    def build(b):
        if b % ndev:
            raise ValueError(f"batch {b} must divide over {ndev} devices")
        decode = jax.shard_map(
            core(b // ndev), mesh=mesh, in_specs=P(batch_axes, None),
            out_specs=(P(batch_axes),) * 3, check_vma=False)

        def step(key, snr_db):
            clean = jnp.full((b, n), -1.0, jnp.float32)
            noisy, sigma, sigma_actual = awgn(key, clean, snr_db)
            llr = llr_from_channel(noisy, sigma) if scale_llr else noisy
            errs, iterations, success = decode(llr)
            frame_err = (errs > 0) | ~success
            return {
                "frames": jnp.int32(b),
                "errors_uncoded": jnp.sum((noisy > 0).astype(jnp.int64)),
                "errors_decoded": jnp.sum(errs.astype(jnp.int64)),
                "iterations_sum": jnp.sum(iterations.astype(jnp.int64)),
                "success_count": jnp.sum(success.astype(jnp.int64)),
                "frame_errors": jnp.sum(frame_err.astype(jnp.int64)),
                "sigma_actual_mean": jnp.mean(sigma_actual),
            }

        return jax.jit(step, in_shardings=(repl, data_sh),
                       out_shardings=repl, compiler_options=opts)

    def step(key, snr_db):
        snr_db = jnp.asarray(snr_db)
        b = snr_db.shape[0]
        if b not in cache:
            cache[b] = build(b)
        return cache[b](key, snr_db)

    return step


def evaluate_code_sharded(code: QCCode,
                          snr_points: Sequence[float],
                          num_transmissions: int,
                          max_iters: int = 50,
                          *,
                          mesh: Mesh | None = None,
                          seed: int = 7134066,
                          batch_size: int | None = None,
                          kind: str = "min-sum",
                          scale_llr: bool = False,
                          dtype=jnp.float32,
                          engine: str = "xla",
                          pallas_tile_b: int = 128,
                          staged: bool = False,
                          phase1_iters=12,
                          redo_capacity=None,
                          store_dtype=None,
                          schedule: str = "flooding",
                          sort_words: bool = False,
                          early_abort_ber: float | None = None,
                          checkpoint_path=None,
                          stats: BerStatistics | None = None,
                          verbose: bool = False) -> BerStatistics:
    """Full sweep over a device mesh; returns weighted BerStatistics.

    ``num_transmissions`` is the GLOBAL count per SNR point (like the
    reference wrapper's total split across GPUs, ldpcCUDA.py:898-900).
    ``batch_size`` is the global per-step batch (default: 256 per device),
    rounded up to a multiple of the mesh size.

    Feature parity with the single-device :func:`~ldpc_tpu.sim.evaluate_code`
    (the sharded path is the production pod driver):

    * ``staged=True`` runs the on-device staged cascade per device shard
      (:func:`sharded_staged_sweep_step`) — identical statistics, ~3x
      faster at operating SNRs; ``phase1_iters``/``redo_capacity``
      configure the cascade and ``store_dtype``/``pallas_tile_b`` the
      Pallas kernel.
    * ``checkpoint_path`` saves accumulated statistics after every SNR
      point and resumes past completed points on restart.
    * ``early_abort_ber`` stops the sweep once a finished point's BER
      exceeds the reference value (ldpc.py:473-475 semantics).
    """
    mesh = mesh if mesh is not None else make_mesh()
    ndev = int(np.prod(list(mesh.shape.values())))
    if batch_size is None:
        batch_size = 256 * ndev
    batch_size = max(ndev, (batch_size // ndev) * ndev)
    if engine == "pallas" and not staged:
        # every per-device shard must be a whole number of kernel tiles
        # (the staged step pads its shard internally)
        batch_size = max(batch_size,
                         ndev * pallas_tile_b)
        batch_size = (batch_size // (ndev * pallas_tile_b)) \
            * ndev * pallas_tile_b
    if staged:
        step = sharded_staged_sweep_step(
            code, mesh, max_iters, phase1_iters=phase1_iters,
            redo_capacity=redo_capacity, kind=kind, scale_llr=scale_llr,
            dtype=dtype, store_dtype=store_dtype, schedule=schedule,
            tile_b=(pallas_tile_b if engine == "pallas" else None),
            engine=engine, sort_words=sort_words)
    else:
        if sort_words:
            raise ValueError("sort_words on the sharded path needs "
                             "staged=True (the per-shard cascade core is "
                             "where the sort lives)")
        step = sharded_sweep_step(code, mesh, max_iters, kind=kind,
                                  scale_llr=scale_llr, dtype=dtype,
                                  engine=engine, schedule=schedule,
                                  pallas_tile_b=pallas_tile_b)
    if stats is None:
        import os
        if checkpoint_path is not None and os.path.exists(checkpoint_path):
            stats = BerStatistics.load(checkpoint_path)
        else:
            stats = BerStatistics(code.n)
    root = jax.random.key(seed)
    data_sh = NamedSharding(mesh, P(_batch_axes(mesh)))
    for s_idx, snr in enumerate(snr_points):
        already = int(stats.column("weight")[
            stats.column("snr") == snr].sum()) if len(stats) else 0
        if already >= num_transmissions:
            continue  # resumed past this point
        t0 = time.time()
        done = already
        point_errs = int(stats.column("errors_decoded")[
            stats.column("snr") == snr].sum()) if already else 0
        point_words = already
        grain = ndev * pallas_tile_b if engine == "pallas" and not staged \
            else ndev
        # Pipeline the point's batches (dispatch all, then drain): jax
        # dispatch is async, so decode overlaps the per-batch host round
        # trip (~33 ms through a tunnelled backend).  Keys and
        # accumulation order are unchanged.
        futures = []
        while done < num_transmissions:
            b = min(batch_size, num_transmissions - done)
            b = max(grain, (b + grain - 1) // grain * grain)
            key = jax.random.fold_in(jax.random.fold_in(root, s_idx), done)
            # Multi-host-correct feeding: every process materialises only
            # the shards it addresses (jax.device_put of a globally
            # materialised array is single-controller-only; cf. the
            # reference splitting transmissions per GPU process,
            # ldpcCUDA.py:898-900).
            snr_arr = jax.make_array_from_callback(
                (b,), data_sh,
                lambda idx: np.full(
                    (len(range(*idx[0].indices(b))),), snr, np.float32))
            futures.append((b, step(key, snr_arr)))
            done += b
        for b, fut in futures:
            out = jax.device_get(fut)
            stats.add_aggregate(
                snr=snr, sigma=float(snr_db_to_sigma(snr)),
                sigma_actual_mean=out["sigma_actual_mean"],
                errors_uncoded=out["errors_uncoded"],
                errors_decoded=out["errors_decoded"],
                iterations_sum=out["iterations_sum"],
                max_iterations=max_iters,
                success_count=out["success_count"],
                frame_errors=out["frame_errors"],
                weight=out["frames"])
            point_errs += int(out["errors_decoded"])
            point_words += b
        if verbose:
            dt = time.time() - t0
            print(f"[sharded] snr {snr}: {dt:.3f}s over {ndev} devices, "
                  f"{(done - already) * code.n / dt:,.0f} bit/s decoded")
        if checkpoint_path is not None:
            stats.save(checkpoint_path)
        if early_abort_ber is not None:
            ber = point_errs / (point_words * code.n)
            if ber > early_abort_ber:
                break
    return stats
