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

__all__ = ["sharded_sweep_step", "evaluate_code_sharded"]


def _batch_axes(mesh: Mesh):
    """Mesh axes the batch dimension shards over: the flat data axis, or
    ALL axes of a hierarchical (dcn, ici) mesh (dcn-major)."""
    if DATA_AXIS in mesh.axis_names:
        return DATA_AXIS
    return tuple(mesh.axis_names)


def sharded_sweep_step(code: QCCode, mesh: Mesh, max_iters: int = 50, *,
                       kind: str = "min-sum", scale_llr: bool = False,
                       dtype=jnp.float32, engine: str = "xla",
                       pallas_tile_b: int = 128, **decoder_kw):
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
            interpret=interp, jit=False)
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
                          stats: BerStatistics | None = None,
                          verbose: bool = False) -> BerStatistics:
    """Full sweep over a device mesh; returns weighted BerStatistics.

    ``num_transmissions`` is the GLOBAL count per SNR point (like the
    reference wrapper's total split across GPUs, ldpcCUDA.py:898-900).
    ``batch_size`` is the global per-step batch (default: 256 per device),
    rounded up to a multiple of the mesh size.
    """
    mesh = mesh if mesh is not None else make_mesh()
    ndev = int(np.prod(list(mesh.shape.values())))
    if batch_size is None:
        batch_size = 256 * ndev
    batch_size = max(ndev, (batch_size // ndev) * ndev)
    if engine == "pallas":
        # every per-device shard must be a whole number of kernel tiles
        batch_size = max(batch_size,
                         ndev * pallas_tile_b)
        batch_size = (batch_size // (ndev * pallas_tile_b)) \
            * ndev * pallas_tile_b
    step = sharded_sweep_step(code, mesh, max_iters, kind=kind,
                              scale_llr=scale_llr, dtype=dtype,
                              engine=engine, pallas_tile_b=pallas_tile_b)
    stats = stats if stats is not None else BerStatistics(code.n)
    root = jax.random.key(seed)
    data_sh = NamedSharding(mesh, P(_batch_axes(mesh)))
    for s_idx, snr in enumerate(snr_points):
        t0 = time.time()
        done = 0
        grain = ndev * pallas_tile_b if engine == "pallas" else ndev
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
            out = jax.device_get(step(key, snr_arr))
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
            done += b
        if verbose:
            dt = time.time() - t0
            print(f"[sharded] snr {snr}: {dt:.3f}s over {ndev} devices, "
                  f"{done * code.n / dt:,.0f} bit/s decoded")
    return stats
