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
from ..sim.channel import awgn, llr_from_channel
from ..sim.stats import BerStatistics
from .mesh import DATA_AXIS, make_mesh

__all__ = ["sharded_sweep_step", "evaluate_code_sharded"]


def sharded_sweep_step(code: QCCode, mesh: Mesh, max_iters: int = 50, *,
                       kind: str = "min-sum", scale_llr: bool = False,
                       dtype=jnp.float32, **decoder_kw):
    """Jitted step with the batch axis sharded over the mesh.

    (key, snr_db[B]) -> dict of pre-reduced scalars: frames, bit errors
    (uncoded/decoded), iteration sum, success count, frame errors, mean
    realized sigma.  All reductions are global (cross-chip psum inserted by
    XLA), so the outputs are replicated scalars safe to read on any host.
    """
    n = code.n
    decode_fn = decoder_for_code(code, max_iters, kind=kind, dtype=dtype,
                                 **decoder_kw)
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def step(key, snr_db):
        b = snr_db.shape[0]
        clean = jnp.full((b, n), -1.0, jnp.float32)
        noisy, sigma, sigma_actual = awgn(key, clean, snr_db)
        llr = llr_from_channel(noisy, sigma) if scale_llr else noisy
        res = decode_fn(llr)
        errs = jnp.sum(res.hard.astype(jnp.int32), axis=-1)
        frame_err = (errs > 0) | ~res.success
        return {
            "frames": jnp.int32(b),
            "errors_uncoded": jnp.sum((noisy > 0).astype(jnp.int64)),
            "errors_decoded": jnp.sum(errs.astype(jnp.int64)),
            "iterations_sum": jnp.sum(res.iterations.astype(jnp.int64)),
            "success_count": jnp.sum(res.success.astype(jnp.int64)),
            "frame_errors": jnp.sum(frame_err.astype(jnp.int64)),
            "sigma_actual_mean": jnp.mean(sigma_actual),
        }

    return jax.jit(step, in_shardings=(repl, data_sh),
                   out_shardings=repl)


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
    step = sharded_sweep_step(code, mesh, max_iters, kind=kind,
                              scale_llr=scale_llr, dtype=dtype)
    stats = stats if stats is not None else BerStatistics(code.n)
    root = jax.random.key(seed)
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    for s_idx, snr in enumerate(snr_points):
        t0 = time.time()
        done = 0
        while done < num_transmissions:
            b = min(batch_size, num_transmissions - done)
            b = max(ndev, (b + ndev - 1) // ndev * ndev)
            key = jax.random.fold_in(jax.random.fold_in(root, s_idx), done)
            snr_arr = jax.device_put(
                jnp.full((b,), snr, jnp.float32), data_sh)
            out = jax.device_get(step(key, snr_arr))
            stats.add_aggregate(
                snr=snr, sigma=float(np.sqrt(0.5 / 10 ** (snr / 10))),
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
