"""Device meshes, shardings and distributed initialisation.

This replaces the reference's entire process-based distribution stack —
``mpi_fork``/``mpiexec`` re-exec (``mpi_tools.py:6-39``), per-GPU
``ProcessPoolExecutor`` fan-out (``ldpcCUDA.py:879-906``), and per-env
process pools (``envContainer.py:30-57``) — with the JAX runtime:

* one process per host, ``jax.distributed.initialize()`` for multi-host;
* a named ``Mesh`` over the devices (``dcn`` axis across slices, ``ici``
  axis within a slice, flattened to a single ``data`` axis by default since
  LDPC Monte-Carlo is embarrassingly data-parallel over codewords);
* ``NamedSharding`` annotations instead of explicit sends: XLA inserts the
  all-reduces (the `psum` replacing ``berStatistics.union`` merges and
  ``mpi_avg_grads``).

Everything degrades gracefully to a single device (like the reference's
``num_procs()==1`` no-op paths, mpi_pytorch.py:22-26) — a 1-device mesh is
still a mesh.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize_distributed", "make_mesh", "make_hierarchical_mesh",
           "data_sharding", "replicated_sharding", "process_batch_slice",
           "DATA_AXIS", "DCN_AXIS", "ICI_AXIS"]

DATA_AXIS = "data"
DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Initialise the multi-host runtime when running on a real slice.

    On single-process runs this is a no-op.  The usual TPU pod case needs
    no arguments (cluster autodetection); explicit values cover manual
    clusters.  Reference equivalent: ``mpi_fork`` + mpi4py COMM_WORLD
    (mpi_tools.py:6-64), except no re-exec is needed.
    """
    if num_processes is not None and num_processes > 1 or (
            coordinator_address is not None):
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    elif os.environ.get("LDPC_TPU_DISTRIBUTED") == "1":
        jax.distributed.initialize()


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D data mesh over all (or the given) devices.

    Monte-Carlo decode, BER reduction and PPO gradient sync are all
    data-parallel, so one flat axis is the right default; the decoder's
    batch axis is sharded over it.  (A codeword itself never needs to be
    sharded: even near-earth messages are ~130 KB/word — see SURVEY.md §5
    "long-context" analysis.)
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def make_hierarchical_mesh(dcn: int | None = None, ici: int | None = None,
                           devices=None) -> Mesh:
    """A 2-D (dcn, ici) mesh for multi-slice runs.

    ``dcn`` counts slices (data-center network axis, one entry per slice);
    ``ici`` counts chips per slice (inter-chip interconnect axis).  Either
    may be omitted and is inferred from the device count.  Shard batch axes
    over BOTH axes with ``P((DCN_AXIS, ICI_AXIS), ...)`` so per-chip work
    stays local and the stat psum rides ICI within a slice before crossing
    DCN once.  Degenerates to ``dcn=1`` on a single slice — still a valid
    mesh for every sharded path (the single-slice analog of the
    reference's ``num_procs()==1`` no-op, mpi_pytorch.py:22-26).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = devices.size
    if dcn is None and ici is None:
        # one "slice" per process by default (the common pod topology)
        dcn = max(1, jax.process_count())
    if dcn is None:
        dcn = total // ici
    if ici is None:
        ici = total // dcn
    if dcn * ici != total:
        raise ValueError(f"dcn*ici = {dcn}*{ici} != {total} devices")
    return Mesh(devices.reshape(dcn, ici), (DCN_AXIS, ICI_AXIS))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS,
                  rank: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest.

    On a hierarchical (dcn, ici) mesh the batch axis is sharded over BOTH
    axes (dcn-major, so one slice holds a contiguous batch range).
    """
    if axis_name not in mesh.axis_names:
        axis = tuple(mesh.axis_names)
        spec = P(axis, *([None] * (rank - 1)))
    else:
        spec = P(axis_name, *([None] * (rank - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_batch_slice(total_batch: int) -> tuple[int, int]:
    """(start, size) of this process's slice of a global batch.

    Multi-host feeding helper: each process materialises only its local
    rows (cf. the reference splitting transmissions across GPUs,
    ldpcCUDA.py:898-900).
    """
    n, i = jax.process_count(), jax.process_index()
    per = total_batch // n
    extra = total_batch % n
    start = i * per + min(i, extra)
    size = per + (1 if i < extra else 0)
    return start, size
