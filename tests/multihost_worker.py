"""Worker for the REAL multi-host test (2 localhost processes).

Launched by tests/test_multihost.py as ``python multihost_worker.py
<coordinator_port> <process_id> <num_processes>``.  Each process owns 4
virtual CPU devices; together they form one 8-device JAX runtime with
``jax.process_count() == 2`` — exercising every multi-host code path that
a single-process 8-device mesh cannot reach:

* ``parallel.mesh.initialize_distributed`` (explicit coordinator args);
* ``process_batch_slice`` feeding (each process materialises only its
  rows, cf. the reference splitting transmissions per GPU process,
  ldpcCUDA.py:898-900);
* ``evaluate_code_sharded`` with ``jax.make_array_from_callback``
  multi-host feeding and cross-process psum stat merges;
* ``utils.logging.statistics_scalar(distributed=True)`` — the
  ``process_allgather`` branch (mpi_tools.py:73-95 equivalent).

Prints one JSON line; the launcher asserts both processes agree.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from ldpc_tpu.parallel import (evaluate_code_sharded,
                                   initialize_distributed, make_mesh,
                                   process_batch_slice)

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    # --- process_batch_slice partitions the global batch ---
    start, size = process_batch_slice(10)
    assert size == 10 // nproc + (1 if pid < 10 % nproc else 0)

    # --- sharded sweep with multi-host feeding + staged cascade ---
    from ldpc_tpu.codes import wifi_code
    stats = evaluate_code_sharded(
        wifi_code(), [2.0, 4.0], 16, max_iters=12, mesh=make_mesh(),
        batch_size=16, seed=11, staged=True, phase1_iters=4)
    summary = stats.summary()
    assert summary["transmissions"] == 32

    # --- statistics_scalar allgather branch: asymmetric local data, the
    # global stats must come out identical on both processes ---
    from ldpc_tpu.utils.logging import statistics_scalar
    local_vals = [float(pid * 10 + j) for j in range(3)]  # 0,1,2 / 10,11,12
    mean, std, lo, hi = statistics_scalar(local_vals, with_min_and_max=True,
                                          distributed=True)

    # --- EpochLogger end-to-end: chief-only output, symmetric collectives
    from ldpc_tpu.utils.logging import EpochLogger
    logger = EpochLogger(output_dir=f"/tmp/ldpc_multihost_test_{port}_{pid}")
    logger.store(Reward=float(pid + 1))
    logger.log_tabular("Reward", with_min_and_max=True)
    logger.dump_tabular()
    logger.close()

    print(json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "ber": summary["ber"],
        "fer": summary["fer"],
        "avg_iterations": summary["avg_iterations"],
        "stat": [mean, std, lo, hi],
    }))


if __name__ == "__main__":
    main()
