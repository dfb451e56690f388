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

    # --- distributed advantage normalization (VERDICT r3 #4): with
    # per-process reward distributions that DIFFER, the buffer's
    # normalized advantages must use the GLOBAL mean/std — i.e. differ
    # from what local normalization would produce (the reference's
    # mpi_statistics_scalar path, buffer.py:97) ---
    import numpy as np

    from ldpc_tpu.rl.buffer import PPOBuffer
    buf = PPOBuffer(obs_dim=2, act_dim=3, size=3, gamma=1.0, lam=1.0,
                    num_entropy_heads=2)
    for r in local_vals:   # rewards 0,1,2 on pid 0; 10,11,12 on pid 1
        buf.store(np.zeros(2), np.zeros(3), r, 0.0, -1.0, 0.0, np.zeros(2))
    buf.finish_path(0.0)
    raw_adv = buf.adv_buf.copy()   # suffix sums of rewards (gamma=lam=1)
    data = buf.get(stat_fn=lambda a: statistics_scalar(
        a, distributed=True))
    local_mean, local_std = float(raw_adv.mean()), float(raw_adv.std())
    local_norm = (raw_adv - local_mean) / max(local_std, 1e-8)
    adv_norm = [float(x) for x in data["adv"]]
    assert not np.allclose(adv_norm, local_norm), (
        "distributed normalization must differ from local when the "
        "per-process reward distributions differ")

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
        "raw_adv": [float(x) for x in raw_adv],
        "adv_norm": adv_norm,
    }))


if __name__ == "__main__":
    main()
