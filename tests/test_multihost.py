"""REAL multi-host execution test: 2 localhost processes, 4 CPU devices
each, one distributed JAX runtime (VERDICT r2 #5).

The virtual 8-device mesh used by the rest of the suite is one process;
``jax.process_count() == 1`` leaves initialize_distributed, multi-host
feeding and the allgather stat branch untested.  Here two actual OS
processes join through ``jax.distributed.initialize`` and run a sharded
staged sweep + cross-process statistics; both must agree bit-for-bit.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_runtime():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(pid), "2"], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    a, b = sorted(outs, key=lambda o: o["pid"])
    assert a["process_count"] == b["process_count"] == 2
    assert a["device_count"] == b["device_count"] == 8
    # replicated psum outputs: both processes saw identical statistics
    assert a["ber"] == b["ber"]
    assert a["fer"] == b["fer"]
    assert a["avg_iterations"] == b["avg_iterations"]
    # allgather branch combined 0,1,2 (pid 0) with 10,11,12 (pid 1)
    mean, std, lo, hi = a["stat"]
    assert a["stat"] == b["stat"]
    assert mean == pytest.approx(6.0)
    assert lo == 0.0 and hi == 12.0
    # population std of {0,1,2,10,11,12}: sqrt(370/6 - 36)
    assert std == pytest.approx((370 / 6 - 36) ** 0.5, rel=1e-6)
    # distributed advantage normalization (VERDICT r3 #4): both
    # processes' normalized advantages must come from the GLOBAL
    # mean/std of the combined raw advantages
    import numpy as np
    raw = np.array(a["raw_adv"] + b["raw_adv"])
    gmean, gstd = raw.mean(), raw.std()
    np.testing.assert_allclose(   # adv buffer is float32
        a["adv_norm"] + b["adv_norm"], (raw - gmean) / gstd, rtol=1e-5)
