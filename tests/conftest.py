"""Test configuration: run the suite on a simulated 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing the
CPU backend with 8 virtual devices (the moral equivalent of the reference's
"degrade gracefully when num_procs()==1" MPI paths — except here the
multi-device code actually runs).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
