"""Test configuration: run the suite on a simulated 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing the
CPU backend with 8 virtual devices.  NOTE: this environment registers a
tunnelled TPU backend ('axon') from sitecustomize at interpreter start, so
jax is already imported here — mutating os.environ is too late; the platform
must be overridden through jax.config before first backend use.  Set
LDPC_TPU_TEST_PLATFORM to run the suite on another backend.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"] +
        " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms",
                  os.environ.get("LDPC_TPU_TEST_PLATFORM", "cpu"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
