"""Profiling & throughput instrumentation.

The reference instruments with bare ``time.time()`` spans and printed
bits/s (``ldpc.py:376-387``, ``ldpcCUDA.py:842-846``).  TPU equivalents:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard/Perfetto trace of device execution;
* ``ThroughputTimer`` — ``block_until_ready``-bracketed wall-clock spans
  accumulating decoded-bits/s, the honest way to time async dispatch;
* ``device_roofline`` — quick sheet of the attached device's peak numbers
  for speed-of-light comparisons.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax

__all__ = ["trace", "ThroughputTimer", "device_roofline"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile: ``with trace('/tmp/prof'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class ThroughputTimer:
    """Accumulating throughput meter.

    >>> t = ThroughputTimer()
    >>> with t.span(bits=batch * n):
    ...     out = jax.block_until_ready(step(...))
    >>> t.bits_per_second
    """

    total_seconds: float = 0.0
    total_bits: float = 0.0
    spans: int = 0

    @contextlib.contextmanager
    def span(self, bits: float):
        t0 = time.time()
        yield
        self.total_seconds += time.time() - t0
        self.total_bits += bits
        self.spans += 1

    @property
    def bits_per_second(self) -> float:
        return self.total_bits / self.total_seconds if self.total_seconds \
            else 0.0

    def summary(self) -> dict:
        return {"bits_per_second": self.bits_per_second,
                "total_seconds": self.total_seconds,
                "total_bits": self.total_bits, "spans": self.spans}


# Published peak numbers for speed-of-light framing (per chip).
_PEAKS = {
    "v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0, "hbm_gib": 16},
    "v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0, "hbm_gib": 16},
    "v5p": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0, "hbm_gib": 95},
    "v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0, "hbm_gib": 32},
}


def device_roofline(device=None) -> dict:
    """Peak specs of the attached device kind, plus MEASURED in-kernel
    primitive costs when the committed roofline artifact exists
    (``docs/kernel_roofline.json``, produced by
    ``scripts/kernel_microbench.py`` fori-slope probes on hardware — the
    published-peak sheet alone is not a measurement)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    out = {"device_kind": getattr(device, "device_kind", "unknown")}
    for name, peaks in _PEAKS.items():
        if name in kind:
            out.update(peaks)
            break
    import json
    import os
    artifact = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "docs",
        "kernel_roofline.json")
    if os.path.exists(artifact):
        try:
            with open(artifact) as f:
                out["measured"] = json.load(f)
        except (OSError, ValueError):
            pass
    return out
