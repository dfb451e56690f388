"""Device capability probes shared across the framework.

The reference selects devices explicitly (``cuda.select_device``,
ldpcCUDA.py:42); here the only runtime question is "is the default device a
real TPU?" — which decides Pallas interpret-mode and compiler options.
"""

from __future__ import annotations

import jax

__all__ = ["on_tpu_hardware"]


def on_tpu_hardware() -> bool:
    """True when the default JAX device is a real TPU.

    ``jax.default_backend()`` is NOT "tpu" on tunnelled/proxied backends
    (e.g. a platform that fronts TPU devices under another name), so probe
    the device itself: accept any platform whose device kind names a TPU,
    plus the native "tpu" platform.
    """
    try:
        dev = jax.devices()[0]
    except Exception:  # noqa: BLE001 — no backend at all
        return False
    if dev.platform == "tpu":
        return True
    return "TPU" in str(getattr(dev, "device_kind", ""))
