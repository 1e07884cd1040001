"""Backend engine profiling: should the hot phases run on-device?

The production default (VERDICT r2 #2): probe the jax backend ONCE per
process — platform plus measured dispatch round-trip latency — and route
the neighbour search / unique counting to the device kernels when a TPU
is co-located (sub-millisecond dispatch).  Behind a tunneled/remote chip
(dispatch = network RTT, tens of ms) or on CPU the measured-faster host
engines remain the default.  Env overrides:

  HUMID_TPU_DEVICE_ENGINE=1|device|on   force the device engines
  HUMID_TPU_DEVICE_ENGINE=0|host|off    force the host engines
  HUMID_TPU_DISPATCH_THRESHOLD_MS       co-location latency bound (2.0)
"""

from __future__ import annotations

import os
import time

_PROFILE: dict | None = None


def backend_profile(refresh: bool = False) -> dict:
    """Cached probe: {"backend", "dispatch_s", "colocated_device"}.

    ``colocated_device`` is True when the default backend is a TPU whose
    measured dispatch round-trip beats HUMID_TPU_DISPATCH_THRESHOLD_MS
    (default 2 ms) — i.e. the chip sits on this host's PCIe/ICI, not at
    the far end of a network tunnel.  The probe costs one tiny jit
    compile + 5 dispatches, paid once per process.
    """
    global _PROFILE
    if _PROFILE is not None and not refresh:
        return _PROFILE

    forced = os.environ.get("HUMID_TPU_DEVICE_ENGINE", "").lower()
    import jax

    backend = jax.default_backend()
    dispatch_s: float | None = None
    if forced in ("1", "device", "on"):
        colocated = True
    elif forced in ("0", "host", "off"):
        colocated = False
    elif backend == "tpu":
        import jax.numpy as jnp

        f = jax.jit(lambda v: (v + 1).sum())
        x = jnp.zeros(128, jnp.int32)
        f(x).block_until_ready()  # compile outside the timed loop
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            f(x).block_until_ready()
        dispatch_s = (time.perf_counter() - t0) / n
        thresh_s = float(
            os.environ.get("HUMID_TPU_DISPATCH_THRESHOLD_MS", "2.0")) / 1e3
        colocated = dispatch_s < thresh_s
    else:
        colocated = False
    _PROFILE = {
        "backend": backend,
        "dispatch_s": dispatch_s,
        "colocated_device": colocated,
    }
    return _PROFILE


def _reset_profile_for_tests() -> None:
    global _PROFILE
    _PROFILE = None
