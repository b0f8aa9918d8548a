"""Device->host link bandwidth probe.

Some deployments reach the TPU through a network tunnel where D2H transfers
run at tens of MB/s; directly-attached chips move GB/s. A few dispatch
decisions (host-native vs. on-device label rasterization) depend on which
regime we are in, so measure once and cache.
"""
from __future__ import annotations

import time

import numpy as np

_CACHE = {}


def d2h_bandwidth_bytes_per_s(probe_bytes=4 << 20, force=False):
    """Measured device->host bandwidth (bytes/s), cached after first call.
    Returns None when no accelerator device is usable."""
    if not force and "bw" in _CACHE:
        return _CACHE["bw"]
    try:
        import jax
        import jax.numpy as jnp

        n = probe_bytes // 4
        x = jax.block_until_ready(jnp.arange(n, dtype=jnp.int32))
        t0 = time.perf_counter()
        np.asarray(x)
        dt = time.perf_counter() - t0
        bw = probe_bytes / max(dt, 1e-6)
    except Exception:
        bw = None
    _CACHE["bw"] = bw
    return bw
