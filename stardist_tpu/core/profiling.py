"""Profiling helpers: jax.profiler trace contexts + device-synced timing.

The reference's perf visibility is verbose per-stage instrumentation in the
C++ NMS cascade (stardist/lib/stardist3d_impl.cpp:1343-1366) plus ad-hoc
``time()`` calls (stardist/nms.py:121-131). The TPU-native equivalents:

- :func:`trace` wraps ``jax.profiler.trace`` so a profiled region can be
  inspected in TensorBoard / xprof;
- :func:`device_sync` forces completion of a jax pytree and returns it —
  note that on some remote-TPU platforms ``jax.block_until_ready`` returns
  before execution finishes, so the sync fetches one scalar derived from
  the outputs (always correct, costs one device->host round trip);
- :class:`Timer` measures wall time around device work with that sync.

Per-stage NMS counters are separate: see
``stardist_tpu.ops.nms.LAST_NMS_COUNTERS`` (surfaced in the
``predict_instances`` details dict as ``nms_counters``).
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir, create_perfetto_link=False):
    """Profile a region with the JAX profiler (view in TensorBoard).

    >>> with trace("/tmp/jax-trace"):
    ...     model.predict_instances(img)
    """
    import jax

    with jax.profiler.trace(str(logdir),
                            create_perfetto_link=create_perfetto_link):
        yield


def device_sync(tree):
    """Force completion of all device computation in ``tree``; returns it.

    Works even where ``jax.block_until_ready`` is unreliable (remote-TPU
    tunnels) by fetching one scalar derived from every leaf."""
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(tree)
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and not isinstance(l, (int, float))]
    if leaves:
        s = sum(jnp.sum(jnp.asarray(l).ravel()[:1].astype(jnp.float32))
                for l in leaves)
        jax.device_get(s)
    return tree


class Timer:
    """Wall-clock timer with device sync; accumulates named laps.

    >>> t = Timer()
    >>> with t("forward"):
    ...     out = forward(params, x)
    >>> t.laps  # {"forward": [0.0123]}
    """

    def __init__(self):
        self.laps = {}

    @contextlib.contextmanager
    def __call__(self, tag, sync=None):
        t0 = time.perf_counter()
        box = []
        try:
            yield box
        finally:
            if box:
                device_sync(box)
            elif sync is not None:
                device_sync(sync)
            self.laps.setdefault(tag, []).append(time.perf_counter() - t0)

    def total(self, tag):
        return sum(self.laps.get(tag, []))

    def report(self):
        return {k: (len(v), sum(v)) for k, v in self.laps.items()}
