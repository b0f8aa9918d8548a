"""Op-level profile of the inference forward pass (CHW path) at 4096^2.

Runs the warm jitted forward under jax.profiler.trace and prints the top
device ops by self-time, so the gap between per-kernel conv efficiency and
the end-to-end forward MFU is attributable (pool/upsample/concat/head glue
vs the Pallas convs themselves).

Usage: python examples/profile_forward_ops.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_nms_v2_ops import _xplane_top_ops  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import stardist_tpu  # noqa: F401  (persistent compile cache)
    from stardist_tpu.models import Config2D, StarDist2D

    cfg = Config2D(n_rays=32, grid=(2, 2), train_patch_size=(256, 256),
                   train_batch_size=4, train_reduce_lr=None)
    model = StarDist2D(cfg, name="fwdprof", basedir=None)
    model.set_inference_precision("bfloat16")
    x4 = jnp.asarray(np.random.RandomState(0)
                     .rand(1, 4096, 4096, 1).astype(np.float32))
    inf_fwd = model._forward_fn()
    jax.device_get(jnp.ravel(
        inf_fwd(model.params, model._extra_vars, x4)[0])[:1])

    logdir = "/tmp/fwd_trace"
    os.system(f"rm -rf {logdir}")
    import time
    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        jax.device_get(jnp.ravel(
            inf_fwd(model.params, model._extra_vars, x4)[0])[:1])
        dt = time.perf_counter() - t0
    print(f"traced run: {dt * 1e3:.1f} ms wall")
    _xplane_top_ops(logdir)


if __name__ == "__main__":
    main()
