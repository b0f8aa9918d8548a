"""Stage ablation of the two-layout striped NMS kernel on the device.

Times `_nms2d_twolayout` with the `stages` switch (0=bounds only,
1=+per-row top_k, 2=+block compaction+erosion, 3=+coarse cascade, 5=full)
to locate the expensive stage at production candidate counts.

Usage: python examples/profile_nms_twolayout.py [N]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_nms import clustered_candidates  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.expanduser("~/.cache/stardist_tpu/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from stardist_tpu.ops.nms2d_fast import _nms2d_twolayout, _bucket, _pad_np

    dist, points, prob = clustered_candidates(n)
    Q = 256
    Npad = _bucket(n, minimum=2 * Q)
    NB, A, P, P2 = 1, 128, 8192, 2048
    axis = int(np.argmax(points.max(0) - points.min(0)))
    dist_p = jnp.asarray(_pad_np(dist, Npad, 1e-3))
    points_p = jnp.asarray(_pad_np(points, Npad, 1e9))
    rank_p = jnp.asarray(_pad_np(np.arange(n, dtype=np.int32), Npad, 2 ** 30))

    for stages in (0, 1, 2, 3, 5):
        t0 = time.perf_counter()
        out = jax.device_get(_nms2d_twolayout(
            dist_p, points_p, rank_p, jnp.int32(n), jnp.float32(0.4),
            axis, Q, NB, A, P, P2, 16, stages))
        warm = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.device_get(_nms2d_twolayout(
                dist_p, points_p, rank_p, jnp.int32(n), jnp.float32(0.4),
                axis, Q, NB, A, P, P2, 16, stages))
            times.append(time.perf_counter() - t0)
        keep, flags, stats = out
        print(f"stages={stages}: {min(times)*1e3:8.1f} ms  "
              f"survivors={int(keep[:n].sum())} flags={[bool(f) for f in flags]} "
              f"stats={[int(s) for s in stats]} warmup={warm:.0f}s", flush=True)


if __name__ == "__main__":
    main()
