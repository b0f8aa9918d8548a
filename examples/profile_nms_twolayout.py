"""Timing of the two-layout global-pair-list NMS kernel on the device.

Runs `nms2d_twolayout_host` (ops/nms2d_fast.py) on clustered candidate
fields and prints wall time, throughput and the kernel's pair statistics.
For an op-level breakdown use examples/profile_nms_v2_ops.py.

Usage: python examples/profile_nms_twolayout.py [N ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_nms import clustered_candidates  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [65536, 262144]
    import jax
    import stardist_tpu  # noqa: F401
    from stardist_tpu import _enable_persistent_compilation_cache
    _enable_persistent_compilation_cache()
    print("backend:", jax.default_backend(), file=sys.stderr)
    from stardist_tpu.ops.nms2d_fast import nms2d_twolayout_host

    for n in sizes:
        dist, points, prob = clustered_candidates(n)
        t0 = time.perf_counter()
        keep = nms2d_twolayout_host(dist, points, 0.4, verbose=True)
        warm = time.perf_counter() - t0
        if keep is None:
            print(f"N={n}: fell back (None)", flush=True)
            continue
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            keep = nms2d_twolayout_host(dist, points, 0.4)
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(f"N={n:7d}: {t * 1e3:8.1f} ms ({n / t / 1e6:6.2f} Mcand/s), "
              f"survivors={int(keep.sum())}, warmup={warm:.1f}s", flush=True)


if __name__ == "__main__":
    main()
