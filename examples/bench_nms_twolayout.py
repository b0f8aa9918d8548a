"""Compare device NMS paths at realistic candidate counts.

Times the round-2 fused onepass path against the round-3 two-layout striped
kernel (ops/nms2d_fast.py) on the same clustered candidate fields, checking
decision agreement.

Usage: python examples/bench_nms_twolayout.py [N ...]
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
    cache_dir = os.path.expanduser("~/.cache/stardist_tpu/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("backend:", jax.default_backend(), file=sys.stderr)
    from stardist_tpu.ops.nms import _nms_polygons_device_onepass
    from stardist_tpu.ops.nms2d_fast import nms2d_twolayout_host

    for n in sizes:
        dist, points, prob = clustered_candidates(n)
        rows = {}
        for name, fn in (("twolayout", nms2d_twolayout_host),
                         ("onepass", _nms_polygons_device_onepass)):
            t0 = time.perf_counter()
            keep = fn(dist, points, 0.4, verbose=True)
            t_warm = time.perf_counter() - t0
            if keep is None:
                print(f"N={n}: {name} fell back (None)")
                continue
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                keep = fn(dist, points, 0.4)
                times.append(time.perf_counter() - t0)
            t = min(times)
            rows[name] = keep
            print(f"N={n:7d} {name:10s}: {t*1e3:8.1f} ms "
                  f"({n/t/1e6:6.2f} Mcand/s), survivors={int(keep.sum())}, "
                  f"warmup={t_warm:.1f}s", flush=True)
        if len(rows) == 2:
            a, b = rows["twolayout"], rows["onepass"]
            print(f"N={n}: decision agreement {(a == b).mean():.6f} "
                  f"({int((a != b).sum())} differ)", flush=True)


if __name__ == "__main__":
    main()
