"""Micro-benchmark: device NMS throughput at realistic candidate counts.

Generates a clustered candidate field resembling 4096^2 fluorescence
inference (many candidates per object, object radius ~7-14 px) and times
`nms_polygons` end to end on the default backend.

Usage: python examples/bench_nms.py [N ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clustered_candidates(n_total, seed=0, img=4096, r_range=(7, 14),
                         per_obj=20, n_rays=32):
    rng = np.random.RandomState(seed)
    n_obj = max(1, n_total // per_obj)
    cy = rng.uniform(20, img - 20, n_obj)
    cx = rng.uniform(20, img - 20, n_obj)
    r = rng.uniform(*r_range, n_obj)
    k = rng.randint(0, n_obj, n_total)
    jitter = rng.normal(0, 2.0, (n_total, 2))
    points = np.stack([cy[k], cx[k]], 1) + jitter
    base = r[k][:, None] * rng.uniform(0.85, 1.15, (n_total, n_rays))
    prob = np.clip(rng.uniform(0.5, 1.0, n_total), 0, 1)
    ind = np.argsort(prob, kind="stable")[::-1]
    return (base[ind].astype(np.float32), points[ind].astype(np.float32),
            prob[ind].astype(np.float32))


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16384, 65536, 131072, 262144]
    import jax
    print("backend:", jax.default_backend(), file=sys.stderr)
    from stardist_tpu.ops.nms import nms_polygons

    for n in sizes:
        dist, points, prob = clustered_candidates(n)
        # warmup/compile
        t0 = time.perf_counter()
        keep = nms_polygons(dist, points, scores=prob, thresh=0.4, device_nms=True)
        t_warm = time.perf_counter() - t0
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            keep = nms_polygons(dist, points, scores=prob, thresh=0.4, device_nms=True)
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(f"N={n:7d}: {t*1e3:8.1f} ms ({n/t/1e6:6.2f} Mcand/s), "
              f"survivors={int(keep.sum())}, warmup={t_warm:.1f}s")


if __name__ == "__main__":
    main()
