"""Shared clustered-candidate generator for NMS benchmarks."""
import numpy as np


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
