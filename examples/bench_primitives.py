"""Micro-benchmarks of the XLA primitives the NMS kernels are built from,
at production sizes — measured on the real chip to drive kernel design
(sorts/top_k/compaction/PIP estimator variants).

Usage: python examples/bench_primitives.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import stardist_tpu  # compile cache
    rng = np.random.RandomState(0)
    sync = lambda x: jax.device_get(x.ravel()[:1])

    # 1-key sorts at several sizes
    for n in (262144, 2 ** 21):
        k = jnp.asarray(rng.rand(n).astype(np.float32))
        i = jnp.arange(n, dtype=jnp.int32)
        f = jax.jit(lambda k, i: jax.lax.sort((k, i), dimension=0, num_keys=1))
        print(f"sort2op   n={n:8d}: {t(lambda: sync(f(k, i)[0])):8.1f} ms", flush=True)

    # top_k at the compaction shapes
    for (n, kk) in ((2 ** 21, 2 ** 19), (2 ** 21, 2 ** 15), (262144, 2 ** 15)):
        v = jnp.asarray(rng.rand(n).astype(np.float32))
        f = jax.jit(lambda v: jax.lax.top_k(v, kk))
        print(f"top_k     n={n:8d} k={kk:6d}: {t(lambda: sync(f(v)[0])):8.1f} ms", flush=True)

    # batched per-row top_k (the cheap compaction)
    v = jnp.asarray(rng.rand(131072, 384).astype(np.float32))
    f = jax.jit(lambda v: jax.lax.top_k(v, 16))
    print(f"top_k rows (131072,384)->16: {t(lambda: sync(f(v)[0])):8.1f} ms", flush=True)

    # cumsum + searchsorted compaction of 2.4M flags -> 512k indices
    flags = jnp.asarray((rng.rand(2 ** 21) < 0.2).astype(np.int32))
    def compact(flags):
        pos = jnp.cumsum(flags)
        return jnp.searchsorted(pos, jnp.arange(1, 2 ** 19 + 1))
    f = jax.jit(compact)
    print(f"cumsum+searchsorted 2M->512k: {t(lambda: sync(f(flags))):8.1f} ms", flush=True)

    # gathers: (N, 40) f32 rows by random index
    feat = jnp.asarray(rng.rand(262144, 40).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 262144, 2 ** 19).astype(np.int32))
    f = jax.jit(lambda a, i: jnp.take(a, i, axis=0))
    print(f"row gather (262k,40)[512k]: {t(lambda: sync(f(feat, idx))):8.1f} ms", flush=True)

    # PIP estimators on a 512k-pair batch, 16 samples each
    from stardist_tpu.ops.polygon import points_in_polygons
    from stardist_tpu.ops.nms2d_fast import points_in_polygons_acc
    P = 2 ** 19
    d = jnp.asarray(rng.uniform(4, 10, (P, 32)).astype(np.float32))
    c = jnp.asarray(rng.uniform(0, 100, (P, 2)).astype(np.float32))
    q = c[:, None, :] + jnp.asarray(rng.uniform(-8, 8, (P, 16, 2)).astype(np.float32))
    f1 = jax.jit(lambda d, c, q: points_in_polygons(d, c, q))
    f2 = jax.jit(lambda d, c, q: points_in_polygons_acc(d, c, q))
    print(f"PIP onehot 512k x16: {t(lambda: sync(f1(d, c, q))):8.1f} ms", flush=True)
    print(f"PIP acc    512k x16: {t(lambda: sync(f2(d, c, q))):8.1f} ms", flush=True)

    # dense band bounds: batched (G=64, Q=256, W=768) sweep x 16 groups
    G, Q, W = 64, 256, 768
    p_r = jnp.asarray(rng.rand(G, Q, 2).astype(np.float32) * 4096)
    p_c = jnp.asarray(rng.rand(G, W, 2).astype(np.float32) * 4096)
    r_r = jnp.asarray(rng.rand(G, Q).astype(np.float32) * 14)
    r_c = jnp.asarray(rng.rand(G, W).astype(np.float32) * 14)
    def bounds(p_r, p_c, r_r, r_c):
        d2 = jnp.sum((p_r[:, :, None] - p_c[:, None]) ** 2, axis=-1)
        rr = r_r[:, :, None] + r_c[:, None]
        return jnp.sum(d2 < rr * rr, axis=(1, 2))
    f4 = jax.jit(bounds)
    print(f"dense reach (64,256,768): {t(lambda: sync(f4(p_r, p_c, r_r, r_c))):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
