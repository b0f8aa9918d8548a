"""Per-stage timing of the fused onepass NMS at production candidate counts.

Times (warm): the striped peel alone, the full onepass, and micro-pieces
(one multi-operand sort, the dense bound sweeps) to locate the cost.

Usage: python examples/profile_nms_onepass.py [N]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_nms import clustered_candidates  # noqa: E402


def timeit(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), file=sys.stderr)
    import stardist_tpu  # enables the persistent compile cache
    from stardist_tpu.ops import nms as N

    dist, points, prob = clustered_candidates(n)
    rank = np.arange(n, dtype=np.int32)
    T = 2.0 * float(dist.max()) + 1.0

    # peel alone
    t = timeit(lambda: jax.device_get(
        N._peel_2d_striped(dist, points, rank, 0.4, T)))
    defsurv, killed = N._peel_2d_striped(dist, points, rank, 0.4, T)
    ds, kd = int(np.asarray(defsurv).sum()), int(np.asarray(killed).sum())
    print(f"peel alone:        {t*1e3:8.1f} ms (defsurv={ds} killed={kd} "
          f"rem={n-kd})", flush=True)

    # one big multi-operand sort (the re-band compaction primitive)
    key = jnp.asarray(points[:, 0].copy())
    py = jnp.asarray(points[:, 0].copy())
    px = jnp.asarray(points[:, 1].copy())
    rk = jnp.asarray(rank)
    bi = jnp.arange(n, dtype=jnp.int32)
    srt = jax.jit(lambda *a: jax.lax.sort(a, dimension=0, num_keys=1))
    t = timeit(lambda: jax.block_until_ready(srt(key, py, px, rk, bi)) and None
               or jax.device_get(srt(key, py, px, rk, bi)[0][:1]))
    print(f"5-operand sort:    {t*1e3:8.1f} ms", flush=True)

    # a (Npad, R) gather by permutation (used twice in onepass)
    dj = jnp.asarray(dist)
    perm = jnp.asarray(np.random.RandomState(0).permutation(n).astype(np.int32))
    gat = jax.jit(lambda d, p: jnp.take(d, p, axis=0))
    t = timeit(lambda: jax.device_get(gat(dj, perm)[:1, :1]))
    print(f"(N,R) row gather:  {t*1e3:8.1f} ms", flush=True)

    # full onepass
    t = timeit(lambda: N._nms_polygons_device_onepass(dist, points, 0.4))
    print(f"full onepass:      {t*1e3:8.1f} ms "
          f"(counters={dict(N.LAST_NMS_COUNTERS)})", flush=True)


if __name__ == "__main__":
    main()
