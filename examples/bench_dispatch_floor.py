"""Measure the per-dispatch latency floor of the TPU tunnel vs real marginal
compute cost: each candidate op is run once per dispatch and then N times
inside a fori_loop in ONE dispatch — the slope (tN - t1)/(N-1) is the true
on-device cost, the intercept is the tunnel/dispatch overhead.

Usage: python examples/bench_dispatch_floor.py
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, n=5):
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
    import stardist_tpu  # noqa: F401  compile cache
    rng = np.random.RandomState(0)
    sync = lambda x: jax.device_get(jnp.ravel(x)[:1])

    # absolute floor: trivial op
    x = jnp.float32(1.0)
    f0 = jax.jit(lambda x: x + 1)
    print(f"floor (x+1):           {t(lambda: sync(f0(x))):8.2f} ms", flush=True)

    def loopify(step, reps):
        @functools.partial(jax.jit, static_argnums=(1,))
        def run(args, reps):
            def body(i, c):
                return step(i, c)
            return jax.lax.fori_loop(0, reps, body, args)
        return run

    # sort 262k 2-op, loop 8x
    k = jnp.asarray(rng.rand(262144).astype(np.float32))
    i0 = jnp.arange(262144, dtype=jnp.int32)
    def sort_step(i, c):
        k, idx = c
        k2, idx2 = jax.lax.sort((k + 1e-9 * i, idx), dimension=0, num_keys=1)
        return k2, idx2
    run = loopify(sort_step, 8)
    t1 = t(lambda: sync(run((k, i0), 1)[0]))
    t8 = t(lambda: sync(run((k, i0), 8)[0]))
    print(f"sort262k 2op: t1={t1:7.2f} t8={t8:7.2f} -> {(t8-t1)/7:7.2f} ms/op", flush=True)

    # sort 262k 5-op
    ops5 = tuple(jnp.asarray(rng.rand(262144).astype(np.float32)) for _ in range(4))
    def sort5_step(i, c):
        k = c[0] + 1e-9 * i
        out = jax.lax.sort((k,) + c[1:], dimension=0, num_keys=1)
        return out
    run = loopify(sort5_step, 8)
    args = (k,) + ops5
    t1 = t(lambda: sync(run(args, 1)[0]))
    t8 = t(lambda: sync(run(args, 8)[0]))
    print(f"sort262k 5op: t1={t1:7.2f} t8={t8:7.2f} -> {(t8-t1)/7:7.2f} ms/op", flush=True)

    # gather (262k,32) rows
    feat = jnp.asarray(rng.rand(262144, 32).astype(np.float32))
    idx = jnp.asarray(rng.permutation(262144).astype(np.int32))
    def gather_step(i, c):
        f, ix = c
        g = jnp.take(f, (ix + i) % 262144, axis=0)
        return g, ix
    run = loopify(gather_step, 8)
    t1 = t(lambda: sync(run((feat, idx), 1)[0]))
    t8 = t(lambda: sync(run((feat, idx), 8)[0]))
    print(f"gather(262k,32): t1={t1:7.2f} t8={t8:7.2f} -> {(t8-t1)/7:7.2f} ms/op", flush=True)

    # dense reach (64,256,768) fused bounds
    G, Q, W = 64, 256, 768
    p_r = jnp.asarray(rng.rand(G, Q, 2).astype(np.float32) * 4096)
    p_c = jnp.asarray(rng.rand(G, W, 2).astype(np.float32) * 4096)
    r_r = jnp.asarray(rng.rand(G, Q).astype(np.float32) * 14)
    r_c = jnp.asarray(rng.rand(G, W).astype(np.float32) * 14)
    def reach_step(i, c):
        p_r, p_c, r_r, r_c, acc = c
        d2 = jnp.sum((p_r[:, :, None] - p_c[:, None]) ** 2, axis=-1)
        rr = r_r[:, :, None] + r_c[:, None] + 1e-9 * i
        acc = acc + jnp.sum(d2 < rr * rr, axis=(1, 2))
        return p_r, p_c, r_r, r_c, acc
    run = loopify(reach_step, 32)
    args = (p_r, p_c, r_r, r_c, jnp.zeros((G,), jnp.int32))
    t1 = t(lambda: sync(run(args, 1)[-1]))
    t32 = t(lambda: sync(run(args, 32)[-1]))
    print(f"reach(64,256,768): t1={t1:7.2f} t32={t32:7.2f} -> {(t32-t1)/31:7.2f} ms/op", flush=True)

    # PIP acc 512k x16 samples
    from stardist_tpu.ops.nms2d_fast import points_in_polygons_acc
    P = 2 ** 19
    d = jnp.asarray(rng.uniform(4, 10, (P, 32)).astype(np.float32))
    c = jnp.asarray(rng.uniform(0, 100, (P, 2)).astype(np.float32))
    q = c[:, None, :] + jnp.asarray(rng.uniform(-8, 8, (P, 16, 2)).astype(np.float32))
    def pip_step(i, carry):
        d, c, q, acc = carry
        r = points_in_polygons_acc(d, c, q + 1e-9 * i)
        return d, c, q, acc + jnp.sum(r, axis=-1)
    run = loopify(pip_step, 8)
    args = (d, c, q, jnp.zeros((P,), jnp.int32))
    t1 = t(lambda: sync(run(args, 1)[-1]))
    t8 = t(lambda: sync(run(args, 8)[-1]))
    print(f"PIPacc 512kx16: t1={t1:7.2f} t8={t8:7.2f} -> {(t8-t1)/7:7.2f} ms/op", flush=True)

    # scatter: 2.6M masked source -> 65k slots
    flags = jnp.asarray((rng.rand(2 ** 21) < 0.01))
    vals = jnp.arange(2 ** 21, dtype=jnp.int32)
    def scat_step(i, c):
        flags, vals, out = c
        pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
        pos = jnp.where(flags, pos, 2 ** 16)
        out = jnp.zeros(2 ** 16, jnp.int32).at[pos].set(vals + i, mode="drop")
        return flags, vals, out
    run = loopify(scat_step, 8)
    args = (flags, vals, jnp.zeros(2 ** 16, jnp.int32))
    t1 = t(lambda: sync(run(args, 1)[-1]))
    t8 = t(lambda: sync(run(args, 8)[-1]))
    print(f"cumsum+scatter 2M->64k: t1={t1:7.2f} t8={t8:7.2f} -> {(t8-t1)/7:7.2f} ms/op", flush=True)

    # fori_loop per-step overhead: 2048 trivial steps
    def triv_step(i, c):
        return c + jnp.float32(i)
    run = loopify(triv_step, 2048)
    t1 = t(lambda: sync(run(jnp.float32(0), 16)))
    t2k = t(lambda: sync(run(jnp.float32(0), 2048)))
    print(f"fori trivial: t16={t1:7.2f} t2048={t2k:7.2f} -> "
          f"{(t2k-t1)/2032*1000:7.1f} us/step", flush=True)

    # fori_loop with small dynamic-slice work per step (the per-block pattern)
    big = jnp.asarray(rng.rand(2 ** 21).astype(np.float32))
    def slice_step(i, c):
        b, acc = c
        s = jax.lax.dynamic_slice_in_dim(b, i * 256 % (2 ** 20), 256, 0)
        return b, acc + jnp.sum(s)
    run = loopify(slice_step, 2048)
    t16 = t(lambda: sync(run((big, jnp.float32(0)), 16)[-1]))
    t2k = t(lambda: sync(run((big, jnp.float32(0)), 2048)[-1]))
    print(f"fori dynslice: t16={t16:7.2f} t2048={t2k:7.2f} -> "
          f"{(t2k-t16)/2032*1000:7.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
