"""Profile the device-NMS kernel stages in isolation on the current backend."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import jax
import jax.numpy as jnp

from bench_nms_data import clustered_candidates  # noqa: E402


def timeit(f, *args, n=3):
    r = f(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from stardist_tpu.ops.nms import (_lens_area_lb, _lens_area_ub,
                                      _inner_radius_2d, _greedy_fixpoint)
    from stardist_tpu.ops.polygon import (polygon_areas, polygon_bboxes,
                                          points_in_polygons)

    N = 16384
    B = 256
    A = 512
    S = 16
    thresh = 0.4
    dist, points, prob = clustered_candidates(N)
    d = jnp.asarray(dist)
    p = jnp.asarray(points)
    valid = jnp.ones(N, bool)

    lo, hi = polygon_bboxes(d, p)
    area = polygon_areas(d)
    rin = _inner_radius_2d(d)
    rout = jnp.max(d, axis=-1)

    # ---- stage 1: bounds only, all blocks, full matrix ----
    @jax.jit
    def bounds_matrix(d, p, lo, hi, area, rin, rout):
        col_ids = jnp.arange(N)

        def blk(b, acc):
            i0 = b * B
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, B, 0)
            ext = jnp.maximum(jnp.minimum(sl(hi)[:, None], hi[None]) -
                              jnp.maximum(sl(lo)[:, None], lo[None]), 0.0)
            bbox_inter = ext[..., 0] * ext[..., 1]
            dc = jnp.sqrt(jnp.sum((sl(p)[:, None] - p[None]) ** 2, axis=-1))
            denom = jnp.minimum(sl(area)[:, None], area[None]) + 1e-10
            ub = jnp.minimum(_lens_area_ub(sl(rout)[:, None], rout[None], dc), bbox_inter) / denom
            lb = _lens_area_lb(sl(rin)[:, None], rin[None], dc) / denom
            pair_ok = col_ids[None] > (i0 + jnp.arange(B))[:, None]
            sup = (lb > thresh) & pair_ok
            amb = ~sup & ~(ub <= thresh) & pair_ok
            acc = jax.lax.dynamic_update_slice_in_dim(acc[0], sup, i0, 0), \
                jax.lax.dynamic_update_slice_in_dim(acc[1], amb, i0, 0)
            return acc

        sup0 = jnp.zeros((N, N), bool)
        amb0 = jnp.zeros((N, N), bool)
        return jax.lax.fori_loop(0, N // B, blk, (sup0, amb0))

    t = timeit(bounds_matrix, d, p, lo, hi, area, rin, rout)
    print(f"bounds matrix ({N}x{N}, blocks of {B}): {t*1e3:.1f} ms")
    sup_mat, amb_mat = bounds_matrix(d, p, lo, hi, area, rin, rout)
    print(f"  sup pairs: {int(sup_mat.sum())}, ambiguous pairs: {int(amb_mat.sum())}, "
          f"max amb/row: {int(jnp.max(jnp.sum(amb_mat, 1)))}")

    # ---- stage 2: fixpoint on the matrix ----
    t = timeit(lambda s: _greedy_fixpoint(s, valid), sup_mat)
    print(f"jacobi fixpoint: {t*1e3:.1f} ms")

    # ---- stage 3: per-row nonzero compaction ----
    @jax.jit
    def compaction(amb):
        def blk(b, acc):
            i0 = b * B
            a = jax.lax.dynamic_slice_in_dim(amb, i0, B, 0)
            idx = jax.vmap(lambda m: jnp.nonzero(m, size=A, fill_value=N)[0])(a)
            return acc + jnp.sum(idx)

        return jax.lax.fori_loop(0, N // B, blk, jnp.int64(0) if jax.config.jax_enable_x64 else jnp.int32(0))

    t = timeit(compaction, amb_mat)
    print(f"nonzero compaction (vmap, {N//B} blocks x {B} rows): {t*1e3:.1f} ms")

    # ---- stage 3b: top_k compaction alternative ----
    @jax.jit
    def compaction_topk(amb):
        col_ids = jnp.arange(N, dtype=jnp.int32)

        def blk(b, acc):
            i0 = b * B
            a = jax.lax.dynamic_slice_in_dim(amb, i0, B, 0)
            # keys: ambiguous columns get their (negated) index; others sink
            keys = jnp.where(a, N - col_ids[None, :], 0)
            vals, idx = jax.lax.top_k(keys, A)
            return acc + jnp.sum(idx)

        return jax.lax.fori_loop(0, N // B, blk, jnp.int32(0))

    t = timeit(compaction_topk, amb_mat)
    print(f"top_k compaction: {t*1e3:.1f} ms")

    # ---- stage 4: gather rows ----
    idx_c = jnp.minimum(jax.vmap(lambda m: jnp.nonzero(m, size=A, fill_value=N)[0])(
        amb_mat[:B]), N - 1)

    @jax.jit
    def gather_rows(d, idx_c):
        return d[idx_c].sum()

    t = timeit(gather_rows, d, idx_c)
    print(f"gather (B={B}, A={A}) of (N,{d.shape[1]}) rows: {t*1e3:.1f} ms")

    # ---- stage 5: exact sampled overlap on (B, A) pairs ----
    s_grid = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S

    @jax.jit
    def exact_pairs(d, p, lo, hi, area, idx_c):
        R = d.shape[1]
        d_r, p_r = d[:B], p[:B]
        lo_r, hi_r, a_r = lo[:B], hi[:B], area[:B]
        d_c = d[idx_c]
        p_c = p[idx_c]
        lo_c = lo[idx_c]
        hi_c = hi[idx_c]
        a_c = area[idx_c]
        plo = jnp.maximum(lo_r[:, None], lo_c)
        phi = jnp.minimum(hi_r[:, None], hi_c)
        extp = jnp.maximum(phi - plo, 0.0)
        qr = plo[..., 0, None, None] + s_grid[:, None] * extp[..., 0, None, None]
        qc = plo[..., 1, None, None] + s_grid[None, :] * extp[..., 1, None, None]
        q = jnp.stack(jnp.broadcast_arrays(qr, qc), axis=-1).reshape(B, A, S * S, 2)
        in_r = points_in_polygons(
            jnp.broadcast_to(d_r[:, None], (B, A, R)),
            jnp.broadcast_to(p_r[:, None], (B, A, 2)), q)
        in_c = points_in_polygons(d_c, p_c, q)
        frac = jnp.mean(in_r & in_c, axis=-1)
        inter = frac * extp[..., 0] * extp[..., 1]
        return (inter / (jnp.minimum(a_r[:, None], a_c) + 1e-10) > thresh).sum()

    t = timeit(exact_pairs, d, p, lo, hi, area, idx_c)
    print(f"exact sampled overlap ONE block (B={B}, A={A}, S={S}): {t*1e3:.1f} ms "
          f"(x{N//B} blocks = {t*1e3*(N//B):.0f} ms)")


if __name__ == "__main__":
    main()
