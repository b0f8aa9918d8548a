"""3D star-convex distance computation (ray casting) on TPU via JAX.

TPU-native equivalent of the reference C++ kernel ``c_star_dist3d``
(stardist/lib/stardist3d.cpp:245-346): per grid-th voxel, march along the
given unit ray directions until leaving the object; the distance is computed
from the *rounded* endpoint (no overshoot correction — a deliberate
difference from 2D in the reference, stardist3d.cpp:317-320).

Design notes (TPU): gather-free shift-compare formulation — every march step
compares the label volume against a uniformly shifted copy (one
dynamic-slice per ray). Since the reference's 3D distance is computed from
the *rounded* offsets anyway, the shift formulation reproduces the C++
distances exactly (offset rounding == endpoint rounding for integer voxel
centers, up to exact-half ties).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2, 3))
def _star_dist3d_impl(lbl, dirs, grid, max_dist):
    D, H, W = lbl.shape
    gz, gy, gx = grid
    vals = lbl[::gz, ::gy, ::gx]
    Do, Ho, Wo = vals.shape
    R = dirs.shape[0]

    P = max_dist + 1
    max_steps = int(math.ceil(1.75 * P)) + 2  # 3D: max |component| >= 1/sqrt(3)
    lbl_pad = jnp.pad(lbl, P, constant_values=-1)

    fg = vals > 0
    alive0 = jnp.broadcast_to(fg[..., None], (Do, Ho, Wo, R))
    dist0 = jnp.zeros((Do, Ho, Wo, R), jnp.float32)

    def cond(carry):
        t, alive, _ = carry
        return jnp.logical_and(t <= max_steps, jnp.any(alive))

    def body(carry):
        t, alive, dist = carry
        tf = t.astype(jnp.float32)
        oz = jnp.round(tf * dirs[:, 0])
        oy = jnp.round(tf * dirs[:, 1])
        ox = jnp.round(tf * dirs[:, 2])
        ozi = oz.astype(jnp.int32)
        oyi = oy.astype(jnp.int32)
        oxi = ox.astype(jnp.int32)

        def one_ray(o_z, o_y, o_x):
            shifted = jax.lax.dynamic_slice(lbl_pad, (P + o_z, P + o_y, P + o_x), (D, H, W))
            return shifted[::gz, ::gy, ::gx]

        shifted = jax.vmap(one_ray, out_axes=-1)(ozi, oyi, oxi)  # (Do,Ho,Wo,R)
        same = shifted == vals[..., None]
        newly = alive & ~same
        # distance from the rounded endpoint (reference stardist3d.cpp:317-320)
        d = jnp.sqrt(oz * oz + oy * oy + ox * ox)  # (R,)
        dist = jnp.where(newly, d, dist)
        return t + 1, alive & same, dist

    _, alive, dist = jax.lax.while_loop(cond, body, (jnp.int32(1), alive0, dist0))
    # rays still alive at the step cap (object larger than max_dist) report
    # the documented cap, not 0; terminations past the sentinel ring (shifted
    # slices clamp there) are clamped to the same cap
    cap = jnp.float32(max_dist)
    return jnp.minimum(jnp.where(alive, cap, dist), cap)


_MAX_DIST_CAP_3D = 160  # default cap for large volumes (documented)


def _default_max_dist(shape):
    return min(int(math.ceil(math.sqrt(sum(s * s for s in shape)))) + 2,
               _MAX_DIST_CAP_3D)


def star_dist3d_jax(lbl, rays, grid=(1, 1, 1), max_dist=None):
    """Compute 3D star distances on device; returns numpy float32 of shape
    ((D-1)//gz+1, (H-1)//gy+1, (W-1)//gx+1, n_rays). Distances are capped at
    ``max_dist`` (default: volume diagonal, at most 160 voxels)."""
    lbl = np.asarray(lbl)
    if max_dist is None:
        max_dist = _default_max_dist(lbl.shape)
    dirs = jnp.asarray(np.asarray(rays.vertices, np.float32))
    out = _star_dist3d_impl(jnp.asarray(lbl.astype(np.int32)), dirs,
                            tuple(int(g) for g in grid), int(max_dist))
    return np.asarray(out)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _star_dist3d_batch_impl(lbls, dirs, grid, max_dist):
    return jax.vmap(lambda l: _star_dist3d_impl(l, dirs, grid, max_dist))(lbls)


def star_dist3d_batch(lbls, rays, grid=(1, 1, 1), max_dist=None):
    """Batched star distances (B,D,H,W) -> (B,Do,Ho,Wo,R) in one device call."""
    lbls = np.asarray(lbls)
    if max_dist is None:
        max_dist = _default_max_dist(lbls.shape[1:])
    dirs = jnp.asarray(np.asarray(rays.vertices, np.float32))
    out = _star_dist3d_batch_impl(jnp.asarray(lbls.astype(np.int32)), dirs,
                                  tuple(int(g) for g in grid), int(max_dist))
    return np.asarray(out)


def star_dist3d_numpy(lbl, rays, grid=(1, 1, 1)):
    """Pure-NumPy oracle with identical semantics (offset rounding)."""
    lbl = np.asarray(lbl)
    D, H, W = lbl.shape
    gz, gy, gx = grid
    vals = lbl[::gz, ::gy, ::gx]
    Do, Ho, Wo = vals.shape
    dirs = np.asarray(rays.vertices, np.float32)
    R = len(dirs)
    dst = np.zeros((Do, Ho, Wo, R), np.float32)
    for i in range(Do):
        for j in range(Ho):
            for k in range(Wo):
                v = vals[i, j, k]
                if v == 0:
                    continue
                for n in range(R):
                    t = 0
                    while True:
                        t += 1
                        tf = np.float32(t)
                        oz, oy, ox = np.round(tf * dirs[n])
                        ii = i * gz + int(oz)
                        jj = j * gy + int(oy)
                        kk = k * gx + int(ox)
                        if (ii < 0 or ii >= D or jj < 0 or jj >= H
                                or kk < 0 or kk >= W or lbl[ii, jj, kk] != v):
                            dst[i, j, k, n] = np.sqrt(oz * oz + oy * oy + ox * ox)
                            break
    return dst
