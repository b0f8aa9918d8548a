"""Star-convex polygon geometry (2D) — vectorized JAX primitives.

A star polygon is given by a center point (row, col) and ``n_rays`` radial
distances along equiangular directions phi_k = 2*pi*k/R with vertex offsets
(row, col) = d_k * (sin phi_k, cos phi_k) (reference convention,
stardist/geometry/geom2d.py:130-146).

The point-in-polygon test exploits star-convexity: a query point at polar
angle theta (relative to the center) lies in exactly one angular wedge
[phi_k, phi_{k+1}); it is inside the polygon iff it is on the center side of
the edge (v_k, v_{k+1}). This is O(1) per point — no loop over vertices.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def ray_angles_jnp(n_rays):
    return (2 * np.pi / n_rays) * jnp.arange(n_rays, dtype=jnp.float32)


def polygon_vertices(dist, points):
    """Vertices of star polygons. dist (..., R), points (..., 2) -> (..., R, 2)."""
    R = dist.shape[-1]
    phis = ray_angles_jnp(R)
    dirs = jnp.stack([jnp.sin(phis), jnp.cos(phis)], axis=-1)  # (R, 2)
    return points[..., None, :] + dist[..., None] * dirs


def polygon_areas(dist):
    """Exact area of equiangular star polygons: 0.5*sin(2pi/R)*sum_k d_k*d_{k+1}."""
    R = dist.shape[-1]
    d_next = jnp.roll(dist, -1, axis=-1)
    return 0.5 * jnp.sin(2 * np.pi / R) * jnp.sum(dist * d_next, axis=-1)


def points_in_polygons(dist, points, query):
    """Vectorized point-in-star-polygon test.

    dist   : (..., R)    radial distances
    points : (..., 2)    polygon centers (row, col)
    query  : (..., S, 2) query points (row, col), batch dims broadcast
    returns: (..., S) bool
    """
    R = dist.shape[-1]
    dphi = 2 * np.pi / R
    u = query - points[..., None, :]  # (..., S, 2) rel. center
    theta = jnp.arctan2(u[..., 0], u[..., 1])  # row ~ sin, col ~ cos
    theta = jnp.mod(theta, 2 * np.pi)
    k = jnp.clip(jnp.floor(theta / dphi).astype(jnp.int32), 0, R - 1)  # (..., S)
    k1 = jnp.where(k + 1 >= R, 0, k + 1)

    d0 = jnp.take_along_axis(dist, k, axis=-1)  # (..., S)
    d1 = jnp.take_along_axis(dist, k1, axis=-1)
    phi0 = k.astype(jnp.float32) * dphi
    phi1 = (k + 1).astype(jnp.float32) * dphi
    # edge endpoints relative to center
    v0r = d0 * jnp.sin(phi0)
    v0c = d0 * jnp.cos(phi0)
    v1r = d1 * jnp.sin(phi1)
    v1c = d1 * jnp.cos(phi1)
    er = v1r - v0r
    ec = v1c - v0c
    # point on the same side of the edge as the center (cross products)
    cross_p = er * (u[..., 1] - v0c) - ec * (u[..., 0] - v0r)
    cross_c = er * (0.0 - v0c) - ec * (0.0 - v0r)
    return cross_p * cross_c >= 0


def polygon_bboxes(dist, points):
    """Axis-aligned bounding boxes. Returns (lo, hi) each (..., 2)."""
    v = polygon_vertices(dist, points)
    return v.min(axis=-2), v.max(axis=-2)
