"""Star-convex polyhedron geometry (3D) — vectorized JAX primitives.

A star polyhedron is given by a center (z, y, x), per-ray radial distances
and a Rays triangulation (unit ``vertices`` (R,3) + ``faces`` (F,3)). It is
exactly the union of the tetrahedra (center, A_f, B_f, C_f) over all faces f
— the same decomposition used by the reference ``inside_polyhedron``
(stardist/lib/stardist3d_impl.cpp:153-191).

The point-in-polyhedron test solves for barycentric coordinates of the query
point (relative to the center) in each face tetrahedron using precomputed
inverse matrices; inside iff any face yields alpha,beta,gamma >= 0 with
alpha+beta+gamma <= 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def polyhedron_vertices(dist, points, ray_dirs):
    """dist (..., R), points (..., 3), ray_dirs (R, 3) -> (..., R, 3)."""
    return points[..., None, :] + dist[..., None] * ray_dirs


def polyhedron_volumes(dist, ray_dirs, faces):
    """Signed-tetra-sum volume (matches reference rays3d.py:76-107)."""
    v = dist[..., None] * ray_dirs  # (..., R, 3)
    tri = v[..., faces, :]          # (..., F, 3, 3)
    det = jnp.linalg.det(tri)
    return -1.0 / 6.0 * jnp.sum(det, axis=-1)


def polyhedron_face_inverses(dist, ray_dirs, faces, eps=1e-12):
    """Per-face inverse matrices for barycentric point tests.

    dist (..., R), ray_dirs (R,3), faces (F,3) ->
      inv   (..., F, 3, 3) rows of inverse(M) with M = [A B C] columns
      valid (..., F) bool (non-degenerate faces)
    """
    v = dist[..., None] * ray_dirs                       # (..., R, 3)
    tri = v[..., faces, :]                               # (..., F, 3(vert), 3(coord))
    # columns of M are the three vertices: M[c, vert]
    M = jnp.swapaxes(tri, -1, -2)                        # (..., F, 3(coord), 3(vert))
    det = jnp.linalg.det(M)
    valid = jnp.abs(det) > eps
    safe_det = jnp.where(valid, det, 1.0)
    # adjugate via cross products of columns
    a = M[..., :, 0]
    b = M[..., :, 1]
    c = M[..., :, 2]
    r0 = jnp.cross(b, c)
    r1 = jnp.cross(c, a)
    r2 = jnp.cross(a, b)
    inv = jnp.stack([r0, r1, r2], axis=-2) / safe_det[..., None, None]
    return inv, valid


def points_in_polyhedra(inv, valid, points, query, eps=1e-7, face_block=8):
    """Vectorized point-in-star-polyhedron test using precomputed inverses.

    inv    : (..., F, 3, 3)
    valid  : (..., F)
    points : (..., 3) centers
    query  : (..., S, 3)
    returns: (..., S) bool

    Streams over blocks of faces to bound the (..., S, F, 3) intermediate —
    peak memory is (..., S, face_block, 3).
    """
    u = query - points[..., None, :]                     # (..., S, 3)
    F = inv.shape[-3]
    inside = jnp.zeros(u.shape[:-1], bool)
    for f0 in range(0, F, face_block):
        f1 = min(f0 + face_block, F)
        inv_b = inv[..., f0:f1, :, :]
        valid_b = valid[..., f0:f1]
        # bary (..., S, fb, 3) = inv_b (..., fb, 3, 3) @ u (..., S, 3)
        # HIGHEST precision: default TPU matmul truncates to bfloat16, whose
        # ~1e-3 relative error would swamp the eps=1e-7 inside tolerance
        bary = jnp.einsum("...fij,...sj->...sfi", inv_b, u,
                          precision=jax.lax.Precision.HIGHEST)
        ge0 = jnp.all(bary >= -eps, axis=-1)
        le1 = jnp.sum(bary, axis=-1) <= 1 + eps
        ok = ge0 & le1 & valid_b[..., None, :]
        inside = inside | jnp.any(ok, axis=-1)
    return inside


def polyhedron_bboxes(dist, points, ray_dirs):
    v = polyhedron_vertices(dist, points, ray_dirs)
    return v.min(axis=-2), v.max(axis=-2)


def polyhedron_inner_radius(dist, ray_dirs, faces):
    """Lower bound for the inscribed-sphere radius: min distance from the
    center to any face plane (cf. reference bounding_radius_inner,
    stardist3d_impl.cpp:343-467)."""
    v = dist[..., None] * ray_dirs
    tri = v[..., faces, :]  # (..., F, 3, 3)
    a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    n = jnp.cross(b - a, c - a)
    nn = jnp.linalg.norm(n, axis=-1)
    d = jnp.abs(jnp.sum(n * a, axis=-1)) / jnp.maximum(nn, 1e-10)
    return jnp.min(d, axis=-1)
