"""2D geometry API: star distances, polar->cartesian, label rendering.

Mirrors the reference public surface (stardist/geometry/geom2d.py) with the
compute mapped to TPU kernels:
- ``star_dist``: JAX ray-march kernel (mode='jax'/'tpu'; 'numpy' oracle).
- ``polygons_to_label``: splatting rasterizer with the reference's
  order semantics — polygons are rendered in ascending probability order and
  later polygons overwrite earlier ones (geom2d.py:169-197); label ids are
  consecutive in the given candidate order.
"""
from __future__ import annotations

import numpy as np

from ..matching import _check_label_array
from ..utils import _normalize_grid, regions
from ..ops.stardist2d import star_dist2d_jax, star_dist2d_numpy
from ..ops.rasterize import rasterize_polygons


def ray_angles(n_rays=32):
    return np.linspace(0, 2 * np.pi, n_rays, endpoint=False)


def star_dist(a, n_rays=32, grid=(1, 1), mode="jax"):
    """Star-convex distances of a label image ('a'; id 0 = background).

    Output shape ((H-1)//gy+1, (W-1)//gx+1, n_rays) float32.
    """
    if not (np.isscalar(n_rays) and 0 < int(n_rays)):
        raise ValueError("need 'n_rays' >= 1")
    if n_rays < 3:
        raise ValueError("need 'n_rays' >= 3")
    n_rays = int(n_rays)
    grid = _normalize_grid(grid, 2)
    a = np.asarray(a)
    if mode in ("jax", "tpu", "cpp", "opencl"):
        # 'cpp'/'opencl' accepted for reference API compatibility
        return star_dist2d_jax(a, n_rays, grid=grid)
    elif mode in ("numpy", "python"):
        return star_dist2d_numpy(a, n_rays, grid=grid)
    else:
        raise ValueError(f"Unknown mode {mode}")


def dist_to_coord(dist, points, scale_dist=(1, 1)):
    """Polar to cartesian: (n_polys, n_rays), (n_polys, 2) -> (n_polys, 2, n_rays)."""
    dist = np.asarray(dist)
    points = np.asarray(points)
    assert dist.ndim == 2 and points.ndim == 2 and len(dist) == len(points) \
        and points.shape[1] == 2 and len(scale_dist) == 2
    phis = ray_angles(dist.shape[1])
    coord = (dist[:, np.newaxis] * np.array([np.sin(phis), np.cos(phis)])).astype(np.float32)
    coord *= np.asarray(scale_dist).reshape(1, 2, 1)
    coord += points[..., np.newaxis]
    return coord


def _use_native_raster(env_var, scale_dist=(1, 1), shape=None, n_polys=None):
    """Host-native rasterization wins when the device is behind a slow
    device->host link (the full label image must come back either way):
    render the few surviving polygons/polyhedra on the host instead of
    downloading the image. Auto mode compares the estimated label-image
    download time (image size / measured D2H bandwidth) against the
    estimated host render time (~per-polygon cost x survivor count);
    overridable via ``env_var`` = native|device|auto."""
    import os
    mode = os.environ.get(env_var, "auto")
    if mode == "device":
        return False
    if tuple(scale_dist) != (1, 1):
        return False  # native path has no scale_dist support
    if mode != "native":
        import jax
        if jax.default_backend() != "tpu":
            return False
        from ..core.linkspeed import d2h_bandwidth_bytes_per_s
        bw = d2h_bandwidth_bytes_per_s()
        if bw is not None:
            if shape is None or n_polys is None:
                if bw > 200e6:
                    return False
            else:
                # device path: rasterize kernel (~8 ns/px) + int32 download;
                # host path: ~25 us/polygon (measured, bench shapes)
                n_px = float(np.prod(shape))
                device_s = n_px * 8e-9 + n_px * 4 / bw
                host_s = float(n_polys) * 25e-6
                if device_s < host_s:
                    return False
    try:
        from ..lib import get_lib
        get_lib()
        return True
    except Exception:
        return False


def _use_native_raster2d(shape, scale_dist, n_polys=None):
    return _use_native_raster("STARDIST_TPU_RASTER2D", scale_dist,
                              shape=shape, n_polys=n_polys)


def _render_polygons(dist, points, prob, labels, shape, scale_dist=(1, 1)):
    """Shared renderer: ascending-prob order, later overwrites; the pixel
    value of the winning polygon i is labels[i]+1. The winner->label LUT is
    applied inside the rasterizer (device or native) so only the final
    label image is produced."""
    n = len(dist)
    if n == 0:
        return np.zeros(shape, np.int32)
    prob = np.inf * np.ones(n) if prob is None else np.asarray(prob)
    ind = np.argsort(prob, kind="stable")
    # rank in ascending-prob order (1-based); scatter-max picks the polygon
    # that the reference's sequential overwrite would have rendered last
    order_values = np.empty(n, np.int32)
    order_values[ind] = np.arange(1, n + 1)
    if _use_native_raster2d(shape, scale_dist, n_polys=n):
        from ..lib import polygons_to_label_native
        return polygons_to_label_native(np.asarray(dist), np.asarray(points),
                                        tuple(shape), order_values,
                                        labels=np.asarray(labels))
    img, _ = rasterize_polygons(
        dist, np.asarray(points), tuple(shape), order_values,
        scale_dist=scale_dist, labels=np.asarray(labels),
    )
    return img


def polygons_to_label_coord(coord, shape, labels=None):
    """Render polygons given by explicit vertex coords (n_polys, 2, n_rays).

    Assumes the coords were produced by ``dist_to_coord`` (equiangular rays);
    the (center, dist) representation is recovered by least squares.
    """
    coord = np.asarray(coord)
    if labels is None:
        labels = np.arange(len(coord))
    _check_label_array(labels, "labels")
    assert coord.ndim == 3 and coord.shape[1] == 2 and len(coord) == len(labels)
    n_polys, _, n_rays = coord.shape
    if n_polys == 0:
        return np.zeros(shape, np.int32)
    phis = ray_angles(n_rays)
    dirs = np.stack([np.sin(phis), np.cos(phis)], axis=-1)  # (R, 2)
    # vertex_k = c + d_k * dirs_k; the component of (v_k - c) perpendicular to
    # dirs_k vanishes -> linear system perp_k . c = perp_k . v_k for c.
    perp = np.stack([-dirs[:, 1], dirs[:, 0]], axis=-1)  # (R, 2)
    v = np.moveaxis(coord, 1, -1)  # (N, R, 2)
    b = np.einsum("rk,nrk->nr", perp, v)  # (N, R)
    AtA = perp.T @ perp
    Atb = np.einsum("rk,nr->nk", perp, b)
    c = np.linalg.solve(AtA[None], Atb[..., None])[..., 0]  # (N, 2)
    d = np.einsum("rk,nrk->nr", dirs, v - c[:, None, :])
    d = np.maximum(d, 1e-3)
    return _render_polygons(d, c, prob=None, labels=np.asarray(labels), shape=shape)


def polygons_to_label(dist, points, shape, prob=None, thr=-np.inf, scale_dist=(1, 1)):
    """Convert distances and center points to a label image.

    Label ids are consecutive and adhere to the given order (reference
    geom2d.py:169-197); for overlapping polygons the higher-probability one
    wins (ties: the later one in ascending stable sort order).
    """
    dist = np.asarray(dist)
    points = np.asarray(points)
    prob = np.inf * np.ones(len(points)) if prob is None else np.asarray(prob)

    assert dist.ndim == 2 and points.ndim == 2 and len(dist) == len(points)
    assert len(points) == len(prob) and points.shape[1] == 2 and prob.ndim == 1

    ind = prob > thr
    points = points[ind]
    dist = dist[ind]
    prob = prob[ind]

    return _render_polygons(dist, points, prob, np.arange(len(dist)), shape,
                            scale_dist=tuple(scale_dist))


# -- legacy dense-coordinate API (kept for parity with the reference's
# regression-test surface; reference geom2d.py:88-127) ----------------------

def _dist_to_coord_old(rhos, grid=(1, 1)):
    """Dense polar->cartesian: (..., Ny, Nx, n_rays) -> (..., Ny, Nx, 2, n_rays)."""
    grid = _normalize_grid(grid, 2)
    is_single = rhos.ndim == 3
    if is_single:
        rhos = rhos[np.newaxis]
    assert rhos.ndim == 4
    n_images, h, w, n_rays = rhos.shape
    coord = np.empty((n_images, h, w, 2, n_rays), dtype=rhos.dtype)
    start = np.indices((h, w))
    for i in range(2):
        coord[..., i, :] = grid[i] * np.broadcast_to(start[i].reshape(1, h, w, 1),
                                                     (n_images, h, w, n_rays))
    phis = ray_angles(n_rays).reshape(1, 1, 1, n_rays)
    coord[..., 0, :] += rhos * np.sin(phis)
    coord[..., 1, :] += rhos * np.cos(phis)
    return coord[0] if is_single else coord


def _polygons_to_label_old(coord, prob, points, shape=None, thr=-np.inf):
    """Render polygons selected by grid-index `points` from a dense coord map;
    increasing-prob overwrite order, ids consecutive in that order."""
    sh = coord.shape[:2] if shape is None else shape
    points = np.asarray(points)
    ind = np.argsort([prob[p[0], p[1]] for p in points], kind="stable")
    points = points[ind]
    keep = [p for p in points if prob[p[0], p[1]] >= thr]
    if len(keep) == 0:
        return np.zeros(sh, np.int32)
    coords = np.stack([coord[p[0], p[1]] for p in keep])  # (n, 2, R)
    return polygons_to_label_coord(coords, shape=sh, labels=np.arange(len(keep)))


def relabel_image_stardist(lbl, n_rays, **kwargs):
    """Relabel each region with its star-convex polygon approximation."""
    _check_label_array(lbl, "lbl")
    if not lbl.ndim == 2:
        raise ValueError("lbl image should be 2 dimensional")
    dist = star_dist(lbl, n_rays, **kwargs)
    points = np.array(tuple(np.array(r.centroid).astype(int) for r in regions(lbl)))
    if len(points) == 0:
        dist, points = np.zeros((0, n_rays), np.float32), np.zeros((0, 2), int)
    else:
        dist = dist[tuple(points.T)]
    return polygons_to_label(dist, points, shape=lbl.shape)
    """Relabel each region with its star-convex polygon approximation."""
    _check_label_array(lbl, "lbl")
    if not lbl.ndim == 2:
        raise ValueError("lbl image should be 2 dimensional")
    dist = star_dist(lbl, n_rays, **kwargs)
    points = np.array(tuple(np.array(r.centroid).astype(int) for r in regions(lbl)))
    if len(points) == 0:
        dist, points = np.zeros((0, n_rays), np.float32), np.zeros((0, 2), int)
    else:
        dist = dist[tuple(points.T)]
    return polygons_to_label(dist, points, shape=lbl.shape)
