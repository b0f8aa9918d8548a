"""3D geometry API: star distances, polyhedron rendering, OBJ export.

Mirrors the reference public surface (stardist/geometry/geom3d.py) with the
compute mapped to TPU kernels. ``polyhedron_to_label`` follows the reference
C++ semantics (stardist/lib/stardist3d_impl.cpp:1404-1525): candidates are
sorted by decreasing probability and rendered first-writer-wins; voxels
claimed by more than one polyhedron can optionally be marked with
``overlap_label``.
"""
from __future__ import annotations

import numpy as np

from ..matching import _check_label_array
from ..utils import _normalize_grid, regions
from ..ops.stardist3d import star_dist3d_jax, star_dist3d_numpy
from ..ops.rasterize import rasterize_polyhedra


def star_dist3D(lbl, rays, grid=(1, 1, 1), mode="jax"):
    """Star-convex distances of a 3D label image along the given rays."""
    grid = _normalize_grid(grid, 3)
    if mode in ("jax", "tpu", "cpp", "opencl"):
        return star_dist3d_jax(lbl, rays, grid=grid)
    elif mode in ("numpy", "python"):
        return star_dist3d_numpy(lbl, rays, grid=grid)
    else:
        raise ValueError(f"Unknown mode {mode}")


def _use_native_raster3d(shape=None, n_polys=None):
    """Host-native rasterization when the device sits behind a slow
    device->host link (shared heuristic: geom2d._use_native_raster).
    Overridable via STARDIST_TPU_RASTER3D=native|device|auto."""
    from .geom2d import _use_native_raster
    return _use_native_raster("STARDIST_TPU_RASTER3D", shape=shape,
                              n_polys=n_polys)


def polyhedron_to_label(dist, points, rays, shape, prob=None, thr=-np.inf,
                        labels=None, mode="full", verbose=True, overlap_label=None):
    """Create a label image from star-polyhedron representations.

    dist (n, n_rays), points (n, 3); polyhedra with prob >= thr are rendered
    in decreasing-probability order, first writer wins. ``mode`` in
    {"full", "kernel", "bbox"} ("hull"/"debug" not supported on the TPU path).
    """
    if len(points) == 0:
        if verbose:
            print("warning: empty list of points (returning background-only image)")
        return np.zeros(shape, np.int32)

    dist = np.asanyarray(dist)
    points = np.asanyarray(points)

    if dist.ndim == 1:
        dist = dist.reshape(1, -1)
    if points.ndim == 1:
        points = points.reshape(1, -1)
    if labels is None:
        labels = np.arange(1, len(points) + 1)
    labels = np.asanyarray(labels)

    if np.amin(dist) <= 0:
        raise ValueError("distance array should be positive!")
    prob = np.ones(len(points)) if prob is None else np.asanyarray(prob)
    if dist.ndim != 2:
        raise ValueError("dist should be 2 dimensional but has shape %s" % str(dist.shape))
    if dist.shape[1] != len(rays):
        raise ValueError("inconsistent number of rays!")
    if len(prob) != len(points):
        raise ValueError("len(prob) != len(points)")
    if len(labels) != len(points):
        raise ValueError("len(labels) != len(points)")
    if mode not in ("full", "kernel", "bbox", "hull", "debug"):
        raise KeyError(f"Unknown render mode '{mode}'")
    if mode in ("hull", "debug"):
        raise NotImplementedError(f"render mode '{mode}' not supported in stardist_tpu")

    # filter by threshold (note: >= thr, unlike 2D which uses > thr)
    ind = np.where(prob >= thr)[0]
    if len(ind) == 0:
        if verbose:
            print(f"warning: no points found with probability>= {thr:.4f} "
                  "(returning background-only image)")
        return np.zeros(shape, np.int32)
    prob = prob[ind]
    points = points[ind]
    dist = dist[ind]
    labels = labels[ind]

    # decreasing probability; first writer wins => for the scatter-max the
    # order value must DEcrease with the sort position (ties: earlier index)
    order = np.argsort(-prob, kind="stable")
    n = len(order)
    order_values = np.empty(n, np.int32)
    order_values[order] = np.arange(n, 0, -1)

    if mode == "full" and _use_native_raster3d(shape=shape, n_polys=n):
        from ..lib import polyhedra_to_label_native
        res = polyhedra_to_label_native(
            dist, points, rays, tuple(shape), order_values,
            return_count=overlap_label is not None, labels=labels)
        if overlap_label is not None:
            out, cnt = res
            out = np.where(cnt > 1, overlap_label, out)
        else:
            out = res
        return out.astype(np.int32)

    img, cnt = rasterize_polyhedra(dist, points, rays, tuple(shape),
                                   order_values, mode=mode,
                                   return_count=overlap_label is not None,
                                   labels=labels)
    out = img
    if overlap_label is not None:
        out = np.where(cnt > 1, overlap_label, out)
    return out.astype(np.int32)


def relabel_image_stardist3D(lbl, rays, verbose=False, **kwargs):
    """Relabel each region with its star-convex polyhedron approximation."""
    _check_label_array(lbl, "lbl")
    if not lbl.ndim == 3:
        raise ValueError("lbl image should be 3 dimensional")
    dist_all = star_dist3D(lbl, rays, **kwargs)
    regs = regions(lbl)
    points = np.array(tuple(np.array(r.centroid).astype(int) for r in regs))
    labs = np.array(tuple(r.label for r in regs))
    if len(points) == 0:
        return np.zeros(lbl.shape, np.int32)
    dist = np.array(tuple(dist_all[p[0], p[1], p[2]] for p in points))
    dist = np.maximum(dist, 1e-3)
    return polyhedron_to_label(dist, points, rays, shape=lbl.shape, labels=labs, verbose=verbose)


def dist_to_volume(dist, rays):
    """Per-voxel polyhedron volumes from a dense dist map (nz,ny,nx,n_rays)
    (reference c_dist_to_volume, stardist3d_impl.cpp:1529-1558)."""
    dist = np.asanyarray(dist)
    if dist.ndim != 4:
        raise ValueError(f"dist.ndim = {dist.ndim} but should be 4")
    if dist.shape[-1] != len(rays):
        raise ValueError(f"dist.shape[-1] = {dist.shape[-1]} but should be {len(rays)}")
    return rays.volume(dist).astype(np.float32)


def dist_to_centroid(dist, rays, mode="absolute"):
    """Per-voxel polyhedron centroids from a dense dist map (nz,ny,nx,n_rays).

    mode='relative' gives centroids relative to the voxel center;
    'absolute' adds the voxel position (reference c_dist_to_centroid,
    stardist3d_impl.cpp:1561-1589)."""
    dist = np.asanyarray(dist)
    if dist.ndim != 4:
        raise ValueError(f"dist.ndim = {dist.ndim} but should be 4")
    if dist.shape[-1] != len(rays):
        raise ValueError(f"dist.shape[-1] = {dist.shape[-1]} but should be {len(rays)}")
    if mode not in ("absolute", "relative"):
        raise ValueError("mode should be either 'absolute' or 'relative'")
    verts = np.asarray(rays.vertices, np.float32)
    faces = np.asarray(rays.faces)
    v = dist[..., None] * verts                  # (..., R, 3)
    tri = v[..., faces, :]                       # (..., F, 3, 3)
    det = np.linalg.det(tri)                     # (..., F)
    vol_f = -det / 6.0
    cen_f = tri.sum(axis=-2) / 4.0               # tetra centroid rel voxel
    total = vol_f.sum(axis=-1, keepdims=True)
    centroid = (vol_f[..., None] * cen_f).sum(axis=-2) / (total + 1e-10)
    if mode == "absolute":
        zz, yy, xx = np.meshgrid(*map(np.arange, dist.shape[:3]), indexing="ij")
        centroid = centroid + np.stack([zz, yy, xx], axis=-1)
    return centroid.astype(np.float32)


def dist_to_coord3D(dist, points, rays_vertices):
    """Convert dist/points/rays_vertices to vertex coordinate lists."""
    dist = np.asarray(dist)
    points = np.asarray(points)
    rays_vertices = np.asarray(rays_vertices)
    if not all((len(dist) == len(points), dist.ndim == 2, points.ndim == 2,
                points.shape[-1] == 3, rays_vertices.shape[-1] == 3,
                dist.shape[-1] == len(rays_vertices))):
        raise ValueError("Wrong shapes! dist -> (m,n) points -> (m,3) rays_vertices -> (n,3)")
    return points[:, np.newaxis] + dist[..., np.newaxis] * rays_vertices


def export_to_obj_file3D(polys, fname=None, scale=1, single_mesh=True, uv_map=False, name="poly"):
    """Export 3D polyhedra (dict with dist/points/rays_vertices/rays_faces)
    to Wavefront OBJ (reference geom3d.py:277-347)."""
    try:
        dist = polys["dist"]
        points = polys["points"]
        rays_vertices = polys["rays_vertices"]
        rays_faces = polys["rays_faces"]
    except KeyError as e:
        raise ValueError(
            "polys should be a dict with keys 'dist', 'points', 'rays_vertices', 'rays_faces' "
            "(such as generated by StarDist3D.predict_instances)"
        ) from e

    coord = dist_to_coord3D(dist, points, rays_vertices)
    if not all((coord.ndim == 3, coord.shape[-1] == 3, np.asarray(rays_faces).shape[-1] == 3)):
        raise ValueError("Wrong shapes! coord -> (m,n,3) rays_faces -> (k,3)")

    if np.isscalar(scale):
        scale = (scale,) * 3
    scale = np.asarray(scale)
    assert len(scale) == 3
    coord = coord * scale

    decimals = int(max(1, 1 - np.log10(np.min(scale))))
    scaled_verts = scale * np.asarray(rays_vertices)
    scaled_verts /= np.linalg.norm(scaled_verts, axis=1, keepdims=True)

    rays_faces = np.asarray(rays_faces).copy() + 1

    parts = []
    for i, xs in enumerate(coord):
        xs = xs[:, [2, 1, 0]]  # reorder to xyz
        if i == 0 or not single_mesh:
            parts.append(f"o {name}_{i:d}\n")
        for x, y, z in xs:
            parts.append(f"v {x:.{decimals}f} {y:.{decimals}f} {z:.{decimals}f}\n")
        if uv_map:
            for vz, vy, vx in scaled_verts:
                u = 1 - (0.5 + 0.5 * np.arctan2(vz, vx) / np.pi)
                v = 1 - (0.5 - np.arcsin(vy) / np.pi)
                parts.append(f"vt {u:.4f} {v:.4f}\n")
        for face in rays_faces:
            parts.append(f"f {face[0]}/{face[0]} {face[1]}/{face[1]} {face[2]}/{face[2]}\n")
        rays_faces += len(xs)

    obj_str = "".join(parts)
    if fname is not None:
        with open(fname, "w") as f:
            f.write(obj_str)
    return obj_str
