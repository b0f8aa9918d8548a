"""Label-image rasterization of star polygons / polyhedra on TPU.

TPU-native equivalent of the reference rasterizers:
- 2D: skimage.draw.polygon loop in ``polygons_to_label_coord``
  (stardist/geometry/geom2d.py:149-166) — later-rendered polygons overwrite.
- 3D: C++ ``_COMMON_polyhedron_to_label`` (stardist/lib/
  stardist3d_impl.cpp:1404-1525) — first-writer-wins on descending prob,
  optional ``overlap_label`` for multiply-claimed voxels.

Design: "splatting" — every candidate rasterizes a fixed-size local window
around its center (vectorized inside test), then a scatter-max resolves the
winner per pixel. Candidate order is encoded in integer order-values, so
"later/earlier wins" becomes a max. This avoids any data-dependent loop and
scales with sum of object areas, not image area x candidates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .polygon import points_in_polygons
from .polyhedron import points_in_polyhedra, polyhedron_face_inverses


def _pad_to(x, n, axis=0, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    if isinstance(x, np.ndarray):
        return np.pad(x, widths, constant_values=value)
    return jnp.pad(x, widths, constant_values=value)  # device array stays put


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def _raster2d_impl(dist, points, vals, labs, shape, W, chunk, scale_dist,
                   with_count, out_uint16):
    """``labs``: None (winner image = order value), or a 1D int32 LUT
    (winner order value -> label), or a per-candidate label array packed with
    the order value into one int32 (see ``_PACKED`` marker in the caller) so
    the scatter-max resolves priority and labeling in a single pass — a
    post-hoc ``jnp.take`` LUT gather over the full image costs ~144 ms at
    4096^2 on v5e (no gather unit); the packed path replaces it with an
    elementwise mask."""
    N = dist.shape[0]
    packed = labs is not None and labs.ndim == 2  # (N, 1): per-candidate label
    if packed:
        labs_flat = labs[:, 0]
    img0 = jnp.zeros(shape, jnp.int32)
    cnt0 = jnp.zeros(shape, jnp.int32) if with_count else jnp.zeros((1, 1), jnp.int32)
    ar = jnp.arange(W, dtype=jnp.int32)
    inv_scale = jnp.asarray([1.0 / scale_dist[0], 1.0 / scale_dist[1]], jnp.float32)

    def body(i, carry):
        img, cnt = carry
        d = jax.lax.dynamic_slice_in_dim(dist, i * chunk, chunk, 0)
        p = jax.lax.dynamic_slice_in_dim(points, i * chunk, chunk, 0)
        v = jax.lax.dynamic_slice_in_dim(vals, i * chunk, chunk, 0)
        if packed:
            lb = jax.lax.dynamic_slice_in_dim(labs_flat, i * chunk, chunk, 0)
        start = jnp.round(p).astype(jnp.int32) - W // 2  # (chunk, 2)
        rr = start[:, 0:1] + ar[None, :]                 # (chunk, W)
        cc = start[:, 1:2] + ar[None, :]
        q = jnp.stack(
            jnp.broadcast_arrays(rr[:, :, None].astype(jnp.float32),
                                 cc[:, None, :].astype(jnp.float32)),
            axis=-1,
        ).reshape(chunk, W * W, 2)
        # anisotropic scale_dist: test in the unscaled polygon frame
        q_rel = (q - p[:, None, :]) * inv_scale
        inside = points_in_polygons(d, jnp.zeros_like(p), q_rel) & (v > 0)[:, None]
        # negative indices would WRAP in the scatter (mode="drop" only drops
        # indices beyond the array) — mask them out explicitly
        in_img = ((rr >= 0)[:, :, None] & (cc >= 0)[:, None, :]).reshape(chunk, W * W)
        inside = inside & in_img
        scatter_v = ((v << 16) | lb) if packed else v
        val_patch = jnp.where(inside, scatter_v[:, None], 0)
        rr_full = jnp.broadcast_to(rr[:, :, None], (chunk, W, W)).reshape(-1)
        cc_full = jnp.broadcast_to(cc[:, None, :], (chunk, W, W)).reshape(-1)
        img = img.at[rr_full, cc_full].max(val_patch.reshape(-1), mode="drop")
        if with_count:
            cnt = cnt.at[rr_full, cc_full].add(inside.reshape(-1).astype(jnp.int32), mode="drop")
        return img, cnt

    n_chunks = (N + chunk - 1) // chunk
    img, cnt = jax.lax.fori_loop(0, n_chunks, body, (img0, cnt0))
    if packed:
        img = img & 0xFFFF            # low 16 bits carry the label
    elif labs is not None:
        img = jnp.take(labs, img)     # winner order value -> label, on device
    if out_uint16:
        img = img.astype(jnp.uint16)  # halves the device->host transfer
    return img, cnt


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _raster2d_packed_dyn(dist, points, vals, labs, n_valid, shape, W, chunk):
    """Packed-label 2D splat raster with a TRACED candidate count: the chunk
    loop runs ceil(n_valid/chunk) iterations (``lax.fori_loop`` with a
    dynamic bound), so a fixed slot capacity costs nothing for unused slots —
    the device-resident predict pipeline (models/model2d.py
    ``predict_instances_device``) rasterizes into M >= n_surv slots without
    a per-image recompile or per-dead-slot compute. Candidates must be
    compacted to the front (slots >= n_valid are never read). Semantics =
    ``_raster2d_impl`` packed path with out_uint16=True: per pixel the
    largest ``vals`` entry wins, pixel value = that candidate's ``labs``
    entry (requires vals < 2^15, labs < 2^16)."""
    img0 = jnp.zeros(shape, jnp.int32)
    ar = jnp.arange(W, dtype=jnp.int32)

    def body(i, img):
        d = jax.lax.dynamic_slice_in_dim(dist, i * chunk, chunk, 0)
        p = jax.lax.dynamic_slice_in_dim(points, i * chunk, chunk, 0)
        v = jax.lax.dynamic_slice_in_dim(vals, i * chunk, chunk, 0)
        lb = jax.lax.dynamic_slice_in_dim(labs, i * chunk, chunk, 0)
        start = jnp.round(p).astype(jnp.int32) - W // 2
        rr = start[:, 0:1] + ar[None, :]
        cc = start[:, 1:2] + ar[None, :]
        q = jnp.stack(
            jnp.broadcast_arrays(rr[:, :, None].astype(jnp.float32),
                                 cc[:, None, :].astype(jnp.float32)),
            axis=-1,
        ).reshape(chunk, W * W, 2)
        inside = points_in_polygons(d, p, q) & (v > 0)[:, None]
        # negative indices would WRAP in the scatter (mode="drop" only drops
        # indices beyond the array) — mask them out explicitly
        in_img = ((rr >= 0)[:, :, None] & (cc >= 0)[:, None, :]).reshape(chunk, W * W)
        inside = inside & in_img
        val_patch = jnp.where(inside, ((v << 16) | lb)[:, None], 0)
        rr_full = jnp.broadcast_to(rr[:, :, None], (chunk, W, W)).reshape(-1)
        cc_full = jnp.broadcast_to(cc[:, None, :], (chunk, W, W)).reshape(-1)
        return img.at[rr_full, cc_full].max(val_patch.reshape(-1), mode="drop")

    n_chunks = (n_valid.astype(jnp.int32) + (chunk - 1)) // chunk
    img = jax.lax.fori_loop(0, n_chunks, body, img0)
    return (img & 0xFFFF).astype(jnp.uint16)


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _raster3d_packed_dyn(dist, points, vals, labs, ray_dirs, faces, n_valid,
                         shape, W, chunk):
    """Packed-label 3D splat raster with a TRACED candidate count — the 3D
    analog of ``_raster2d_packed_dyn`` (full polyhedron mode): per voxel the
    largest ``vals`` entry wins, voxel value = that candidate's ``labs``
    entry (requires vals < 2^15, labs < 2^16). Candidates must be compacted
    to the front; slots >= n_valid are never read. Used by the fused 3D
    device-predict pipeline (models/model3d.py ``predict_instances_device``)."""
    img0 = jnp.zeros(shape, jnp.int32)
    ar = jnp.arange(W, dtype=jnp.int32)

    def body(i, img):
        d = jax.lax.dynamic_slice_in_dim(dist, i * chunk, chunk, 0)
        p = jax.lax.dynamic_slice_in_dim(points, i * chunk, chunk, 0)
        v = jax.lax.dynamic_slice_in_dim(vals, i * chunk, chunk, 0)
        lb = jax.lax.dynamic_slice_in_dim(labs, i * chunk, chunk, 0)
        start = jnp.round(p).astype(jnp.int32) - W // 2  # (chunk, 3)
        zz = start[:, 0:1] + ar[None, :]
        yy = start[:, 1:2] + ar[None, :]
        xx = start[:, 2:3] + ar[None, :]
        q = jnp.stack(
            jnp.broadcast_arrays(
                zz[:, :, None, None].astype(jnp.float32),
                yy[:, None, :, None].astype(jnp.float32),
                xx[:, None, None, :].astype(jnp.float32),
            ),
            axis=-1,
        ).reshape(chunk, W * W * W, 3)
        inv, valid_f = polyhedron_face_inverses(d, ray_dirs, faces)
        inside = points_in_polyhedra(inv, valid_f, p, q) & (v > 0)[:, None]
        # negative indices would WRAP in the scatter — mask them out
        in_img = ((zz >= 0)[:, :, None, None]
                  & (yy >= 0)[:, None, :, None]
                  & (xx >= 0)[:, None, None, :]).reshape(chunk, W ** 3)
        inside = inside & in_img
        val_patch = jnp.where(inside, ((v << 16) | lb)[:, None], 0)
        zf = jnp.broadcast_to(zz[:, :, None, None], (chunk, W, W, W)).reshape(-1)
        yf = jnp.broadcast_to(yy[:, None, :, None], (chunk, W, W, W)).reshape(-1)
        xf = jnp.broadcast_to(xx[:, None, None, :], (chunk, W, W, W)).reshape(-1)
        return img.at[zf, yf, xf].max(val_patch.reshape(-1), mode="drop")

    n_chunks = (n_valid.astype(jnp.int32) + (chunk - 1)) // chunk
    img = jax.lax.fori_loop(0, n_chunks, body, img0)
    return (img & 0xFFFF).astype(jnp.uint16)


def _can_pack_labels(order_values, labels_plus):
    """True when (order_value << 16 | label) fits an int32 scatter value."""
    return (int(order_values.max(initial=0)) < 2 ** 15
            and labels_plus.min(initial=0) >= 0
            and int(labels_plus.max(initial=0)) < 2 ** 16)


def rasterize_polygons(dist, points, shape, order_values, window=None, chunk=256,
                       scale_dist=(1, 1), return_count=False, labels=None):
    """Rasterize star polygons; per pixel the candidate with the largest
    positive ``order_values`` entry wins. Returns (winner_img, count_img)
    as numpy int32 arrays; winner 0 = background. When ``return_count`` is
    False, the count image is not computed/transferred (None).

    ``labels`` (optional, len N): map the winning candidate's order value to
    ``labels[i] + 1`` on device (0 stays background) — avoids a host-side
    LUT pass over the full image. ``dist`` may be a device (jax) array."""
    if isinstance(dist, (list, tuple, np.ndarray)):
        dist = np.asarray(dist, np.float32)
    points = np.asarray(points, np.float32)
    order_values = np.asarray(order_values, np.int32)
    N = len(dist)
    if N == 0:
        z = np.zeros(shape, np.int32)
        return z, (np.zeros(shape, np.int32) if return_count else None)

    # scatter-free Pallas tile kernel (TPU): identical results, no scatter.
    # Opt-in (STARDIST_TPU_PALLAS_RASTER=1) until the first-compile cost is
    # acceptable by default — the kernel itself beats the scatter splat, but
    # a cold Mosaic compile through a remote-TPU tunnel takes minutes.
    import os
    if (not return_count and tuple(scale_dist) == (1, 1)
            and isinstance(dist, np.ndarray)
            and os.environ.get("STARDIST_TPU_PALLAS_RASTER", "0") == "1"
            and jax.default_backend() == "tpu"):
        from .raster_pallas import rasterize_polygons_tiles
        res = rasterize_polygons_tiles(dist, points, tuple(shape),
                                       order_values, labels=labels,
                                       window=window)
        if res is not None:
            return res
    if window is None:
        window = 2 * int(np.ceil(float(dist.max()) * max(scale_dist))) + 4
    window = int(min(window, 2 * max(shape) + 4))
    # bucket the window and the candidate count so nearby fields (e.g. the
    # per-probe prefixes of optimize_thresholds) share one compiled kernel:
    # every distinct (window, Np) pair is a full XLA compile
    window = -(-window // 16) * 16
    chunk = int(min(chunk, max(1, N)))
    Np = ((N + chunk - 1) // chunk) * chunk
    if Np > chunk:
        b = chunk
        while b < Np:
            b *= 2
        Np = b
    if labels is not None:
        labels_plus = np.asarray(labels, np.int32) + 1
        if _can_pack_labels(order_values, labels_plus):
            labs = jnp.asarray(_pad_to(labels_plus.reshape(-1, 1), Np))
        else:  # rare: >32k candidates or >16-bit labels -> LUT gather
            lut_np = np.zeros(int(order_values.max(initial=0)) + 1, np.int32)
            lut_np[order_values] = labels_plus
            labs = jnp.asarray(lut_np)
        out_u16 = (labels_plus.min(initial=0) >= 0
                   and int(labels_plus.max(initial=0)) < 2 ** 16 - 1)
    else:
        labs = None
        out_u16 = int(order_values.max(initial=0)) < 2 ** 16 - 1
    img, cnt = _raster2d_impl(
        _pad_to(dist, Np),
        jnp.asarray(_pad_to(points, Np)),
        jnp.asarray(_pad_to(order_values, Np)),
        labs,
        tuple(shape), window, chunk,
        (float(scale_dist[0]), float(scale_dist[1])),
        bool(return_count), out_u16,
    )
    return (np.asarray(img).astype(np.int32),
            (np.asarray(cnt) if return_count else None))


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11))
def _raster3d_impl(dist, points, vals, ray_dirs, faces, labs, shape, W, chunk,
                   mode, with_count, out_uint16):
    """``labs``: None / 1D LUT / (N, 1) packed labels — see _raster2d_impl."""
    N = dist.shape[0]
    packed = labs is not None and labs.ndim == 2
    if packed:
        labs_flat = labs[:, 0]
    img0 = jnp.zeros(shape, jnp.int32)
    cnt0 = jnp.zeros(shape, jnp.int32) if with_count else jnp.zeros((1, 1, 1), jnp.int32)
    ar = jnp.arange(W, dtype=jnp.int32)

    def body(i, carry):
        img, cnt = carry
        d = jax.lax.dynamic_slice_in_dim(dist, i * chunk, chunk, 0)
        p = jax.lax.dynamic_slice_in_dim(points, i * chunk, chunk, 0)
        v = jax.lax.dynamic_slice_in_dim(vals, i * chunk, chunk, 0)
        if packed:
            lb = jax.lax.dynamic_slice_in_dim(labs_flat, i * chunk, chunk, 0)
        start = jnp.round(p).astype(jnp.int32) - W // 2  # (chunk, 3)
        zz = start[:, 0:1] + ar[None, :]
        yy = start[:, 1:2] + ar[None, :]
        xx = start[:, 2:3] + ar[None, :]
        q = jnp.stack(
            jnp.broadcast_arrays(
                zz[:, :, None, None].astype(jnp.float32),
                yy[:, None, :, None].astype(jnp.float32),
                xx[:, None, None, :].astype(jnp.float32),
            ),
            axis=-1,
        ).reshape(chunk, W * W * W, 3)
        if mode == "bbox":
            v3 = d[..., None] * ray_dirs
            lo = p + v3.min(axis=-2)
            hi = p + v3.max(axis=-2)
            inside = jnp.all((q >= lo[:, None, :]) & (q <= hi[:, None, :]), axis=-1)
        elif mode == "kernel":
            tri = (d[..., None] * ray_dirs)[..., faces, :]  # (chunk, F, 3, 3)
            a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
            n = jnp.cross(b - a, c - a)
            off = jnp.sum(n * a, axis=-1)
            sgn = jnp.where(off < 0, -1.0, 1.0)
            n = n * sgn[..., None]
            off = off * sgn
            u = q[:, :, None, :] - p[:, None, None, :]
            inside = jnp.all(jnp.sum(u * n[:, None], axis=-1) <= off[:, None] + 1e-6, axis=-1)
        else:  # "full"
            inv, valid = polyhedron_face_inverses(d, ray_dirs, faces)
            inside = points_in_polyhedra(inv, valid, p, q)
        inside = inside & (v > 0)[:, None]
        # negative indices would WRAP in the scatter — mask them out
        in_img = ((zz >= 0)[:, :, None, None]
                  & (yy >= 0)[:, None, :, None]
                  & (xx >= 0)[:, None, None, :]).reshape(chunk, W ** 3)
        inside = inside & in_img
        scatter_v = ((v << 16) | lb) if packed else v
        val_patch = jnp.where(inside, scatter_v[:, None], 0)
        zf = jnp.broadcast_to(zz[:, :, None, None], (chunk, W, W, W)).reshape(-1)
        yf = jnp.broadcast_to(yy[:, None, :, None], (chunk, W, W, W)).reshape(-1)
        xf = jnp.broadcast_to(xx[:, None, None, :], (chunk, W, W, W)).reshape(-1)
        img = img.at[zf, yf, xf].max(val_patch.reshape(-1), mode="drop")
        if with_count:
            cnt = cnt.at[zf, yf, xf].add(inside.reshape(-1).astype(jnp.int32), mode="drop")
        return img, cnt

    n_chunks = (N + chunk - 1) // chunk
    img, cnt = jax.lax.fori_loop(0, n_chunks, body, (img0, cnt0))
    if packed:
        img = img & 0xFFFF            # low 16 bits carry the label
    elif labs is not None:
        img = jnp.take(labs, img)     # winner order value -> label, on device
    if out_uint16:
        img = img.astype(jnp.uint16)  # halves the device->host transfer
    return img, cnt


def rasterize_polyhedra(dist, points, rays, shape, order_values, window=None,
                        chunk=8, mode="full", return_count=True, labels=None):
    """Rasterize star polyhedra; per voxel the candidate with the largest
    positive ``order_values`` entry wins. Returns (winner_img, count_img);
    count_img is None when ``return_count`` is False. With ``labels``, the
    winning candidate's order value is mapped to labels[i] on device."""
    dist = np.asarray(dist, np.float32)
    points = np.asarray(points, np.float32)
    order_values = np.asarray(order_values, np.int32)
    N = len(dist)
    if N == 0:
        z = np.zeros(shape, np.int32)
        return z, (np.zeros(shape, np.int32) if return_count else None)
    if window is None:
        window = 2 * int(np.ceil(dist.max())) + 4
    window = int(min(window, 2 * max(shape) + 4))
    chunk = int(min(chunk, max(1, N)))
    Np = ((N + chunk - 1) // chunk) * chunk
    if labels is not None:
        labels_np = np.asarray(labels, np.int32)
        if _can_pack_labels(order_values, labels_np):
            labs = jnp.asarray(_pad_to(labels_np.reshape(-1, 1), Np))
        else:  # rare: >32k candidates or labels outside uint16 -> LUT gather
            lut_np = np.zeros(int(order_values.max(initial=0)) + 1, np.int32)
            lut_np[order_values] = labels_np
            labs = jnp.asarray(lut_np)
        out_u16 = (labels_np.min(initial=0) >= 0
                   and int(labels_np.max(initial=0)) < 2 ** 16 - 1)
    else:
        labs = None
        out_u16 = int(order_values.max(initial=0)) < 2 ** 16 - 1
    img, cnt = _raster3d_impl(
        jnp.asarray(_pad_to(dist, Np)),
        jnp.asarray(_pad_to(points, Np)),
        jnp.asarray(_pad_to(order_values, Np)),
        jnp.asarray(np.asarray(rays.vertices, np.float32)),
        jnp.asarray(np.asarray(rays.faces, np.int32)),
        labs,
        tuple(shape), window, chunk, mode, bool(return_count), out_u16,
    )
    return (np.asarray(img).astype(np.int32),
            (np.asarray(cnt) if return_count else None))
