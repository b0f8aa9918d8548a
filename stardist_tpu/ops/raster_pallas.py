"""Tile-based 2D label rasterization as a Pallas TPU kernel.

The splat rasterizer (ops/rasterize.py) resolves the winning polygon per
pixel with a scatter-max — correct, but scatters are slow on TPU. This
kernel inverts the loop: the image is partitioned into (8, 128) register
tiles (the native int32 tile shape); each grid program loops over just the
candidates whose splat window intersects its tile (host-binned lists,
per-tile *dynamic* trip counts — the case where padding-free iteration
beats any dense XLA formulation) and resolves the winner with an
elementwise max. No scatter anywhere.

Semantics match ``_raster2d_impl`` (same splat window, "largest order
value wins") up to degenerate on-ray boundary pixels: this kernel picks
the wedge via double-cross signs while the JAX/native paths use f32
atan2 + floor(theta/dphi), so a pixel lying exactly on a ray direction
can be assigned to the adjacent wedge and differ on the boundary. The
winner->label mapping rides along by packing ``(order_value << 16) | label``
into the max operand when both fit in 16 bits (the common case).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R, TILE_C = 8, 128


def _bin_candidates(points, window, shape, pad_shape):
    """Host binning: for every image tile, the candidates whose splat window
    (centered at round(p), side ``window``) intersects it. Returns
    (tile_idx (T, K) int32, tile_count (T,) int32, K)."""
    nty = pad_shape[0] // TILE_R
    ntx = pad_shape[1] // TILE_C
    start = np.round(points).astype(np.int64) - window // 2     # (N, 2)
    r0 = np.clip(start[:, 0] // TILE_R, 0, nty - 1)
    r1 = np.clip((start[:, 0] + window - 1) // TILE_R, 0, nty - 1)
    c0 = np.clip(start[:, 1] // TILE_C, 0, ntx - 1)
    c1 = np.clip((start[:, 1] + window - 1) // TILE_C, 0, ntx - 1)
    # drop candidates entirely outside the image
    inside = ((start[:, 0] + window > 0) & (start[:, 0] < shape[0])
              & (start[:, 1] + window > 0) & (start[:, 1] < shape[1]))
    ii = np.flatnonzero(inside)
    T = nty * ntx
    if len(ii) == 0:
        return np.zeros((T, 8), np.int32), np.zeros(T, np.int32), 8
    # vectorized (candidate, tile) pair enumeration over the small span grid
    nr = int((r1[ii] - r0[ii]).max()) + 1
    nc = int((c1[ii] - c0[ii]).max()) + 1
    t_list, i_list = [], []
    for dr in range(nr):
        for dc in range(nc):
            ok = (r0[ii] + dr <= r1[ii]) & (c0[ii] + dc <= c1[ii])
            sel = ii[ok]
            t_list.append((r0[sel] + dr) * ntx + (c0[sel] + dc))
            i_list.append(sel)
    t_arr = np.concatenate(t_list)
    i_arr = np.concatenate(i_list)
    order = np.argsort(t_arr, kind="stable")
    t_sorted = t_arr[order]
    i_sorted = i_arr[order]
    count = np.bincount(t_sorted, minlength=T).astype(np.int32)
    kmax = int(count.max(initial=1))
    K = 8
    while K < kmax:
        K *= 2
    offs = np.zeros(T, np.int64)
    offs[1:] = np.cumsum(count[:-1])
    pos = np.arange(len(t_sorted)) - np.repeat(offs, count)
    tile_idx = np.zeros((T, K), np.int32)
    tile_idx[t_sorted, pos] = i_sorted
    return tile_idx, count, K


def _kernel(count_ref, feats_ref, vals_ref, trig_ref, out_ref, *, R, window):
    # wedge membership via two cross-product signs per wedge (no atan2 —
    # unavailable in the Pallas TPU lowering, and the double-cross test is
    # the mathematically exact wedge selection):
    #   theta in [phi_k, phi_{k+1})  <=>  cross(dir_k, u) >= 0 and
    #                                     cross(dir_{k+1}, u) < 0
    t = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    base_r = pl.program_id(0) * TILE_R
    base_c = pl.program_id(1) * TILE_C
    rr = (base_r + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
          ).astype(jnp.float32)
    cc = (base_c + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)
          ).astype(jnp.float32)
    def body(k, acc):
        f = feats_ref[0, k, :]                   # (4R + 4,) f32
        cr = f[4 * R]
        ccen = f[4 * R + 1]
        w0r = f[4 * R + 2]                       # window start row (float)
        w0c = f[4 * R + 3]
        vali = vals_ref[0, k, 0]                 # int32 (packed order|label)
        ur = rr - cr
        uc = cc - ccen
        inside = (ur == 0.0) & (uc == 0.0)       # the center pixel
        for r in range(R):
            s_l = trig_ref[0, r]
            c_l = trig_ref[1, r]
            s_h = trig_ref[2, r]
            c_h = trig_ref[3, r]
            lo = c_l * ur - s_l * uc             # cross(dir_k, u)
            hi = c_h * ur - s_h * uc             # cross(dir_{k+1}, u)
            in_wedge = (lo >= 0.0) & (hi < 0.0)
            v0r = f[r]
            v0c = f[R + r]
            er = f[2 * R + r] - v0r
            ec = f[3 * R + r] - v0c
            cross_p = er * (uc - v0c) - ec * (ur - v0r)
            cross_c = ec * v0r - er * v0c
            inside = inside | (in_wedge & (cross_p * cross_c >= 0.0))
        # splat-window mask (same pixel set as the scatter rasterizer)
        in_win = ((rr >= w0r) & (rr < w0r + window)
                  & (cc >= w0c) & (cc < w0c + window))
        return jnp.maximum(acc, jnp.where(inside & in_win, vali, 0))

    n = count_ref[t]
    acc0 = jnp.zeros((TILE_R, TILE_C), jnp.int32)
    out_ref[:, :] = jax.lax.fori_loop(0, n, body, acc0)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _raster_tiles_call(feats, vals, tile_idx, counts, pad_shape, R, window,
                       interpret, packed):
    nty = pad_shape[0] // TILE_R
    ntx = pad_shape[1] // TILE_C
    # per-tile candidate rows gathered ON DEVICE (XLA gather) — the host only
    # ships the small (T, K) index lists and the (N, F) feature rows
    feats_tiles = feats[tile_idx]                    # (T, K, F)
    vals_tiles = vals[tile_idx][..., None]           # (T, K, 1)
    angles = np.arange(R + 1) * (2.0 * np.pi / R)
    trig = jnp.asarray(np.stack([
        np.sin(angles[:R]), np.cos(angles[:R]),
        np.sin(angles[1:]), np.cos(angles[1:])]).astype(np.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((1,) + feats_tiles.shape[1:],
                         lambda i, j, c: (i * ntx + j, 0, 0)),
            pl.BlockSpec((1, vals_tiles.shape[1], 1),
                         lambda i, j, c: (i * ntx + j, 0, 0)),
            pl.BlockSpec((4, R), lambda i, j, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_R, TILE_C), lambda i, j, c: (i, j)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, R=R, window=window),
        out_shape=jax.ShapeDtypeStruct(pad_shape, jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(counts, feats_tiles, vals_tiles, trig)
    if packed:
        # unpack (order << 16 | label+1) -> label on device; uint16 halves
        # the device->host transfer
        out = (out & 0xFFFF).astype(jnp.uint16)
    return out


def rasterize_polygons_tiles(dist, points, shape, order_values, labels=None,
                             window=None, k_cap=512, interpret=None):
    """Scatter-free tile rasterization of star polygons (2D, TPU Pallas).

    Same contract as ``rasterize_polygons(..., return_count=False)``: per
    pixel the candidate with the largest positive ``order_values`` entry
    wins; with ``labels``, the winner's value is ``labels[i] + 1``.
    Returns (label image int32, None), or None if the per-tile candidate
    density exceeds ``k_cap`` (caller falls back to the splat path).
    """
    dist = np.asarray(dist, np.float32)
    points = np.asarray(points, np.float32)
    order_values = np.asarray(order_values, np.int32)
    N, R = dist.shape
    if N == 0:
        return np.zeros(shape, np.int32), None
    if window is None:
        window = 2 * int(np.ceil(float(dist.max()))) + 4
    window = int(min(window, 2 * max(shape) + 4))
    pad_shape = (-(-shape[0] // TILE_R) * TILE_R, -(-shape[1] // TILE_C) * TILE_C)

    # pack (order << 16 | label+1) so the max resolves winner and label at once
    if labels is not None:
        labels = np.asarray(labels, np.int32)
        if (int(order_values.max(initial=0)) >= 1 << 15
                or int(labels.min(initial=0)) < 0
                or int(labels.max(initial=0)) + 1 >= 1 << 16):
            return None  # packing out of range -> fall back
        vals = (order_values.astype(np.int64) << 16) | (labels.astype(np.int64) + 1)
        vals = vals.astype(np.int32)
    else:
        vals = order_values

    tile_idx, counts, K = _bin_candidates(points, window, shape, pad_shape)
    if K > k_cap:
        return None

    # per-candidate feature rows: wedge vertex tables (match the JAX/native
    # rasterizers bit for bit: f64 trig tables cast to f32), center, packed
    # value, splat-window origin
    angles = np.arange(R) * (2.0 * np.pi / R)
    s0 = np.sin(angles).astype(np.float32)
    c0 = np.cos(angles).astype(np.float32)
    s1 = np.sin(angles + 2.0 * np.pi / R).astype(np.float32)
    c1 = np.cos(angles + 2.0 * np.pi / R).astype(np.float32)
    d1 = np.roll(dist, -1, axis=1)
    start = np.round(points).astype(np.float32) - np.float32(window // 2)
    feats = np.concatenate([
        dist * s0, dist * c0, d1 * s1, d1 * c1,
        points[:, :1], points[:, 1:2],
        start[:, :1], start[:, 1:2],
    ], axis=1)                                   # (N, 4R + 4)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = np.asarray(_raster_tiles_call(
        jnp.asarray(feats), jnp.asarray(vals), jnp.asarray(tile_idx),
        jnp.asarray(counts),
        pad_shape, R, int(window), bool(interpret),
        labels is not None))[:shape[0], :shape[1]]
    # packed case already unpacked on device to labels[i]+1 (0 = background)
    return out.astype(np.int32), None
