"""Non-maximum suppression of star polygons / polyhedra on TPU.

TPU-native equivalent of the reference C++ NMS kernels:
- 2D ``c_non_max_suppression_inds`` (stardist/lib/stardist2d.cpp:390-615):
  greedy score-descending suppression with overlap criterion
  ``A_inter / min(A_i, A_j) > thresh`` (exact Clipper polygon clipping).
- 3D ``_COMMON_non_maximum_suppression_sparse``
  (stardist/lib/stardist3d_impl.cpp:956-1385): same greedy loop with a
  bound cascade + voxel-rendered exact overlap.

Design: instead of per-pair exact clipping (irregular, host-bound), the
pairwise intersection is measured on a sampling grid over the bbox
intersection — continuous sub-pixel sampling in 2D, integer-lattice (voxel)
counting in 3D to agree with the voxel rasterizer's notion of overlap.
Areas/volumes in the denominator are analytic. The greedy pass reproduces
the reference's semantics exactly — a survivor suppresses all later
overlapping candidates; suppressed candidates suppress nothing — but is
resolved as the unique fixpoint of the triangular recursion via Jacobi
iteration on the (N, N) 0/1 suppression matrix (MXU matvecs), not as a
sequential scan (see `_greedy_fixpoint`).

Execution paths:
- device (default on TPU): one jit call builds the suppression matrix in
  row blocks (analytic bounds decide most pairs; exact sampled overlap on
  top_k-compacted ambiguous pairs) and runs the Jacobi fixpoint; arbitrary
  N via exact survivor-chunked rounds on a fixed-size kernel.
- dense (small N, CPU): full overlap matrix + greedy scan.
- blocked (large N, CPU): host-driven greedy with suppressed-row skipping,
  mirroring the reference's ``if suppressed[i]: continue`` row skipping.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .polygon import polygon_areas, polygon_bboxes, points_in_polygons
from .polyhedron import (
    polyhedron_bboxes,
    polyhedron_face_inverses,
    polyhedron_inner_radius,
    polyhedron_volumes,
    points_in_polyhedra,
)


def _bucket(n, minimum=16):
    b = minimum
    while b < n:
        b *= 2
    return b


def _pad(x, n, value=0.0):
    if x.shape[0] >= n:
        return x
    widths = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    if isinstance(x, np.ndarray):
        return np.pad(x, widths, constant_values=value)
    return jnp.pad(x, widths, constant_values=value)  # device array stays put


def _compact_pairs(ambiguous, A_max, P):
    """Two-level top_k compaction of an ambiguous-pair mask (Q, W):
    per-row top_k to A_max column slots, then block-wide top_k of the
    flattened slots to P pair slots, so downstream exact-overlap work runs
    on ~actual-pair-count slots instead of Q*W. Returns
    (pr row-in-block, pc column, pair_valid, max_amb, n_pairs) — max_amb >
    A_max or n_pairs > P signal compaction overflow (callers retry larger).
    Sort-based compaction: ~15x faster than a vmapped nonzero on TPU."""
    Q, W = ambiguous.shape
    col_pos = jnp.arange(W, dtype=jnp.int32)
    max_amb = jnp.max(jnp.sum(ambiguous, axis=1))
    keys = jnp.where(ambiguous, W - col_pos[None, :], 0)
    vals, amb_idx = jax.lax.top_k(keys, A_max)                   # (Q, A)
    amb_ok = vals > 0
    flat_ok = amb_ok.reshape(Q * A_max)
    n_pairs = jnp.sum(flat_ok)
    flat_pos = jnp.arange(Q * A_max, dtype=jnp.int32)
    keys2 = jnp.where(flat_ok, Q * A_max - flat_pos, 0)
    vals2, sel = jax.lax.top_k(keys2, P)
    pair_valid = vals2 > 0
    sel = jnp.where(pair_valid, sel, 0)
    return sel // A_max, amb_idx.reshape(Q * A_max)[sel], pair_valid, max_amb, n_pairs


# last-successful compaction capacities per kernel tag: subsequent calls on
# similar candidate fields start at the working sizes instead of re-discovering
# them through overflow retries (each retry is a full kernel re-run)
_RETRY_CAPS = {}


def _compact_pairs_chunked(ambiguous, A_max, P, C=16):
    """Two-level chunked variant of `_compact_pairs` for wide windows.

    Per-row top_k over the full W columns dominates the banded-NMS kernel
    cost (~90% at bench shapes); a sparse mask is compacted much cheaper in
    two stages: (1) top_k over per-chunk any-flags (W/C keys per row),
    (2) gather the <=A_max selected C-wide chunks with a 0/1 bfloat16 matmul
    (MXU) and top_k over the gathered A_max*C columns. Exactness: a row with
    more than A_max active chunks necessarily has more than A_max ambiguous
    columns, so the existing max_amb overflow retry already covers chunk
    overflow. Returns the same tuple contract as `_compact_pairs`.
    """
    Q, W = ambiguous.shape
    if W % C != 0 or W // C < A_max:
        return _compact_pairs(ambiguous, A_max, P)
    nC = W // C
    amb3 = ambiguous.reshape(Q, nC, C)
    flags = jnp.any(amb3, axis=-1)                              # (Q, nC)
    max_amb = jnp.max(jnp.sum(ambiguous, axis=1))
    chunk_pos = jnp.arange(nC, dtype=jnp.int32)
    keys_c = jnp.where(flags, nC - chunk_pos[None, :], 0)
    vals_c, cidx = jax.lax.top_k(keys_c, A_max)                 # (Q, A)
    chunk_ok = vals_c > 0
    cidx = jnp.where(chunk_ok, cidx, 0)
    # gather the selected chunks: 0/1 one-hot matmul (exact in bfloat16)
    oh = (cidx[:, :, None] == chunk_pos[None, None, :]).astype(jnp.bfloat16)
    seg = jnp.einsum("qkc,qcw->qkw", oh, amb3.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)        # (Q, A, C)
    seg = (seg > 0.5) & chunk_ok[:, :, None]
    Wg = A_max * C
    segf = seg.reshape(Q, Wg)
    g_pos = jnp.arange(Wg, dtype=jnp.int32)
    keys_g = jnp.where(segf, Wg - g_pos[None, :], 0)
    vals_g, gidx = jax.lax.top_k(keys_g, A_max)                 # (Q, A)
    amb_ok = vals_g > 0
    # gathered index -> original column
    sel_chunk = jnp.take_along_axis(cidx, gidx // C, axis=1)
    amb_idx = sel_chunk * C + gidx % C                          # (Q, A)
    amb_idx = jnp.where(amb_ok, amb_idx, 0)
    # block-level pair compaction (same as _compact_pairs stage 2)
    flat_ok = amb_ok.reshape(Q * A_max)
    n_pairs = jnp.sum(flat_ok)
    flat_pos = jnp.arange(Q * A_max, dtype=jnp.int32)
    keys2 = jnp.where(flat_ok, Q * A_max - flat_pos, 0)
    vals2, sel = jax.lax.top_k(keys2, P)
    pair_valid = vals2 > 0
    sel = jnp.where(pair_valid, sel, 0)
    return (sel // A_max, amb_idx.reshape(Q * A_max)[sel], pair_valid,
            max_amb, n_pairs)


def _compaction_retry(call, A0, P0, amb_cap, col_capacity, pair_cap_of,
                      a_min, p_min, verbose, tag):
    """Run a fixed-capacity NMS kernel, growing the ambiguous-column (A) and
    pair (P) slot capacities on overflow (bucketed so compile sizes repeat).
    Returns the kernel result, or None when max_amb exceeds ``amb_cap``
    (callers fall back to a host path)."""
    A, P = A0, P0
    cached = _RETRY_CAPS.get(tag)
    if cached is not None:
        A, P = max(A, cached[0]), max(P, cached[1])
    while True:
        A_p = min(_bucket(A, minimum=a_min), col_capacity)
        P_p = min(_bucket(P, minimum=p_min), pair_cap_of(A_p))
        suppressed, max_amb, max_pairs = call(A_p, P_p)
        max_amb = int(max_amb)
        max_pairs = int(max_pairs)
        amb_over = max_amb > A_p and A_p < col_capacity
        pairs_over = max_pairs > P_p and P_p < pair_cap_of(A_p)
        if not amb_over and not pairs_over:
            _RETRY_CAPS[tag] = (A_p, P_p)
            return suppressed
        if max_amb > amb_cap:
            if verbose:
                print(f"NMS: ambiguous columns {max_amb} exceed cap {amb_cap} "
                      f"({tag}); falling back", flush=True)
            return None
        if verbose:
            print(f"NMS: {tag} compaction overflow (amb {max_amb}/{A_p}, "
                  f"pairs {max_pairs}/{P_p}); retrying", flush=True)
        if amb_over:
            A = max_amb
        if pairs_over:
            P = max_pairs


# ---------------------------------------------------------------------------
# analytic bounds (cheap pre-pass; reference cascade stages 1-2,
# stardist3d_impl.cpp:1209-1330)
# ---------------------------------------------------------------------------

def _lens_area_lb(r1, r2, d):
    """Arccos-free LOWER bound of the disc-intersection area: area of the
    largest disc inscribed in the lens (radius (r1+r2-d)/2, capped at
    min(r1,r2)). Transcendental-free for the N^2 bounds sweep."""
    rho = jnp.maximum(jnp.minimum((r1 + r2 - d) * 0.5, jnp.minimum(r1, r2)), 0.0)
    return np.pi * rho * rho


def _lens_area_ub(r1, r2, d):
    """Arccos-free UPPER bound of the disc-intersection area: the lens fits
    in a w x h box (w along the center line) and in the smaller disc.

    The radical-line chord is the lens's widest cross-section ONLY when the
    radical line lies between the two centers (0 <= x1 <= d). Otherwise one
    disc (nearly) contains the other and the intersection is as tall as the
    smaller disc's diameter — using the chord there under-estimates the
    area and (as an upper bound) silently keeps heavily-overlapping pairs.
    """
    rmin = jnp.minimum(r1, r2)
    w = jnp.maximum(r1 + r2 - d, 0.0)
    d_safe = jnp.maximum(d, 1e-6)
    x1 = (d_safe * d_safe + r1 * r1 - r2 * r2) / (2 * d_safe)
    h_chord = 2.0 * jnp.sqrt(jnp.maximum(r1 * r1 - x1 * x1, 0.0))
    h = jnp.where((x1 >= 0.0) & (x1 <= d_safe), h_chord, 2.0 * rmin)
    return jnp.minimum(w * h, np.pi * rmin * rmin)


def _lens_volume_3d(r1, r2, d):
    """Intersection volume of two balls."""
    d = jnp.maximum(d, 1e-6)
    rmin = jnp.minimum(r1, r2)
    full = 4.0 / 3.0 * np.pi * rmin ** 3
    lens = (np.pi * (r1 + r2 - d) ** 2
            * (d ** 2 + 2 * d * (r1 + r2) - 3 * (r1 ** 2 + r2 ** 2) + 6 * r1 * r2)
            / (12 * d))
    return jnp.where(d >= r1 + r2, 0.0, jnp.where(d <= jnp.abs(r1 - r2), full, lens))


def _inner_radius_2d(dist):
    """Lower bound of the polygon inradius: min distance from the center to
    any edge's supporting line."""
    R = dist.shape[-1]
    dphi = 2 * np.pi / R
    d0 = dist
    d1 = jnp.roll(dist, -1, axis=-1)
    chord = jnp.sqrt(jnp.maximum(d0 ** 2 + d1 ** 2 - 2 * d0 * d1 * np.cos(dphi), 1e-12))
    return jnp.min(d0 * d1 * np.sin(dphi) / chord, axis=-1)


@jax.jit
def _bounds_block_2d(dist_r, points_r, dist_c, points_c, thresh):
    """(definite_suppress, definite_keep) bool (B, M) from disc/bbox bounds."""
    area_r = polygon_areas(dist_r)
    area_c = polygon_areas(dist_c)
    rin_r = _inner_radius_2d(dist_r)
    rin_c = _inner_radius_2d(dist_c)
    rout_r = jnp.max(dist_r, axis=-1)
    rout_c = jnp.max(dist_c, axis=-1)
    lo_r, hi_r = polygon_bboxes(dist_r, points_r)
    lo_c, hi_c = polygon_bboxes(dist_c, points_c)
    ext = jnp.maximum(jnp.minimum(hi_r[:, None], hi_c[None]) - jnp.maximum(lo_r[:, None], lo_c[None]), 0.0)
    bbox_inter = ext[..., 0] * ext[..., 1]
    dc = jnp.sqrt(jnp.sum((points_r[:, None] - points_c[None]) ** 2, axis=-1))
    denom = jnp.minimum(area_r[:, None], area_c[None]) + 1e-10
    ub = jnp.minimum(_lens_area_ub(rout_r[:, None], rout_c[None], dc), bbox_inter) / denom
    lb = _lens_area_lb(rin_r[:, None], rin_c[None], dc) / denom
    return lb > thresh, ub <= thresh


@jax.jit
def _bounds_block_3d(dist_r, points_r, dist_c, points_c, ray_dirs, faces, thresh):
    vol_r = polyhedron_volumes(dist_r, ray_dirs, faces)
    vol_c = polyhedron_volumes(dist_c, ray_dirs, faces)
    rin_r = polyhedron_inner_radius(dist_r, ray_dirs, faces)
    rin_c = polyhedron_inner_radius(dist_c, ray_dirs, faces)
    rout_r = jnp.max(dist_r, axis=-1)
    rout_c = jnp.max(dist_c, axis=-1)
    lo_r, hi_r = polyhedron_bboxes(dist_r, points_r, ray_dirs)
    lo_c, hi_c = polyhedron_bboxes(dist_c, points_c, ray_dirs)
    ext = jnp.maximum(jnp.minimum(hi_r[:, None], hi_c[None]) - jnp.maximum(lo_r[:, None], lo_c[None]), 0.0)
    bbox_inter = ext[..., 0] * ext[..., 1] * ext[..., 2]
    dc = jnp.sqrt(jnp.sum((points_r[:, None] - points_c[None]) ** 2, axis=-1))
    denom = jnp.minimum(vol_r[:, None], vol_c[None]) + 1e-10
    ub = jnp.minimum(_lens_volume_3d(rout_r[:, None], rout_c[None], dc), bbox_inter) / denom
    lb = _lens_volume_3d(rin_r[:, None], rin_c[None], dc) / denom
    return lb > thresh, ub <= thresh


# ---------------------------------------------------------------------------
# greedy scan
# ---------------------------------------------------------------------------

@jax.jit
def _greedy_scan(suppress_mat, valid):
    """suppress_mat[i, j] True if candidate i would suppress j (i < j in
    score order). Returns the boolean 'suppressed' vector."""
    N = suppress_mat.shape[0]
    idx = jnp.arange(N)

    def body(i, suppressed):
        row = suppress_mat[i] & (idx > i)
        new = suppressed | row
        keep_row = jnp.logical_not(suppressed[i]) & valid[i]
        return jnp.where(keep_row, new, suppressed)

    return jax.lax.fori_loop(0, N, body, ~valid)


# ---------------------------------------------------------------------------
# single-call device greedy NMS (2D)
# ---------------------------------------------------------------------------

def _greedy_fixpoint(sup_mat, valid):
    """Greedy survivors from the full pairwise suppression matrix.

    ``sup_mat[j, i]`` is nonzero (0/1 bfloat16) iff candidate j (earlier in
    score order) would suppress i *were j kept*. The greedy recursion

        keep[i] = valid[i] and not any_j (sup_mat[j, i] and keep[j])

    is triangular (sup only for j < i), hence has a UNIQUE fixpoint — the
    greedy result. Jacobi iteration (recompute all rows from the previous
    iterate) converges in O(longest suppression chain) steps: after t
    iterations every candidate whose suppression-dependency depth is <= t
    is final, and a stable iterate satisfies the recursion everywhere.
    This replaces the N sequential greedy steps of the reference C++ loop
    (stardist/lib/stardist2d.cpp:524-588) with a few vector-matrix products
    on the MXU — the TPU-native formulation (sequential scalar loops are
    latency-bound, and the 0/1 matvec `killed = keep @ sup` runs at matmul
    speed; counts are exact in the float32 accumulator).
    """
    N = sup_mat.shape[0]

    def cond(c):
        t, keep, changed = c
        return changed & (t < N)

    def body(c):
        t, keep, _ = c
        killed = jnp.dot(keep.astype(jnp.bfloat16), sup_mat,
                         preferred_element_type=jnp.float32) > 0.5
        new = valid & ~killed
        return t + 1, new, jnp.any(new != keep)

    _, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), valid, jnp.bool_(True)))
    return keep


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _greedy_nms_2d_device(dist, points, valid, established, thresh, B, A_max,
                          P, S):
    """Greedy NMS entirely on device in ONE call, two phases:

    1. build the full (N, N) 0/1 suppression matrix in row blocks of size B —
       analytic bounds decide most pairs; the remaining ambiguous pairs are
       compacted in two top_k levels (per-row to A_max columns, then
       block-wide to P pair slots) so the exact sampled overlap runs on
       ~actual-pair-count slots instead of B*N;
    2. resolve the greedy recursion with the Jacobi fixpoint
       (`_greedy_fixpoint`) — no per-candidate sequential scan.

    ``established`` (dynamic scalar): the first `established` rows are final
    survivors from earlier chunked rounds — they can suppress but can never
    be suppressed, so their columns are skipped (incl. the exact-overlap
    work). Returns (suppressed, max_amb, max_pairs); max_amb > A_max or
    max_pairs > P signal compaction overflow (host retries larger).
    """
    N, R = dist.shape
    lo, hi = polygon_bboxes(dist, points)          # (N, 2)
    area = polygon_areas(dist)
    rin = _inner_radius_2d(dist)
    rout = jnp.max(dist, axis=-1)
    col_ids = jnp.arange(N)

    n_blocks = N // B
    s_grid = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S

    def block_fill(b, carry):
        sup_acc, max_amb, max_pairs = carry
        i0 = b * B
        d_r = jax.lax.dynamic_slice_in_dim(dist, i0, B, 0)
        p_r = jax.lax.dynamic_slice_in_dim(points, i0, B, 0)
        lo_r = jax.lax.dynamic_slice_in_dim(lo, i0, B, 0)
        hi_r = jax.lax.dynamic_slice_in_dim(hi, i0, B, 0)
        a_r = jax.lax.dynamic_slice_in_dim(area, i0, B, 0)
        rin_r = jax.lax.dynamic_slice_in_dim(rin, i0, B, 0)
        rout_r = jax.lax.dynamic_slice_in_dim(rout, i0, B, 0)
        valid_r = jax.lax.dynamic_slice_in_dim(valid, i0, B, 0)

        # pairs that can matter: strictly later column, not an established
        # survivor, both ends valid
        row_ids = i0 + jnp.arange(B)
        pair_ok = ((col_ids[None, :] > row_ids[:, None])
                   & (col_ids[None, :] >= established)
                   & valid[None, :] & valid_r[:, None])

        # ---- bounds (B, N) ----
        ext = jnp.maximum(jnp.minimum(hi_r[:, None], hi[None]) -
                          jnp.maximum(lo_r[:, None], lo[None]), 0.0)
        bbox_inter = ext[..., 0] * ext[..., 1]
        dc = jnp.sqrt(jnp.sum((p_r[:, None] - points[None]) ** 2, axis=-1))
        denom = jnp.minimum(a_r[:, None], area[None]) + 1e-10
        ub = jnp.minimum(_lens_area_ub(rout_r[:, None], rout[None], dc), bbox_inter) / denom
        lb = _lens_area_lb(rin_r[:, None], rin[None], dc) / denom
        sup_mat = (lb > thresh) & pair_ok
        ambiguous = ~sup_mat & ~(ub <= thresh) & pair_ok
        pr, pc, pair_valid, amb_b, pairs_b = _compact_pairs(ambiguous, A_max, P)
        max_amb = jnp.maximum(max_amb, amb_b)
        max_pairs = jnp.maximum(max_pairs, pairs_b)

        # ---- exact sampled overlap on the P compacted pairs ----
        d_rp, p_rp = d_r[pr], p_r[pr]
        lo_rp, hi_rp, a_rp = lo_r[pr], hi_r[pr], a_r[pr]
        d_cp, p_cp = dist[pc], points[pc]
        lo_cp, hi_cp, a_cp = lo[pc], hi[pc], area[pc]

        plo = jnp.maximum(lo_rp, lo_cp)                          # (P, 2)
        phi = jnp.minimum(hi_rp, hi_cp)
        extp = jnp.maximum(phi - plo, 0.0)
        qr = plo[:, 0, None, None] + s_grid[:, None] * extp[:, 0, None, None]
        qc = plo[:, 1, None, None] + s_grid[None, :] * extp[:, 1, None, None]
        q = jnp.stack(jnp.broadcast_arrays(qr, qc), axis=-1).reshape(P, S * S, 2)
        in_r = points_in_polygons(d_rp, p_rp, q)
        in_c = points_in_polygons(d_cp, p_cp, q)
        frac = jnp.mean(in_r & in_c, axis=-1)
        inter = frac * extp[:, 0] * extp[:, 1]
        exact_sup = inter / (jnp.minimum(a_rp, a_cp) + 1e-10) > thresh

        sup_mat = sup_mat.at[pr, pc].max(exact_sup & pair_valid)
        sup_mat = sup_mat & pair_ok
        sup_acc = jax.lax.dynamic_update_slice_in_dim(
            sup_acc, sup_mat.astype(jnp.bfloat16), i0, 0)
        return sup_acc, max_amb, max_pairs

    sup0 = jnp.zeros((N, N), jnp.bfloat16)
    sup_mat, max_amb, max_pairs = jax.lax.fori_loop(
        0, n_blocks, block_fill, (sup0, jnp.int32(0), jnp.int32(0)))
    keep = _greedy_fixpoint(sup_mat, valid)
    return ~keep, max_amb, max_pairs


# ---------------------------------------------------------------------------
# banded device greedy NMS (2D): single call for large N
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def _greedy_nms_2d_banded(dist, points, rank, valid, established, thresh,
                          Q, NB, A_max, P, S):
    """Banded variant of `_greedy_nms_2d_device` for candidates pre-sorted by
    row coordinate: a pair can only suppress when the centers are closer than
    r_out_i + r_out_j <= 2*max(dist), so in y-sorted order all undecided pairs
    of a Q-row block live in a window of (2*NB+1)*Q consecutive columns.
    The suppression structure is a band (N, W) instead of (N, N) — one kernel
    call replaces the survivor-chunked rounds at large N. `rank` is the
    original score order; greedy direction and the `established`-survivor
    skip use ranks instead of positions (the layout is y-order, not score
    order). Greedy semantics are identical to the reference C++ loop
    (stardist/lib/stardist2d.cpp:524-588), resolved by a band Jacobi fixpoint
    (batched matvecs over the band blocks).
    """
    N, R = dist.shape
    n_blocks = N // Q
    W = (2 * NB + 1) * Q
    pad = NB * Q
    lo, hi = polygon_bboxes(dist, points)
    area = polygon_areas(dist)
    rin = _inner_radius_2d(dist)
    rout = jnp.max(dist, axis=-1)

    def padw(x, value):
        widths = [(pad, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=value)

    # column-side arrays padded by NB blocks on both ends so every row
    # block's window is a plain dynamic slice (pad slots are invalid)
    dist_p = padw(dist, 1e-3)
    points_p = padw(points, -1e9)
    lo_p = padw(lo, -1e9)
    hi_p = padw(hi, -1e9)
    area_p = padw(area, 1.0)
    rin_p = padw(rin, 1e-3)
    rout_p = padw(rout, 1e-3)
    valid_p = padw(valid, False)
    rank_p = padw(rank, jnp.int32(2 ** 30))

    s_grid = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    col_pos = jnp.arange(W, dtype=jnp.int32)

    def block_fill(b, carry):
        sup_acc, max_amb, max_pairs = carry
        i0 = b * Q
        slr = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, Q, 0)
        slc = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, W, 0)
        d_r, p_r = slr(dist), slr(points)
        lo_r, hi_r, a_r = slr(lo), slr(hi), slr(area)
        rin_r, rout_r = slr(rin), slr(rout)
        valid_r, rank_r = slr(valid), slr(rank)
        d_c, p_c = slc(dist_p), slc(points_p)
        lo_c, hi_c, a_c = slc(lo_p), slc(hi_p), slc(area_p)
        rin_c, rout_c = slc(rin_p), slc(rout_p)
        valid_c, rank_c = slc(valid_p), slc(rank_p)

        pair_ok = ((rank_c[None, :] > rank_r[:, None])
                   & (rank_c[None, :] >= established)
                   & valid_c[None, :] & valid_r[:, None])

        # ---- bounds (Q, W) ----
        ext = jnp.maximum(jnp.minimum(hi_r[:, None], hi_c[None]) -
                          jnp.maximum(lo_r[:, None], lo_c[None]), 0.0)
        bbox_inter = ext[..., 0] * ext[..., 1]
        dc = jnp.sqrt(jnp.sum((p_r[:, None] - p_c[None]) ** 2, axis=-1))
        denom = jnp.minimum(a_r[:, None], a_c[None]) + 1e-10
        ub = jnp.minimum(_lens_area_ub(rout_r[:, None], rout_c[None], dc), bbox_inter) / denom
        lb = _lens_area_lb(rin_r[:, None], rin_c[None], dc) / denom
        sup_blk = (lb > thresh) & pair_ok
        ambiguous = ~sup_blk & ~(ub <= thresh) & pair_ok
        pr, pc, pair_valid, amb_b, pairs_b = _compact_pairs_chunked(
            ambiguous, A_max, P)
        max_amb = jnp.maximum(max_amb, amb_b)
        max_pairs = jnp.maximum(max_pairs, pairs_b)

        # ---- exact sampled overlap on the P compacted pairs ----
        # pair-row fetch as one-hot f32 matmuls (MXU) instead of gathers —
        # TPUs have no gather unit; selecting-by-sum is exact (non-selected
        # terms contribute 0.0)
        F_r = jnp.concatenate([d_r, p_r, lo_r, hi_r, a_r[:, None]], axis=1)
        F_c = jnp.concatenate([d_c, p_c, lo_c, hi_c, a_c[:, None]], axis=1)
        oh_r = (pr[:, None] == jnp.arange(Q, dtype=jnp.int32)).astype(jnp.float32)
        oh_c = (pc[:, None] == col_pos).astype(jnp.float32)
        G_r = jnp.dot(oh_r, F_r, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)        # (P, R+7)
        G_c = jnp.dot(oh_c, F_c, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
        d_rp, p_rp = G_r[:, :R], G_r[:, R:R + 2]
        lo_rp, hi_rp, a_rp = G_r[:, R + 2:R + 4], G_r[:, R + 4:R + 6], G_r[:, R + 6]
        d_cp, p_cp = G_c[:, :R], G_c[:, R:R + 2]
        lo_cp, hi_cp, a_cp = G_c[:, R + 2:R + 4], G_c[:, R + 4:R + 6], G_c[:, R + 6]

        plo = jnp.maximum(lo_rp, lo_cp)                          # (P, 2)
        phi = jnp.minimum(hi_rp, hi_cp)
        extp = jnp.maximum(phi - plo, 0.0)
        qr = plo[:, 0, None, None] + s_grid[:, None] * extp[:, 0, None, None]
        qc = plo[:, 1, None, None] + s_grid[None, :] * extp[:, 1, None, None]
        q = jnp.stack(jnp.broadcast_arrays(qr, qc), axis=-1).reshape(P, S * S, 2)
        in_r = points_in_polygons(d_rp, p_rp, q)
        in_c = points_in_polygons(d_cp, p_cp, q)
        frac = jnp.mean(in_r & in_c, axis=-1)
        inter = frac * extp[:, 0] * extp[:, 1]
        exact_sup = inter / (jnp.minimum(a_rp, a_cp) + 1e-10) > thresh

        sup_blk = sup_blk.at[pr, pc].max(exact_sup & pair_valid)
        sup_blk = sup_blk & pair_ok
        sup_acc = jax.lax.dynamic_update_slice(
            sup_acc, sup_blk.astype(jnp.bfloat16)[None], (b, 0, 0))
        return sup_acc, max_amb, max_pairs

    sup0 = jnp.zeros((n_blocks, Q, W), jnp.bfloat16)
    sup, max_amb, max_pairs = jax.lax.fori_loop(
        0, n_blocks, block_fill, (sup0, jnp.int32(0), jnp.int32(0)))

    # ---- band Jacobi fixpoint (see _greedy_fixpoint for the argument) ----
    def cond(c):
        t, keep, changed = c
        return changed & (t < N)

    def body(c):
        t, keep, _ = c
        contrib = jnp.einsum(
            "bq,bqw->bw", keep.reshape(n_blocks, Q).astype(jnp.bfloat16), sup,
            preferred_element_type=jnp.float32)                  # (n_blocks, W)
        contrib3 = contrib.reshape(n_blocks, 2 * NB + 1, Q)
        killed_pad = jnp.zeros(N + 2 * pad, jnp.float32)
        for o in range(2 * NB + 1):                              # static, small
            piece = contrib3[:, o, :].reshape(N)
            killed_pad = killed_pad + jnp.pad(piece, (o * Q, (2 * NB - o) * Q))
        killed = killed_pad[pad:pad + N] > 0.5
        new = valid & ~killed
        return t + 1, new, jnp.any(new != keep)

    _, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), valid, jnp.bool_(True)))
    return ~keep, max_amb, max_pairs


# last-call per-stage NMS counters (reference verbose cascade
# instrumentation, stardist3d_impl.cpp:1343-1366); read via
# `stardist_tpu.ops.nms.LAST_NMS_COUNTERS` and surfaced in the
# predict_instances details dict
LAST_NMS_COUNTERS = {}


@functools.partial(jax.jit, static_argnums=(4, 5, 7))
def _peel_2d(dist, points, rank, valid, Q, NB, thresh, S=16):
    """Provably-exact candidate peeling before the full greedy kernel.

    Banded sweeps over y-sorted candidates:

    (a) *definite survivors*: a candidate with no earlier-rank candidate
        within center distance ``rout_i + rout_j`` cannot be suppressed by
        anyone — suppression needs a positive-area polygon intersection
        (``A_inter/min(A) > thresh >= 0``), which requires
        ``dc < rout_i + rout_j``, and only earlier-rank candidates suppress
        (reference greedy loop, stardist/lib/stardist2d.cpp:524-588);
    (b) *definitely suppressed (bound)*: a candidate whose inscribed-disc
        lens LOWER bound of overlap vs some earlier-rank definite survivor
        exceeds ``thresh`` is suppressed in the true greedy pass (that
        survivor is guaranteed kept when the candidate is processed);
    (c) *definitely suppressed (exact)*: for candidates still undecided,
        the exact sampled overlap (the same S x S estimator the main kernel
        uses) vs the NEAREST earlier-rank definite survivor — one pair per
        candidate, so this costs O(N) exact tests instead of O(pairs).

    Definitely-suppressed candidates never suppress anyone, so removing
    them from the candidate set leaves the greedy result unchanged; the
    expensive all-pairs kernel then runs on the (typically several-fold
    smaller) remainder. Returns (defsurv, killed) bool (N,).
    """
    N = dist.shape[0]
    n_blocks = N // Q
    W = (2 * NB + 1) * Q
    pad = NB * Q
    area = polygon_areas(dist)
    rin = _inner_radius_2d(dist)
    rout = jnp.max(dist, axis=-1)

    def padw(x, value):
        widths = [(pad, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=value)

    points_p = padw(points, -1e9)
    rout_p = padw(rout, 1e-3)
    rin_p = padw(rin, 1e-3)
    area_p = padw(area, 1.0)
    valid_p = padw(valid, False)
    rank_p = padw(rank, jnp.int32(2 ** 30))

    def sweep1(b, defsurv):
        i0 = b * Q
        slr = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, Q, 0)
        slc = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, W, 0)
        p_r, rout_r, rank_r = slr(points), slr(rout), slr(rank)
        p_c, rout_c = slc(points_p), slc(rout_p)
        valid_c, rank_c = slc(valid_p), slc(rank_p)
        d2 = jnp.sum((p_r[:, None] - p_c[None]) ** 2, axis=-1)
        rr = rout_r[:, None] + rout_c[None]
        earlier = (rank_c[None, :] < rank_r[:, None]) & valid_c[None, :]
        reach = earlier & (d2 < rr * rr)
        ds = ~jnp.any(reach, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(defsurv, ds, i0, 0)

    defsurv = jax.lax.fori_loop(0, n_blocks, sweep1, jnp.zeros(N, bool))
    defsurv = defsurv & valid
    defsurv_p = padw(defsurv, False)

    def sweep2(b, carry):
        killed, nn = carry
        i0 = b * Q
        slr = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, Q, 0)
        slc = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, W, 0)
        p_r, rank_r = slr(points), slr(rank)
        rin_r, area_r = slr(rin), slr(area)
        p_c, rank_c = slc(points_p), slc(rank_p)
        rin_c, area_c = slc(rin_p), slc(area_p)
        ds_c = slc(defsurv_p)
        d2 = jnp.sum((p_r[:, None] - p_c[None]) ** 2, axis=-1)
        dc = jnp.sqrt(d2)
        denom = jnp.minimum(area_r[:, None], area_c[None]) + 1e-10
        lb = _lens_area_lb(rin_c[None], rin_r[:, None], dc) / denom
        earlier_ds = ds_c[None, :] & (rank_c[None, :] < rank_r[:, None])
        kb = jnp.any(earlier_ds & (lb > thresh), axis=1)
        # nearest earlier definite survivor (global y-order index, -1 = none)
        d2m = jnp.where(earlier_ds, d2, jnp.inf)
        a = jnp.argmin(d2m, axis=1)
        has = jnp.take_along_axis(d2m, a[:, None], axis=1)[:, 0] < jnp.inf
        nn_b = jnp.where(has, i0 - pad + a, -1)
        return (jax.lax.dynamic_update_slice_in_dim(killed, kb, i0, 0),
                jax.lax.dynamic_update_slice_in_dim(nn, nn_b, i0, 0))

    killed, nn = jax.lax.fori_loop(
        0, n_blocks, sweep2,
        (jnp.zeros(N, bool), jnp.full(N, -1, jnp.int32)))
    killed = killed & valid & ~defsurv

    # (c) exact sampled overlap vs the nearest earlier definite survivor —
    # same estimator as the main kernel's exact stage, one pair per candidate
    lo, hi = polygon_bboxes(dist, points)
    s_grid = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    CH = min(4096, N)
    n_chunks = (N + CH - 1) // CH

    def exact_chunk(c, killed):
        i0 = c * CH
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, CH, 0)
        nn_c = sl(nn)
        todo = (nn_c >= 0) & ~sl(killed)
        i_idx = jnp.where(nn_c >= 0, nn_c, 0)
        d_r, p_r = sl(dist), sl(points)
        lo_r, hi_r, a_r = sl(lo), sl(hi), sl(area)
        d_c, p_c = dist[i_idx], points[i_idx]
        lo_c, hi_c, a_c = lo[i_idx], hi[i_idx], area[i_idx]
        plo = jnp.maximum(lo_r, lo_c)
        phi2 = jnp.minimum(hi_r, hi_c)
        extp = jnp.maximum(phi2 - plo, 0.0)
        qr = plo[:, 0, None, None] + s_grid[:, None] * extp[:, 0, None, None]
        qc = plo[:, 1, None, None] + s_grid[None, :] * extp[:, 1, None, None]
        q = jnp.stack(jnp.broadcast_arrays(qr, qc), axis=-1).reshape(CH, S * S, 2)
        in_r = points_in_polygons(d_r, p_r, q)
        in_c = points_in_polygons(d_c, p_c, q)
        frac = jnp.mean(in_r & in_c, axis=-1)
        inter = frac * extp[:, 0] * extp[:, 1]
        kill_c = todo & (inter / (jnp.minimum(a_r, a_c) + 1e-10) > thresh)
        cur = jax.lax.dynamic_slice_in_dim(killed, i0, CH, 0)
        return jax.lax.dynamic_update_slice_in_dim(killed, cur | kill_c, i0, 0)

    if N % CH == 0:
        killed = jax.lax.fori_loop(0, n_chunks, exact_chunk, killed)
        killed = killed & valid & ~defsurv
    return defsurv, killed


# -- striped two-pass peel ---------------------------------------------------
#
# The y-band peel above pays for ALL candidates within |dy| < T — on dense
# fields that band is thousands wide although interactions also need
# |dx| < T. Stripe decomposition recovers the 2D locality with 1D sorts:
# partition the axis into stripes of height 2T at offsets 0 and T. Any pair
# with |dy| < T lies inside ONE stripe of at least one partition (an
# interval of length < T containing a boundary of one partition is strictly
# inside a stripe of the other — boundaries alternate every T). Sorting each
# partition by (stripe, x) makes same-stripe interacting pairs band-local
# with band width ~ stripe_density * 2T (tens, not thousands). Each sweep
# runs once per layout; results combine as ds = ds_a & ds_b (a definite
# survivor must clear ALL potential suppressors) and killed = k_a | k_b.


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11, 12, 13))
def _peel_2d_fused(dist, points, rank, n_real, thresh, T, gap, x0,
                   axis, Q, NB, S, CH, P):
    """One-dispatch striped peel: stripe keys, both layout sorts, both
    sweeps, and a compacted exact stage in a single jit (a multi-dispatch
    version spent more on host round trips than on compute).

    dist/points/rank are padded to a bucketed Npad (pad sentinels: dist
    1e-3, points 1e9, rank 2^30); ``n_real`` is traced. ``T`` (the
    interaction radius bound, > 2*max_dist), ``gap`` (> x-extent + 2T) and
    ``x0`` are traced so per-image geometry never recompiles. Static: the
    stripe axis, block size Q, band width NB (verified in-kernel, see
    ``band_ok``), exact-stage sampling S, chunk CH, exact capacity P.

    Returns (defsurv, killed, band_ok, n_todo) — base order. ``band_ok``
    False means NB was too small for this field (caller retries with a
    bigger bucket; results are invalid). Peeling is conservative: exact
    kills beyond the P capacity are simply skipped.
    """
    Npad = dist.shape[0]
    pad = NB * Q
    n_blocks = Npad // Q
    W = (2 * NB + 1) * Q
    valid = jnp.arange(Npad) < n_real
    y = points[:, axis]
    x = points[:, 1 - axis]
    area = polygon_areas(dist)
    rin = _inner_radius_2d(dist)
    rout = jnp.max(dist, axis=-1)
    stripe_h = 2.0 * T
    base_idx = jnp.arange(Npad, dtype=jnp.int32)

    def padw(v, value):
        return jnp.pad(v, (pad, pad), constant_values=value)

    # -- per-layout data: one multi-operand sort carries every per-candidate
    # scalar along with its stripe key (no gathers), then band-pad once ----
    layouts = []
    band_ok = jnp.bool_(True)
    for off in (0.0, 0.5):
        stripe = jnp.floor((y + off * stripe_h) / stripe_h)
        key = jnp.where(valid, stripe * gap + (x - x0), jnp.inf)
        (key_s, py_s, px_s, rout_s, rin_s, area_s, rank_s, perm) = \
            jax.lax.sort((key, points[:, 0], points[:, 1], rout, rin, area,
                          rank, base_idx), dimension=0, num_keys=1)
        # band coverage: the element just outside each block's band must be
        # farther than T in key space (pads sort to the end as +inf)
        i0s = jnp.arange(n_blocks) * Q
        i1s = i0s + Q - 1
        li = i0s - pad - 1
        ri = i1s + pad + 1
        lkey = key_s[jnp.clip(li, 0, Npad - 1)]
        rkey = key_s[jnp.clip(ri, 0, Npad - 1)]
        l_ok = (li < 0) | ~jnp.isfinite(key_s[i0s]) | (lkey < key_s[i0s] - T)
        r_ok = ((ri >= Npad) | ~jnp.isfinite(key_s[i1s])
                | (rkey > key_s[i1s] + T))
        band_ok = band_ok & jnp.all(l_ok & r_ok)
        L = dict(
            p=jnp.stack([padw(py_s, 1e9), padw(px_s, 1e9)], axis=-1),
            rout=padw(rout_s, 1e-3), rin=padw(rin_s, 1e-3),
            area=padw(area_s, 1.0),
            rank=padw(rank_s, jnp.int32(2 ** 30)),
            valid=padw(jnp.isfinite(key_s), False),
            perm=perm, perm_pad=padw(perm, jnp.int32(-1)),
        )
        layouts.append(L)

    # Banded sweeps are batched over GROUPS of blocks: a per-block fori_loop
    # serializes thousands of tiny (Q, W) steps (measured ~0.3-0.5 ms each on
    # v5e — the dominant NMS cost at production N), while a (G, Q, W) batched
    # step keeps the VPU saturated. G bounds the intermediates to ~tens of MB;
    # it shrinks as the NB band-retry widens (G*(2NB+1) ~ const) so the
    # (G, Q, W) f32 temporaries stay bounded across retries instead of
    # ballooning exactly on the pathological fields that trigger wide bands.
    G = max(1, min(192 // (2 * NB + 1), n_blocks))
    while n_blocks % G:
        G //= 2
    n_groups = n_blocks // G

    def windows(a_padded, g, F_last=None):
        """(G, Q, ...) row blocks and (G, W, ...) band windows of group g."""
        i0 = g * G * Q
        rows = jax.lax.dynamic_slice_in_dim(a_padded, i0 + pad, G * Q, 0)
        rows = rows.reshape((G, Q) + a_padded.shape[1:])
        seg = jax.lax.dynamic_slice_in_dim(a_padded, i0, (G + 2 * NB) * Q, 0)
        view = seg.reshape((G + 2 * NB, Q) + a_padded.shape[1:])
        win = jnp.concatenate([view[k:k + G] for k in range(2 * NB + 1)],
                              axis=1)                    # (G, W, ...)
        return rows, win

    # -- sweep 1: definite survivors (no earlier candidate within reach) ---
    ds_base = valid
    for L in layouts:
        p_L, rout_L, rank_L, valid_L = L["p"], L["rout"], L["rank"], L["valid"]

        def sweep1(g, ds):
            p_r, p_c = windows(p_L, g)
            rout_r, rout_c = windows(rout_L, g)
            rank_r, rank_c = windows(rank_L, g)
            _, valid_c = windows(valid_L, g)
            d2 = jnp.sum((p_r[:, :, None] - p_c[:, None]) ** 2, axis=-1)
            rr = rout_r[:, :, None] + rout_c[:, None]
            earlier = ((rank_c[:, None] < rank_r[:, :, None])
                       & valid_c[:, None])
            reach = earlier & (d2 < rr * rr)
            ds_g = ~jnp.any(reach, axis=2)               # (G, Q)
            return jax.lax.dynamic_update_slice_in_dim(
                ds, ds_g.reshape(G * Q), g * G * Q, 0)

        ds_L = jax.lax.fori_loop(0, n_groups, sweep1, jnp.zeros(Npad, bool))
        ds_base = ds_base & jnp.zeros(Npad, bool).at[L["perm"]].set(ds_L)
    defsurv = ds_base & valid

    # -- sweep 2: lens lower-bound kills + nearest plausible survivor ------
    killed = jnp.zeros(Npad, bool)
    nn = jnp.full(Npad, -1, jnp.int32)
    d2n = jnp.full(Npad, jnp.inf, jnp.float32)
    for L in layouts:
        p_L, rank_L = L["p"], L["rank"]
        rin_L, rout_L, area_L = L["rin"], L["rout"], L["area"]
        ds_L = padw(defsurv[L["perm"]], False)
        perm_pad = L["perm_pad"]

        def sweep2(g, carry):
            kd, nnc, d2c = carry
            p_r, p_c = windows(p_L, g)
            rank_r, rank_c = windows(rank_L, g)
            rin_r, rin_c = windows(rin_L, g)
            rout_r, rout_c = windows(rout_L, g)
            area_r, area_c = windows(area_L, g)
            _, dsc = windows(ds_L, g)
            d2 = jnp.sum((p_r[:, :, None] - p_c[:, None]) ** 2, axis=-1)
            dc = jnp.sqrt(d2)
            denom = jnp.minimum(area_r[:, :, None], area_c[:, None]) + 1e-10
            lb = _lens_area_lb(rin_c[:, None], rin_r[:, :, None], dc) / denom
            earlier_ds = dsc[:, None] & (rank_c[:, None] < rank_r[:, :, None])
            kb = jnp.any(earlier_ds & (lb > thresh), axis=2)
            # exact-stage neighbor: nearest whose lens UPPER bound clears
            # the threshold (others provably cannot kill)
            ub = _lens_area_ub(rout_c[:, None], rout_r[:, :, None], dc) / denom
            plaus = earlier_ds & (ub > thresh)
            d2m = jnp.where(plaus, d2, jnp.inf)
            a = jnp.argmin(d2m, axis=2)                   # (G, Q)
            d2n_b = jnp.min(d2m, axis=2)
            # window-local column -> global padded row of this layout
            i0 = g * G * Q
            base = i0 + jnp.arange(G, dtype=jnp.int32)[:, None] * Q
            nn_b = jnp.where(d2n_b < jnp.inf,
                             jnp.take(perm_pad, base + a), -1)
            return (jax.lax.dynamic_update_slice_in_dim(
                        kd, kb.reshape(G * Q), i0, 0),
                    jax.lax.dynamic_update_slice_in_dim(
                        nnc, nn_b.reshape(G * Q), i0, 0),
                    jax.lax.dynamic_update_slice_in_dim(
                        d2c, d2n_b.reshape(G * Q), i0, 0))

        kd0 = (jnp.zeros(Npad, bool), jnp.full(Npad, -1, jnp.int32),
               jnp.full(Npad, jnp.inf, jnp.float32))
        kd_L, nn_L, d2_L = jax.lax.fori_loop(0, n_groups, sweep2, kd0)
        kd_b = jnp.zeros(Npad, bool).at[L["perm"]].set(kd_L)
        nn_bse = jnp.full(Npad, -1, jnp.int32).at[L["perm"]].set(nn_L)
        d2_bse = jnp.full(Npad, jnp.inf, jnp.float32).at[L["perm"]].set(d2_L)
        killed = killed | kd_b
        closer = d2_bse < d2n
        nn = jnp.where(closer, nn_bse, nn)
        d2n = jnp.where(closer, d2_bse, d2n)
    killed = killed & valid & ~defsurv

    # -- exact stage: compacted, capacity P --------------------------------
    todo = (nn >= 0) & ~killed & ~defsurv & valid
    n_todo = jnp.sum(todo.astype(jnp.int32))
    ordr = jnp.argsort(~todo)              # stable: todo candidates first
    idx = ordr[:P]
    todo_s = todo[idx]
    d_s = jnp.take(dist, idx, axis=0)
    p_s = jnp.take(points, idx, axis=0)
    a_s = jnp.take(area, idx, axis=0)
    nn_s = jnp.take(nn, idx, axis=0)
    lo, hi = polygon_bboxes(dist, points)
    lo_s = jnp.take(lo, idx, axis=0)
    hi_s = jnp.take(hi, idx, axis=0)
    s_grid = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S

    def exact_chunk(c, kill_sel):
        i0 = c * CH
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, CH, 0)
        nn_c = sl(nn_s)
        i_idx = jnp.where(nn_c >= 0, nn_c, 0)
        d_r, p_r = sl(d_s), sl(p_s)
        lo_r, hi_r, a_r = sl(lo_s), sl(hi_s), sl(a_s)
        d_c, p_c = dist[i_idx], points[i_idx]
        lo_c, hi_c, a_c = lo[i_idx], hi[i_idx], area[i_idx]
        plo = jnp.maximum(lo_r, lo_c)
        phi2 = jnp.minimum(hi_r, hi_c)
        extp = jnp.maximum(phi2 - plo, 0.0)
        qr = plo[:, 0, None, None] + s_grid[:, None] * extp[:, 0, None, None]
        qc = plo[:, 1, None, None] + s_grid[None, :] * extp[:, 1, None, None]
        q = jnp.stack(jnp.broadcast_arrays(qr, qc), axis=-1).reshape(CH, S * S, 2)
        in_r = points_in_polygons(d_r, p_r, q)
        in_c = points_in_polygons(d_c, p_c, q)
        frac = jnp.mean(in_r & in_c, axis=-1)
        inter = frac * extp[:, 0] * extp[:, 1]
        kill_c = sl(todo_s) & (nn_c >= 0) & (
            inter / (jnp.minimum(a_r, a_c) + 1e-10) > thresh)
        return jax.lax.dynamic_update_slice_in_dim(kill_sel, kill_c, i0, 0)

    kill_sel = jax.lax.fori_loop(0, P // CH, exact_chunk,
                                 jnp.zeros(P, bool))
    killed = killed | jnp.zeros(Npad, bool).at[idx].set(kill_sel)
    killed = killed & valid & ~defsurv
    return defsurv, killed, band_ok, n_todo




def _peel_2d_striped(dist, points, rank, thresh, T, Q=256, S=16):
    """Striped two-pass peel driver (see block comment above): pad to a
    bucketed size, run the fused kernel, retry with a wider band bucket in
    the (rare) case the in-kernel coverage check fails. Returns
    (defsurv, killed) host bool arrays in base order — identical peeling
    semantics to `_peel_2d` (definite survivors must clear all interacting
    pairs across BOTH layouts; kills only ever test against definite
    survivors with the main kernel's own overlap estimator)."""
    N = len(points)
    points = np.asarray(points, np.float32)
    axis = int(np.argmax(points.max(0) - points.min(0)))
    x = points[:, 1 - axis]
    x0 = float(x.min())
    gap = float(x.max() - x0) + 2.0 * float(T) + 2.0
    Npad = _bucket(N, minimum=2 * Q)
    P = min(Npad, 131072)  # exact-stage capacity; spills just peel less
    CH = min(4096, P)
    dist_p = _pad(jnp.asarray(dist), Npad, value=1e-3)
    points_p = jnp.asarray(_pad(points, Npad, value=1e9))
    rank_p = jnp.asarray(_pad(np.asarray(rank, np.int32), Npad,
                              value=2 ** 30))
    for NB in (1, 2, 4, 8):
        defsurv, killed, ok, _ = _peel_2d_fused(
            dist_p, points_p, rank_p, jnp.int32(N), jnp.float32(thresh),
            jnp.float32(T), jnp.float32(gap), jnp.float32(x0),
            axis, Q, NB, S, CH, P)
        if bool(jax.device_get(ok)):
            return defsurv[:N], killed[:N]
    # pathological clustering: fall back to "peel nothing" (still correct)
    z = jnp.zeros(N, bool)
    return z, z

def _band_width_blocks(y_sorted, Q, T, n_real=None):
    """Smallest NB such that, for every Q-block of y-sorted candidates, all
    candidates within |dy| < T of the block live within +-NB blocks.

    ``n_real``: number of real (non-pad) candidates at the front of
    ``y_sorted``. Pad slots (sentinel y values) neither need coverage nor
    count as neighbors — including them would inflate NB by the number of
    pad blocks (they all share one y value).

    The result is rounded UP to a small bucket set (1, 2, 3, 4, 6, 8, ...):
    NB is a static jit argument of the banded kernels, so every distinct
    value costs a full recompile (minutes through a remote-TPU tunnel); a
    slightly wider band trades a bit of bounded extra compute for
    compile-cache hits."""
    n = len(y_sorted) if n_real is None else int(n_real)
    ys = y_sorted[:n]
    n_blocks = (n + Q - 1) // Q
    nb = 1
    for b in range(n_blocks):
        i0, i1 = b * Q, min((b + 1) * Q, n) - 1
        lo_idx = int(np.searchsorted(ys, ys[i0] - T, side="left"))
        hi_idx = int(np.searchsorted(ys, ys[i1] + T, side="right")) - 1
        nb = max(nb, b - lo_idx // Q, hi_idx // Q - b)
    return _bucket_nb(nb)


def _bucket_nb(nb):
    """Round a band width up to ~1.5x-spaced buckets (1,2,3,4,6,9,13,19,...)."""
    if nb <= 4:
        return nb
    b = 4
    while b < nb:
        b = b * 3 // 2
    return b


@functools.partial(jax.jit, static_argnums=tuple(range(8, 19)))
def _nms_2d_onepass(dist, points, rank, n_real, thresh, T, gap, x0,
                    axis, Q, NB, S, CH, P, R, Qb, NB2, A_max, Pb):
    """Full large-N 2D NMS in ONE device dispatch: striped peel, on-device
    remainder compaction + re-band (one sort, no host round trip), banded
    greedy kernel, scatter back to base (score) order.

    The previous driver (`_nms_polygons_device_banded`) synced twice between
    peel and banded kernel to re-band the remainder on the host — through a
    high-latency TPU tunnel those round trips cost several times the actual
    device compute. Here every shape decision is a static capacity with an
    in-kernel validity flag, so the host only inspects the FINAL result and
    retries (rare, compile-cached) on overflow.

    Static capacities: peel stripe-band NB at block Q, exact-stage chunk
    CH / capacity P (peel, see `_peel_2d_fused`); remainder capacity R,
    banded block Qb, band width NB2, compaction capacities A_max / Pb.

    Returns (keep, flags, stats) with flags = (peel_band_ok, fits,
    band_ok2) and stats = (n_defsurv, n_killed, n_rem, max_amb,
    max_pairs); `keep` is only meaningful when all flags are True.
    """
    Npad = dist.shape[0]
    dist = dist.astype(jnp.float32)
    defsurv, killed, peel_ok, n_todo = _peel_2d_fused(
        dist, points, rank, n_real, thresh, T, gap, x0,
        axis, Q, NB, S, CH, P)
    valid = jnp.arange(Npad) < n_real
    rem = valid & ~killed          # definite survivors stay (they suppress)
    n_rem = jnp.sum(rem.astype(jnp.int32))
    fits = n_rem <= R

    # -- on-device compaction + re-band: one multi-operand sort moves the
    # remainder (sorted by the spatial axis) to the front ------------------
    key = jnp.where(rem, points[:, axis], jnp.inf)
    base_idx = jnp.arange(Npad, dtype=jnp.int32)
    key_s, py_s, px_s, rank_s, perm = jax.lax.sort(
        (key, points[:, 0], points[:, 1], rank, base_idx),
        dimension=0, num_keys=1)
    keyR = key_s[:R]
    permR = perm[:R]
    pR = jnp.stack([py_s[:R], px_s[:R]], axis=-1)
    rankR = rank_s[:R]
    validR = jnp.arange(R) < n_rem
    dR = jnp.take(dist, permR, axis=0)

    # band coverage at static NB2: the element just outside every Qb-block's
    # +-NB2-block window must be farther than T along the axis (pad slots
    # sort to the end as +inf and need no coverage)
    nb_pad = NB2 * Qb
    i0s = jnp.arange(R // Qb) * Qb
    i1s = i0s + Qb - 1
    li = i0s - nb_pad - 1
    ri = i1s + nb_pad + 1
    lkey = keyR[jnp.clip(li, 0, R - 1)]
    rkey = keyR[jnp.clip(ri, 0, R - 1)]
    l_ok = (li < 0) | ~jnp.isfinite(keyR[i0s]) | (lkey < keyR[i0s] - T)
    r_ok = (ri >= R) | ~jnp.isfinite(keyR[i1s]) | (rkey > keyR[i1s] + T)
    band_ok2 = jnp.all(l_ok & r_ok)

    suppressedR, max_amb, max_pairs = _greedy_nms_2d_banded(
        dR, pR, rankR, validR, jnp.int32(0), thresh, Qb, NB2, A_max, Pb, S)

    # scatter the banded verdict back to base order; killed/pad slots stay
    # False (slots beyond R only matter when not fits -> host retries)
    keep = jnp.zeros(Npad, bool).at[permR].set(validR & ~suppressedR)
    stats = (jnp.sum(defsurv.astype(jnp.int32)),
             jnp.sum(killed.astype(jnp.int32)), n_rem, max_amb, max_pairs,
             n_todo)
    return keep, (peel_ok, fits, band_ok2), stats


@functools.partial(jax.jit, static_argnums=tuple(range(5, 17)))
def _nms_2d_onepass_traced(dist, points, n_real, dmax, thresh,
                           grid, axis, Q, NB, S, CH, P, R, Qb, NB2,
                           A_max, Pb):
    """`_nms_2d_onepass` with every per-image scalar computed in-trace, for
    the device-resident predict pipeline (models/model2d.py
    ``predict_instances_device``): consumes the sparse-extraction outputs
    directly (grid-unit integer points, traced candidate count and max
    dist), so the NMS dispatch needs NO host-side inspection of the
    candidate field. ``grid`` is the static (gy, gx) subsampling factor."""
    Npad = dist.shape[0]
    valid = jnp.arange(Npad) < n_real
    pts = points.astype(jnp.float32) * jnp.asarray(grid, jnp.float32)[None]
    pts = jnp.where(valid[:, None], pts, 1e9)
    T = 2.0 * dmax.astype(jnp.float32) + 1.0
    x = pts[:, 1 - axis]
    x0 = jnp.min(jnp.where(valid, x, jnp.inf))
    xmax = jnp.max(jnp.where(valid, x, -jnp.inf))
    x0 = jnp.where(jnp.isfinite(x0), x0, 0.0)
    gap = jnp.maximum(xmax - x0, 0.0) + 2.0 * T + 2.0
    rank = jnp.where(valid, jnp.arange(Npad, dtype=jnp.int32),
                     jnp.int32(2 ** 30))
    keep, flags, stats = _nms_2d_onepass(
        jnp.maximum(dist.astype(jnp.float32), 1e-3), pts, rank, n_real,
        thresh, T, gap, x0, axis, Q, NB, S, CH, P, R, Qb, NB2, A_max, Pb)
    return keep, flags, stats


def _nms_polygons_device_onepass(dist, points, thresh, samples=16, Q=256,
                                 Qb=512, verbose=False, dist_max=None,
                                 band_bytes_cap=6 << 30):
    """Driver for `_nms_2d_onepass`: pad/bucket once, dispatch, inspect the
    validity flags, retry with the next capacity bucket on overflow. Warm
    path = ONE dispatch + ONE small device->host transfer. Returns the keep
    mask in the caller's (score) order, or None to fall back."""
    N = len(dist)
    points = np.asarray(points, np.float32)
    axis = int(np.argmax(points.max(0) - points.min(0)))
    x = points[:, 1 - axis]
    x0 = float(x.min())
    T = 2.0 * float(dist.max() if dist_max is None else dist_max) + 1.0
    gap = float(x.max() - x0) + 2.0 * T + 2.0
    Npad = _bucket(N, minimum=2 * Q)
    # peel exact-stage capacity: start from the last observed todo count
    # (bucketed) instead of the worst case — exact-stage cost is linear in P
    # and a too-small P only peels less (the banded stage stays exact)
    P_cap = min(Npad, 131072)
    P = min(P_cap, _bucket(_RETRY_CAPS.get("onepass_todo", P_cap),
                           minimum=16384))
    CH = min(4096, P)
    dist_p = _pad(jnp.asarray(dist), Npad, value=1e-3)
    points_p = jnp.asarray(_pad(points, Npad, value=1e9))
    rank_p = jnp.asarray(_pad(np.arange(N, dtype=np.int32), Npad,
                              value=2 ** 30))
    counters = LAST_NMS_COUNTERS
    counters.update(n_candidates=N, n_peel_survivor=0, n_peel_suppressed=0)

    NB, NB2 = 1, 2
    # start from the last working remainder fraction (in 16ths of Npad):
    # fields from the same workload peel similarly, so the warm path is one
    # dispatch with no fits-retry
    frac16 = _RETRY_CAPS.get("onepass_R16", 2)
    R = min(Npad, max(2 * Qb, Npad * frac16 // 16))
    cached = _RETRY_CAPS.get("onepass")
    A_max, Pb = cached if cached is not None else (64, 1024)
    for _ in range(12):
        W2 = (2 * NB2 + 1) * Qb
        if R * W2 * 2 > band_bytes_cap:
            return None
        keep, flags, stats = jax.device_get(_nms_2d_onepass(
            dist_p, points_p, rank_p, jnp.int32(N), jnp.float32(thresh),
            jnp.float32(T), jnp.float32(gap), jnp.float32(x0),
            axis, Q, NB, samples, CH, P, R, Qb, NB2, A_max, Pb))
        peel_ok, fits, band_ok2 = (bool(f) for f in flags)
        (n_defsurv, n_killed, n_rem, max_amb, max_pairs,
         n_todo) = (int(s) for s in stats)
        if peel_ok and fits and band_ok2 and max_amb <= A_max and \
                max_pairs <= Pb:
            _RETRY_CAPS["onepass"] = (A_max, Pb)
            _RETRY_CAPS["onepass_R16"] = max(1, -((-16 * R) // Npad)) \
                if R < Npad else 16
            _RETRY_CAPS["onepass_todo"] = n_todo
            counters.update(n_peel_survivor=n_defsurv,
                            n_peel_suppressed=n_killed)
            out = np.asarray(keep)[:N]
            counters["n_survivors"] = int(out.sum())
            if verbose:
                print(f"NMS(onepass): peel kept {n_rem}/{N}, "
                      f"{int(out.sum())} survivors", flush=True)
            return out
        if verbose:
            print(f"NMS(onepass): retry (peel_ok={peel_ok} fits={fits} "
                  f"band_ok2={band_ok2} amb={max_amb}/{A_max} "
                  f"pairs={max_pairs}/{Pb})", flush=True)
        if not peel_ok:
            if NB >= 8:
                return None
            NB *= 2
        elif not fits:
            if P < P_cap and n_todo > P:
                # the capped exact stage peeled less than usual; restore the
                # full capacity before growing the remainder buffer
                P = P_cap
                CH = min(4096, P)
            elif R >= Npad:
                return None
            else:
                R = min(Npad, R * 2)
        elif not band_ok2:
            if NB2 >= 8:
                return None
            NB2 = min(8, NB2 * 2)
        else:
            if max_amb > A_max:
                if max_amb > 4096:
                    return None
                A_max = min(_bucket(max_amb, minimum=64), W2)
            if max_pairs > Pb:
                Pb = min(_bucket(max_pairs, minimum=1024), Qb * A_max)
    return None


def _nms_polygons_device_banded(dist, points, thresh, samples, Q=512,
                                amb_max=128, amb_cap=4096, pair_slots=8192,
                                verbose=False, established=0, rank=None,
                                band_bytes_cap=6 << 30, dist_max=None,
                                peel=True):
    """Banded-kernel driver: sort by row coordinate, compute the band width,
    peel provably-decided candidates (`_peel_2d`), run
    `_greedy_nms_2d_banded` on the remainder (with ambiguous-cap retry).
    Returns the keep mask in the caller's (score) order, or None if the band
    is too wide or too large to be worthwhile (caller falls back)."""
    N = len(dist)
    Npad = _bucket(N, minimum=2 * Q)
    if rank is None:
        rank = np.arange(N, dtype=np.int32)
    # band along the spatial axis with the largest extent (narrowest band)
    axis = int(np.argmax(points.max(0) - points.min(0)))
    order = np.argsort(points[:, axis], kind="stable")
    d = _pad(dist[order], Npad, value=1e-3)
    p = _pad(points[order], Npad, value=1e9)      # +inf-ish keeps sort order
    rk = _pad(rank[order].astype(np.int32), Npad, value=2 ** 30)
    T = 2.0 * float(dist.max() if dist_max is None else dist_max) + 1.0
    NB = _band_width_blocks(p[:, axis], Q, T, n_real=N)
    W = (2 * NB + 1) * Q
    if W >= Npad or Npad * W * 2 > band_bytes_cap:
        return None
    valid = jnp.arange(Npad) < N
    dj, pj, rj = jnp.asarray(d), jnp.asarray(p), jnp.asarray(rk)
    counters = LAST_NMS_COUNTERS
    counters.update(n_candidates=N, n_peel_survivor=0, n_peel_suppressed=0)

    keep_pos = None
    if peel and established == 0 and N > 4096:
        defsurv_b, killed_b = _peel_2d_striped(dist, points, rank,
                                               float(thresh), T)
        defsurv_h, killed_hb = jax.device_get((defsurv_b, killed_b))
        killed_h = np.asarray(killed_hb)[order]   # -> banded (sorted) order
        counters.update(n_peel_survivor=int(np.asarray(defsurv_h).sum()),
                        n_peel_suppressed=int(killed_h.sum()))
        if verbose:
            print(f"NMS: peel kept {N - int(killed_h.sum())}/{N} candidates "
                  f"({counters['n_peel_survivor']} definite survivors)",
                  flush=True)
        # re-band the (much smaller) remainder only when it pays for the
        # extra kernel-size compile bucket
        if killed_h.sum() > max(2048, N // 8):
            keep_pos = np.flatnonzero(~killed_h)
            N2 = len(keep_pos)
            Npad2 = _bucket(N2, minimum=2 * Q)
            keep_pos_j = jnp.asarray(keep_pos)
            d2 = _pad(dj[:N][keep_pos_j], Npad2, value=1e-3)
            p_h2 = _pad(p[:N][keep_pos], Npad2, value=1e9)
            rk2 = _pad(rk[:N][keep_pos], Npad2, value=2 ** 30)
            NB2 = _band_width_blocks(p_h2[:, axis], Q, T, n_real=N2)
            W2 = (2 * NB2 + 1) * Q
            if W2 < Npad2:
                dj, pj, rj = d2, jnp.asarray(p_h2), jnp.asarray(rk2)
                valid = jnp.arange(Npad2) < N2
                NB, W, Npad = NB2, W2, Npad2
                N_kernel = N2
            else:
                keep_pos = None
        if keep_pos is None:
            N_kernel = N
    else:
        N_kernel = N

    suppressed = _compaction_retry(
        lambda A_p, P_p: jax.device_get(_greedy_nms_2d_banded(
            dj, pj, rj, valid, jnp.int32(established), float(thresh),
            Q, NB, A_p, P_p, samples)),
        amb_max, pair_slots, amb_cap, W, lambda A_p: Q * A_p,
        64, 1024, verbose, "banded")
    if suppressed is None:
        return None
    keep_kernel = ~np.asarray(suppressed)[:N_kernel]
    keep = np.zeros(N, bool)
    if keep_pos is not None:
        keep[order[keep_pos]] = keep_kernel
    else:
        keep[order] = keep_kernel
    counters["n_survivors"] = int(keep.sum())
    return keep


def _nms_polygons_device_single(dist, points, thresh, samples, row_block,
                                amb_max, amb_cap, pair_slots, verbose,
                                established=0):
    """One fixed-size device-NMS invocation with ambiguous-cap retry; input
    already padded/truncated to a bucketed size by the caller."""
    N = len(dist)
    # minimum bucket 2048: small fields (threshold-sweep probes, tiny tiles)
    # all share ONE compiled kernel — the padded rows cost microseconds, a
    # per-bucket XLA compile costs seconds (minutes through a TPU tunnel)
    Np = _bucket(N, minimum=2048 if N > 8 else 8)
    d = jnp.asarray(_pad(dist, Np, value=1e-3))
    p = jnp.asarray(_pad(points, Np, value=-1e9))
    valid = jnp.arange(Np) < N
    B = max(8, min(row_block, Np))
    while Np % B != 0:
        B //= 2
    suppressed = _compaction_retry(
        lambda A_p, P_p: jax.device_get(_greedy_nms_2d_device(
            d, p, valid, jnp.int32(established), float(thresh),
            B, A_p, P_p, samples)),
        amb_max, pair_slots, amb_cap, Np, lambda A_p: B * A_p,
        64, 1024, verbose, "single")
    if suppressed is None:
        return _blocked_greedy(
            lambda dr, pr, dc, pc: _overlap_block_2d(dr, pr, dc, pc, samples, thresh),
            dist, points, thresh, row_block=128, verbose=verbose,
            bounds_fn=lambda dr, pr, dc, pc: _bounds_block_2d(dr, pr, dc, pc, thresh),
        )
    return ~np.asarray(suppressed)[:N]


@jax.jit
def _presuppress_2d(dist_s, points_s, dist_c, points_c, thresh):
    """killed (C,) = definitely suppressed by some established survivor
    (inscribed-disc lower bound only — consistent with the greedy kernel's
    own suppression bound). Row-blocked to bound memory."""
    S = dist_s.shape[0]
    B = 512
    rin_s = _inner_radius_2d(dist_s)
    rin_c = _inner_radius_2d(dist_c)
    area_s = polygon_areas(dist_s)
    area_c = polygon_areas(dist_c)

    def body(b, killed):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, b * B, B, 0)
        dc = jnp.sqrt(jnp.sum((sl(points_s)[:, None] - points_c[None]) ** 2, axis=-1))
        denom = jnp.minimum(sl(area_s)[:, None], area_c[None]) + 1e-10
        lb = _lens_area_lb(sl(rin_s)[:, None], rin_c[None], dc) / denom
        return killed | jnp.any(lb > thresh, axis=0)

    killed0 = jnp.zeros(dist_c.shape[0], bool)
    return jax.lax.fori_loop(0, max(1, S // B), body, killed0)


def _chunked_device_nms(single_fn, N, kernel_size, verbose, prefilter_fn=None,
                        raw_chunk=None):
    """Exact greedy NMS for arbitrary N with a fixed-size kernel: candidates
    are processed in score order in chunks; each round re-runs the kernel on
    [established survivors ++ next chunk]. Established survivors are final
    (later candidates have lower scores and cannot suppress them), suppressed
    candidates never suppress — so the result equals one global greedy pass.

    ``prefilter_fn(survivor_idx, chunk_idx) -> killed`` may cheaply mark
    chunk candidates that are definitely suppressed by a survivor (must use
    the same suppression lower bound as the kernel) before the greedy round.
    """
    survivors_idx = np.zeros(0, np.int64)
    pos = 0
    ks = kernel_size
    if raw_chunk is None:
        raw_chunk = 4 * kernel_size
    while pos < N:
        room = ks - len(survivors_idx)
        if room < max(256, ks // 8):
            ks *= 2  # survivors filled the kernel; accept a recompile
            room = ks - len(survivors_idx)
            if verbose:
                print(f"NMS: growing kernel size to {ks}", flush=True)
        if prefilter_fn is not None and len(survivors_idx):
            # collect up to `room` not-definitely-killed candidates from a
            # larger raw window
            pending = []
            n_pending = 0
            while pos < N and n_pending < room:
                raw_idx = np.arange(pos, min(N, pos + raw_chunk))
                killed = prefilter_fn(survivors_idx, raw_idx)
                kept = raw_idx[~killed]
                # only take as many as fit; the rest is re-examined next round
                if n_pending + len(kept) > room:
                    cut = kept[room - n_pending]
                    kept = kept[kept < cut]
                    pos = int(cut)
                else:
                    pos = raw_idx[-1] + 1
                pending.append(kept)
                n_pending += len(kept)
            chunk_idx = np.concatenate(pending) if pending else np.zeros(0, np.int64)
            if len(chunk_idx) == 0:
                continue
        else:
            chunk_idx = np.arange(pos, min(N, pos + room))
            pos = chunk_idx[-1] + 1
        cand_idx = np.concatenate([survivors_idx, chunk_idx]).astype(np.int64)
        keep = single_fn(cand_idx, ks, len(survivors_idx))
        survivors_idx = cand_idx[keep[:len(cand_idx)]]
        if verbose:
            print(f"NMS: processed {pos}/{N}, survivors {len(survivors_idx)}", flush=True)
    out = np.zeros(N, bool)
    out[survivors_idx] = True
    return out


def _nms_polygons_device(dist, points, thresh, samples=16, row_block=512,
                         amb_max=64, amb_cap=4096, pair_slots=8192,
                         kernel_size=16384, verbose=False, dist_max=None):
    """Device NMS driver: two-layout global-pair-list kernel for large N
    (ops/nms2d_fast.py — stripe sorts + banded bounds sweep + Pallas pair
    stages + Jacobi fixpoint, ONE dispatch), round-2 onepass as first
    fallback, small-N fixed-size kernel otherwise; exact survivor-chunked
    rounds as the last resort (bounded compile sizes)."""
    N = len(dist)
    if N > 2048:
        from .nms2d_fast import nms2d_twolayout_host
        keep = nms2d_twolayout_host(dist, points, thresh, S=samples,
                                    verbose=verbose)
        if keep is not None:
            return keep
        keep = _nms_polygons_device_onepass(dist, points, thresh,
                                            samples=samples, verbose=verbose,
                                            dist_max=dist_max)
        if keep is not None:
            return keep
        keep = _nms_polygons_device_banded(dist, points, thresh, samples,
                                           amb_cap=amb_cap, verbose=verbose,
                                           dist_max=dist_max)
        if keep is not None:
            return keep
    if N <= kernel_size:
        return _nms_polygons_device_single(dist, points, thresh, samples,
                                           row_block, amb_max, amb_cap,
                                           pair_slots, verbose)

    def single_fn(cand_idx, ks, established=0):
        # pad to the fixed kernel size so every round reuses one compilation;
        # pad rows are far-away dummy polygons that neither suppress nor
        # affect real candidates and are sliced off by the caller
        keep = _nms_polygons_device_single(
            _pad(dist[cand_idx], ks, value=1e-3),
            _pad(points[cand_idx], ks, value=-1e9),
            thresh, samples, row_block, amb_max, amb_cap, pair_slots, verbose,
            established=established)
        return keep[:len(cand_idx)]

    def prefilter_fn(surv_idx, raw_idx):
        Sp = _bucket(len(surv_idx), minimum=512)
        Cp = _bucket(len(raw_idx), minimum=1024)
        killed = _presuppress_2d(
            jnp.asarray(_pad(dist[surv_idx], Sp, value=1e-3)),
            jnp.asarray(_pad(points[surv_idx], Sp, value=-1e9)),
            jnp.asarray(_pad(dist[raw_idx], Cp, value=1e-3)),
            jnp.asarray(_pad(points[raw_idx], Cp, value=1e9)),
            float(thresh))
        return np.asarray(killed)[:len(raw_idx)]

    return _chunked_device_nms(single_fn, N, kernel_size, verbose,
                               prefilter_fn=prefilter_fn)


# ---------------------------------------------------------------------------
# 2D
# ---------------------------------------------------------------------------

def _frac_block_2d(dist_r, points_r, dist_c, points_c, S, plo, ext):
    """Covered fraction of an S x S midpoint grid over the per-pair bbox
    intersection (B, M)."""
    s = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    B, M = ext.shape[:2]
    # query points (B,M,S,S,2): rows vary along axis -2, cols along axis -1
    qr = plo[..., 0, None, None] + s[:, None] * ext[..., 0, None, None]  # (B,M,S,1)
    qc = plo[..., 1, None, None] + s[None, :] * ext[..., 1, None, None]  # (B,M,1,S)
    q = jnp.stack(jnp.broadcast_arrays(qr, qc), axis=-1).reshape(B, M, S * S, 2)

    in_r = points_in_polygons(
        jnp.broadcast_to(dist_r[:, None], (B, M) + dist_r.shape[1:]),
        jnp.broadcast_to(points_r[:, None], (B, M, 2)),
        q,
    )
    in_c = points_in_polygons(
        jnp.broadcast_to(dist_c[None], (B, M) + dist_c.shape[1:]),
        jnp.broadcast_to(points_c[None], (B, M, 2)),
        q,
    )
    return jnp.mean(in_r & in_c, axis=-1)


@functools.partial(jax.jit, static_argnums=(4,))
def _overlap_block_2d(dist_r, points_r, dist_c, points_c, S, thresh):
    """Overlap criterion for a block of row candidates vs column candidates.

    Returns bool (B, M): A_inter / min(A_r, A_c) > thresh, with A_inter
    estimated by the package-wide cascade estimator over the pair's bbox
    intersection (ops/nms2d_fast.py module doc): the coarse
    CASCADE_S x CASCADE_S grid decides pairs at least CASCADE_MARGIN from
    the decision boundary, the fine S x S grid decides the rest. Every NMS
    execution path (dense, blocked, onepass, two-layout v2) shares this
    definition so their decisions agree exactly.
    """
    from .nms2d_fast import CASCADE_S, CASCADE_MARGIN
    lo_r, hi_r = polygon_bboxes(dist_r, points_r)  # (B,2)
    lo_c, hi_c = polygon_bboxes(dist_c, points_c)  # (M,2)
    area_r = polygon_areas(dist_r)
    area_c = polygon_areas(dist_c)

    plo = jnp.maximum(lo_r[:, None], lo_c[None])   # (B,M,2)
    phi = jnp.minimum(hi_r[:, None], hi_c[None])
    ext = jnp.maximum(phi - plo, 0.0)
    ext_area = ext[..., 0] * ext[..., 1]
    min_area = jnp.minimum(area_r[:, None], area_c[None])
    fstar = thresh * (min_area + 1e-10) / jnp.maximum(ext_area, 1e-10)

    frac8 = _frac_block_2d(dist_r, points_r, dist_c, points_c, CASCADE_S,
                           plo, ext)
    frac = _frac_block_2d(dist_r, points_r, dist_c, points_c, S, plo, ext)
    return jnp.where(jnp.abs(frac8 - fstar) >= CASCADE_MARGIN,
                     frac8 > fstar, frac > fstar)


def nms_polygons(dist, points, scores=None, thresh=0.5, use_bbox=True,
                 use_kdtree=True, verbose=False, samples=16, dense_max=None,
                 row_block=16, col_block=4096, device_nms=None, dist_max=None):
    """Greedy NMS over score-sorted 2D star polygons. Returns bool survivors.

    Candidates must already be sorted by descending score (same contract as
    reference non_maximum_suppression_inds, stardist/nms.py:186-227).

    Three execution paths with identical greedy semantics:
    - device (default on TPU): ONE jit call — block-sequential scan with
      bounds + compacted exact overlap, no host round-trips;
    - dense (small N): full suppression matrix + device greedy scan;
    - blocked (default on CPU at large N): host-driven greedy with
      suppressed-row skipping, mirroring the reference's row skipping.

    ``dist`` may be a device (jax) array: the device paths consume it where
    it lives; host fallbacks download it once.
    """
    dist_on_device = not isinstance(dist, (list, tuple, np.ndarray))
    if not dist_on_device:
        dist = np.asarray(dist, np.float32)
    points = np.asarray(points, np.float32)
    N = len(dist)
    LAST_NMS_COUNTERS.clear()
    LAST_NMS_COUNTERS.update(n_candidates=N, n_peel_survivor=0,
                             n_peel_suppressed=0, n_survivors=N)
    if N == 0:
        return np.zeros(0, bool)
    if N == 1:
        return np.ones(1, bool)
    thresh = float(thresh)
    if device_nms is None:
        device_nms = jax.default_backend() == "tpu"
    if device_nms:
        from .. import _enable_persistent_compilation_cache
        _enable_persistent_compilation_cache()
        keep = _nms_polygons_device(dist, points, thresh, samples=samples,
                                    verbose=verbose, dist_max=dist_max)
        LAST_NMS_COUNTERS["n_survivors"] = int(keep.sum())
        return keep
    if dist_on_device:
        dist = np.asarray(dist, np.float32)
    if dense_max is None:
        dense_max = 256

    if N <= dense_max:
        Np = _bucket(N)
        d = jnp.asarray(_pad(dist, Np))
        p = jnp.asarray(_pad(points, Np, value=-1e6))
        valid = jnp.arange(Np) < N
        sup = _dense_suppression_2d(d, p, valid, samples, thresh, min(row_block, Np))
        suppressed = np.asarray(_greedy_scan(sup, valid))
        keep = ~suppressed[:N]
        LAST_NMS_COUNTERS["n_survivors"] = int(keep.sum())
        return keep

    keep = _blocked_greedy(
        lambda dr, pr, dc, pc: _overlap_block_2d(dr, pr, dc, pc, samples, thresh),
        dist, points, thresh, row_block=row_block, col_block=col_block,
        verbose=verbose,
        bounds_fn=lambda dr, pr, dc, pc: _bounds_block_2d(dr, pr, dc, pc, thresh),
    )
    LAST_NMS_COUNTERS["n_survivors"] = int(keep.sum())
    return keep


@functools.partial(jax.jit, static_argnums=(3, 5))
def _dense_suppression_2d(dist, points, valid, S, thresh, row_block):
    N = dist.shape[0]

    def row_blocks(i, acc):
        i0 = i * row_block
        d_r = jax.lax.dynamic_slice_in_dim(dist, i0, row_block, 0)
        p_r = jax.lax.dynamic_slice_in_dim(points, i0, row_block, 0)
        blk = _overlap_block_2d(d_r, p_r, dist, points, S, thresh)
        return jax.lax.dynamic_update_slice_in_dim(acc, blk, i0, 0)

    acc0 = jnp.zeros((N, N), bool)
    n_blocks = N // row_block
    sup = jax.lax.fori_loop(0, n_blocks, row_blocks, acc0)
    return sup & valid[None, :] & valid[:, None]


# ---------------------------------------------------------------------------
# single-call device greedy NMS (3D)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10))
def _greedy_nms_3d_device(dist, points, ray_dirs, faces, valid, established,
                          thresh, B, A_max, P, S):
    """3D analog of _greedy_nms_2d_device: bounds from sphere lenses + bbox,
    exact overlap by integer-lattice counting (matching the voxel
    rasterizer), suppression matrix built in row blocks with two-level
    top_k pair compaction, greedy resolved by the Jacobi fixpoint — all in
    one jit call."""
    N, R = dist.shape
    lo, hi = polyhedron_bboxes(dist, points, ray_dirs)
    vol = polyhedron_volumes(dist, ray_dirs, faces)
    rin = polyhedron_inner_radius(dist, ray_dirs, faces)
    rout = jnp.max(dist, axis=-1)
    inv_all, valid_faces = polyhedron_face_inverses(dist, ray_dirs, faces)  # (N,F,3,3)
    col_ids = jnp.arange(N)
    n_blocks = N // B
    ar = jnp.arange(S, dtype=jnp.float32)

    def block_fill(b, carry):
        sup_acc, max_amb, max_pairs = carry
        i0 = b * B
        d_r = jax.lax.dynamic_slice_in_dim(dist, i0, B, 0)
        p_r = jax.lax.dynamic_slice_in_dim(points, i0, B, 0)
        lo_r = jax.lax.dynamic_slice_in_dim(lo, i0, B, 0)
        hi_r = jax.lax.dynamic_slice_in_dim(hi, i0, B, 0)
        v_r = jax.lax.dynamic_slice_in_dim(vol, i0, B, 0)
        rin_r = jax.lax.dynamic_slice_in_dim(rin, i0, B, 0)
        rout_r = jax.lax.dynamic_slice_in_dim(rout, i0, B, 0)
        inv_r = jax.lax.dynamic_slice_in_dim(inv_all, i0, B, 0)
        vf_r = jax.lax.dynamic_slice_in_dim(valid_faces, i0, B, 0)
        valid_r = jax.lax.dynamic_slice_in_dim(valid, i0, B, 0)

        row_ids = i0 + jnp.arange(B)
        pair_ok = ((col_ids[None, :] > row_ids[:, None])
                   & (col_ids[None, :] >= established)
                   & valid[None, :] & valid_r[:, None])

        ext = jnp.maximum(jnp.minimum(hi_r[:, None], hi[None]) -
                          jnp.maximum(lo_r[:, None], lo[None]), 0.0)
        bbox_inter = ext[..., 0] * ext[..., 1] * ext[..., 2]
        dcn = jnp.sqrt(jnp.sum((p_r[:, None] - points[None]) ** 2, axis=-1))
        denom = jnp.minimum(v_r[:, None], vol[None]) + 1e-10
        ub = jnp.minimum(_lens_volume_3d(rout_r[:, None], rout[None], dcn), bbox_inter) / denom
        lb = _lens_volume_3d(rin_r[:, None], rin[None], dcn) / denom
        sup_mat = (lb > thresh) & pair_ok
        ambiguous = ~sup_mat & ~(ub <= thresh) & pair_ok
        pr, pc, pair_valid, amb_b, pairs_b = _compact_pairs(ambiguous, A_max, P)
        max_amb = jnp.maximum(max_amb, amb_b)
        max_pairs = jnp.maximum(max_pairs, pairs_b)

        # exact lattice-counted overlap on the P compacted pairs
        p_rp = p_r[pr]
        lo_rp, hi_rp, v_rp = lo_r[pr], hi_r[pr], v_r[pr]
        inv_rp, vf_rp = inv_r[pr], vf_r[pr]
        p_cp = points[pc]
        lo_cp, hi_cp, v_cp = lo[pc], hi[pc], vol[pc]
        inv_cp, vf_cp = inv_all[pc], valid_faces[pc]

        plo = jnp.ceil(jnp.maximum(lo_rp, lo_cp))                # (P, 3)
        phi = jnp.floor(jnp.minimum(hi_rp, hi_cp))
        n_vox = jnp.maximum(phi - plo + 1, 0.0)
        stride = jnp.maximum(jnp.ceil(n_vox / S), 1.0)
        pos = plo[:, :, None] + stride[:, :, None] * ar          # (P, 3, S)
        ok = pos <= phi[:, :, None]
        qz = pos[:, 0, :][:, :, None, None]
        qy = pos[:, 1, :][:, None, :, None]
        qx = pos[:, 2, :][:, None, None, :]
        q = jnp.stack(jnp.broadcast_arrays(qz, qy, qx), axis=-1).reshape(P, S ** 3, 3)
        m = (ok[:, 0, :][:, :, None, None]
             & ok[:, 1, :][:, None, :, None]
             & ok[:, 2, :][:, None, None, :]).reshape(P, S ** 3)
        in_r = points_in_polyhedra(inv_rp, vf_rp, p_rp, q)
        in_c = points_in_polyhedra(inv_cp, vf_cp, p_cp, q)
        weight = stride[:, 0] * stride[:, 1] * stride[:, 2]
        count = jnp.sum(in_r & in_c & m, axis=-1).astype(jnp.float32)
        exact_sup = count * weight / (jnp.minimum(v_rp, v_cp) + 1e-10) > thresh

        sup_mat = sup_mat.at[pr, pc].max(exact_sup & pair_valid)
        sup_mat = sup_mat & pair_ok
        sup_acc = jax.lax.dynamic_update_slice_in_dim(
            sup_acc, sup_mat.astype(jnp.bfloat16), i0, 0)
        return sup_acc, max_amb, max_pairs

    sup0 = jnp.zeros((N, N), jnp.bfloat16)
    sup_mat, max_amb, max_pairs = jax.lax.fori_loop(
        0, n_blocks, block_fill, (sup0, jnp.int32(0), jnp.int32(0)))
    keep = _greedy_fixpoint(sup_mat, valid)
    return ~keep, max_amb, max_pairs


# ---------------------------------------------------------------------------
# banded device greedy NMS (3D)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11, 12))
def _greedy_nms_3d_banded(dist, points, ray_dirs, faces, rank, valid,
                          established, thresh, Q, NB, A_max, P, S,
                          n_valid=None):
    """3D analog of `_greedy_nms_2d_banded`: candidates pre-sorted along one
    spatial axis; all undecided pairs of a Q-row block live in a window of
    (2*NB+1)*Q consecutive columns. Bounds + lattice-counted exact overlap
    as in `_greedy_nms_3d_device`; greedy resolved by the band Jacobi
    fixpoint.

    ``n_valid`` (traced, optional): when the valid candidates form a sorted
    PREFIX (invalid slots sort last — both callers guarantee this), only
    ceil(n_valid/Q) row blocks can source pairs, so the block loop's trip
    count tracks the real candidate count instead of the slot capacity
    (each block costs ~90 ms on v5e at P=4096: full-capacity sweeps of an
    empty field used to pay all of it)."""
    N, R = dist.shape
    n_blocks = N // Q
    W = (2 * NB + 1) * Q
    pad = NB * Q
    lo, hi = polyhedron_bboxes(dist, points, ray_dirs)
    vol = polyhedron_volumes(dist, ray_dirs, faces)
    rin = polyhedron_inner_radius(dist, ray_dirs, faces)
    rout = jnp.max(dist, axis=-1)
    inv_all, valid_faces = polyhedron_face_inverses(dist, ray_dirs, faces)

    def padw(x, value):
        widths = [(pad, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=value)

    dist_p = padw(dist, 1e-3)
    points_p = padw(points, -1e9)
    lo_p = padw(lo, -1e9)
    hi_p = padw(hi, -1e9)
    vol_p = padw(vol, 1.0)
    rin_p = padw(rin, 1e-3)
    rout_p = padw(rout, 1e-3)
    inv_p = padw(inv_all, 0.0)
    vf_p = padw(valid_faces, False)
    valid_p = padw(valid, False)
    rank_p = padw(rank, jnp.int32(2 ** 30))

    ar = jnp.arange(S, dtype=jnp.float32)

    def block_fill(b, carry):
        sup_acc, max_amb, max_pairs = carry
        i0 = b * Q
        slr = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, Q, 0)
        slc = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, W, 0)
        d_r, p_r = slr(dist), slr(points)
        lo_r, hi_r, v_r = slr(lo), slr(hi), slr(vol)
        rin_r, rout_r = slr(rin), slr(rout)
        inv_r, vf_r = slr(inv_all), slr(valid_faces)
        valid_r, rank_r = slr(valid), slr(rank)
        d_c, p_c = slc(dist_p), slc(points_p)
        lo_c, hi_c, v_c = slc(lo_p), slc(hi_p), slc(vol_p)
        rin_c, rout_c = slc(rin_p), slc(rout_p)
        inv_c, vf_c = slc(inv_p), slc(vf_p)
        valid_c, rank_c = slc(valid_p), slc(rank_p)

        pair_ok = ((rank_c[None, :] > rank_r[:, None])
                   & (rank_c[None, :] >= established)
                   & valid_c[None, :] & valid_r[:, None])

        ext = jnp.maximum(jnp.minimum(hi_r[:, None], hi_c[None]) -
                          jnp.maximum(lo_r[:, None], lo_c[None]), 0.0)
        bbox_inter = ext[..., 0] * ext[..., 1] * ext[..., 2]
        dcn = jnp.sqrt(jnp.sum((p_r[:, None] - p_c[None]) ** 2, axis=-1))
        denom = jnp.minimum(v_r[:, None], v_c[None]) + 1e-10
        ub = jnp.minimum(_lens_volume_3d(rout_r[:, None], rout_c[None], dcn), bbox_inter) / denom
        lb = _lens_volume_3d(rin_r[:, None], rin_c[None], dcn) / denom
        sup_blk = (lb > thresh) & pair_ok
        ambiguous = ~sup_blk & ~(ub <= thresh) & pair_ok
        pr, pc, pair_valid, amb_b, pairs_b = _compact_pairs_chunked(
            ambiguous, A_max, P)
        max_amb = jnp.maximum(max_amb, amb_b)
        max_pairs = jnp.maximum(max_pairs, pairs_b)

        # exact lattice-counted overlap on the compacted pairs, evaluated in
        # EC3-slot chunks under a while_loop whose trip count tracks the
        # REAL pair count — the face-inverse gathers and S^3-sample inside
        # tests are the block's dominant cost (~90 ms at P=4096 on v5e) and
        # must not be paid for empty capacity slots
        EC3 = min(P, 512)
        while P % EC3:
            EC3 //= 2
        NCH3 = P // EC3
        n_pairs_blk = jnp.minimum(pairs_b, jnp.int32(P))

        def pair_chunk(s):
            ci, sup_c = s
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * EC3, EC3, 0)
            prc, pcc, pvc = sl(pr), sl(pc), sl(pair_valid)
            p_rp = p_r[prc]
            lo_rp, hi_rp, v_rp = lo_r[prc], hi_r[prc], v_r[prc]
            inv_rp, vf_rp = inv_r[prc], vf_r[prc]
            p_cp = p_c[pcc]
            lo_cp, hi_cp, v_cp = lo_c[pcc], hi_c[pcc], v_c[pcc]
            inv_cp, vf_cp = inv_c[pcc], vf_c[pcc]

            plo = jnp.ceil(jnp.maximum(lo_rp, lo_cp))            # (EC3, 3)
            phi = jnp.floor(jnp.minimum(hi_rp, hi_cp))
            n_vox = jnp.maximum(phi - plo + 1, 0.0)
            stride = jnp.maximum(jnp.ceil(n_vox / S), 1.0)
            pos = plo[:, :, None] + stride[:, :, None] * ar      # (EC3, 3, S)
            ok = pos <= phi[:, :, None]
            qz = pos[:, 0, :][:, :, None, None]
            qy = pos[:, 1, :][:, None, :, None]
            qx = pos[:, 2, :][:, None, None, :]
            q = jnp.stack(jnp.broadcast_arrays(qz, qy, qx),
                          axis=-1).reshape(EC3, S ** 3, 3)
            m = (ok[:, 0, :][:, :, None, None]
                 & ok[:, 1, :][:, None, :, None]
                 & ok[:, 2, :][:, None, None, :]).reshape(EC3, S ** 3)
            in_r = points_in_polyhedra(inv_rp, vf_rp, p_rp, q)
            in_c = points_in_polyhedra(inv_cp, vf_cp, p_cp, q)
            weight = stride[:, 0] * stride[:, 1] * stride[:, 2]
            count = jnp.sum(in_r & in_c & m, axis=-1).astype(jnp.float32)
            exact_sup = (count * weight
                         / (jnp.minimum(v_rp, v_cp) + 1e-10)) > thresh
            sup_c = sup_c.at[prc, pcc].max(exact_sup & pvc)
            return ci + 1, sup_c

        _, sup_blk = jax.lax.while_loop(
            lambda s: (s[0] * EC3 < n_pairs_blk) & (s[0] < NCH3),
            pair_chunk, (jnp.int32(0), sup_blk))
        sup_blk = sup_blk & pair_ok
        sup_acc = jax.lax.dynamic_update_slice(
            sup_acc, sup_blk.astype(jnp.bfloat16)[None], (b, 0, 0))
        return sup_acc, max_amb, max_pairs

    sup0 = jnp.zeros((n_blocks, Q, W), jnp.bfloat16)
    if n_valid is None:
        n_blocks_used = n_blocks
    else:
        n_blocks_used = jnp.minimum(
            (n_valid.astype(jnp.int32) + (Q - 1)) // Q, jnp.int32(n_blocks))
    sup, max_amb, max_pairs = jax.lax.fori_loop(
        0, n_blocks_used, block_fill, (sup0, jnp.int32(0), jnp.int32(0)))

    def cond(c):
        t, keep, changed = c
        return changed & (t < N)

    def body(c):
        t, keep, _ = c
        contrib = jnp.einsum(
            "bq,bqw->bw", keep.reshape(n_blocks, Q).astype(jnp.bfloat16), sup,
            preferred_element_type=jnp.float32)
        contrib3 = contrib.reshape(n_blocks, 2 * NB + 1, Q)
        killed_pad = jnp.zeros(N + 2 * pad, jnp.float32)
        for o in range(2 * NB + 1):
            piece = contrib3[:, o, :].reshape(N)
            killed_pad = killed_pad + jnp.pad(piece, (o * Q, (2 * NB - o) * Q))
        killed = killed_pad[pad:pad + N] > 0.5
        new = valid & ~killed
        return t + 1, new, jnp.any(new != keep)

    _, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), valid, jnp.bool_(True)))
    return ~keep, max_amb, max_pairs


def _nms_polyhedra_device_banded(dist, points, rays, thresh, samples=10,
                                 Q=256, amb_max=32, amb_cap=2048,
                                 pair_slots=2048, verbose=False,
                                 established=0, rank=None,
                                 band_bytes_cap=6 << 30, dist_max=None):
    """Banded-kernel 3D driver: sort along the spatial axis with the largest
    extent, compute the band width, run `_greedy_nms_3d_banded` once.
    Returns keep mask in the caller's (score) order, or None if the band is
    too wide (caller falls back)."""
    N = len(dist)
    Npad = _bucket(N, minimum=2 * Q)
    if rank is None:
        rank = np.arange(N, dtype=np.int32)
    axis = int(np.argmax(points.max(0) - points.min(0)))
    order = np.argsort(points[:, axis], kind="stable")
    d = _pad(dist[order], Npad, value=1e-3)
    p = _pad(points[order], Npad, value=1e9)
    rk = _pad(rank[order].astype(np.int32), Npad, value=2 ** 30)
    T = 2.0 * float(dist.max() if dist_max is None else dist_max) + 1.0
    NB = _band_width_blocks(p[:, axis], Q, T, n_real=N)
    W = (2 * NB + 1) * Q
    if W >= Npad or Npad * W * 2 > band_bytes_cap:
        return None
    valid = jnp.arange(Npad) < N
    ray_dirs = jnp.asarray(np.asarray(rays.vertices, np.float32))
    faces = jnp.asarray(np.asarray(rays.faces, np.int32))
    dj, pj, rj = jnp.asarray(d), jnp.asarray(p), jnp.asarray(rk)
    suppressed = _compaction_retry(
        lambda A_p, P_p: jax.device_get(_greedy_nms_3d_banded(
            dj, pj, ray_dirs, faces, rj, valid, jnp.int32(established),
            float(thresh), Q, NB, A_p, P_p, samples,
            n_valid=jnp.int32(N))),
        amb_max, pair_slots, amb_cap, W, lambda A_p: Q * A_p,
        32, 512, verbose, "banded 3D")
    if suppressed is None:
        return None
    keep_sorted = ~np.asarray(suppressed)[:N]
    keep = np.empty(N, bool)
    keep[order] = keep_sorted
    return keep


def _nms_polyhedra_device(dist, points, rays, thresh, samples=10, row_block=64,
                          amb_max=32, amb_cap=2048, pair_slots=2048,
                          kernel_size=4096, verbose=False, established=0,
                          dist_max=None):
    N = len(dist)
    if N > 1024 and established == 0:
        keep = _nms_polyhedra_device_banded(dist, points, rays, thresh,
                                            samples=samples, amb_cap=amb_cap,
                                            verbose=verbose, dist_max=dist_max)
        if keep is not None:
            return keep
    if N > kernel_size:
        def single_fn(cand_idx, ks, established=0):
            keep = _nms_polyhedra_device(
                _pad(dist[cand_idx], ks, value=1e-3),
                _pad(points[cand_idx], ks, value=-1e9),
                rays, thresh, samples=samples, row_block=row_block,
                amb_max=amb_max, amb_cap=amb_cap, pair_slots=pair_slots,
                kernel_size=ks, verbose=verbose, established=established)
            return keep[:len(cand_idx)]

        return _chunked_device_nms(single_fn, N, kernel_size, verbose)
    Np = _bucket(N, minimum=8)
    d = jnp.asarray(_pad(dist, Np, value=1e-3))
    p = jnp.asarray(_pad(points, Np, value=-1e9))
    ray_dirs = jnp.asarray(np.asarray(rays.vertices, np.float32))
    faces = jnp.asarray(np.asarray(rays.faces, np.int32))
    valid = jnp.arange(Np) < N
    B = max(4, min(row_block, Np))
    while Np % B != 0:
        B //= 2
    suppressed = _compaction_retry(
        lambda A_p, P_p: jax.device_get(_greedy_nms_3d_device(
            d, p, ray_dirs, faces, valid, jnp.int32(established),
            float(thresh), B, A_p, P_p, samples)),
        amb_max, pair_slots, amb_cap, Np, lambda A_p: B * A_p,
        32, 512, verbose, "single 3D")
    if suppressed is None:
        overlap_fn = lambda dr, pr, dc, pc: _overlap_block_3d(
            dr, pr, dc, pc, ray_dirs, faces, max(samples, 12), thresh)
        return _blocked_greedy(
            overlap_fn, dist, points, thresh, row_block=8, col_block=128,
            verbose=verbose,
            bounds_fn=lambda dr, pr, dc, pc: _bounds_block_3d(
                dr, pr, dc, pc, ray_dirs, faces, thresh),
        )
    return ~np.asarray(suppressed)[:N]


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12))
def _nms3d_banded_traced(dist, points, ray_dirs, faces, n_real, thresh,
                         grid, axis, Q, NB, A_max, P, S):
    """`_greedy_nms_3d_banded` with the device-predict calling convention:
    consumes the sparse-extraction outputs directly (grid-unit integer
    points, traced candidate count, descending-score order), sorts along the
    static spatial ``axis`` in-trace and verifies the static band width
    ``NB`` in-trace — so the fused 3D dispatch needs NO host-side inspection
    of the candidate field (the host retry ladder widens NB/A_max/P on a
    False flag). Returns (keep, (band_ok, amb_ok, pairs_ok), (max_amb,
    max_pairs)) with ``keep`` in the input (descending-score) order.

    TPU-native replacement for the reference's greedy polyhedron NMS loop
    (stardist/lib/stardist3d_impl.cpp:956-1385)."""
    Npad = dist.shape[0]
    iota = jnp.arange(Npad, dtype=jnp.int32)
    valid = iota < n_real
    d = jnp.where(valid[:, None], jnp.maximum(dist.astype(jnp.float32), 1e-3),
                  1e-3)
    pts = points.astype(jnp.float32) * jnp.asarray(grid, jnp.float32)[None]
    pts = jnp.where(valid[:, None], pts, 1e9)
    rank = jnp.where(valid, iota, jnp.int32(2 ** 30))
    # sort along the banding axis (invalid slots carry 1e9 -> sort last)
    _, _, perm = jax.lax.sort((pts[:, axis], iota, iota), dimension=0,
                              num_keys=2)
    d_s = jnp.take(d, perm, axis=0)
    p_s = jnp.take(pts, perm, axis=0)
    rank_s = jnp.take(rank, perm, axis=0)
    valid_s = jnp.take(valid, perm, axis=0)
    # band validity: a pair can only overlap when its axis distance is
    # <= T = 2*dist_max + 1 (bboxes live within dist_max of the center);
    # NB is wide enough iff for every Q-row block the first column outside
    # its (2NB+1)Q window is farther than T from the block's extremes
    T = 2.0 * jnp.max(jnp.where(valid[:, None], d, 0.0)) + 1.0
    s = jnp.where(valid_s, p_s[:, axis], jnp.float32(jnp.inf))
    nb_blocks = Npad // Q
    sb = s.reshape(nb_blocks, Q)
    vb = valid_s.reshape(nb_blocks, Q)
    hi_b = jnp.max(jnp.where(vb, sb, -jnp.inf), axis=1)
    lo_b = jnp.min(jnp.where(vb, sb, jnp.inf), axis=1)
    bi = jnp.arange(nb_blocks, dtype=jnp.int32)
    r_idx = (bi + NB + 1) * Q
    rv = jnp.where(r_idx < Npad, jnp.take(s, jnp.minimum(r_idx, Npad - 1)),
                   jnp.float32(jnp.inf))
    l_idx = (bi - NB) * Q - 1
    lv = jnp.where(l_idx >= 0, jnp.take(s, jnp.maximum(l_idx, 0)),
                   jnp.float32(-jnp.inf))
    # all-invalid blocks (lo_b/hi_b non-finite — e.g. an empty candidate
    # field) interact with nothing and need no coverage; without this guard
    # an empty field fails band_ok forever and the retry ladder walks every
    # NB rung before falling back to the host path on EVERY call
    r_ok = ~jnp.isfinite(hi_b) | (rv > hi_b + T)
    l_ok = ~jnp.isfinite(lo_b) | (lv < lo_b - T)
    band_ok = jnp.all(r_ok) & jnp.all(l_ok)
    suppressed, max_amb, max_pairs = _greedy_nms_3d_banded(
        d_s, p_s, ray_dirs, faces, rank_s, valid_s, jnp.int32(0), thresh,
        Q, NB, A_max, P, S, n_valid=n_real)
    keep_s = ~suppressed & valid_s
    keep = jnp.zeros(Npad, bool).at[perm].set(keep_s)
    flags = (band_ok, max_amb <= A_max, max_pairs <= P)
    return keep, flags, (max_amb, max_pairs)


# ---------------------------------------------------------------------------
# 3D
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(6,))
def _overlap_block_3d(dist_r, points_r, dist_c, points_c, ray_dirs, faces, S, thresh):
    """Overlap for row vs column polyhedra blocks. Intersection counted on
    the integer voxel lattice inside the bbox intersection (stride >= 1),
    matching the rasterizer's voxel semantics; volumes analytic."""
    lo_r, hi_r = polyhedron_bboxes(dist_r, points_r, ray_dirs)
    lo_c, hi_c = polyhedron_bboxes(dist_c, points_c, ray_dirs)
    vol_r = polyhedron_volumes(dist_r, ray_dirs, faces)
    vol_c = polyhedron_volumes(dist_c, ray_dirs, faces)

    plo = jnp.ceil(jnp.maximum(lo_r[:, None], lo_c[None]))   # (B,M,3)
    phi = jnp.floor(jnp.minimum(hi_r[:, None], hi_c[None]))
    n_vox = jnp.maximum(phi - plo + 1, 0.0)
    stride = jnp.maximum(jnp.ceil(n_vox / S), 1.0)            # (B,M,3)

    ar = jnp.arange(S, dtype=jnp.float32)
    # positions per axis: (B,M,S)
    pos = plo[..., :, None] + stride[..., :, None] * ar       # (B,M,3,S)
    ok = pos <= phi[..., :, None]
    B, M = plo.shape[:2]
    qz = pos[..., 0, :][..., :, None, None]
    qy = pos[..., 1, :][..., None, :, None]
    qx = pos[..., 2, :][..., None, None, :]
    q = jnp.stack(jnp.broadcast_arrays(qz, qy, qx), axis=-1).reshape(B, M, S ** 3, 3)
    m = (
        ok[..., 0, :][..., :, None, None]
        & ok[..., 1, :][..., None, :, None]
        & ok[..., 2, :][..., None, None, :]
    ).reshape(B, M, S ** 3)

    inv_r, val_r = polyhedron_face_inverses(dist_r, ray_dirs, faces)  # (B,F,3,3)
    inv_c, val_c = polyhedron_face_inverses(dist_c, ray_dirs, faces)  # (M,F,3,3)
    in_r = points_in_polyhedra(inv_r[:, None], val_r[:, None], points_r[:, None], q)
    in_c = points_in_polyhedra(inv_c[None], val_c[None], points_c[None], q)

    weight = stride[..., 0] * stride[..., 1] * stride[..., 2]
    count = jnp.sum(in_r & in_c & m, axis=-1).astype(jnp.float32)
    inter = count * weight
    overlap = inter / (jnp.minimum(vol_r[:, None], vol_c[None]) + 1e-10)
    return overlap > thresh


def nms_polyhedra(dist, points, rays, scores=None, thresh=0.5, use_bbox=True,
                  use_kdtree=True, verbose=False, samples=12, dense_max=None,
                  row_block=8, col_block=128, device_nms=None, dist_max=None):
    """Greedy NMS over score-sorted 3D star polyhedra. Returns bool survivors.

    ``dist`` may be a device (jax) array: the device paths consume it where
    it lives; host fallbacks download it once."""
    dist_on_device = not isinstance(dist, (list, tuple, np.ndarray))
    if not dist_on_device:
        dist = np.asarray(dist, np.float32)
    points = np.asarray(points, np.float32)
    N = len(dist)
    LAST_NMS_COUNTERS.clear()
    LAST_NMS_COUNTERS.update(n_candidates=N, n_peel_survivor=0,
                             n_peel_suppressed=0, n_survivors=N)
    if N == 0:
        return np.zeros(0, bool)
    if N == 1:
        return np.ones(1, bool)
    thresh = float(thresh)
    if device_nms is None:
        device_nms = jax.default_backend() == "tpu"
    if device_nms:
        keep = _nms_polyhedra_device(dist, points, rays, thresh, samples=samples,
                                     verbose=verbose, dist_max=dist_max)
        LAST_NMS_COUNTERS["n_survivors"] = int(keep.sum())
        return keep
    if dist_on_device:
        dist = np.asarray(dist, np.float32)
    if dense_max is None:
        dense_max = 32
    ray_dirs = jnp.asarray(np.asarray(rays.vertices, np.float32))
    faces = jnp.asarray(np.asarray(rays.faces, np.int32))

    overlap_fn = lambda dr, pr, dc, pc: _overlap_block_3d(
        dr, pr, dc, pc, ray_dirs, faces, samples, thresh
    )

    if N <= dense_max:
        # row/col-blocked dense matrix in a host loop (keeps memory bounded)
        Np = _bucket(N, minimum=row_block)
        d = _pad(dist, Np, value=1e-3)
        p = _pad(points, Np, value=-1e6)
        cb = min(col_block, Np)
        sup = np.zeros((Np, Np), bool)
        for i0 in range(0, Np, row_block):
            for j0 in range(0, Np, cb):
                blk = overlap_fn(
                    jnp.asarray(d[i0:i0 + row_block]), jnp.asarray(p[i0:i0 + row_block]),
                    jnp.asarray(d[j0:j0 + cb]), jnp.asarray(p[j0:j0 + cb]),
                )
                sup[i0:i0 + row_block, j0:j0 + cb] = np.asarray(blk)
        valid = np.arange(Np) < N
        sup &= valid[None, :] & valid[:, None]
        suppressed = np.asarray(_greedy_scan(jnp.asarray(sup), jnp.asarray(valid)))
        return ~suppressed[:N]

    return _blocked_greedy(
        overlap_fn, dist, points, thresh,
        row_block=row_block, col_block=col_block, verbose=verbose,
        bounds_fn=lambda dr, pr, dc, pc: _bounds_block_3d(
            dr, pr, dc, pc, ray_dirs, faces, thresh),
    )


# ---------------------------------------------------------------------------
# blocked greedy driver (large candidate counts)
# ---------------------------------------------------------------------------

def _blocked_greedy(overlap_fn, dist, points, thresh, row_block=64,
                    col_block=4096, verbose=False, bounds_fn=None):
    """Host-driven greedy NMS: process unsuppressed rows in score order in
    blocks; columns shrink to the currently-unsuppressed tail. When
    ``bounds_fn`` is given, cheap analytic bounds decide most pairs and the
    exact sampled overlap runs only on the ambiguous columns (reference
    cascade, stardist3d_impl.cpp:1209-1330)."""
    N = len(dist)
    suppressed = np.zeros(N, bool)

    def _suppress_matrix(rows, cols):
        Bp = _bucket(len(rows), minimum=8)
        d_r = jnp.asarray(_pad(dist[rows], Bp, value=1e-3))
        p_r = jnp.asarray(_pad(points[rows], Bp, value=-1e6))
        blk = np.empty((len(rows), len(cols)), bool)
        for j0 in range(0, len(cols), col_block):
            cj = cols[j0:j0 + col_block]
            Mp = _bucket(len(cj), minimum=64)
            d_c = jnp.asarray(_pad(dist[cj], Mp, value=1e-3))
            p_c = jnp.asarray(_pad(points[cj], Mp, value=-1e6))
            if bounds_fn is not None:
                sup_lb, keep_ub = bounds_fn(d_r, p_r, d_c, p_c)
                sup_lb = np.asarray(sup_lb)[:len(rows), :len(cj)]
                keep_ub = np.asarray(keep_ub)[:len(rows), :len(cj)]
                ambiguous = ~sup_lb & ~keep_ub
                part = sup_lb.copy()
                amb_cols = np.flatnonzero(ambiguous.any(axis=0))
                # bound per-call sample memory: rows x amb-chunk x samples
                amb_chunk = max(64, (1 << 16) // max(1, len(rows)))
                for a0 in range(0, len(amb_cols), amb_chunk):
                    ac = amb_cols[a0:a0 + amb_chunk]
                    Ap = _bucket(len(ac), minimum=64)
                    exact = np.asarray(overlap_fn(
                        d_r, p_r,
                        jnp.asarray(_pad(dist[cj[ac]], Ap, value=1e-3)),
                        jnp.asarray(_pad(points[cj[ac]], Ap, value=-1e6)),
                    ))[:len(rows), :len(ac)]
                    part[:, ac] = np.where(ambiguous[:, ac], exact, part[:, ac])
            else:
                part = np.asarray(overlap_fn(d_r, p_r, d_c, p_c))[:len(rows), :len(cj)]
            blk[:, j0:j0 + len(cj)] = part
        return blk

    pos = 0
    while pos < N:
        rows = np.flatnonzero(~suppressed[pos:])[:row_block] + pos
        if len(rows) == 0:
            break
        cols = np.flatnonzero(~suppressed[rows[0] + 1:]) + rows[0] + 1
        if len(cols) == 0:
            break
        blk = _suppress_matrix(rows, cols)
        # sequential greedy inside the block (host)
        for bi, i in enumerate(rows):
            if suppressed[i]:
                continue
            js = cols[blk[bi] & ~suppressed[cols] & (cols > i)]
            suppressed[js] = True
        pos = rows[-1] + 1
        if verbose:
            print(f"NMS: processed up to {pos}/{N}, suppressed {suppressed.sum()}", flush=True)
    return ~suppressed
