"""Two-layout striped banded NMS for 2D star polygons — round-3 redesign.

TPU-native replacement for the reference 2D NMS
(stardist/lib/stardist2d.cpp:390-615: greedy score-descending suppression,
overlap criterion ``A_inter / min(A_i, A_j) > thresh``) built for one goal:
decide the ~10^7 interacting pairs of a production candidate field in tens
of milliseconds on one chip.

Structure (ONE jit dispatch, no host round trips):

1. *Stripe layouts.* Candidates are sorted twice by a stripe key
   (``floor((y+off)/2T)*gap + x`` for offsets 0 and T, T > interaction
   radius). Any interacting pair (|dy| < T and |dx| < T) is band-local in at
   least one layout (an interval of length < T containing a boundary of one
   stripe partition lies strictly inside a stripe of the other), so each
   layout's suppression structure is a narrow band of width W = (2*NB+1)*Q
   (~hundreds, vs thousands for a plain y-sort on a wide image).
2. *Block sweep* (per layout): for each Q-row block vs its W-column window:
   - analytic bound cascade (reference stages 1-2,
     stardist3d_impl.cpp:1209-1330): inscribed/outer-disc lens bounds + bbox
     intersection decide most pairs;
   - the surviving ambiguous pairs are compacted (per-row top_k to A slots,
     block-wide top_k to P slots);
   - *kernel-lemma lower bound* (new, exact): for star polygon j with
     inscribed-disc radius rin_j (about its center), the kernel of j
     contains B(c_j, rin_j), hence lambda*(j - c_j) + c stays inside j for
     any |c - c_j| <= (1-lambda)*rin_j. Thus
     ``polygon(c_i, min(d_i, lambda*d_j))`` is a subset of the pair's
     intersection with
     ``lambda = 1 - |c_i-c_j|/rin_j`` — an O(R) per-pair area lower bound
     that decides the near-duplicate bulk (same-object candidates) without
     sampling;
   - remaining pairs: the exact sampled-overlap estimator (S x S midpoint
     grid over the bbox intersection — the package-wide overlap estimator,
     see ops/nms.py) on a second compaction to P2 slots.
3. *Band Jacobi fixpoint*: greedy semantics (a survivor suppresses all
   later overlapping candidates; suppressed candidates suppress nothing)
   resolved as the unique fixpoint of the triangular recursion with
   banded matvecs over BOTH layouts per iteration (see
   ops/nms.py ``_greedy_fixpoint`` for the argument).

All data-dependent sizes are static capacities with in-kernel overflow
flags; the host driver inspects one small scalar tuple per call and retries
with the next capacity bucket (compile-cached) on overflow.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .polygon import polygon_areas, polygon_bboxes


# ---------------------------------------------------------------------------
# gather-free point-in-polygon (identical results to polygon.points_in_polygons)
# ---------------------------------------------------------------------------

def points_in_polygons_acc(dist, points, query):
    """Same results as :func:`..ops.polygon.points_in_polygons`, computed
    with a mask-accumulate gather (static loop over R) instead of a one-hot
    einsum: batched (P, S, R) @ (P, R, 4) matmuls degrade to per-batch tiny
    MXU ops on TPU, while the accumulate form is pure wide VPU work.
    Exactness: the accumulated sum has exactly one nonzero term per sample
    (w in {0,1}), so ``picked`` equals the einsum result bitwise."""
    R = dist.shape[-1]
    dphi = 2 * np.pi / R
    u = query - points[..., None, :]          # (..., S, 2)
    ur, uc = u[..., 0], u[..., 1]
    theta = jnp.mod(jnp.arctan2(ur, uc), 2 * np.pi)
    k = jnp.clip(jnp.floor(theta / dphi).astype(jnp.int32), 0, R - 1)

    angles = np.arange(R) * dphi
    s0 = np.sin(angles).astype(np.float32)
    c0 = np.cos(angles).astype(np.float32)
    s1 = np.sin(angles + dphi).astype(np.float32)
    c1 = np.cos(angles + dphi).astype(np.float32)
    d1 = jnp.roll(dist, -1, axis=-1)

    v0r = jnp.zeros_like(theta)
    v0c = jnp.zeros_like(theta)
    v1r = jnp.zeros_like(theta)
    v1c = jnp.zeros_like(theta)
    for kk in range(R):
        w = (k == kk).astype(dist.dtype)       # (..., S)
        a = dist[..., kk][..., None]           # (..., 1)
        b = d1[..., kk][..., None]
        v0r = v0r + w * (a * float(s0[kk]))
        v0c = v0c + w * (a * float(c0[kk]))
        v1r = v1r + w * (b * float(s1[kk]))
        v1c = v1c + w * (b * float(c1[kk]))
    er = v1r - v0r
    ec = v1c - v0c
    cross_p = er * (uc - v0c) - ec * (ur - v0r)
    cross_c = ec * v0r - er * v0c
    return cross_p * cross_c >= 0


# ---------------------------------------------------------------------------
# per-pair exact stages
# ---------------------------------------------------------------------------

def _erosion_lb_area(d_r, p_r, rin_r, d_c, p_c, rin_c):
    """Kernel-lemma intersection-area lower bound (exact, see module doc):
    max over both directions of area(polygon(min(d_i, lambda*d_j))).
    Inputs are per-pair rows: d_* (P, R), p_* (P, 2), rin_* (P,)."""
    dc = jnp.sqrt(jnp.sum((p_r - p_c) ** 2, axis=-1))
    lamA = jnp.clip(1.0 - dc / jnp.maximum(rin_c, 1e-6), 0.0, 1.0)
    lbA = polygon_areas(jnp.minimum(d_r, lamA[:, None] * d_c))
    lamB = jnp.clip(1.0 - dc / jnp.maximum(rin_r, 1e-6), 0.0, 1.0)
    lbB = polygon_areas(jnp.minimum(d_c, lamB[:, None] * d_r))
    return jnp.maximum(lbA, lbB)


def _pair_frac(d_r, p_r, lo_r, hi_r, d_c, p_c, lo_c, hi_c, S):
    """Fraction of an S x S midpoint grid over the pair's bbox intersection
    that lies inside both polygons, plus the bbox-intersection extents."""
    P = d_r.shape[0]
    s_grid = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    plo = jnp.maximum(lo_r, lo_c)
    phi = jnp.minimum(hi_r, hi_c)
    ext = jnp.maximum(phi - plo, 0.0)
    qr = plo[:, 0, None, None] + s_grid[:, None] * ext[:, 0, None, None]
    qc = plo[:, 1, None, None] + s_grid[None, :] * ext[:, 1, None, None]
    q = jnp.stack(jnp.broadcast_arrays(qr, qc), axis=-1).reshape(P, S * S, 2)
    in_r = points_in_polygons_acc(d_r, p_r, q)
    in_c = points_in_polygons_acc(d_c, p_c, q)
    frac = jnp.mean(in_r & in_c, axis=-1)
    return frac, ext


# Cascade margin: a coarse 4x4-grid overlap fraction within MARGIN of the
# decision boundary defers to the full 16x16 grid. Safety measured on the
# bench model's real 4096^2 field: 0 / 76k disagreements with the pure
# 16x16 decision at this margin (51% of ambiguous pairs decided coarse).
CASCADE_MARGIN = 0.25


def _sampled_sup(d_r, p_r, lo_r, hi_r, a_r, d_c, p_c, lo_c, hi_c, a_c,
                 thresh, S):
    """The package-wide exact overlap estimator on a flat pair list.

    Two-stage cascade (identical in every execution path, so all paths
    agree exactly): a 4x4 midpoint grid decides when its overlap fraction
    is at least CASCADE_MARGIN away from the decision boundary
    ``f* = thresh * min(A_r, A_c) / bbox_inter_area``; otherwise the S x S
    (default 16x16) grid decides: suppress iff
    ``frac * bbox_inter_area / (min(A_r, A_c) + 1e-10) > thresh``."""
    frac4, ext = _pair_frac(d_r, p_r, lo_r, hi_r, d_c, p_c, lo_c, hi_c, 4)
    ext_area = ext[:, 0] * ext[:, 1]
    fstar = thresh * (jnp.minimum(a_r, a_c) + 1e-10) / jnp.maximum(ext_area, 1e-10)
    coarse_sup = frac4 - fstar > CASCADE_MARGIN
    coarse_no = fstar - frac4 > CASCADE_MARGIN
    undecided = ~coarse_sup & ~coarse_no
    return coarse_sup, undecided


def _sampled_sup_fine(d_r, p_r, lo_r, hi_r, a_r, d_c, p_c, lo_c, hi_c, a_c,
                      thresh, S):
    """Fine stage of the cascade: full S x S grid decision."""
    frac, ext = _pair_frac(d_r, p_r, lo_r, hi_r, d_c, p_c, lo_c, hi_c, S)
    inter = frac * ext[:, 0] * ext[:, 1]
    return inter / (jnp.minimum(a_r, a_c) + 1e-10) > thresh


# ---------------------------------------------------------------------------
# analytic bounds (same formulas as ops/nms.py stage 1)
# ---------------------------------------------------------------------------

def _lens_lb(r1, r2, d):
    rho = jnp.maximum(jnp.minimum((r1 + r2 - d) * 0.5, jnp.minimum(r1, r2)), 0.0)
    return np.pi * rho * rho


def _lens_ub(r1, r2, d):
    rmin = jnp.minimum(r1, r2)
    w = jnp.maximum(r1 + r2 - d, 0.0)
    d_safe = jnp.maximum(d, 1e-6)
    x1 = (d_safe * d_safe + r1 * r1 - r2 * r2) / (2 * d_safe)
    h_chord = 2.0 * jnp.sqrt(jnp.maximum(r1 * r1 - x1 * x1, 0.0))
    h = jnp.where((x1 >= 0.0) & (x1 <= d_safe), h_chord, 2.0 * rmin)
    return jnp.minimum(w * h, np.pi * rmin * rmin)


def _inner_radius(dist):
    R = dist.shape[-1]
    dphi = 2 * np.pi / R
    d0 = dist
    d1 = jnp.roll(dist, -1, axis=-1)
    chord = jnp.sqrt(jnp.maximum(d0 ** 2 + d1 ** 2 - 2 * d0 * d1 * np.cos(dphi),
                                 1e-12))
    return jnp.min(d0 * d1 * np.sin(dphi) / chord, axis=-1)


# ---------------------------------------------------------------------------
# the fused two-layout kernel
# ---------------------------------------------------------------------------

def _compact_topk(flags, cap):
    """Select up to `cap` set positions of a flat 0/1 flag vector (earliest
    first). Returns (sel_idx (cap,), sel_ok (cap,), n_set)."""
    n = flags.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(flags, n - pos, 0)
    vals, sel = jax.lax.top_k(keys, cap)
    ok = vals > 0
    return jnp.where(ok, sel, 0), ok, jnp.sum(flags.astype(jnp.int32))


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _nms2d_twolayout(dist, points, rank, n_real, thresh,
                     axis, Q, NB, A, P, P2, S, stages=5):
    """Full 2D greedy NMS in one dispatch (see module doc).

    dist (Npad, R) f32 (pad 1e-3), points (Npad, 2) f32 full-res px
    (pad 1e9), rank (Npad,) i32 descending-score position (pad 2^30),
    n_real traced count, thresh traced f32.

    Static: axis (stripe axis), Q (block rows), NB (band half-width in
    blocks), A (per-row ambiguous slots), P (per-block pair slots), P2
    (per-block sampled-stage slots), S (estimator grid).

    Returns (keep (Npad,) bool in input order,
             flags = (band_ok, amb_ok, pairs_ok, p2_ok),
             stats = (max_amb, max_pairs, max_todo, n_iters)).
    `keep` is only meaningful when all flags are True.
    """
    Npad, R = dist.shape
    n_blocks = Npad // Q
    W = (2 * NB + 1) * Q
    pad = NB * Q
    valid = jnp.arange(Npad) < n_real
    dist = jnp.where(valid[:, None], dist.astype(jnp.float32), 1e-3)
    pts = jnp.where(valid[:, None], points.astype(jnp.float32), 1e9)

    rout_all = jnp.max(dist, axis=-1)
    dmax = jnp.max(jnp.where(valid, rout_all, 0.0))
    T = 2.0 * dmax + 1.0
    y = pts[:, axis]
    x = pts[:, 1 - axis]
    x0 = jnp.min(jnp.where(valid, x, jnp.inf))
    x0 = jnp.where(jnp.isfinite(x0), x0, 0.0)
    xmax = jnp.max(jnp.where(valid, x, -jnp.inf))
    gap = jnp.maximum(xmax - x0, 0.0) + 2.0 * T + 2.0
    base_idx = jnp.arange(Npad, dtype=jnp.int32)
    col_pos = jnp.arange(W, dtype=jnp.int32)

    layouts = []
    band_ok = jnp.bool_(True)
    for off in (0.0, 0.5):
        stripe = jnp.floor((y + off * 2.0 * T) / (2.0 * T))
        key = jnp.where(valid, stripe * gap + (x - x0), jnp.inf)
        key_s, py_s, px_s, rank_s, perm = jax.lax.sort(
            (key, pts[:, 0], pts[:, 1], rank, base_idx),
            dimension=0, num_keys=1)
        d_s = jnp.take(dist, perm, axis=0)
        p_s = jnp.stack([py_s, px_s], axis=-1)
        # band coverage at static NB: the element just outside each block's
        # +-pad window must be farther than T in key space
        i0s = jnp.arange(n_blocks) * Q
        i1s = i0s + Q - 1
        li = i0s - pad - 1
        ri = i1s + pad + 1
        lkey = key_s[jnp.clip(li, 0, Npad - 1)]
        rkey = key_s[jnp.clip(ri, 0, Npad - 1)]
        l_ok = (li < 0) | ~jnp.isfinite(key_s[i0s]) | (lkey < key_s[i0s] - T)
        r_ok = (ri >= Npad) | ~jnp.isfinite(key_s[i1s]) | (rkey > key_s[i1s] + T)
        band_ok = band_ok & jnp.all(l_ok & r_ok)

        lo_s, hi_s = polygon_bboxes(d_s, p_s)
        area_s = polygon_areas(d_s)
        rin_s = _inner_radius(d_s)
        rout_s = jnp.max(d_s, axis=-1)
        valid_s = jnp.isfinite(key_s)

        def padw(v, value):
            widths = [(pad, pad)] + [(0, 0)] * (v.ndim - 1)
            return jnp.pad(v, widths, constant_values=value)

        layouts.append(dict(
            perm=perm,
            d=padw(d_s, 1e-3), p=padw(p_s, 1e9),
            lo=padw(lo_s, -1e9), hi=padw(hi_s, -1e9),
            area=padw(area_s, 1.0), rin=padw(rin_s, 1e-3),
            rout=padw(rout_s, 1e-3),
            rank=padw(rank_s, jnp.int32(2 ** 30)),
            valid=padw(valid_s, False),
        ))

    max_amb = jnp.int32(0)
    max_pairs = jnp.int32(0)
    max_todo = jnp.int32(0)
    bands = []
    for L in layouts:
        dL, pL = L["d"], L["p"]
        loL, hiL, areaL = L["lo"], L["hi"], L["area"]
        rinL, routL = L["rin"], L["rout"]
        rankL, validL = L["rank"], L["valid"]
        # one feature matrix per layout so pair gathers are single takes:
        # [d(R), py, px, loy, lox, hiy, hix, area, rin]
        FL = jnp.concatenate([dL, pL, loL, hiL, areaL[:, None],
                              rinL[:, None]], axis=1)          # (Npad+2pad, R+8)

        def unpack(F):
            return (F[:, :R], F[:, R:R + 2], F[:, R + 2:R + 4],
                    F[:, R + 4:R + 6], F[:, R + 6], F[:, R + 7])

        def block_fill(b, carry):
            sup_acc, m_amb, m_pairs, m_todo = carry
            i0 = b * Q
            slr = lambda a: jax.lax.dynamic_slice_in_dim(a, i0 + pad, Q, 0)
            slc = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, W, 0)
            p_r, a_r = slr(pL), slr(areaL)
            lo_r, hi_r = slr(loL), slr(hiL)
            rin_r, rout_r = slr(rinL), slr(routL)
            rank_r, valid_r = slr(rankL), slr(validL)
            p_c, a_c = slc(pL), slc(areaL)
            lo_c, hi_c = slc(loL), slc(hiL)
            rin_c, rout_c = slc(rinL), slc(routL)
            rank_c, valid_c = slc(rankL), slc(validL)
            F_r, F_c = slr(FL), slc(FL)

            pair_ok = ((rank_c[None, :] > rank_r[:, None])
                       & valid_c[None, :] & valid_r[:, None])

            # ---- stage 1: lens + bbox bounds, dense (Q, W) ----
            ext = jnp.maximum(jnp.minimum(hi_r[:, None], hi_c[None]) -
                              jnp.maximum(lo_r[:, None], lo_c[None]), 0.0)
            bbox_inter = ext[..., 0] * ext[..., 1]
            dc = jnp.sqrt(jnp.sum((p_r[:, None] - p_c[None]) ** 2, axis=-1))
            denom = jnp.minimum(a_r[:, None], a_c[None]) + 1e-10
            ub = jnp.minimum(_lens_ub(rout_r[:, None], rout_c[None], dc),
                             bbox_inter) / denom
            lb = _lens_lb(rin_r[:, None], rin_c[None], dc) / denom
            sup = (lb > thresh) & pair_ok
            amb = pair_ok & ~sup & (ub > thresh)
            m_amb = jnp.maximum(m_amb, jnp.max(jnp.sum(amb, axis=1)))
            if stages == 0:
                sup_acc = jax.lax.dynamic_update_slice(
                    sup_acc, sup.astype(jnp.bfloat16)[None], (b, 0, 0))
                return sup_acc, m_amb, m_pairs, m_todo

            # ---- per-row selection (A slots) + block compaction (P) ----
            keys = jnp.where(amb, W - col_pos[None, :], 0)
            vals_a, cols_a = jax.lax.top_k(keys, A)          # (Q, A)
            ok_a = vals_a > 0
            if stages == 1:
                sup = sup | (ok_a.any(axis=1)[:, None] & amb)  # keep live
                sup_acc = jax.lax.dynamic_update_slice(
                    sup_acc, sup.astype(jnp.bfloat16)[None], (b, 0, 0))
                return sup_acc, m_amb, m_pairs, m_todo
            sel, ok_p, n_pairs = _compact_topk(ok_a.reshape(Q * A), P)
            m_pairs = jnp.maximum(m_pairs, n_pairs)
            pr = sel // A
            pc = jnp.where(ok_p, cols_a.reshape(Q * A)[sel], 0)

            # pair data: two single-take row gathers of the feature matrix
            d_rp, p_rp, lo_rp, hi_rp, a_rp, rin_rp = unpack(
                jnp.take(F_r, pr, axis=0))
            d_cp, p_cp, lo_cp, hi_cp, a_cp, rin_cp = unpack(
                jnp.take(F_c, pc, axis=0))

            # ---- stage A0: kernel-lemma exact lower bound ----
            lb0 = _erosion_lb_area(d_rp, p_rp, rin_rp, d_cp, p_cp, rin_cp)
            sup0 = ok_p & (lb0 / (jnp.minimum(a_rp, a_cp) + 1e-10) > thresh)
            if stages == 2:
                sup = sup.at[pr, pc].max(sup0)
                sup = sup & pair_ok
                sup_acc = jax.lax.dynamic_update_slice(
                    sup_acc, sup.astype(jnp.bfloat16)[None], (b, 0, 0))
                return sup_acc, m_amb, m_pairs, m_todo

            # ---- stage A: coarse 4x4 cascade on the P slots ----
            supA, undA = _sampled_sup(
                d_rp, p_rp, lo_rp, hi_rp, a_rp,
                d_cp, p_cp, lo_cp, hi_cp, a_cp, thresh, S)
            supA = (supA | sup0) & ok_p
            if stages == 3:
                sup = sup.at[pr, pc].max(supA)
                sup = sup & pair_ok
                sup_acc = jax.lax.dynamic_update_slice(
                    sup_acc, sup.astype(jnp.bfloat16)[None], (b, 0, 0))
                return sup_acc, m_amb, m_pairs, m_todo

            # ---- stage B: fine S x S grid on the undecided (P2 slots) ----
            todo = ok_p & undA & ~sup0
            sel2, ok2, n_todo = _compact_topk(todo, P2)
            m_todo = jnp.maximum(m_todo, n_todo)
            d_r2, p_r2, lo_r2, hi_r2, a_r2, _ = unpack(
                jnp.take(F_r, jnp.take(pr, sel2), axis=0))
            d_c2, p_c2, lo_c2, hi_c2, a_c2, _ = unpack(
                jnp.take(F_c, jnp.take(pc, sel2), axis=0))
            supB = _sampled_sup_fine(
                d_r2, p_r2, lo_r2, hi_r2, a_r2,
                d_c2, p_c2, lo_c2, hi_c2, a_c2, thresh, S)
            supB = supB & ok2

            # fold pair verdicts into the block (scatter-max, few K updates)
            sup = sup.at[pr, pc].max(supA)
            sup = sup.at[jnp.take(pr, sel2), jnp.take(pc, sel2)].max(supB)
            sup = sup & pair_ok
            sup_acc = jax.lax.dynamic_update_slice(
                sup_acc, sup.astype(jnp.bfloat16)[None], (b, 0, 0))
            return sup_acc, m_amb, m_pairs, m_todo

        sup0 = jnp.zeros((n_blocks, Q, W), jnp.bfloat16)
        sup_band, max_amb, max_pairs, max_todo = jax.lax.fori_loop(
            0, n_blocks, block_fill, (sup0, max_amb, max_pairs, max_todo))
        bands.append(sup_band)

    # ---- two-layout band Jacobi fixpoint (greedy recursion, base order) ----
    inv_perms = []
    for L in layouts:
        inv = jnp.zeros(Npad, jnp.int32).at[L["perm"]].set(base_idx)
        inv_perms.append(inv)

    def band_killed(keep_sorted, band):
        contrib = jnp.einsum(
            "bq,bqw->bw", keep_sorted.reshape(n_blocks, Q).astype(jnp.bfloat16),
            band, preferred_element_type=jnp.float32)
        contrib3 = contrib.reshape(n_blocks, 2 * NB + 1, Q)
        killed_pad = jnp.zeros(Npad + 2 * pad, jnp.float32)
        for o in range(2 * NB + 1):
            piece = contrib3[:, o, :].reshape(Npad)
            killed_pad = killed_pad + jnp.pad(piece, (o * Q, (2 * NB - o) * Q))
        return killed_pad[pad:pad + Npad] > 0.5

    def cond(c):
        t, keep, changed = c
        return changed & (t < Npad)

    def body(c):
        t, keep, _ = c
        killed = jnp.zeros(Npad, bool)
        for L, band, inv in zip(layouts, bands, inv_perms):
            kL = band_killed(jnp.take(keep, L["perm"]), band)
            killed = killed | jnp.take(kL, inv)
        new = valid & ~killed
        return t + 1, new, jnp.any(new != keep)

    n_it, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), valid, jnp.bool_(True)))

    flags = (band_ok, max_amb <= A, max_pairs <= P, max_todo <= P2)
    stats = (max_amb, max_pairs, max_todo, n_it)
    return keep, flags, stats


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

def _bucket(n, minimum=16):
    b = minimum
    while b < n:
        b *= 2
    return b


def _pad_np(x, n, value=0.0):
    if x.shape[0] >= n:
        return x
    widths = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, widths, constant_values=value)


# last-working static capacities, persisted across calls (and to disk via
# ops.nms cap persistence) so the warm path is one dispatch, zero retries
_CAPS = {"NB": 1, "A": 16, "P": 2048, "P2": 1024}


def nms2d_twolayout_host(dist, points, thresh, Q=256, S=16, verbose=False,
                         band_bytes_cap=6 << 30, caps=None):
    """Host driver for `_nms2d_twolayout`: pad/bucket, dispatch, inspect the
    overflow flags, retry with the next capacity bucket. Candidates must be
    pre-sorted by descending score. Returns the keep bool mask (input order)
    or None when the field exceeds the band limits (caller falls back)."""
    N = len(dist)
    points = np.asarray(points, np.float32)
    axis = int(np.argmax(points.max(0) - points.min(0)))
    Npad = _bucket(N, minimum=2 * Q)
    caps = _CAPS if caps is None else caps
    NB, A, P, P2 = caps["NB"], caps["A"], caps["P"], caps["P2"]
    dist_p = jnp.asarray(_pad_np(np.asarray(dist, np.float32), Npad, 1e-3)) \
        if isinstance(dist, np.ndarray) else _pad_jnp(dist, Npad, 1e-3)
    points_p = jnp.asarray(_pad_np(points, Npad, 1e9))
    rank_p = jnp.asarray(_pad_np(np.arange(N, dtype=np.int32), Npad, 2 ** 30))
    for _ in range(12):
        W = (2 * NB + 1) * Q
        if Npad * W * 2 > band_bytes_cap:
            return None
        keep, flags, stats = jax.device_get(_nms2d_twolayout(
            dist_p, points_p, rank_p, jnp.int32(N), jnp.float32(thresh),
            axis, Q, NB, A, P, P2, S))
        b_ok, a_ok, p_ok, p2_ok = (bool(f) for f in flags)
        m_amb, m_pairs, m_todo, n_it = (int(s) for s in stats)
        if b_ok and a_ok and p_ok and p2_ok:
            caps.update(NB=NB, A=A, P=P, P2=P2)
            if verbose:
                print(f"NMS(twolayout): N={N} amb<= {m_amb} pairs<={m_pairs} "
                      f"todo<={m_todo} iters={n_it}", flush=True)
            return np.asarray(keep)[:N]
        if verbose:
            print(f"NMS(twolayout): retry (band={b_ok} amb={m_amb}/{A} "
                  f"pairs={m_pairs}/{P} todo={m_todo}/{P2})", flush=True)
        if not b_ok:
            if NB >= 8:
                return None
            NB *= 2
        if not a_ok:
            if m_amb > 2048:
                return None
            A = _bucket(m_amb, minimum=16)
        if not p_ok:
            P = min(_bucket(m_pairs, minimum=1024), Q * A)
        if not p2_ok:
            P2 = min(_bucket(m_todo, minimum=512), P)
    return None


def _pad_jnp(x, n, value):
    if x.shape[0] >= n:
        return x
    widths = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=value)
