"""Two-layout striped banded NMS for 2D star polygons — global-pair-list
kernel (round-4 redesign of the round-3 per-block kernel).

TPU-native replacement for the reference 2D NMS
(stardist/lib/stardist2d.cpp:390-615: greedy score-descending suppression,
overlap criterion ``A_inter / min(A_i, A_j) > thresh``) built for one goal:
decide the ~10^5-10^6 interacting pairs of a production candidate field in
tens of milliseconds of device time, in ONE dispatch.

Measured design constraints on the tunneled v5e (examples/
bench_dispatch_floor.py): each host->device dispatch costs ~27-30 ms of
latency regardless of payload; on-device, sorts/top_k/gathers cost single
milliseconds at 262k candidates while dense elementwise sweeps are
essentially free. So the kernel runs everything in one jit, avoids
per-block loops over thousands of tiny steps (the round-3 kernel's cost),
and touches each pair-slot buffer O(1) times.

Structure (ONE jit dispatch, no host round trips):

1. *Stripe layouts.* Candidates are sorted twice by a stripe key
   (``floor((y+off)/2T)*gap + x`` for offsets 0 and T, T > interaction
   radius). Any interacting pair (|dy| < T and |dx| < T) is band-local in at
   least one layout (an interval of length < T containing a boundary of one
   stripe partition lies strictly inside a stripe of the other), so each
   layout's suppression structure is a narrow band of width W = (2*NB+1)*Q.
2. *Grouped bounds sweep* (per layout): G row-blocks at a time (one fused
   (G, Q, W) elementwise op per step — no per-block dispatches), the
   analytic bound cascade (reference stages 1-2,
   stardist3d_impl.cpp:1209-1330: inscribed/outer-disc lens bounds + bbox
   intersection) decides most pairs, writing the suppression band and a
   dense ambiguous-pair mask (Npad, W).
3. *Two-tier pair slots* (NO compaction sort): rows with at most AS
   ambiguous pairs keep them in their natural (Npad, AS) layout (extracted
   by AS iterated-argmax passes over the mask — cheap); rows with more
   ("overflow rows", capacity OVR) contribute their ENTIRE masked window
   densely as (OVR, W) slots. Pair stages run on the concatenated slot
   array with validity masks — slot waste is bounded and costs no sort.
4. *Exact stages on the slot array* (Pallas pair kernels on TPU,
   ops/pair_overlap.py — the jnp forms multiply HBM traffic by R):
   - stage A on every slot: *kernel-lemma lower bound* (exact): for star
     polygon j with inscribed-disc radius rin_j (about its center), the
     kernel of j contains B(c_j, rin_j), hence lambda*(j - c_j) + c stays
     inside j for any |c - c_j| <= (1-lambda)*rin_j. Thus
     ``polygon(c_i, min(d_i, lambda*d_j))`` is a subset of the pair's
     intersection with ``lambda = 1 - |c_i-c_j|/rin_j`` — an O(R) per-pair
     area lower bound that decides the near-duplicate bulk — plus the 4x4
     coarse grid of the package-wide sampled-overlap cascade;
   - stage B: cascade-undecided slots are compacted (ONE 1-operand sort of
     slot indices) into PF slots for the full S x S grid. Verdicts are
     scattered into the suppression bands at ``r*W + w`` (the flat band
     index, since n_blocks*Q = Npad).
5. *Band Jacobi fixpoint*: greedy semantics (a survivor suppresses all
   later overlapping candidates; suppressed candidates suppress nothing)
   resolved as the unique fixpoint of the triangular recursion with
   banded matvecs over BOTH layouts per iteration (see ops/nms.py
   ``_greedy_fixpoint`` for the argument).

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
    (w in {0,1}), so ``picked`` equals the einsum result bitwise. Wedge
    selection stays atan2-based like points_in_polygons: atan2 is a library
    call XLA never fuses, so the selection is bitwise-stable across every
    jit context (a cross-product-sign rule is NOT — XLA:CPU contracts
    mul-sub into FMA per fusion site, flipping boundary-sample signs
    inconsistently between a tensor and its rolled copy)."""
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

    v0r = jnp.zeros_like(ur)
    v0c = jnp.zeros_like(ur)
    v1r = jnp.zeros_like(ur)
    v1c = jnp.zeros_like(ur)
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
# decision boundary ``f* = thresh * min(A_r, A_c) / bbox_inter_area``
# defers to the full 16x16 grid. Safety measured on the bench model's real
# 4096^2 field: 0 / 76k disagreements with the pure 16x16 decision at this
# margin (51% of ambiguous pairs decided coarse). The cascade is identical
# in every execution path (jnp and Pallas), so all paths agree exactly.
CASCADE_MARGIN = 0.25


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
# the fused global-pair-list kernel
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=tuple(range(5, 13)))
def _nms2d_v2(dist, points, rank, n_real, thresh,
              axis, Q, NB, AS, OVR, PF, S, use_pallas):
    """Full 2D greedy NMS in one dispatch (see module doc).

    dist (Npad, R) f32 (pad 1e-3), points (Npad, 2) f32 full-res px
    (pad 1e9), rank (Npad,) i32 descending-score position (pad 2^30),
    n_real traced count, thresh traced f32.

    Static: axis (stripe axis), Q (block rows), NB (band half-width in
    blocks), AS (per-row ambiguous slots), OVR (overflow-row slots), PF
    (fine-stage slots), S (estimator grid), use_pallas (TPU pair kernels
    vs the pure-jnp stage implementations).

    Returns (keep (Npad,) bool in input order,
             flags = (band_ok, over_ok, pf_ok),
             stats = (max_amb_row, n_over, n_pairs, n_fine, n_iters)).
    `keep` is only meaningful when all flags are True.
    """
    from .pair_overlap import pair_stage_coarse, pair_stage_fine
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
    col_iota = jnp.arange(W, dtype=jnp.int32)

    # grouped sweep geometry: G row-blocks per fused step, sized so the
    # (G, Q, W) f32 temporaries stay ~25-50 MB regardless of Q/NB
    G = max(1, min((1 << 23) // (Q * W), n_blocks))
    while n_blocks % G:
        G -= 1
    n_groups = n_blocks // G

    def padw(v, value):
        widths = [(pad, pad)] + [(0, 0)] * (v.ndim - 1)
        return jnp.pad(v, widths, constant_values=value)

    def windows(a_padded, g):
        """(G, Q, ...) row blocks and (G, W, ...) band windows of group g."""
        i0 = g * G * Q
        rows = jax.lax.dynamic_slice_in_dim(a_padded, i0 + pad, G * Q, 0)
        rows = rows.reshape((G, Q) + a_padded.shape[1:])
        seg = jax.lax.dynamic_slice_in_dim(a_padded, i0, (G + 2 * NB) * Q, 0)
        view = seg.reshape((G + 2 * NB, Q) + a_padded.shape[1:])
        win = jnp.concatenate([view[k:k + G] for k in range(2 * NB + 1)],
                              axis=1)                    # (G, W, ...)
        return rows, win

    band_ok = jnp.bool_(True)
    max_amb = jnp.int32(0)
    n_over_t = jnp.int32(0)
    n_pairs_t = jnp.int32(0)
    n_fine_t = jnp.int32(0)
    perms = []
    bands = []
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
        # feature matrix: pair gathers later are single row takes
        # layout: [d(R), py, px, loy, lox, hiy, hix, area, rin]
        F = jnp.concatenate([d_s, p_s, lo_s, hi_s, area_s[:, None],
                             rin_s[:, None]], axis=1)          # (Npad, R+8)
        pad_row = jnp.concatenate([
            jnp.full((R,), 1e-3, jnp.float32),
            jnp.full((2,), 1e9, jnp.float32),
            jnp.full((2,), -1e9, jnp.float32),
            jnp.full((2,), -1e9, jnp.float32),
            jnp.asarray([1.0, 1e-3], jnp.float32)])
        F_pad = jnp.concatenate([
            jnp.broadcast_to(pad_row, (pad, R + 8)), F,
            jnp.broadcast_to(pad_row, (pad, R + 8))], axis=0)

        p_pad = padw(p_s, 1e9)
        rout_pad = padw(rout_s, 1e-3)
        rin_pad = padw(rin_s, 1e-3)
        area_pad = padw(area_s, 1.0)
        lo_pad = padw(lo_s, -1e9)
        hi_pad = padw(hi_s, -1e9)
        rank_pad = padw(rank_s, jnp.int32(2 ** 30))
        valid_pad = padw(valid_s, False)

        # ---- grouped bounds sweep: sup band + ambiguous mask -------------
        def sweep(g, carry):
            band, amb_buf, amb_cnt = carry
            p_r, p_c = windows(p_pad, g)
            rout_r, rout_c = windows(rout_pad, g)
            rin_r, rin_c = windows(rin_pad, g)
            area_r, area_c = windows(area_pad, g)
            lo_r, lo_c = windows(lo_pad, g)
            hi_r, hi_c = windows(hi_pad, g)
            rank_r, rank_c = windows(rank_pad, g)
            valid_r, valid_c = windows(valid_pad, g)

            pair_ok = ((rank_c[:, None] > rank_r[:, :, None])
                       & valid_c[:, None] & valid_r[:, :, None])
            ext = jnp.maximum(jnp.minimum(hi_r[:, :, None], hi_c[:, None]) -
                              jnp.maximum(lo_r[:, :, None], lo_c[:, None]), 0.0)
            bbox_inter = ext[..., 0] * ext[..., 1]
            dc = jnp.sqrt(jnp.sum((p_r[:, :, None] - p_c[:, None]) ** 2,
                                  axis=-1))
            denom = jnp.minimum(area_r[:, :, None], area_c[:, None]) + 1e-10
            ub = jnp.minimum(_lens_ub(rout_r[:, :, None], rout_c[:, None], dc),
                             bbox_inter) / denom
            lb = _lens_lb(rin_r[:, :, None], rin_c[:, None], dc) / denom
            sup = (lb > thresh) & pair_ok
            amb = pair_ok & ~sup & (ub > thresh)
            band = jax.lax.dynamic_update_slice(
                band, sup.astype(jnp.bfloat16), (g * G, 0, 0))
            amb_buf = jax.lax.dynamic_update_slice(
                amb_buf, amb.reshape(G * Q, W), (g * G * Q, 0))
            amb_cnt = jax.lax.dynamic_update_slice_in_dim(
                amb_cnt, jnp.sum(amb, axis=2).reshape(G * Q).astype(jnp.int32),
                g * G * Q, 0)
            return band, amb_buf, amb_cnt

        band0 = jnp.zeros((n_blocks, Q, W), jnp.bfloat16)
        amb0 = jnp.zeros((Npad, W), bool)
        cnt0 = jnp.zeros(Npad, jnp.int32)
        band, amb_buf, amb_cnt = jax.lax.fori_loop(
            0, n_groups, sweep, (band0, amb0, cnt0))
        max_amb = jnp.maximum(max_amb, jnp.max(amb_cnt))
        n_pairs_t = n_pairs_t + jnp.sum(amb_cnt)

        # ---- tier 2 rows: amb_cnt > AS, handled densely -------------------
        over = amb_cnt > AS
        n_over = jnp.sum(over.astype(jnp.int32))
        n_over_t = jnp.maximum(n_over_t, n_over)
        okey = jnp.where(over, base_idx, jnp.int32(Npad))
        okey_s, rows_all = jax.lax.sort((okey, base_idx), dimension=0,
                                        num_keys=1)
        ok_o = okey_s[:OVR] < Npad
        rows_o = jnp.where(ok_o, rows_all[:OVR], 0)
        amb_o = jnp.take(amb_buf, rows_o, axis=0) & ok_o[:, None]

        # ---- tier 1: up to AS ambiguous columns per non-overflow row
        # (iterated argmax over the masked buffer)
        def extract(k, carry):
            buf, cols, ok = carry
            idx = jnp.argmax(buf, axis=1).astype(jnp.int32)   # first set col
            has = jnp.any(buf, axis=1)    # idx points at a set bit iff any
            cols = jax.lax.dynamic_update_slice_in_dim(
                cols, idx[:, None], k, 1)
            ok = jax.lax.dynamic_update_slice_in_dim(
                ok, has[:, None], k, 1)
            buf = buf & (col_iota[None, :] != idx[:, None])
            return buf, cols, ok

        cols0 = jnp.zeros((Npad, AS), jnp.int32)
        ok0 = jnp.zeros((Npad, AS), bool)
        _, cols_a, ok_a = jax.lax.fori_loop(
            0, AS, extract, (amb_buf & ~over[:, None], cols0, ok0))

        # ---- unified slot arrays (no compaction: tier-1 slots stay in
        # their (Npad, AS) layout, tier-2 in (OVR, W)) ----------------------
        pr = jnp.concatenate([
            jnp.broadcast_to(base_idx[:, None], (Npad, AS)).reshape(-1),
            jnp.broadcast_to(rows_o[:, None], (OVR, W)).reshape(-1)])
        pw = jnp.concatenate([
            cols_a.reshape(-1),
            jnp.broadcast_to(col_iota[None, :], (OVR, W)).reshape(-1)])
        ok_p = jnp.concatenate([ok_a.reshape(-1), amb_o.reshape(-1)])

        def unpack(Fg):
            return (Fg[:, :R], Fg[:, R:R + 2], Fg[:, R + 2:R + 4],
                    Fg[:, R + 4:R + 6], Fg[:, R + 6], Fg[:, R + 7])

        # ---- stage A (cheap, all slots): 4x4 grid + erosion lower bound.
        # CHUNKED: the slot count scales with Npad*AS + OVR*W (millions on
        # dense fields) and each slot gathers two (R+8)-float feature rows —
        # materializing them all at once multiplies HBM by ~300 bytes/slot
        # (measured 23 GB demand on a 65k clustered field at AS=64). A
        # fori_loop over fixed-size chunks bounds peak memory at
        # O(CH * features) while keeping total work identical.
        n_slots = Npad * AS + OVR * W
        CH = 1 << 10
        while CH < min(1 << 18, n_slots):
            CH *= 2
        n_slots_p = -(-n_slots // CH) * CH
        pr = jnp.pad(pr, (0, n_slots_p - n_slots))
        pw = jnp.pad(pw, (0, n_slots_p - n_slots))
        ok_p = jnp.pad(ok_p, (0, n_slots_p - n_slots))
        band_flat = band.reshape(Npad * W)
        OOB = jnp.int32(Npad * W)           # scatter index meaning "drop"

        def stageA(ci, carry):
            band_flat, fine_mask = carry
            sl = ci * CH
            pr_c = jax.lax.dynamic_slice(pr, (sl,), (CH,))
            pw_c = jax.lax.dynamic_slice(pw, (sl,), (CH,))
            ok_c = jax.lax.dynamic_slice(ok_p, (sl,), (CH,))
            code_c = pr_c * W + pw_c        # flat band index of each slot
            pc_c = (pr_c // Q) * Q + pw_c   # padded column row index
            d_rp, p_rp, lo_rp, hi_rp, a_rp, rin_rp = unpack(
                jnp.take(F_pad, pr_c + pad, axis=0))
            d_cp, p_cp, lo_cp, hi_cp, a_cp, rin_cp = unpack(
                jnp.take(F_pad, pc_c, axis=0))
            plo_p = jnp.maximum(lo_rp, lo_cp)
            ext_p = jnp.maximum(jnp.minimum(hi_rp, hi_cp) - plo_p, 0.0)
            min_a = jnp.minimum(a_rp, a_cp)
            ext_area = ext_p[:, 0] * ext_p[:, 1]
            fstar = thresh * (min_a + 1e-10) / jnp.maximum(ext_area, 1e-10)
            if use_pallas:
                frac4, lb0_area = pair_stage_coarse(
                    d_rp, p_rp, d_cp, p_cp, plo_p, ext_p, rin_rp, rin_cp,
                    interpret=False)
            else:
                lb0_area = _erosion_lb_area(d_rp, p_rp, rin_rp,
                                            d_cp, p_cp, rin_cp)
                frac4, _ = _pair_frac(d_rp, p_rp, lo_rp, hi_rp,
                                      d_cp, p_cp, lo_cp, hi_cp, 4)
            sup0 = ok_c & (lb0_area / (min_a + 1e-10) > thresh)
            coarse_sup = frac4 - fstar > CASCADE_MARGIN
            coarse_no = fstar - frac4 > CASCADE_MARGIN
            sup_pair = (sup0 | coarse_sup) & ok_c
            fine_todo = ok_c & ~coarse_sup & ~coarse_no & ~sup0
            band_flat = band_flat.at[jnp.where(sup_pair, code_c, OOB)].max(
                jnp.bfloat16(1.0), mode="drop")
            fine_mask = jax.lax.dynamic_update_slice(fine_mask, fine_todo,
                                                     (sl,))
            return band_flat, fine_mask

        band_flat, fine_mask = jax.lax.fori_loop(
            0, n_slots_p // CH, stageA,
            (band_flat, jnp.zeros(n_slots_p, bool)))

        # ---- stage B: full S x S on the cascade's undecided (ONE global
        # compaction sort of slot indices, then a single bounded pass) ------
        slot_pos = jnp.arange(n_slots_p, dtype=jnp.int32)
        fkey = jnp.where(fine_mask, slot_pos, jnp.int32(n_slots_p))
        fkey_s = jax.lax.sort(fkey, dimension=0)
        ok_f = fkey_s[:PF] < n_slots_p
        sel_slot = jnp.where(ok_f, fkey_s[:PF], 0)
        n_fine = jnp.sum(fine_mask.astype(jnp.int32))
        n_fine_t = jnp.maximum(n_fine_t, n_fine)
        pr_f = jnp.take(pr, sel_slot)
        pc_f = (pr_f // Q) * Q + jnp.take(pw, sel_slot)
        code_f = pr_f * W + jnp.take(pw, sel_slot)
        d_r2, p_r2, lo_r2, hi_r2, a_r2, _ = unpack(
            jnp.take(F_pad, pr_f + pad, axis=0))
        d_c2, p_c2, lo_c2, hi_c2, a_c2, _ = unpack(
            jnp.take(F_pad, pc_f, axis=0))
        plo_f = jnp.maximum(lo_r2, lo_c2)
        ext_f = jnp.maximum(jnp.minimum(hi_r2, hi_c2) - plo_f, 0.0)
        if use_pallas:
            frac_f = pair_stage_fine(d_r2, p_r2, d_c2, p_c2, plo_f, ext_f,
                                     S=S, interpret=False)
        else:
            frac_f, _ = _pair_frac(d_r2, p_r2, lo_r2, hi_r2,
                                   d_c2, p_c2, lo_c2, hi_c2, S)
        inter_f = frac_f * ext_f[:, 0] * ext_f[:, 1]
        supB = ok_f & (inter_f / (jnp.minimum(a_r2, a_c2) + 1e-10) > thresh)

        # ---- fold the fine verdicts into the band -------------------------
        band_flat = band_flat.at[jnp.where(supB, code_f, OOB)].max(
            jnp.bfloat16(1.0), mode="drop")
        bands.append(band_flat.reshape(n_blocks, Q, W))
        perms.append(perm)

    # ---- two-layout band Jacobi fixpoint (greedy recursion, base order) ----
    inv_perms = []
    for perm in perms:
        inv = jnp.zeros(Npad, jnp.int32).at[perm].set(base_idx)
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
        for perm, band, inv in zip(perms, bands, inv_perms):
            kL = band_killed(jnp.take(keep, perm), band)
            killed = killed | jnp.take(kL, inv)
        new = valid & ~killed
        return t + 1, new, jnp.any(new != keep)

    n_it, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), valid, jnp.bool_(True)))

    flags = (band_ok, n_over_t <= OVR, n_fine_t <= PF)
    stats = (max_amb, n_over_t, n_pairs_t, n_fine_t, n_it)
    return keep, flags, stats


@functools.partial(jax.jit, static_argnums=tuple(range(4, 13)))
def _nms2d_v2_traced(dist, points, n_real, thresh, grid,
                     axis, Q, NB, AS, OVR, PF, S=16, use_pallas=True):
    """`_nms2d_v2` with the device-predict calling convention: consumes the
    sparse-extraction outputs directly (grid-unit integer points, traced
    candidate count), so the NMS dispatch needs NO host-side inspection of
    the candidate field. ``grid`` is the static (gy, gx) subsampling
    factor. Candidates must already be sorted by descending score."""
    Npad = dist.shape[0]
    valid = jnp.arange(Npad) < n_real
    pts = points.astype(jnp.float32) * jnp.asarray(grid, jnp.float32)[None]
    pts = jnp.where(valid[:, None], pts, 1e9)
    rank = jnp.where(valid, jnp.arange(Npad, dtype=jnp.int32),
                     jnp.int32(2 ** 30))
    return _nms2d_v2(jnp.maximum(dist.astype(jnp.float32), 1e-3), pts, rank,
                     n_real, thresh, axis, Q, NB, AS, OVR, PF, S, use_pallas)


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


def _pad_jnp(x, n, value):
    if x.shape[0] >= n:
        return x
    widths = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=value)


# last-working static capacities, persisted across calls (and to disk via
# the model layer's device-caps persistence) so the warm path is one
# dispatch, zero retries
_CAPS = {"NB": 1, "AS": 16, "OVR": 1024, "PF": 1 << 16}


def nms2d_twolayout_host(dist, points, thresh, Q=128, S=16, verbose=False,
                         band_bytes_cap=6 << 30, caps=None):
    """Host driver for `_nms2d_v2`: pad/bucket, dispatch, inspect the
    overflow flags, retry with the next capacity bucket. Candidates must be
    pre-sorted by descending score. Returns the keep bool mask (input order)
    or None when the field exceeds the band limits (caller falls back)."""
    N = len(dist)
    points = np.asarray(points, np.float32)
    axis = int(np.argmax(points.max(0) - points.min(0)))
    Npad = _bucket(N, minimum=2 * Q)
    caps = _CAPS if caps is None else caps
    NB = caps.get("NB", 1)
    AS = caps.get("AS", 16)
    OVR = min(caps.get("OVR", 1024), Npad)
    PF = caps.get("PF", 1 << 16)
    use_pallas = jax.default_backend() == "tpu"
    dist_p = jnp.asarray(_pad_np(np.asarray(dist, np.float32), Npad, 1e-3)) \
        if isinstance(dist, np.ndarray) else _pad_jnp(dist, Npad, 1e-3)
    points_p = jnp.asarray(_pad_np(points, Npad, 1e9))
    rank_p = jnp.asarray(_pad_np(np.arange(N, dtype=np.int32), Npad, 2 ** 30))
    for _ in range(12):
        W = (2 * NB + 1) * Q
        if Npad * W * 2 > band_bytes_cap:
            return None
        keep, flags, stats = jax.device_get(_nms2d_v2(
            dist_p, points_p, rank_p, jnp.int32(N), jnp.float32(thresh),
            axis, Q, NB, AS, OVR, PF, S, use_pallas))
        b_ok, o_ok, pf_ok = (bool(f) for f in flags)
        m_amb, n_over, n_pairs, n_fine, n_it = (int(s) for s in stats)
        if b_ok and o_ok and pf_ok:
            caps.update(NB=NB, AS=AS, OVR=OVR, PF=PF)
            if verbose:
                print(f"NMS(v2): N={N} amb<={m_amb} over={n_over} "
                      f"pairs={n_pairs} fine={n_fine} iters={n_it}",
                      flush=True)
            return np.asarray(keep)[:N]
        if verbose:
            print(f"NMS(v2): retry (band={b_ok} over={n_over}/{OVR} "
                  f"fine={n_fine}/{PF} amb={m_amb} AS={AS})", flush=True)
        if not b_ok:
            if NB >= 8:
                return None
            NB *= 2
        if not o_ok:
            # many overflow rows = the field is dense everywhere: widen the
            # cheap per-row tier instead of the dense overflow windows (whose
            # slot count scales with OVR*W)
            if n_over > max(1024, Npad // 8) and AS < 64:
                AS = min(_bucket(m_amb, minimum=2 * AS), 64)
            else:
                OVR = min(_bucket(n_over, minimum=1024), Npad)
                if n_over > OVR:     # still over at the Npad clamp
                    if AS >= 64:
                        return None
                    AS = min(_bucket(m_amb, minimum=2 * AS), 64)
        if not pf_ok:
            PF = _bucket(n_fine, minimum=1 << 14)
    return None
