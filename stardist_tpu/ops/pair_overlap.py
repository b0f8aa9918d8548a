"""Pallas TPU kernels for the 2D NMS pair machinery.

One kernel, ``pair_frac`` — the exact sampled-overlap estimator for a flat
list of candidate pairs: the fraction of an S x S midpoint grid over the
pair's bbox intersection that lies inside both star polygons (the
package-wide overlap estimator — see ops/nms.py ``_overlap_block_2d`` and
the reference criterion ``A_inter / min(A_i, A_j) > thresh``,
stardist/lib/stardist2d.cpp:579-585).

The pure-jnp form (``points_in_polygons_acc``, ops/nms2d_fast.py) selects
each sample's wedge by an R-step mask-accumulate loop; under XLA every
step is a separate HBM-bound fusion over the full (P, S*S) sample tensor,
so the HBM traffic is multiplied by R (~300 ms of a 65k-candidate NMS at
R=32 measured on v5e). This kernel keeps a tile of pairs VMEM-resident
across the R loop: traffic is O(P*S*S) once, the select loop runs on the
VPU at register/VMEM speed.

The sample-grid formulas replicate ``points_in_polygons_acc`` except the
wedge selection: Mosaic has no atan2 lowering, so the kernel selects each
sample's angular wedge by cross-product signs against the boundary rays
(an exact partition of the plane — each cross value is bound once in the
kernel, so the selection is internally consistent). A sample lying
EXACTLY on a wedge-boundary ray in float32 may classify into the adjacent
wedge relative to the jnp atan2 rule; grid midpoints
``plo + (i+0.5)/S*ext`` are generically never exactly on a boundary, and
every TPU execution path uses this kernel, so decisions are identical
within a platform (a cross-PLATFORM bitwise guarantee is neither needed
nor asserted anywhere). Sums of 0/1 floats are exact in f32, so the
fraction is order-independent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _inside_body(d, p_r, p_c, qr, qc, trig, R):
    """Inside test of sample grid (qr, qc) (TP, NS) against star polygons
    given by dist rows d (TP, R) about centers (p_r, p_c) (TP, 1) each.
    Mirrors points_in_polygons_acc (ops/nms2d_fast.py) except the wedge
    selection, which uses cross-product signs instead of atan2 (no Mosaic
    lowering) — see the module docstring for the exact-boundary caveat."""
    s0, c0, s1, c1 = trig
    ur = qr - p_r
    uc = qc - p_c

    # stream the wedge cross-products two-at-a-time: materializing all R of
    # them at once blows the Mosaic VMEM stack (each (TP, NS) f32 array is
    # lane-padded to 128 — R=32 live arrays = ~50 MB at TP=1024)
    def cr(kk):
        return ur * float(c0[kk % R]) - uc * float(s0[kk % R])

    cr0 = cr(0)
    prev = cr0
    v0r = jnp.zeros_like(ur)
    v0c = jnp.zeros_like(ur)
    v1r = jnp.zeros_like(ur)
    v1c = jnp.zeros_like(ur)
    for kk in range(R):
        nxt = cr0 if kk == R - 1 else cr(kk + 1)
        w = ((prev >= 0) & (nxt < 0)).astype(d.dtype)
        prev = nxt
        a = d[:, kk][:, None]
        b = d[:, (kk + 1) % R][:, None]
        v0r = v0r + w * (a * float(s0[kk]))
        v0c = v0c + w * (a * float(c0[kk]))
        v1r = v1r + w * (b * float(s1[kk]))
        v1c = v1c + w * (b * float(c1[kk]))
    er = v1r - v0r
    ec = v1c - v0c
    cross_p = er * (uc - v0c) - ec * (ur - v0r)
    cross_c = ec * v0r - er * v0c
    return cross_p * cross_c >= 0


def _pair_kernel(f_ref, out_ref, *, R, S, TP):
    """One tile of TP pairs: read the packed feature block, emit the S x S
    overlap fraction.

    f_ref: (TP, F) packed features
           [d_r(R), d_c(R), p_r(2), p_c(2), plo(2), ext(2), pad...].
    out_ref: (TP, 1) f32 frac_S.
    """
    F = f_ref[:, :]
    d_r = F[:, :R]
    d_c = F[:, R:2 * R]
    pr_r = F[:, 2 * R:2 * R + 1]
    pr_c = F[:, 2 * R + 1:2 * R + 2]
    pc_r = F[:, 2 * R + 2:2 * R + 3]
    pc_c = F[:, 2 * R + 3:2 * R + 4]
    plo_r = F[:, 2 * R + 4:2 * R + 5]
    plo_c = F[:, 2 * R + 5:2 * R + 6]
    ext_r = F[:, 2 * R + 6:2 * R + 7]
    ext_c = F[:, 2 * R + 7:2 * R + 8]

    dphi = 2 * np.pi / R
    angles = np.arange(R) * dphi
    trig = (np.sin(angles).astype(np.float32),
            np.cos(angles).astype(np.float32),
            np.sin(angles + dphi).astype(np.float32),
            np.cos(angles + dphi).astype(np.float32))

    # (S*S) midpoint grid over the bbox intersection, same construction as
    # _pair_frac (ops/nms2d_fast.py): row-major (r-major) order. Built from
    # iota (Pallas kernels cannot capture host constants); (i + 0.5)/S is
    # bitwise equal to numpy's (arange + 0.5)/S.
    idx = jax.lax.broadcasted_iota(jnp.int32, (TP, S * S), 1)
    gr = ((idx // S).astype(jnp.float32) + 0.5) / float(S)
    gc = ((idx % S).astype(jnp.float32) + 0.5) / float(S)
    qr = plo_r + gr * ext_r                   # (TP, S*S)
    qc = plo_c + gc * ext_c
    in_r = _inside_body(d_r, pr_r, pr_c, qr, qc, trig, R)
    in_c = _inside_body(d_c, pc_r, pc_c, qr, qc, trig, R)
    both = jnp.logical_and(in_r, in_c).astype(jnp.float32)
    out_ref[:, 0:1] = jnp.sum(both, axis=1, keepdims=True) / float(S * S)


def _pair_kernel2(f_ref, out_ref, *, R, S, TP):
    """Two pairs per tile row (lane packing for S*S <= 64): the VPU lane
    dimension is 128 wide, so an S=8 (64-sample) pair wastes half of every
    lane row in `_pair_kernel`. This kernel puts pair A's samples in lanes
    [0, NS) and pair B's in [NS, 2*NS); per-lane operands are selected by a
    lane mask, so the expensive R-step wedge loop serves both pairs at once.
    Per-pair arithmetic (sample coordinates, cross products, accumulation,
    final exact 0/1-sum) is identical to `_pair_kernel` — results are
    bitwise equal per pair.

    f_ref: (TP, F) packed DOUBLE-pair features
           [dA_r(R), dA_c(R), dB_r(R), dB_c(R),
            pA_r(2), pA_c(2), pB_r(2), pB_c(2),
            ploA(2), extA(2), ploB(2), extB(2), pad...].
    out_ref: (TP, 2) f32 (fracA, fracB).
    """
    NS = S * S
    F = f_ref[:, :]
    dA_r, dA_c = F[:, :R], F[:, R:2 * R]
    dB_r, dB_c = F[:, 2 * R:3 * R], F[:, 3 * R:4 * R]
    o = 4 * R
    pA = F[:, o:o + 4]
    pB = F[:, o + 4:o + 8]
    boxA = F[:, o + 8:o + 12]
    boxB = F[:, o + 12:o + 16]

    dphi = 2 * np.pi / R
    angles = np.arange(R) * dphi
    s0 = np.sin(angles).astype(np.float32)
    c0 = np.cos(angles).astype(np.float32)
    s1 = np.sin(angles + dphi).astype(np.float32)
    c1 = np.cos(angles + dphi).astype(np.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (TP, 2 * NS), 1)
    isA = lane < NS
    idx = jnp.where(isA, lane, lane - NS)     # per-pair sample index in [0, NS)
    gr = ((idx // S).astype(jnp.float32) + 0.5) / float(S)
    gc = ((idx % S).astype(jnp.float32) + 0.5) / float(S)

    def sel(a, b, j):
        return jnp.where(isA, a[:, j:j + 1], b[:, j:j + 1])

    qr = sel(boxA, boxB, 0) + gr * sel(boxA, boxB, 2)
    qc = sel(boxA, boxB, 1) + gc * sel(boxA, boxB, 3)

    def inside(da, db, pj):
        """Inside test against the A-polygon (lanes < NS) / B-polygon
        (lanes >= NS); da/db are the two (TP, R) dist blocks, pj the column
        offset of the center inside pA/pB."""
        ur = qr - sel(pA, pB, pj)
        uc = qc - sel(pA, pB, pj + 1)

        def cr(kk):
            return ur * float(c0[kk % R]) - uc * float(s0[kk % R])

        cr0 = cr(0)
        prev = cr0
        v0r = jnp.zeros_like(ur)
        v0c = jnp.zeros_like(ur)
        v1r = jnp.zeros_like(ur)
        v1c = jnp.zeros_like(ur)
        for kk in range(R):
            nxt = cr0 if kk == R - 1 else cr(kk + 1)
            w = ((prev >= 0) & (nxt < 0)).astype(jnp.float32)
            prev = nxt
            a = sel(da, db, kk)
            b = sel(da, db, (kk + 1) % R)
            v0r = v0r + w * (a * float(s0[kk]))
            v0c = v0c + w * (a * float(c0[kk]))
            v1r = v1r + w * (b * float(s1[kk]))
            v1c = v1c + w * (b * float(c1[kk]))
        er = v1r - v0r
        ec = v1c - v0c
        cross_p = er * (uc - v0c) - ec * (ur - v0r)
        cross_c = ec * v0r - er * v0c
        return cross_p * cross_c >= 0

    in_r = inside(dA_r, dB_r, 0)
    in_c = inside(dA_c, dB_c, 2)
    both = jnp.logical_and(in_r, in_c).astype(jnp.float32)
    fa = jnp.sum(jnp.where(isA, both, 0.0), axis=1, keepdims=True)
    fb = jnp.sum(jnp.where(isA, 0.0, both), axis=1, keepdims=True)
    out_ref[:, 0:1] = fa / float(NS)
    out_ref[:, 1:2] = fb / float(NS)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _pair_call(feat, R, S, TP, interpret, packed2):
    P = feat.shape[0]
    kern = functools.partial(_pair_kernel2 if packed2 else _pair_kernel,
                             R=R, S=S, TP=TP)
    n_out = 2 if packed2 else 1
    Fw = feat.shape[1]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((P, n_out), jnp.float32),
        grid=(P // TP,),
        in_specs=[pl.BlockSpec((TP, Fw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TP, n_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=P * n_out * 2 * S * S * (R * 8 + 30),
            bytes_accessed=P * (Fw * 4 + 4),
            transcendentals=0,
        ),
        # the streamed R-loop's (TP, NS) temporaries live on the Mosaic
        # stack; raise the default 16 MB scoped limit for headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(feat)


def _pack(parts, TP):
    feat = jnp.concatenate([p.astype(jnp.float32) for p in parts], axis=1)
    P, Fw = feat.shape
    pad_r = (-P) % TP
    pad_c = (-Fw) % 128
    if pad_r or pad_c:
        feat = jnp.pad(feat, ((0, pad_r), (0, pad_c)),
                       constant_values=1e-3)
    return feat, P


def pair_frac(d_r, p_r, d_c, p_c, plo, ext, S=16, TP=256, interpret=None):
    """S x S midpoint-grid overlap fraction for a flat pair list (P,).

    When S*S <= 64 two pairs share one 128-wide lane row (`_pair_kernel2`)
    — ~2x throughput at identical per-pair results."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = d_r.shape[-1]
    P_in = d_r.shape[0]
    if S * S <= 64 and P_in >= 2 and P_in % 2 == 0:
        half = P_in // 2
        # interleave-free split: pair 2k sits in row k as A, pair 2k+1 as B
        # (a plain reshape of each (P, F) part: rows (2k, 2k+1) -> row k)
        def two(x):
            x = x.astype(jnp.float32)
            return x.reshape(half, 2 * x.shape[1])

        d2_r = two(d_r)       # [dA_r | dB_r]
        d2_c = two(d_c)
        p2_r = two(p_r)       # [pA_r | pB_r]
        p2_c = two(p_c)
        box = jnp.concatenate([plo.astype(jnp.float32),
                               ext.astype(jnp.float32)], axis=1)  # (P, 4)
        box2 = box.reshape(half, 8)  # [ploA extA | ploB extB]
        # reorder into the kernel layout:
        # [dA_r dA_c dB_r dB_c | pA_r pA_c pB_r pB_c | ploA extA ploB extB]
        dA_r, dB_r = d2_r[:, :R], d2_r[:, R:]
        dA_c, dB_c = d2_c[:, :R], d2_c[:, R:]
        pA_r, pB_r = p2_r[:, :2], p2_r[:, 2:]
        pA_c, pB_c = p2_c[:, :2], p2_c[:, 2:]
        boxA, boxB = box2[:, :4], box2[:, 4:]
        feat, P = _pack([dA_r, dA_c, dB_r, dB_c, pA_r, pA_c, pB_r, pB_c,
                         boxA, boxB], TP)
        out = _pair_call(feat, R, S, TP, bool(interpret), True)
        return out[:half].reshape(2 * half)[:P_in]
    feat, P = _pack([d_r, d_c, p_r, p_c, plo, ext], TP)
    out = _pair_call(feat, R, S, TP, bool(interpret), False)
    return out[:P, 0]
