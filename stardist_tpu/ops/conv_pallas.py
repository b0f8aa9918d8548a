"""3x3 convolution as a Pallas TPU kernel, (H, C, W) "HCW" layout.

Why this exists: XLA's NHWC convolution pads BOTH channel operands to the
128-lane MXU width, so the reference U-Net topology (stardist/models/
model2d.py:310-349; 32 filters at full resolution) runs at ~1/16 of MXU
peak (~5-6 TF/s measured on v5e for C=32). Reformulated as a matmul

    out[co, w] = sum_{dy,dx,ci} W[co, (dy,dx,ci)] * x[r+dy-1, ci, w+dx-1]

with weights as LHS (M = C_out: the M dimension is 8-granular, no 128
padding) and an im2col patch matrix (K = 9*C_in, N = W-tile) built in VMEM
as RHS, the MXU runs at 75-100% K/N efficiency — ~10x faster for the C<=64
layers that dominate the StarDist forward pass.

Layout: activations are (H, C, W). H is the memref's *untiled* major dim, so
the per-output-row loop indexes it dynamically for free; the (C, W) minor
dims are exactly the (sublane, lane) tile, so channel-block writes into the
patch matrix and dx-shifted lane slices are cheap static ops. The model
wrapper (models/unet_chw.py) keeps the whole backbone in this layout.

The input stays in HBM (`memory_space=ANY`); each grid step DMAs its
(S+2, C, WT+2) halo window into VMEM scratch — overlapping windows need no
host-side duplication.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_pad(n):
    return -(-n // 128) * 128


def _pick_tiles(C, Cout, H, W, vmem_budget=11 * 1024 * 1024):
    """Choose (S, WT) so the working set fits in VMEM.

    Working set: DOUBLE-buffered halo window 2 x (S+2, C, lane_pad(WT+2))
    bf16 (manual prefetch pipeline — the next grid step's DMA overlaps this
    step's compute), dx-shift ring (3, 3C, WT) bf16, out block
    (S, Cout, WT) bf16 (double-buffered by the pipeline). Prefer the
    WIDEST WT that fits: the per-row matmul has N = WT, and wide N
    amortizes MXU pipeline latency (measured on v5e, 32ch@4096^2:
    WT 512 -> 17.8 ms, WT 4096 -> 9.5 ms serial; the ring keeps WT = 4096
    feasible where a full (S+2, 3C, WT) shift buffer would not fit)."""
    # S + 2 must be a multiple of 3: the row loop runs in 3-row groups so
    # every ring index is a compile-time constant (see _conv_kernel)
    for WT in (4096, 2048, 1024, 512, 256, 128):
        if WT > _lane_pad(W):
            continue
        for S in (16, 10, 7):
            win = (S + 2) * C * (WT + 128) * 2
            ring = 3 * 3 * C * WT * 2
            out = S * Cout * WT * 2 * 2
            if win * 2 + ring + out <= vmem_budget:
                return S, WT
    return 7, 128


def _conv_kernel(x_hbm, w_ref, b_ref, o_ref, win2, ring, sem, *, C, Cout, S,
                 WT, act):
    """One grid step: out rows [i*S, i*S+S), cols [j*WT, j*WT+WT).

    x_hbm: (Hp+2, C, Wp+2) padded input in HBM.
    w_ref: (Cout, 9C) weight matrix, VMEM — K ordered (dy, dx, c).
    b_ref: (Cout, 1) bias, VMEM.
    o_ref: (S, Cout, WT) output block, VMEM.
    win2:  (2, S+2, C, WT+128) scratch — DOUBLE-buffered halo window: step
           t computes from slot t%2 while the DMA for step t+1 fills slot
           (t+1)%2, so the halo fetch rides under the compute instead of
           serializing with it. HBM DMA lane slices must be 128-aligned in
           offset and size, so the window is WT+128 wide (start j*WT is
           aligned; only cols [0, WT+2) are used).
    ring:  (3, 3C, WT) scratch — rolling dx-shift buffer: each input row's
           three dx-shifted lane views (sublane order (dx, c)) are
           materialized ONCE (3 lane-slice copies) into slot q%3 and
           consumed by the up-to-3 output rows that need them. vs an
           im2col patch build (9 copies per output row) the VPU shift work
           — which dominates the M=Cout<=128-limited matmul for this
           topology — drops 3x, at 3 rows of VMEM instead of S+2.

    Each output row is 3 accumulated (Cout, 3C) @ (3C, WT) matmuls whose
    RHS are the ring slots of its three input rows.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    gi = pl.num_programs(0)
    gj = pl.num_programs(1)
    t = i * gj + j
    slot = jax.lax.rem(t, 2)

    def dma(sl, ii, jj):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(ii * S, S + 2), :, pl.ds(jj * WT, WT + 128)],
            win2.at[sl],
            sem.at[sl],
        )

    @pl.when(t == 0)
    def _():
        dma(slot, i, j).start()

    # prefetch the next grid step's halo window into the other slot
    nj = j + 1
    ni = jnp.where(nj == gj, i + 1, i)
    njw = jnp.where(nj == gj, 0, nj)
    last = (i == gi - 1) & (j == gj - 1)

    @pl.when(~last)
    def _():
        dma(1 - slot, ni, njw).start()

    dma(slot, i, j).wait()

    # Row pipeline in 3-row groups: every ring index and weight K-slice is
    # a compile-time constant inside the group body (a fully dynamic
    # fori_loop spends more scalar-core cycles on ring index arithmetic
    # than the row's matmuls cost; full unrolling blows the Mosaic scoped
    # VMEM stack — all S accumulators live at once). The fori_loop keeps
    # at most one (Cout, WT) f32 accumulator live.
    #
    # Invariant: ring slot (q % 3) holds the dx-shifted views of input row
    # q. Output row r = q-2 becomes computable right after input row q is
    # shifted (its inputs are rows r+dy = q-2+dy, dy=0..2, in slots
    # (q+1+dy) % 3) — so ring slot d holds the dy = (d - q - 1) mod 3 tap,
    # all static given k = q % 3.

    def row(q, k):
        """Emit output row q-2; q traced, k = q % 3 static."""
        y = b_ref[:, :]                                  # (Cout, 1) f32
        for d in range(3):
            dy = (d - k - 1) % 3
            y = y + jax.lax.dot_general(
                w_ref[:, dy * 3 * C:(dy * 3 * C + 3 * C)],
                ring[d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (Cout, WT)
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "elu":
            y = jnp.where(y > 0, y, jnp.expm1(y))
        o_ref[q - 2] = y.astype(o_ref.dtype)

    def make_group(first):
        def group(g, _):
            base = 3 * g
            for k in range(3):
                q = base + k                             # q % 3 == k
                src = win2[slot, q]                      # (C, WL)
                for dx in range(3):
                    ring[k, dx * C:(dx + 1) * C, :] = src[:, dx:dx + WT]
                if not (first and k < 2):                # rows -2,-1 don't exist
                    row(q, k)
            return 0
        return group

    make_group(True)(0, 0)
    jax.lax.fori_loop(1, (S + 2) // 3, make_group(False), 0)


def _pick_tiles_v2(C, Cout, H, W, vmem_budget=11 * 1024 * 1024):
    """(S, WT) for the tap-stacked kernel: one (3C, WT) rhs buffer and a
    3-slot (Cout, WT) f32 accumulator ring instead of the 3-row shift ring."""
    for WT in (4096, 2048, 1024, 512, 256, 128):
        if WT > _lane_pad(W):
            continue
        for S in (16, 10, 7):
            win = (S + 2) * C * (WT + 128) * 2
            rhs = 3 * C * WT * 2
            acc = 3 * Cout * WT * 4
            out = S * Cout * WT * 2 * 2
            if win * 2 + rhs + acc + out <= vmem_budget:
                return S, WT
    return 7, 128


def _conv_kernel_v2(x_hbm, w_ref, b_ref, o_ref, win2, rhs, acc, sem, *, C,
                    Cout, S, WT, act):
    """Tap-stacked variant for 3*Cout <= 128: the three dy-tap weight blocks
    are stacked in the matmul's M dimension, so each INPUT row costs ONE
    (3*Cout, 3C) @ (3C, WT) matmul instead of three (Cout, 3C) matmuls —
    3x fewer M-passes through the 128-row MXU, raising the structural
    ceiling for the Cout<=42 layers that dominate the StarDist topology
    (e.g. Cout=32, C=32: M-util 96/128 vs 32/128).

    Contribution map: input row q's tap dy lands in output row q - dy.
    acc is a 3-slot (Cout, WT) f32 ring: out row r lives in slot r % 3,
    receives its dy=0 slice as an OVERWRITE at q = r (so slots never need
    zeroing), its dy=1,2 slices as adds at q = r+1, r+2, and finalizes
    (bias + activation + store) right after the dy=2 add.

    w_ref: (3*Cout, 3C) — dy-major stack of (Cout, (dx, c)) blocks.
    rhs:   (3C, WT) scratch — row q's three dx-shifted lane views.
    acc:   (3, Cout, WT) f32 scratch ring.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    gi = pl.num_programs(0)
    gj = pl.num_programs(1)
    t = i * gj + j
    slot = jax.lax.rem(t, 2)

    def dma(sl, ii, jj):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(ii * S, S + 2), :, pl.ds(jj * WT, WT + 128)],
            win2.at[sl],
            sem.at[sl],
        )

    @pl.when(t == 0)
    def _():
        dma(slot, i, j).start()

    nj = j + 1
    ni = jnp.where(nj == gj, i + 1, i)
    njw = jnp.where(nj == gj, 0, nj)
    last = (i == gi - 1) & (j == gj - 1)

    @pl.when(~last)
    def _():
        dma(1 - slot, ni, njw).start()

    dma(slot, i, j).wait()

    def row(q, k, first):
        """Process input row q (k = q % 3 static); emit out row q-2."""
        src = win2[slot, q]                              # (C, WL)
        for dx in range(3):
            rhs[dx * C:(dx + 1) * C, :] = src[:, dx:dx + WT]
        Y = jax.lax.dot_general(
            w_ref[:, :], rhs[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (3Cout, WT)
        for dy in range(3):
            if first and k < dy:                         # out row q-dy < 0
                continue
            s = (k - dy) % 3                             # out row (q-dy) % 3
            piece = Y[dy * Cout:(dy + 1) * Cout]
            if dy == 0:
                acc[s] = piece                           # overwrite: no zeroing
            else:
                acc[s] = acc[s] + piece
            if dy == 2:
                y = acc[s] + b_ref[:, :]
                if act == "relu":
                    y = jnp.maximum(y, 0.0)
                elif act == "elu":
                    y = jnp.where(y > 0, y, jnp.expm1(y))
                o_ref[q - 2] = y.astype(o_ref.dtype)

    def make_group(first):
        def group(g, _):
            for k in range(3):
                row(3 * g + k, k, first)
            return 0
        return group

    make_group(True)(0, 0)
    jax.lax.fori_loop(1, (S + 2) // 3, make_group(False), 0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _conv2d_hcw_call_v2(xp, wmat3, bias, act, S, WT, out_shape,
                        interpret=False):
    Hp2, C, Wpad = xp.shape
    Hp, Wp = Hp2 - 2, Wpad - 128
    Cout = wmat3.shape[0] // 3
    grid = (Hp // S, Wp // WT)
    kern = functools.partial(_conv_kernel_v2, C=C, Cout=Cout, S=S, WT=WT,
                             act=act)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Hp, Cout, Wp), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3 * Cout, 3 * C), lambda i, j: (0, 0)),
            pl.BlockSpec((Cout, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((S, Cout, WT), lambda i, j: (i, 0, j)),
        scratch_shapes=[
            pltpu.VMEM((2, S + 2, C, WT + 128), jnp.bfloat16),
            pltpu.VMEM((3 * C, WT), jnp.bfloat16),
            pltpu.VMEM((3, Cout, WT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Hp * Wp * Cout * 9 * C,
            bytes_accessed=Hp2 * C * Wpad * 2 + Hp * Cout * Wp * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wmat3, bias)
    return out[: out_shape[0], :, : out_shape[1]]


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _conv2d_hcw_call(xp, wmat, bias, act, S, WT, out_shape, interpret=False):
    Hp2, C, Wpad = xp.shape
    Hp, Wp = Hp2 - 2, Wpad - 128
    Cout = wmat.shape[0]
    grid = (Hp // S, Wp // WT)
    kern = functools.partial(_conv_kernel, C=C, Cout=Cout, S=S, WT=WT, act=act)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Hp, Cout, Wp), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Cout, 9 * C), lambda i, j: (0, 0)),
            pl.BlockSpec((Cout, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((S, Cout, WT), lambda i, j: (i, 0, j)),
        scratch_shapes=[
            pltpu.VMEM((2, S + 2, C, WT + 128), jnp.bfloat16),
            pltpu.VMEM((3, 3 * C, WT), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Hp * Wp * Cout * 9 * C,
            bytes_accessed=Hp2 * C * Wpad * 2 + Hp * Cout * Wp * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wmat, bias)
    return out[: out_shape[0], :, : out_shape[1]]


def _pick_tiles_3d(C, Cout, H, W, vmem_budget=11 * 1024 * 1024):
    """(S, WT) for the 3D kernel: the double-buffered halo window triples
    (3 z-planes) and the shift ring holds 9 (dz, dx) shifted views per
    slot."""
    # S + 2 must be a multiple of 3 (3-row-group pipeline, as in 2D)
    for WT in (2048, 1024, 512, 256, 128):
        if WT > _lane_pad(W):
            continue
        for S in (16, 10, 7):
            win = 3 * (S + 2) * C * (WT + 128) * 2
            ring = 3 * 9 * C * WT * 2
            out = S * Cout * WT * 2 * 2
            if win * 2 + ring + out <= vmem_budget:
                return S, WT
    return 7, 128


def _conv3d_kernel(x_hbm, w_ref, b_ref, o_ref, win2, ring, sem, *, C, Cout,
                   S, WT, act):
    """One grid step: out plane z, rows [i*S, i*S+S), cols [j*WT, j*WT+WT).

    x_hbm: (D+2, Hp+2, C, Wp+128) padded volume in HBM.
    w_ref: (Cout, 27C) weight matrix, VMEM — K ordered (dy, dz, dx, c).
    o_ref: (1, S, Cout, WT) output block, VMEM.
    win2:  (2, 3, S+2, C, WT+128) scratch — double-buffered z-triple halo
           window (next grid step's DMA overlaps this step's compute, as in
           the 2D kernel).
    ring:  (3, 9C, WT) scratch — rolling shift buffer: each input row's
           nine (dz, dx)-shifted lane views (sublane order (dz, dx, c))
           are materialized once into slot q%3.

    Each output row is 3 accumulated (Cout, 9C) @ (9C, WT) matmuls — the z
    taps ride the K dim, so the 3D topology gets 3x the MXU work per
    shifted byte compared to running 2D convs plane-by-plane.
    """
    z = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    gi = pl.num_programs(1)
    gj = pl.num_programs(2)
    gz = pl.num_programs(0)
    t = (z * gi + i) * gj + j
    slot = jax.lax.rem(t, 2)

    def dma(sl, zz, ii, jj):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(zz, 3), pl.ds(ii * S, S + 2), :,
                     pl.ds(jj * WT, WT + 128)],
            win2.at[sl],
            sem.at[sl],
        )

    @pl.when(t == 0)
    def _():
        dma(slot, z, i, j).start()

    nj = j + 1
    ni = jnp.where(nj == gj, i + 1, i)
    njw = jnp.where(nj == gj, 0, nj)
    nz = jnp.where(ni == gi, z + 1, z)
    niw = jnp.where(ni == gi, 0, ni)
    last = (z == gz - 1) & (i == gi - 1) & (j == gj - 1)

    @pl.when(~last)
    def _():
        dma(1 - slot, nz, niw, njw).start()

    dma(slot, z, i, j).wait()

    # row pipeline in 3-row groups with a rolling ring — same structure and
    # slot/dy mapping as the 2D kernel (see its comment)

    def row(q, k):
        """Emit output row q-2; q traced, k = q % 3 static."""
        y = b_ref[:, :]                                  # (Cout, 1) f32
        for d in range(3):
            dy = (d - k - 1) % 3
            y = y + jax.lax.dot_general(
                w_ref[:, dy * 9 * C:(dy * 9 * C + 9 * C)],
                ring[d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (Cout, WT)
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "elu":
            y = jnp.where(y > 0, y, jnp.expm1(y))
        o_ref[0, q - 2] = y.astype(o_ref.dtype)

    def make_group(first):
        def group(g, _):
            base = 3 * g
            for k in range(3):
                q = base + k                             # q % 3 == k
                for dz in range(3):
                    src = win2[slot, dz, q]              # (C, WL)
                    for dx in range(3):
                        kk = (dz * 3 + dx) * C
                        ring[k, kk:kk + C, :] = src[:, dx:dx + WT]
                if not (first and k < 2):
                    row(q, k)
            return 0
        return group

    make_group(True)(0, 0)
    jax.lax.fori_loop(1, (S + 2) // 3, make_group(False), 0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _conv3d_hcw_call(xp, wmat, bias, act, S, WT, out_shape, interpret=False):
    D2, Hp2, C, Wpad = xp.shape
    D, Hp, Wp = D2 - 2, Hp2 - 2, Wpad - 128
    Cout = wmat.shape[0]
    grid = (D, Hp // S, Wp // WT)
    kern = functools.partial(_conv3d_kernel, C=C, Cout=Cout, S=S, WT=WT,
                             act=act)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((D, Hp, Cout, Wp), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Cout, 27 * C), lambda z, i, j: (0, 0)),
            pl.BlockSpec((Cout, 1), lambda z, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, Cout, WT), lambda z, i, j: (z, i, 0, j)),
        scratch_shapes=[
            pltpu.VMEM((2, 3, S + 2, C, WT + 128), jnp.bfloat16),
            pltpu.VMEM((3, 9 * C, WT), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * D * Hp * Wp * Cout * 27 * C,
            bytes_accessed=3 * D2 * Hp2 * C * Wpad * 2 + D * Hp * Cout * Wp * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wmat, bias)
    return out[:, : out_shape[1], :, : out_shape[2]]


def conv3d_hcw(x, w, b=None, act="relu", interpret=None):
    """3x3x3 SAME convolution in (D, H, C, W) layout via the Pallas kernel.

    x: (D, H, C, W) array (any float dtype; computed in bfloat16).
    w: (3, 3, 3, C, Cout) DHWIO weights (the Flax param layout).
    b: (Cout,) bias or None.
    act: "relu" | "elu" | "linear".
    Returns (D, H, Cout, W) bfloat16.

    Replaces XLA's NDHWC convolution for the StarDist 3D U-Net
    (reference topology: stardist/models/model3d.py:337-379), which pads
    both channel operands to the 128-lane MXU width.
    """
    D, H, C, W = x.shape
    kd, kh, kw, wc, Cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3) and wc == C, (w.shape, x.shape)
    Cp = -(-C // 8) * 8
    if Cp != C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, Cp - C), (0, 0)))
        C = Cp
    S, WT = _pick_tiles_3d(C, Cout, H, W)
    Hp = -(-H // S) * S
    Wp = -(-W // WT) * WT
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((1, 1), (1, 1 + Hp - H), (0, 0), (1, 127 + Wp - W)))
    # (3,3,3,C,Cout) -> (Cout, 27C) with K ordered (dy, dz, dx, c) to match
    # the shift-buffer layout (dz, dx, c) within each dy slice
    wmat = jnp.transpose(w.astype(jnp.bfloat16),
                         (4, 1, 0, 2, 3)).reshape(Cout, 27 * C)
    bias = (jnp.zeros((Cout, 1), jnp.float32) if b is None
            else b.astype(jnp.float32).reshape(Cout, 1))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _conv3d_hcw_call(xp, wmat, bias, act, S, WT, (D, H, W),
                            bool(interpret))


def conv2d_hcw(x, w, b=None, act="relu", interpret=None):
    """3x3 SAME convolution in (H, C, W) layout via the Pallas kernel.

    x: (H, C, W) array (any float dtype; computed in bfloat16).
    w: (3, 3, C, Cout) HWIO weights (the Flax param layout).
    b: (Cout,) bias or None.
    act: "relu" | "elu" | "linear".
    Returns (H, Cout, W) bfloat16.
    """
    H, C, W = x.shape
    kh, kw, wc, Cout = w.shape
    assert (kh, kw) == (3, 3) and wc == C, (w.shape, x.shape)
    # Mosaic requires (sublane) slices aligned to the bf16 packing tiling;
    # pad the channel dim to a multiple of 8 (zero channels x zero weight
    # rows contribute nothing). Only the C_in=1 first layer hits this.
    Cp = -(-C // 8) * 8
    if Cp != C:
        x = jnp.pad(x, ((0, 0), (0, Cp - C), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
        C = Cp
    import os
    # tap-stacked variant: same speed as v1 on v5e (the kernel is not
    # MXU-pass-bound at these shapes — measured 3.8 ms for 32ch@4096^2
    # either way, ~41% MFU); kept opt-in as a tuning basis
    use_v2 = (3 * Cout <= 128 and Cout % 8 == 0
              and os.environ.get("STARDIST_TPU_CONV_V2", "0") == "1")
    S, WT = (_pick_tiles_v2 if use_v2 else _pick_tiles)(C, Cout, H, W)
    Hp = -(-H // S) * S
    Wp = -(-W // WT) * WT
    # zero padding serves the SAME-conv halo, the tile round-up, and the
    # 128-aligned DMA window width (last block reads cols up to Wp+128)
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((1, 1 + Hp - H), (0, 0), (1, 127 + Wp - W)))
    # (3,3,C,Cout) -> (Cout, 9C) with K ordered (dy, dx, c) to match the
    # patch assembly order in the kernel
    wmat = jnp.transpose(w.astype(jnp.bfloat16), (3, 0, 1, 2)).reshape(Cout, 9 * C)
    bias = (jnp.zeros((Cout, 1), jnp.float32) if b is None
            else b.astype(jnp.float32).reshape(Cout, 1))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if use_v2:
        # dy-major tap stack (3*Cout, 3C) for the tap-stacked kernel
        wmat3 = wmat.reshape(Cout, 3, 3 * C).transpose(1, 0, 2).reshape(
            3 * Cout, 3 * C)
        return _conv2d_hcw_call_v2(xp, wmat3, bias, act, S, WT, (H, W),
                                   bool(interpret))
    return _conv2d_hcw_call(xp, wmat, bias, act, S, WT, (H, W), bool(interpret))
