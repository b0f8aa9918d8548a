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
    # every ring index is a compile-time constant (see _conv_kernel).
    # WT floor is 256: Mosaic miscompiles the width-128 lane reads at the
    # kernels' unaligned dx offsets (verified on v5e — wrong values for
    # every W=128 config, correct for every W>=256), so 128-wide images
    # run on a half-padded 256 tile instead.
    for WT in (4096, 2048, 1024, 512, 256):
        if WT > max(_lane_pad(W), 256):
            continue
        for S in (16, 10, 7):
            win = (S + 2) * C * (WT + 128) * 2
            ring = 3 * 3 * C * WT * 2
            out = S * Cout * WT * 2 * 2
            if win * 2 + ring + out <= vmem_budget:
                return S, WT
    return 7, 256


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
    3-slot (Cout, WT) f32 accumulator ring instead of the 3-row shift ring.
    WT floor 256 — see _pick_tiles (width-128 unaligned-read miscompile)."""
    for WT in (4096, 2048, 1024, 512, 256):
        if WT > max(_lane_pad(W), 256):
            continue
        for S in (16, 10, 7):
            win = (S + 2) * C * (WT + 128) * 2
            rhs = 3 * C * WT * 2
            acc = 3 * Cout * WT * 4
            out = S * Cout * WT * 2 * 2
            if win * 2 + rhs + acc + out <= vmem_budget:
                return S, WT
    return 7, 256


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


def _pick_s_v3(C, Cout, H, W, stacked, vmem_budget=64 * 1024 * 1024):
    """Row-block size S for the halo-in-kernel v3 kernel (whole-width tiles,
    WT = W). S must divide H (no output slice) with S + 2 divisible by 3
    (3-row-group pipeline). Returns None when no candidate fits — caller
    falls back to the padded-input kernels."""
    if W % 128 or W < 256:
        # whole-row DMA wants a lane-aligned width; W == 128 is excluded
        # because Mosaic miscompiles the width-128 lane reads at the
        # unaligned (127/129) shift offsets this kernel uses (verified on
        # v5e: every W=128 config wrong, every W>=256 config correct) —
        # those shapes take the padded-input kernels instead
        return None
    for S in (16, 64, 4):
        if H % S or H < 2 * S or (S + 2) % 3:
            continue
        win = 2 * (S + 2) * C * (W + 256) * 2
        if stacked:
            work = 3 * C * W * 2 + 3 * Cout * W * 4
        else:
            work = 3 * 3 * C * W * 2
        out = 2 * S * Cout * W * 2
        if win + work + out <= vmem_budget:
            return S
    return None


def _dma_v3(x_hbm, win2, sem, sl, ii, gi, S, W):
    """Start/wait descriptors for the halo window of row block ``ii`` from
    an UNPADDED (H, C, W) input: rows [ii*S - 1, ii*S + S + 1) clamped to
    the array; the missing first/last halo row is zeroed by the caller.
    The destination lane range is [128, 128 + W) of the (.., C, W + 256)
    window — a 128-aligned DMA offset, leaving zeroed flank columns that
    serve as the W-dim halo (so every VMEM store in the kernel stays full
    width and lane-aligned; Mosaic miscompiles were observed with per-row
    sub-lane-offset partial stores). Returns a list of (cond, copy) pairs —
    the caller wraps each in ``pl.when`` for both .start() and .wait() so
    they pair exactly."""
    first = ii == 0
    lastb = ii == gi - 1
    interior = ~first & ~lastb
    lanes = pl.ds(128, W)
    return [
        (interior, pltpu.make_async_copy(
            x_hbm.at[pl.ds(ii * S - 1, S + 2)],
            win2.at[sl, slice(None), slice(None), lanes], sem.at[sl])),
        (first, pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, S + 1)],
            win2.at[sl, pl.ds(1, S + 1), slice(None), lanes], sem.at[sl])),
        (lastb, pltpu.make_async_copy(
            x_hbm.at[pl.ds(ii * S - 1, S + 1)],
            win2.at[sl, pl.ds(0, S + 1), slice(None), lanes], sem.at[sl])),
    ]


def _conv_kernel_v3(x_hbm, w_ref, b_ref, o_ref, win2, rhs, acc, sem, *, C,
                    Cout, S, W, act, stacked):
    """Halo-in-kernel variant: the input arrives UNPADDED (H, C, W) in HBM
    and whole rows are processed at once (WT = W, single-column grid), so
    the wrapper performs NO pad and NO output slice — each of those is a
    full HBM round trip (~3.3 ms each for a 1 GB activation on v5e) that
    the padded-input kernels pay per layer.

    Halo: the row window [i*S-1, i*S+S+1) is DMA'd with three statically
    shaped variants (interior / first / last block) and the missing border
    row is zeroed in VMEM. The W-dim halo comes from the window's zeroed
    flank columns (DMA lands at lane offset 128 of a W+256-wide window;
    the flanks are zeroed ONCE at the first grid step and never written
    again), so the per-row dx-shift copies are full-width stores from
    shifted window reads — the exact access pattern of the padded-input
    kernels, which Mosaic compiles correctly (sub-lane-offset partial
    STORES, the previous design, miscompiled).

    stacked=True: tap-stacked matmul per INPUT row ((3Cout, 3C) @ (3C, W))
    with a 3-slot f32 accumulator ring (see _conv_kernel_v2). Requires
    3*Cout <= 128. stacked=False: 3-slot rhs ring + 3 matmuls per OUTPUT
    row (see _conv_kernel), for Cout > 42.
    """
    i = pl.program_id(0)
    gi = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        # zero the flank lane ranges of BOTH window slots once; DMAs only
        # ever write lanes [128, 128+W), so the flanks stay zero for the
        # whole grid — they provide x[:, -1] == x[:, W] == 0
        win2[0, :, :, 0:128] = jnp.zeros((S + 2, C, 128), win2.dtype)
        win2[0, :, :, 128 + W:] = jnp.zeros((S + 2, C, 128), win2.dtype)
        win2[1, :, :, 0:128] = jnp.zeros((S + 2, C, 128), win2.dtype)
        win2[1, :, :, 128 + W:] = jnp.zeros((S + 2, C, 128), win2.dtype)
        for cond, cp in _dma_v3(x_hbm, win2, sem, slot, i, gi, S, W):
            @pl.when(cond)
            def _():
                cp.start()

    @pl.when(i < gi - 1)
    def _():
        for cond, cp in _dma_v3(x_hbm, win2, sem, 1 - slot, i + 1, gi, S, W):
            @pl.when(cond)
            def _():
                cp.start()

    for cond, cp in _dma_v3(x_hbm, win2, sem, slot, i, gi, S, W):
        @pl.when(cond)
        def _():
            cp.wait()

    @pl.when(i == 0)
    def _():
        win2[slot, 0, :, 128:128 + W] = jnp.zeros((C, W), win2.dtype)

    @pl.when(i == gi - 1)
    def _():
        win2[slot, S + 1, :, 128:128 + W] = jnp.zeros((C, W), win2.dtype)

    def shift_into(buf, src):
        """dx-shifted copies into buf (3C, W) from the W+256-wide window
        row src: out col w reads input col w + dx - 1, i.e. window lane
        127 + dx + w (borders ride the zeroed flanks)."""
        for dx in range(3):
            buf[dx * C:(dx + 1) * C, :] = src[:, 127 + dx:127 + dx + W]

    if stacked:
        def row(q, k, first):
            shift_into(rhs, win2[slot, q])
            Y = jax.lax.dot_general(
                w_ref[:, :], rhs[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (3Cout, W)
            for dy in range(3):
                if first and k < dy:
                    continue
                s = (k - dy) % 3
                piece = Y[dy * Cout:(dy + 1) * Cout]
                if dy == 0:
                    acc[s] = piece
                else:
                    acc[s] = acc[s] + piece
                if dy == 2:
                    y = acc[s] + b_ref[:, :]
                    if act == "relu":
                        y = jnp.maximum(y, 0.0)
                    elif act == "elu":
                        y = jnp.where(y > 0, y, jnp.expm1(y))
                    o_ref[q - 2] = y.astype(o_ref.dtype)
    else:
        def row(q, k, first):
            shift_into(rhs.at[k], win2[slot, q])
            if first and k < 2:
                return
            y = b_ref[:, :]
            for d in range(3):
                dy = (d - k - 1) % 3
                y = y + jax.lax.dot_general(
                    w_ref[:, dy * 3 * C:(dy * 3 * C + 3 * C)], rhs[d],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (Cout, W)
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


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _conv2d_hcw_call_v3(x, wmat, bias, act, S, stacked, interpret=False):
    H, C, W = x.shape
    Cout = wmat.shape[0] // 3 if stacked else wmat.shape[0]
    kern = functools.partial(_conv_kernel_v3, C=C, Cout=Cout, S=S, W=W,
                             act=act, stacked=stacked)
    if stacked:
        work = [pltpu.VMEM((3 * C, W), jnp.bfloat16),
                pltpu.VMEM((3, Cout, W), jnp.float32)]
    else:
        # the acc slot is unused in ring mode; Mosaic wants a real ref
        work = [pltpu.VMEM((3, 3 * C, W), jnp.bfloat16),
                pltpu.VMEM((8, 128), jnp.float32)]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((H, Cout, W), jnp.bfloat16),
        grid=(H // S,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(tuple(wmat.shape), lambda i: (0, 0)),
            pl.BlockSpec((Cout, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((S, Cout, W), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, S + 2, C, W + 256), jnp.bfloat16),
            work[0],
            work[1],
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * H * W * Cout * 9 * C,
            bytes_accessed=H * C * W * 2 + H * Cout * W * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # the default scoped-vmem limit is 16 MiB; the whole-row window
            # + double-buffered output block at S=16 exceed it at 4096-wide
            # layers (v5e has 128 MiB of VMEM — 64 MiB leaves the compiler
            # plenty for its own temporaries)
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, wmat, bias)


def _pick_tiles_3d(C, Cout, H, W, vmem_budget=11 * 1024 * 1024):
    """(S, WT) for the 3D kernel: the double-buffered halo window triples
    (3 z-planes) and the shift ring holds 9 (dz, dx) shifted views per
    slot."""
    # S + 2 must be a multiple of 3 (3-row-group pipeline, as in 2D).
    # WT floor 256 — see _pick_tiles (width-128 unaligned-read miscompile).
    for WT in (2048, 1024, 512, 256):
        if WT > max(_lane_pad(W), 256):
            continue
        for S in (16, 10, 7):
            win = 3 * (S + 2) * C * (WT + 128) * 2
            ring = 3 * 9 * C * WT * 2
            out = S * Cout * WT * 2 * 2
            if win * 2 + ring + out <= vmem_budget:
                return S, WT
    return 7, 256


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
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # v3 halo-in-kernel fast path (round 5): unpadded input, whole-row
    # tiles, no output slice — the padded-path wrapper's pad and slice are
    # each a full HBM round trip (~3.3 ms per 1 GB activation on v5e) that
    # v3 skips entirely. Measured (4096^2, 32->32): 16.2 ms padded v1 ->
    # ~3 ms v3. Opt-out: STARDIST_TPU_CONV_V3=0.
    stacked = 3 * Cout <= 128 and Cout % 8 == 0
    if os.environ.get("STARDIST_TPU_CONV_V3", "1") == "1":
        S3 = _pick_s_v3(C, Cout, H, W, stacked)
        if S3 is not None:
            x3 = x.astype(jnp.bfloat16)
            wmat = jnp.transpose(w.astype(jnp.bfloat16),
                                 (3, 0, 1, 2)).reshape(Cout, 9 * C)
            if stacked:
                wmat = wmat.reshape(Cout, 3, 3 * C).transpose(1, 0, 2)\
                    .reshape(3 * Cout, 3 * C)
            bias3 = (jnp.zeros((Cout, 1), jnp.float32) if b is None
                     else b.astype(jnp.float32).reshape(Cout, 1))
            return _conv2d_hcw_call_v3(x3, wmat, bias3, act, S3, stacked,
                                       bool(interpret))
    # tap-stacked padded variant: same speed as v1 on v5e (the padded-path
    # kernels are memory-bound, not MXU-pass-bound); kept as a tuning basis
    use_v2 = (stacked
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
