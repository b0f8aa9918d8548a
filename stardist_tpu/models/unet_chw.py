"""(H, C, W)-layout inference forward pass for the StarDist U-Net.

Functionally identical to ``StarDistNet.__call__`` (unet.py — itself matching
the reference topology, stardist/models/model2d.py:310-349), but every 3x3
convolution runs through the Pallas CHW kernel (ops/conv_pallas.py), which is
~10x faster than XLA's NHWC convolution for the C<=64 layers that dominate
this architecture on TPU. Consumes the SAME Flax parameter pytree — module
names are generated in call order, so this function mirrors the exact call
sequence of ``StarDistNet``/``UNetBackbone``.

Returns ``prob`` as (H', W') float32 and ``dist`` as (R, H', W') float32 —
the head is computed as ``dot_general(k.T, feat)`` contracting the channel
dim, so the output is born CHANNEL-MAJOR: each (H', W') ray plane is
contiguous in the default layout and XLA emits NO layout-conversion copies
(the previous (pixel, ray) head cost three full 553 MB relayout passes,
~5 ms at 4096^2 on v5e, converting to the jit output layout). The sparse
extraction path gathers candidate COLUMNS of the flat (R, H'*W') view; the
dense path pays one explicit transpose.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv_pallas import conv2d_hcw, conv3d_hcw

_KERNEL_ACTS = ("relu", "elu", "linear")


def supports_chw(net) -> bool:
    """True when `chw_forward` can replace `net.apply` for inference."""
    return (net.n_dim in (2, 3)
            and net.backbone == "unet"
            and tuple(net.unet_kernel_size) == (3,) * net.n_dim
            and not net.unet_batch_norm
            and str(net.unet_activation).lower() in _KERNEL_ACTS
            and str(net.unet_last_activation).lower() in _KERNEL_ACTS)


def _conv_block(x, p, act):
    """ConvBlock equivalent (conv + bias + activation).

    x: (H, C, W) with a (3, 3, C, Cout) kernel, or (D, H, C, W) with a
    (3, 3, 3, C, Cout) kernel — the channel axis is -2 in both layouts."""
    k = p["Conv_0"]["kernel"]
    b = p["Conv_0"]["bias"]
    conv = conv2d_hcw if k.ndim == 4 else conv3d_hcw
    act = str(act).lower()
    if act in _KERNEL_ACTS:
        return conv(x, k, b, act=act)
    y = conv(x, k, b, act="linear")
    import flax.linen as nn
    return {"tanh": jnp.tanh, "sigmoid": nn.sigmoid, "swish": nn.swish,
            "gelu": nn.gelu}[act](y)


def _max_pool(x, pool):
    """Max-pool per spatial dim on (..., C, W) via one reduce_window.

    pool: one factor per spatial dim — (py, px) for (H, C, W), (pz, py, px)
    for (D, H, C, W). One fused reduce_window beats the previous stride-2
    slice+max chain (the lane-dim strided slice lowers to layout-changing
    copies: 12.1 ms vs 5.4 ms for (4096, 32, 4096) bf16 on v5e; 2.1x at
    every level measured)."""
    window = tuple(pool[:-1]) + (1, pool[-1])
    if all(p == 1 for p in window):
        return x
    neg = jnp.asarray(-jnp.inf if x.dtype == jnp.float32 else -3e38, x.dtype)
    return jax.lax.reduce_window(x, neg, jax.lax.max, window, window, "VALID")


def _upsample(x, factors):
    axes = tuple(range(len(factors) - 1)) + (x.ndim - 1,)
    for f, ax in zip(factors, axes):
        if f > 1:
            x = jnp.repeat(x, f, axis=ax)
    return x


def _head_1x1(x, p):
    """1x1 conv head as a channel-contraction matmul; x: (..., C, W) bf16.

    Returns (Cout, ...spatial..., W) float32 — born CHANNEL-MAJOR, which is
    already the default layout of a (Cout, spatial) result: no layout
    conversion between the matmul and the jit output."""
    k = p["kernel"].reshape(p["kernel"].shape[-2:]).astype(x.dtype)  # (C, Cout)
    b = p["bias"].astype(jnp.float32)
    if jax.default_backend() != "tpu":
        # XLA:CPU's DotThunk lacks BF16 x BF16 = F32 for this contraction
        k, x = k.astype(jnp.float32), x.astype(jnp.float32)
    y = jax.lax.dot_general(k.T, x, (((1,), (x.ndim - 2,)), ((), ())),
                            preferred_element_type=jnp.float32)
    bshape = (-1,) + (1,) * (y.ndim - 1)
    return y + b.reshape(bshape)


def chw_forward(net, params, x):
    """Inference forward pass in CHW layout.

    net: a StarDistNet instance (provides the static topology).
    params: its Flax parameter pytree (params collection).
    x: (H, W, C_in) or (D, H, W, C_in) input (single image, no batch dim).

    Returns (prob, dist[, prob_class]): prob (H', W') / (D', H', W') f32,
    dist (R, spatial...) f32, prob_class (n_classes+1, spatial...) f32 —
    heads are CHANNEL-MAJOR (see module doc).
    """
    assert supports_chw(net)
    nd = net.n_dim
    # channels-last -> (..., C, W): move C in front of W
    h = jnp.swapaxes(x, nd - 1, nd).astype(jnp.bfloat16)

    top_i = 0

    def top_block(h, act):
        nonlocal top_i
        p = params[f"ConvBlock_{top_i}"]
        top_i += 1
        return _conv_block(h, p, act)

    # -- grid pre-pooling (mirrors unet.py StarDistNet.__call__) ------------
    grid = tuple(net.grid)
    pooled = np.ones(nd, int)
    while tuple(pooled) != grid:
        pool = 1 + (np.asarray(grid) > pooled)
        pooled *= pool
        for _ in range(net.unet_n_conv_per_depth):
            h = top_block(h, net.unet_activation)
        h = _max_pool(h, tuple(pool))

    # -- U-Net backbone (mirrors unet.py UNetBackbone.__call__) -------------
    bp = params["UNetBackbone_0"]
    bb_i = 0

    def bb_block(h, act):
        nonlocal bb_i
        p = bp[f"ConvBlock_{bb_i}"]
        bb_i += 1
        return _conv_block(h, p, act)

    n_depth = net.unet_n_depth
    n_conv = net.unet_n_conv_per_depth
    pool = tuple(net.unet_pool)
    skips = []
    for n in range(n_depth):
        for _ in range(n_conv):
            h = bb_block(h, net.unet_activation)
        skips.append(h)
        h = _max_pool(h, pool)
    for _ in range(n_conv - 1):
        h = bb_block(h, net.unet_activation)
    h = bb_block(h, net.unet_activation)
    for n in reversed(range(n_depth)):
        h = jnp.concatenate([_upsample(h, pool), skips[n]], axis=-2)
        for _ in range(n_conv - 1):
            h = bb_block(h, net.unet_activation)
        h = bb_block(h, net.unet_activation if n > 0 else net.unet_last_activation)
    base = h

    # -- feature conv + heads ----------------------------------------------
    if net.net_conv_after_unet > 0:
        feat = top_block(base, net.unet_activation)
    else:
        feat = base

    # prob + dist heads share `feat`: one fused contraction (C -> 1+R)
    # avoids a second relayout pass over the full-resolution feature map
    kp, kd = params["head_prob"], params["head_dist"]
    fused = {
        "kernel": jnp.concatenate(
            [kp["kernel"].reshape(kp["kernel"].shape[-2:]),
             kd["kernel"].reshape(kd["kernel"].shape[-2:])], axis=-1),
        "bias": jnp.concatenate([kp["bias"], kd["bias"]]),
    }
    fused["kernel"] = fused["kernel"][None, None]
    y = _head_1x1(feat, fused)                               # (1+R, sp...)
    prob = jax.nn.sigmoid(y[0])                              # (sp...)
    dist = y[1:]                                             # (R, sp...)

    if net.n_classes is not None:
        if net.net_conv_after_unet > 0:
            feat_c = top_block(base, net.unet_activation)
        else:
            feat_c = base
        pc = _head_1x1(feat_c, params["head_prob_class"])    # (ncls, sp...)
        prob_class = jax.nn.softmax(pc, axis=0)
        return prob, dist, prob_class
    return prob, dist
