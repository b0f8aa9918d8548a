"""Flax network definitions: U-Net / ResNet backbones + StarDist heads.

TPU-native re-implementation of the reference network topology
(stardist/models/model2d.py:310-349, model3d.py:360-447, plus the csbdeep
``unet_block``/``resnet_block`` builders it delegates to). Works for 2D and
3D via tuple-valued kernel/pool sizes; channels-last (NHWC / NDHWC), which is
XLA's native convolution layout on TPU.

Design notes (TPU): convolutions run in bfloat16 on the MXU with float32
accumulation/params (configurable via ``compute_dtype``); upsampling is
nearest-neighbor ``jnp.repeat`` (fuses into the following conv).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_ACTIVATIONS = {
    "relu": nn.relu,
    "elu": nn.elu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "linear": lambda x: x,
    "swish": nn.swish,
    "gelu": nn.gelu,
}


def _act(name):
    if callable(name):
        return name
    return _ACTIVATIONS[str(name).lower()]


def _kernel_init(name):
    name = str(name).lower()
    if name in ("glorot_uniform", "xavier_uniform"):
        return nn.initializers.glorot_uniform()
    if name == "he_normal":
        return nn.initializers.he_normal()
    if name == "he_uniform":
        return nn.initializers.he_uniform()
    return nn.initializers.glorot_uniform()


def max_pool(x, pool: Sequence[int]):
    nd = len(pool)
    window = (1,) + tuple(pool) + (1,)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window, window, "VALID"
    )


def upsample_nearest(x, factors: Sequence[int]):
    for axis, f in enumerate(factors, start=1):
        if f > 1:
            x = jnp.repeat(x, f, axis=axis)
    return x


class ConvBlock(nn.Module):
    filters: int
    kernel_size: Tuple[int, ...]
    activation: Any = "relu"
    batch_norm: bool = False
    dropout: float = 0.0
    kernel_init: Any = "glorot_uniform"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, self.kernel_size, padding="SAME",
                    kernel_init=_kernel_init(self.kernel_init), dtype=self.dtype)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = _act(self.activation)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class UNetBackbone(nn.Module):
    """U-Net feature extractor with csbdeep ``unet_block`` topology:
    per depth: n_conv convs -> skip -> pool; middle: (n_conv-1) convs at
    base*2^depth then one at base*2^(depth-1); per up level: upsample +
    concat skip, (n_conv-1) convs, last conv reduces filters (the very last
    conv uses ``last_activation``)."""
    n_depth: int = 3
    n_filter_base: int = 32
    kernel_size: Tuple[int, ...] = (3, 3)
    n_conv_per_depth: int = 2
    activation: Any = "relu"
    last_activation: Any = "relu"
    batch_norm: bool = False
    dropout: float = 0.0
    pool: Tuple[int, ...] = (2, 2)
    prefix: str = ""
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(kernel_size=tuple(self.kernel_size), batch_norm=self.batch_norm,
                  dropout=self.dropout, dtype=self.dtype)
        skips = []
        for n in range(self.n_depth):
            for _ in range(self.n_conv_per_depth):
                x = ConvBlock(self.n_filter_base * 2 ** n, activation=self.activation, **kw)(x, train)
            skips.append(x)
            x = max_pool(x, self.pool)

        for _ in range(self.n_conv_per_depth - 1):
            x = ConvBlock(self.n_filter_base * 2 ** self.n_depth, activation=self.activation, **kw)(x, train)
        x = ConvBlock(self.n_filter_base * 2 ** max(0, self.n_depth - 1),
                      activation=self.activation, **kw)(x, train)

        for n in reversed(range(self.n_depth)):
            x = jnp.concatenate([upsample_nearest(x, self.pool), skips[n]], axis=-1)
            for _ in range(self.n_conv_per_depth - 1):
                x = ConvBlock(self.n_filter_base * 2 ** n, activation=self.activation, **kw)(x, train)
            x = ConvBlock(self.n_filter_base * 2 ** max(0, n - 1),
                          activation=self.activation if n > 0 else self.last_activation,
                          **kw)(x, train)
        return x


class ResNetBlock(nn.Module):
    """csbdeep ``resnet_block``: n_conv convs (first may be strided for
    pooling), identity/projection shortcut, post-add activation."""
    filters: int
    kernel_size: Tuple[int, ...] = (3, 3, 3)
    pool: Tuple[int, ...] = (1, 1, 1)
    n_conv_per_block: int = 3
    activation: Any = "relu"
    batch_norm: bool = False
    kernel_init: Any = "he_normal"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _act(self.activation)
        init = _kernel_init(self.kernel_init)
        strides = tuple(self.pool)
        y = nn.Conv(self.filters, self.kernel_size, strides=strides, padding="SAME",
                    kernel_init=init, dtype=self.dtype)(x)
        if self.batch_norm:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = act(y)
        for i in range(self.n_conv_per_block - 1):
            y = nn.Conv(self.filters, self.kernel_size, padding="SAME",
                        kernel_init=init, dtype=self.dtype)(y)
            if self.batch_norm:
                y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
            if i < self.n_conv_per_block - 2:
                y = act(y)
        if any(p > 1 for p in strides) or x.shape[-1] != self.filters:
            x = nn.Conv(self.filters, tuple(1 for _ in self.kernel_size), strides=strides,
                        padding="SAME", kernel_init=init, dtype=self.dtype)(x)
        return act(x + y)


class StarDistNet(nn.Module):
    """Full StarDist network: grid pre-pooling -> backbone -> feature conv ->
    heads (prob sigmoid / dist linear / optional prob_class softmax).

    Matches StarDist2D._build (model2d.py:310-349) and
    StarDist3D._build_unet/_build_resnet (model3d.py:360-447).
    """
    n_dim: int = 2
    n_rays: int = 32
    grid: Tuple[int, ...] = (1, 1)
    n_classes: Optional[int] = None
    backbone: str = "unet"
    # unet params
    unet_n_depth: int = 3
    unet_kernel_size: Tuple[int, ...] = (3, 3)
    unet_n_filter_base: int = 32
    unet_n_conv_per_depth: int = 2
    unet_pool: Tuple[int, ...] = (2, 2)
    unet_activation: Any = "relu"
    unet_last_activation: Any = "relu"
    unet_batch_norm: bool = False
    unet_dropout: float = 0.0
    unet_prefix: str = ""
    net_conv_after_unet: int = 128
    # resnet params (3D)
    resnet_n_blocks: int = 4
    resnet_kernel_size: Tuple[int, ...] = (3, 3, 3)
    resnet_kernel_init: Any = "he_normal"
    resnet_n_filter_base: int = 32
    resnet_n_conv_per_block: int = 3
    resnet_activation: Any = "relu"
    resnet_batch_norm: bool = False
    net_conv_after_resnet: int = 128
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16 on TPU)

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = self.n_dim
        grid = tuple(self.grid)
        if self.backbone == "unet":
            # pre-pool the input down to the grid resolution
            pooled = np.ones(nd, int)
            while tuple(pooled) != grid:
                pool = 1 + (np.asarray(grid) > pooled)
                pooled *= pool
                for _ in range(self.unet_n_conv_per_depth):
                    x = ConvBlock(self.unet_n_filter_base, tuple(self.unet_kernel_size),
                                  activation=self.unet_activation, dtype=self.dtype)(x, train)
                x = max_pool(x, tuple(pool))

            base = UNetBackbone(
                n_depth=self.unet_n_depth,
                n_filter_base=self.unet_n_filter_base,
                kernel_size=tuple(self.unet_kernel_size),
                n_conv_per_depth=self.unet_n_conv_per_depth,
                activation=self.unet_activation,
                last_activation=self.unet_last_activation,
                batch_norm=self.unet_batch_norm,
                dropout=self.unet_dropout,
                pool=tuple(self.unet_pool),
                dtype=self.dtype,
            )(x, train)
            n_feat = self.net_conv_after_unet
            feat_kernel = tuple(self.unet_kernel_size)
            feat_act = self.unet_activation
        elif self.backbone == "resnet":
            init = _kernel_init(self.resnet_kernel_init)
            x = nn.Conv(self.resnet_n_filter_base, tuple(7 for _ in range(nd)),
                        padding="SAME", kernel_init=init, dtype=self.dtype)(x)
            x = nn.Conv(self.resnet_n_filter_base, tuple(3 for _ in range(nd)),
                        padding="SAME", kernel_init=init, dtype=self.dtype)(x)
            n_filter = self.resnet_n_filter_base
            pooled = np.ones(nd, int)
            for _ in range(self.resnet_n_blocks):
                pool = 1 + (np.asarray(grid) > pooled)
                pooled *= pool
                if any(p > 1 for p in pool):
                    n_filter *= 2
                x = ResNetBlock(
                    n_filter, kernel_size=tuple(self.resnet_kernel_size),
                    pool=tuple(int(p) for p in pool),
                    n_conv_per_block=self.resnet_n_conv_per_block,
                    activation=self.resnet_activation,
                    batch_norm=self.resnet_batch_norm,
                    kernel_init=self.resnet_kernel_init,
                    dtype=self.dtype,
                )(x, train)
            base = x
            n_feat = self.net_conv_after_resnet
            feat_kernel = tuple(self.resnet_kernel_size)
            feat_act = self.resnet_activation
        else:
            raise NotImplementedError(f"backbone '{self.backbone}'")

        if n_feat > 0:
            feat = ConvBlock(n_feat, feat_kernel, activation=feat_act,
                             dtype=self.dtype)(base, train)
        else:
            feat = base

        one = tuple(1 for _ in range(nd))
        prob = nn.Conv(1, one, padding="SAME", name="head_prob", dtype=self.dtype)(feat)
        prob = nn.sigmoid(prob.astype(jnp.float32))
        dist = nn.Conv(self.n_rays, one, padding="SAME", name="head_dist", dtype=self.dtype)(feat)
        dist = dist.astype(jnp.float32)

        if self.n_classes is not None:
            if n_feat > 0:
                feat_c = ConvBlock(n_feat, feat_kernel, activation=feat_act,
                                   dtype=self.dtype)(base, train)
            else:
                feat_c = base
            pc = nn.Conv(self.n_classes + 1, one, padding="SAME",
                         name="head_prob_class", dtype=self.dtype)(feat_c)
            prob_class = nn.softmax(pc.astype(jnp.float32), axis=-1)
            return prob, dist, prob_class
        return prob, dist
