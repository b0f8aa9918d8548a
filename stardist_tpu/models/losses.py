"""Training losses and metrics (JAX).

Exact re-implementation of the reference Keras losses
(stardist/models/base.py:34-126,291-349): masked distance losses
(mae/mse/iou) with background regularizer and mask normalization, BCE
probability loss with y_true==-1 ignore masking, weighted categorical
cross-entropy for multiclass, and the kld / relevant_mae / relevant_mse /
dist_iou metrics.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7  # Keras epsilon


def _bce(y_true, y_pred):
    p = jnp.clip(y_pred, _EPS, 1 - _EPS)
    return -(y_true * jnp.log(p) + (1 - y_true) * jnp.log(1 - p))


def prob_loss(y_true, y_pred):
    """BCE over pixels with y_true >= 0 (y_true == -1 disables the loss)."""
    mask = (y_true >= 0).astype(jnp.float32)
    bce = _bce(jnp.maximum(y_true, 0.0), y_pred)
    return jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def kld_metric(y_true, y_pred):
    """KL-divergence-style prob metric (reference base.py:72-77)."""
    mask = (y_true >= 0).astype(jnp.float32)
    t = jnp.clip(y_true, _EPS, 1.0)
    p = jnp.clip(y_pred, _EPS, 1.0)
    v = _bce(t, p) - _bce(t, t)
    return jnp.sum(v * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _generic_masked(mask, loss_map, reg_weight, reg_map, norm_by_mask=True):
    """Combinator (reference generic_masked_loss, base.py:34-46): per-pixel
    channel-mean of mask*loss, normalized by the global mask mean, plus an
    optional background regularizer on (1-mask)."""
    actual = jnp.mean(mask * loss_map, axis=-1)
    norm = (jnp.mean(mask) + _EPS) if norm_by_mask else 1.0
    out = actual / norm
    if reg_weight > 0:
        out = out + reg_weight * jnp.mean((1 - mask) * reg_map, axis=-1)
    return jnp.mean(out)


def dist_loss(dist_true, dist_mask, dist_pred, kind="mae", reg_weight=0.0):
    """Masked distance loss; dist_mask is the (0..1) EDT-prob weight map with
    shape (..., 1) broadcasting over rays."""
    diff = dist_true - dist_pred
    if kind == "mae":
        loss_map = jnp.abs(diff)
    elif kind == "mse":
        loss_map = jnp.square(diff)
    elif kind == "iou":
        # soft squared IoU with sign trick for unconstrained negative preds
        inter = jnp.mean(jnp.sign(dist_pred) * jnp.square(jnp.minimum(dist_true, dist_pred)), axis=-1)
        union = jnp.mean(jnp.square(jnp.maximum(dist_true, dist_pred)), axis=-1)
        iou = inter / (union + _EPS)
        loss_map = (1.0 - iou)[..., None]
    else:
        raise ValueError(f"unknown dist loss '{kind}'")
    return _generic_masked(dist_mask, loss_map, reg_weight, jnp.abs(dist_pred))


def dist_iou_metric(dist_true, dist_mask, dist_pred):
    pred = jnp.maximum(0.0, dist_pred)
    inter = jnp.mean(jnp.square(jnp.minimum(dist_true, pred)), axis=-1)
    union = jnp.mean(jnp.square(jnp.maximum(dist_true, pred)), axis=-1)
    iou = (inter / (union + _EPS))[..., None]
    return _generic_masked(dist_mask, iou, 0.0, None)


def relevant_mae(dist_true, dist_mask, dist_pred):
    return _generic_masked(dist_mask, jnp.abs(dist_true - dist_pred), 0.0, None)


def relevant_mse(dist_true, dist_mask, dist_pred):
    return _generic_masked(dist_mask, jnp.square(dist_true - dist_pred), 0.0, None)


def class_loss(y_true, y_pred, class_weights):
    """Weighted categorical cross-entropy with <0 ignore
    (reference weighted_categorical_crossentropy, base.py:108-126)."""
    w = jnp.asarray(class_weights, jnp.float32)
    mask = (y_true >= 0).astype(jnp.float32)
    p = y_pred / jnp.sum(y_pred + _EPS, axis=-1, keepdims=True)
    p = jnp.clip(p, _EPS, 1 - _EPS)
    loss = -jnp.sum(w * mask * jnp.maximum(y_true, 0.0) * jnp.log(p), axis=-1)
    return jnp.mean(loss)
