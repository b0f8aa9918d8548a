"""Exact Euclidean distance transform on device (JAX).

TPU-native equivalent of the reference's EDT-based object-probability
targets (``edt_prob``: per-object normalized distance to the nearest pixel
of a different label; reference stardist/utils.py:71-125 via scipy/edt).

Uses the separable squared-distance formulation: per axis,
``D(i) = min_j (f(j) + (i-j)^2)`` — a dense min-plus reduction that maps to
large vectorized ops (O(n^2) per line, exact, no data-dependent control
flow). Labels are processed as a batched one-vs-rest stack.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e12


def _minplus_axis(f, axis, spacing):
    """Exact 1D squared EDT along ``axis`` of f (squared distances)."""
    n = f.shape[axis]
    i = jnp.arange(n, dtype=jnp.float32)
    d2 = ((i[:, None] - i[None, :]) * spacing) ** 2  # (n, n)
    f = jnp.moveaxis(f, axis, -1)
    out = jnp.min(f[..., None, :] + d2, axis=-1)
    return jnp.moveaxis(out, -1, axis)


def edt_prob_core(lbl, labels, spacing):
    """Traceable core (usable inside other jitted programs, e.g. the fused
    training step): lbl (sp...), labels (L,) -> normalized EDT prob."""
    L = labels.shape[0]
    valid = labels > 0
    mask = lbl[None] == labels.reshape((L,) + (1,) * lbl.ndim)  # (L, sp...)
    f = jnp.where(mask, _INF, 0.0)
    for ax in range(lbl.ndim):
        f = _minplus_axis(f, ax + 1, spacing[ax])
    d = jnp.sqrt(jnp.maximum(f, 0.0))
    dmax = jnp.max(jnp.where(mask, d, 0.0), axis=tuple(range(1, lbl.ndim + 1)),
                   keepdims=True)
    probs = jnp.where(mask & valid.reshape((L,) + (1,) * lbl.ndim),
                      d / (dmax + 1e-10), 0.0)
    return jnp.sum(probs, axis=0)


_edt_prob_impl = functools.partial(jax.jit, static_argnums=(2,))(edt_prob_core)


def edt_prob_jax(lbl_img, anisotropy=None, label_block=64):
    """Per-object normalized EDT on device; equivalent to utils.edt_prob."""
    lbl_img = np.asarray(lbl_img)
    spacing = tuple(float(s) for s in (anisotropy if anisotropy is not None
                                       else (1.0,) * lbl_img.ndim))
    uniques = np.unique(lbl_img[lbl_img > 0])
    if len(uniques) == 0:
        return np.zeros(lbl_img.shape, np.float32)
    out = np.zeros(lbl_img.shape, np.float32)
    lbl_dev = jnp.asarray(lbl_img.astype(np.int32))
    for i0 in range(0, len(uniques), label_block):
        chunk = uniques[i0:i0 + label_block]
        Lp = label_block if len(uniques) > label_block else _next_pow2(len(chunk))
        padded = np.zeros(Lp, np.int32)
        padded[:len(chunk)] = chunk
        out += np.asarray(_edt_prob_impl(lbl_dev, jnp.asarray(padded), spacing))
    return out


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p
