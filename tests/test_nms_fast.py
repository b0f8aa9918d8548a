"""Tests for the two-layout striped banded NMS (ops/nms2d_fast.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stardist_tpu.ops.nms import nms_polygons
from stardist_tpu.ops.nms2d_fast import (
    nms2d_twolayout_host,
    points_in_polygons_acc,
    _erosion_lb_area,
)
from stardist_tpu.ops.polygon import points_in_polygons, polygon_areas


def _field(n, seed=0, img=512, r_range=(5, 12), per_obj=8, n_rays=32):
    rng = np.random.RandomState(seed)
    n_obj = max(1, n // per_obj)
    cy = rng.uniform(15, img - 15, n_obj)
    cx = rng.uniform(15, img - 15, n_obj)
    r = rng.uniform(*r_range, n_obj)
    k = rng.randint(0, n_obj, n)
    points = np.stack([cy[k], cx[k]], 1) + rng.normal(0, 2.0, (n, 2))
    dist = r[k][:, None] * rng.uniform(0.85, 1.15, (n, n_rays))
    prob = rng.uniform(0.5, 1.0, n)
    ind = np.argsort(prob, kind="stable")[::-1]
    return (dist[ind].astype(np.float32), points[ind].astype(np.float32),
            prob[ind].astype(np.float32))


def test_pip_acc_matches_onehot():
    rng = np.random.RandomState(0)
    dist = rng.uniform(2, 10, (64, 32)).astype(np.float32)
    pts = rng.uniform(0, 100, (64, 2)).astype(np.float32)
    q = pts[:, None, :] + rng.uniform(-12, 12, (64, 40, 2)).astype(np.float32)
    a = np.asarray(points_in_polygons(jnp.asarray(dist), jnp.asarray(pts),
                                      jnp.asarray(q)))
    b = np.asarray(points_in_polygons_acc(jnp.asarray(dist), jnp.asarray(pts),
                                          jnp.asarray(q)))
    assert (a == b).all()


def test_erosion_lb_is_true_lower_bound():
    """The kernel-lemma bound must never exceed the true intersection area
    (checked against a fine-grid rasterized intersection)."""
    rng = np.random.RandomState(1)
    n = 128
    d_r = rng.uniform(4, 10, (n, 32)).astype(np.float32)
    d_c = rng.uniform(4, 10, (n, 32)).astype(np.float32)
    p_r = np.zeros((n, 2), np.float32)
    p_c = rng.uniform(-6, 6, (n, 2)).astype(np.float32)
    from stardist_tpu.ops.nms2d_fast import _inner_radius
    rin_r = np.asarray(_inner_radius(jnp.asarray(d_r)))
    rin_c = np.asarray(_inner_radius(jnp.asarray(d_c)))
    lb = np.asarray(_erosion_lb_area(
        jnp.asarray(d_r), jnp.asarray(p_r), jnp.asarray(rin_r),
        jnp.asarray(d_c), jnp.asarray(p_c), jnp.asarray(rin_c)))
    # fine-grid true intersection area
    S = 160
    g = np.linspace(-22, 22, S).astype(np.float32)
    q = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
    cell = (g[1] - g[0]) ** 2
    qb = jnp.asarray(np.broadcast_to(q, (n,) + q.shape))
    in_r = np.asarray(points_in_polygons(jnp.asarray(d_r), jnp.asarray(p_r), qb))
    in_c = np.asarray(points_in_polygons(jnp.asarray(d_c), jnp.asarray(p_c), qb))
    inter = (in_r & in_c).sum(1) * cell
    # allow tiny rasterization slack on the true area
    assert (lb <= inter + 3.0).all(), (lb - inter).max()


@pytest.mark.parametrize("n,seed", [(600, 0), (2048, 1), (6000, 2)])
def test_twolayout_matches_reference_paths(n, seed):
    """The two-layout kernel must reproduce the package's greedy NMS
    decisions; compare survivors against the host blocked-greedy path.

    Note: stage A0 (kernel-lemma bound) may decide a pair the sampled
    estimator would leave ambiguous only when the TRUE overlap exceeds the
    threshold, so survivor sets can differ only on pairs where the sampled
    estimate contradicts the true geometry; on these random fields the two
    must agree exactly (asserted) — a disagreement indicates a real bug.
    """
    dist, points, prob = _field(n, seed=seed)
    keep_ref = nms_polygons(dist, points, thresh=0.4, device_nms=False)
    keep_new = nms2d_twolayout_host(dist, points, 0.4, verbose=True)
    assert keep_new is not None
    a, b = int(keep_ref.sum()), int(keep_new.sum())
    # identical greedy semantics: exact agreement expected
    assert (keep_ref == keep_new).mean() > 0.999, (a, b)


def test_twolayout_tiny_and_degenerate():
    dist, points, prob = _field(64, seed=3)
    keep = nms2d_twolayout_host(dist, points, 0.4)
    ref = nms_polygons(dist, points, thresh=0.4, device_nms=False)
    assert keep is not None and (keep == ref).all()
    # single candidate
    keep1 = nms2d_twolayout_host(dist[:1], points[:1], 0.4)
    assert keep1 is not None and keep1.all()


def test_twolayout_all_identical_candidates():
    """Heavy degenerate clustering: all candidates on one spot — exactly one
    survivor (the highest rank)."""
    n = 300
    dist = np.full((n, 32), 8.0, np.float32)
    points = np.full((n, 2), 100.0, np.float32) + \
        np.random.RandomState(0).normal(0, 0.01, (n, 2)).astype(np.float32)
    keep = nms2d_twolayout_host(dist, points, 0.4)
    assert keep is not None
    assert keep.sum() == 1 and keep[0]
