"""Tests for the two-layout striped banded NMS (ops/nms2d_fast.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stardist_tpu.ops.nms import nms_polygons
from stardist_tpu.ops.nms2d_fast import (
    nms2d_twolayout_host,
    points_in_polygons_acc,
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


def test_pair_frac_jnp_vs_host_estimator():
    """The jnp pair estimator (_pair_frac, the CPU execution path of the
    rounds kernel) must agree with the package-wide blocked estimator."""
    from stardist_tpu.ops.nms2d_fast import _pair_frac
    from stardist_tpu.ops.polygon import polygon_bboxes
    rng = np.random.RandomState(2)
    P = 256
    d_r = jnp.asarray(rng.uniform(3, 12, (P, 32)).astype(np.float32))
    d_c = jnp.asarray(rng.uniform(3, 12, (P, 32)).astype(np.float32))
    p_r = jnp.asarray(rng.uniform(0, 300, (P, 2)).astype(np.float32))
    p_c = p_r + jnp.asarray(rng.uniform(-12, 12, (P, 2)).astype(np.float32))
    lo_r, hi_r = polygon_bboxes(d_r, p_r)
    lo_c, hi_c = polygon_bboxes(d_c, p_c)
    frac, ext = _pair_frac(d_r, p_r, lo_r, hi_r, d_c, p_c, lo_c, hi_c, 16)
    # against the blocked form used by the host paths: one (B=1, M=P) block
    # per row candidate, diagonal entry = the pair
    from stardist_tpu.ops.nms import _frac_block_2d
    for i in range(0, P, 37):
        fb = _frac_block_2d(d_r[i:i + 1], p_r[i:i + 1], d_c, p_c, 16,
                            jnp.maximum(lo_r[i:i + 1, None], lo_c[None]),
                            jnp.maximum(
                                jnp.minimum(hi_r[i:i + 1, None], hi_c[None]) -
                                jnp.maximum(lo_r[i:i + 1, None], lo_c[None]),
                                0.0))
        assert np.allclose(float(frac[i]), float(np.asarray(fb)[0, i]))


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
