import numpy as np
import pytest

from stardist_tpu import (
    non_maximum_suppression,
    non_maximum_suppression_sparse,
    non_maximum_suppression_3d,
    non_maximum_suppression_3d_sparse,
    polygons_to_label,
    polyhedron_to_label,
    Rays_GoldenSpiral,
)


def create_random_data_2d(shape=(100, 103), radius=8, noise=0.1, n_rays=32, seed=42):
    rng = np.random.RandomState(seed)
    dist = radius * np.ones(shape + (n_rays,))
    noise = np.clip(noise, 0, 1)
    if noise > 0:
        dist *= 1 + noise * rng.uniform(-1, 1, dist.shape)
    prob = rng.uniform(0, 1, shape)
    return prob, dist


def test_nms_2d_basic():
    prob, dist = create_random_data_2d(shape=(64, 67))
    points, probi, disti = non_maximum_suppression(
        dist, prob, prob_thresh=0.9, nms_thresh=0.3)
    assert len(points) > 0
    assert np.all(np.sort(probi)[::-1] == probi)
    # survivors should be mutually non-overlapping beyond the threshold:
    # centers of equal-radius polygons must not coincide
    d2 = np.sum((points[:, None] - points[None]) ** 2, axis=-1)
    assert np.all(d2[np.triu_indices(len(points), 1)] > 0)


def test_nms_2d_thresh_zero_suppresses_overlaps():
    """nms_thresh=0: any overlapping pair is suppressed."""
    n_rays = 32
    dist = 10 * np.ones((3, n_rays))
    points = np.array([[30.0, 30.0], [30.0, 35.0], [30.0, 80.0]])
    prob = np.array([0.9, 0.8, 0.7])
    p, s, d, idx = non_maximum_suppression_sparse(dist, prob, points, nms_thresh=0)
    assert len(p) == 2 and set(idx.tolist()) == {0, 2}


def test_nms_2d_blocked_equals_dense():
    prob, dist = create_random_data_2d(shape=(60, 60))
    mask = prob > 0.92
    pts = np.stack(np.where(mask), axis=1).astype(np.float32)
    pr = prob[mask]
    di = dist[mask]
    a = non_maximum_suppression_sparse(di, pr, pts, nms_thresh=0.3, dense_max=10 ** 9)[3]
    b = non_maximum_suppression_sparse(di, pr, pts, nms_thresh=0.3, dense_max=0,
                                       row_block=16)[3]
    assert np.array_equal(np.sort(a), np.sort(b))


def test_nms_2d_flip_around_measured_iou():
    """Suppression flips exactly around the rasterized pair overlap."""
    n_rays = 64
    dist = np.stack([10 * np.ones(n_rays), 10 * np.ones(n_rays)])
    points = np.array([[30.0, 30.0], [30.0, 36.0]])
    prob = np.array([1.0, 0.5])
    m1 = polygons_to_label(dist[:1], points[:1], shape=(64, 64))
    m2 = polygons_to_label(dist[1:], points[1:], shape=(64, 64))
    inter = np.count_nonzero((m1 > 0) & (m2 > 0))
    iou = inter / min(np.count_nonzero(m1), np.count_nonzero(m2))
    keep_low = non_maximum_suppression_sparse(dist, prob, points, nms_thresh=0.90 * iou)[0]
    keep_high = non_maximum_suppression_sparse(dist, prob, points, nms_thresh=1.10 * iou)[0]
    assert len(keep_low) == 1 and len(keep_high) == 2


# ---------------------------------------------------------------------------
# 3D
# ---------------------------------------------------------------------------

def create_random_data_3d(shape=(24, 25, 27), noise=0.1, n_rays=32, seed=42):
    rng = np.random.RandomState(seed)
    dist = 6 * np.ones(shape + (n_rays,))
    dist *= 1 + np.clip(noise, 0, 1) * rng.uniform(-1, 1, dist.shape)
    prob = rng.uniform(0, 1, shape)
    rays = Rays_GoldenSpiral(n_rays)
    return prob, dist, rays


@pytest.mark.parametrize("n_rays, nms_thresh", [(16, 0), (32, 0.4)])
def test_nms_3d(n_rays, nms_thresh):
    prob, dist, rays = create_random_data_3d(noise=0, n_rays=n_rays)
    points, probi, disti = non_maximum_suppression_3d(
        dist, prob, rays, prob_thresh=0.95, nms_thresh=nms_thresh, verbose=False)
    assert len(points) > 0


@pytest.mark.parametrize("noise", (0, 0.2))
@pytest.mark.parametrize("n_rays", (32, 96))
def test_nms_3d_accuracy_flip(noise, n_rays):
    """Suppression must flip exactly around the measured pair IoU
    (reference tests/test_nms3D.py:60-83)."""
    dx = 3
    shape = (40, 55, 66)
    rays = Rays_GoldenSpiral(n_rays)
    dist = 10 * (1 + noise * np.sin(2 * np.pi * rays.vertices[:, :2].T))
    points = [(20, 20, 20), (20, 20, 20 + dx)]
    mask1 = polyhedron_to_label([dist[0]], [points[0]], rays, shape=shape, verbose=False)
    mask2 = polyhedron_to_label([dist[1]], [points[1]], rays, shape=shape, verbose=False)
    iou = np.count_nonzero(mask1 * mask2) / min(
        np.count_nonzero(mask1), np.count_nonzero(mask2) + 1e-10)
    prob = [1, 0.5]
    sup1 = non_maximum_suppression_3d_sparse(
        dist, prob, points, rays=rays, nms_thresh=0.95 * iou, verbose=False)[0]
    sup2 = non_maximum_suppression_3d_sparse(
        dist, prob, points, rays=rays, nms_thresh=1.05 * iou, verbose=False)[0]
    assert len(sup1) == 1 and len(sup2) == 2


def test_nms_3d_blocked_equals_dense():
    prob, dist, rays = create_random_data_3d(shape=(12, 13, 14), n_rays=24)
    mask = prob > 0.97
    pts = np.stack(np.where(mask), axis=1).astype(np.float32)
    pr = prob[mask]
    di = dist[mask]
    a = non_maximum_suppression_3d_sparse(di, pr, pts, rays=rays, nms_thresh=0.3,
                                          dense_max=10 ** 9)[3]
    b = non_maximum_suppression_3d_sparse(di, pr, pts, rays=rays, nms_thresh=0.3,
                                          dense_max=0, row_block=8)[3]
    assert np.array_equal(np.sort(a), np.sort(b))
