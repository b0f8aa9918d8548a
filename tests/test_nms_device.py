"""Single-call device NMS vs the host blocked/dense paths: identical decisions."""
import numpy as np
import pytest

from stardist_tpu.ops.nms import nms_polygons, _nms_polygons_device


def _candidates(n, seed=0, spread=200):
    rng = np.random.RandomState(seed)
    dist = rng.uniform(5, 10, (n, 16)).astype(np.float32)
    points = rng.uniform(12, spread, (n, 2)).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n))[::-1]
    return dist, points, scores


@pytest.mark.parametrize("n,thresh", [(60, 0.3), (300, 0.5), (1000, 0.3)])
def test_device_nms_equals_blocked(n, thresh):
    dist, points, scores = _candidates(n, seed=n)
    a = nms_polygons(dist, points, scores=scores, thresh=thresh, device_nms=False)
    b = _nms_polygons_device(dist, points, thresh)
    assert np.array_equal(a, b), (a.sum(), b.sum(), np.flatnonzero(a != b)[:10])


def test_device_nms_overflow_retry():
    # dense cluster: everything ambiguous/overlapping -> exercises the
    # A_max overflow retry
    dist, points, scores = _candidates(600, seed=1, spread=40)
    a = nms_polygons(dist, points, scores=scores, thresh=0.98, device_nms=False)
    b = _nms_polygons_device(dist, points, 0.98, amb_max=64)
    assert np.array_equal(a, b)


def test_device_nms_thresh_zero():
    dist, points, scores = _candidates(200, seed=2, spread=100)
    a = nms_polygons(dist, points, scores=scores, thresh=0.0, device_nms=False)
    b = _nms_polygons_device(dist, points, 0.0)
    assert np.array_equal(a, b)


@pytest.mark.parametrize("n,thresh", [(40, 0.3), (150, 0.5)])
def test_device_nms_3d_equals_host(n, thresh):
    from stardist_tpu.ops.nms import nms_polyhedra, _nms_polyhedra_device
    from stardist_tpu.rays3d import Rays_GoldenSpiral

    rays = Rays_GoldenSpiral(16)
    rng = np.random.RandomState(n)
    dist = rng.uniform(4, 7, (n, 16)).astype(np.float32)
    points = rng.uniform(8, 60, (n, 3)).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n))[::-1]
    a = nms_polyhedra(dist, points, rays, scores=scores, thresh=thresh,
                      device_nms=False, samples=12)
    b = _nms_polyhedra_device(dist, points, rays, thresh, samples=12)
    assert np.array_equal(a, b), np.flatnonzero(a != b)[:10]
