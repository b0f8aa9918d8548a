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


def test_bounds_paths_equal_exact_dense_with_containment():
    # Regression: the arccos-free box upper bound formerly used the
    # radical-line chord as the lens height, which is invalid when one disc
    # (nearly) contains the other — heavily overlapping size-mismatched
    # pairs were declared "definitely below threshold" and silently kept by
    # both bounds-using paths (blocked AND device). Pin both against the
    # exact dense path on geometry with strong size variation.
    rng = np.random.RandomState(0)
    for trial in range(3):
        n = 400
        points = rng.uniform(0, 80, (n, 2)).astype(np.float32)  # crowded field
        dist = (rng.uniform(2, 14, (n, 1))
                * rng.uniform(0.7, 1.3, (n, 32))).astype(np.float32)
        scores = np.sort(rng.uniform(0.2, 1, n))[::-1].copy()
        exact = nms_polygons(dist, points, scores=scores, thresh=0.4,
                             device_nms=False, dense_max=1 << 20)
        blocked = nms_polygons(dist, points, scores=scores, thresh=0.4,
                               device_nms=False)
        device = nms_polygons(dist, points, scores=scores, thresh=0.4,
                              device_nms=True)
        assert np.array_equal(blocked, exact), trial
        assert np.array_equal(device, exact), trial


def test_contained_polygon_suppressed():
    # a small polygon strictly inside a larger one: overlap/min-area = 1
    dist = np.stack([np.full(32, 12.0), np.full(32, 4.0)]).astype(np.float32)
    points = np.array([[50.0, 50.0], [52.0, 51.0]], np.float32)
    for device_nms in (False, True):
        keep = nms_polygons(dist, points, scores=np.array([0.9, 0.8]),
                            thresh=0.5, device_nms=device_nms)
        assert keep.tolist() == [True, False]


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
