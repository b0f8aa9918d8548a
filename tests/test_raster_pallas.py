"""Pallas tile rasterizer == splat rasterizer (interpret mode on CPU)."""
import numpy as np
import pytest

from stardist_tpu.ops.rasterize import rasterize_polygons
from stardist_tpu.ops.raster_pallas import rasterize_polygons_tiles


def _field(n, R, shape, seed, border=True):
    rng = np.random.RandomState(seed)
    lo = -5 if border else 15
    points = rng.uniform(lo, max(shape) + (5 if border else -15),
                         (n, 2)).astype(np.float32)
    dist = (rng.uniform(3, 12, (n, 1))
            * rng.uniform(0.85, 1.15, (n, R))).astype(np.float32)
    order = rng.permutation(n).astype(np.int32) + 1
    labels = rng.permutation(n).astype(np.int32)
    return dist, points, order, labels


@pytest.mark.parametrize("n,R,shape", [(40, 16, (100, 150)),
                                       (150, 32, (256, 256)),
                                       (3, 8, (33, 45))])
def test_tiles_equal_splat(n, R, shape):
    dist, points, order, labels = _field(n, R, shape, seed=n)
    a, _ = rasterize_polygons(dist, points, shape, order, labels=labels)
    res = rasterize_polygons_tiles(dist, points, shape, order, labels=labels)
    assert res is not None
    b, _ = res
    assert np.array_equal(a, b), (a != b).sum()


def test_tiles_equal_splat_no_labels():
    dist, points, order, _ = _field(60, 16, (120, 130), seed=3)
    a, _ = rasterize_polygons(dist, points, (120, 130), order)
    b, _ = rasterize_polygons_tiles(dist, points, (120, 130), order)
    assert np.array_equal(a, b)


def test_splat_no_negative_index_wraparound():
    # regression: a candidate near the top border must not paint wrapped
    # pixels at the image bottom (scatter with negative indices wraps)
    dist = np.full((1, 16), 8.0, np.float32)
    points = np.array([[1.0, 50.0]], np.float32)
    order = np.array([1], np.int32)
    img, _ = rasterize_polygons(dist, points, (64, 100), order)
    assert img[-12:, :].sum() == 0


def test_splat3d_no_negative_index_wraparound():
    from stardist_tpu.ops.rasterize import rasterize_polyhedra
    from stardist_tpu.rays3d import Rays_GoldenSpiral

    rays = Rays_GoldenSpiral(16)
    dist = np.full((1, 16), 6.0, np.float32)
    points = np.array([[1.0, 1.0, 20.0]], np.float32)
    order = np.array([1], np.int32)
    img, _ = rasterize_polyhedra(dist, points, rays, (32, 32, 48), order,
                                 return_count=False)
    assert img[-8:, :, :].sum() == 0 and img[:, -8:, :].sum() == 0


def test_tiles_declines_out_of_range_labels():
    dist, points, order, _ = _field(5, 8, (64, 64), seed=1)
    labels = np.array([70000, 1, 2, 3, 4], np.int32)  # label+1 > 16 bit
    assert rasterize_polygons_tiles(dist, points, (64, 64), order,
                                    labels=labels) is None
