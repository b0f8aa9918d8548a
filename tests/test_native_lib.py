"""Native C++ host library vs JAX/TPU kernels: same semantics."""
import numpy as np
import pytest

from stardist_tpu import star_dist, star_dist3D, Rays_GoldenSpiral
from stardist_tpu.lib import (
    star_dist2d_native,
    star_dist3d_native,
    nms2d_native,
    nms3d_native,
    polygons_to_label_native,
    dist_to_volume_native,
    get_lib,
)
from stardist_tpu.ops.nms import nms_polygons, nms_polyhedra
from utils import random_image


def test_lib_builds():
    assert get_lib().sd_version() == 101


@pytest.mark.parametrize("grid", ((1, 1), (2, 2)))
def test_star_dist2d_native_vs_jax(grid):
    img = random_image((61, 63))
    a = star_dist(img, 16, grid=grid, mode="jax")
    b = star_dist2d_native(img, 16, grid=grid)
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


def test_star_dist3d_native_vs_jax():
    img = random_image((15, 17, 19)).astype(np.uint16)
    rays = Rays_GoldenSpiral(12)
    a = star_dist3D(img, rays, mode="jax")
    b = star_dist3d_native(img, rays)
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


def test_nms2d_native_vs_jax():
    rng = np.random.RandomState(0)
    N, R = 120, 16
    dist = rng.uniform(5, 10, (N, R)).astype(np.float32)
    points = rng.uniform(10, 120, (N, 2)).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, N))[::-1]
    a = nms_polygons(dist, points, scores=scores, thresh=0.3, dense_max=10 ** 9)
    b = nms2d_native(dist, points, thresh=0.3)
    assert np.array_equal(a, b)


def test_nms3d_native_vs_jax():
    rng = np.random.RandomState(0)
    rays = Rays_GoldenSpiral(16)
    N, R = 25, 16
    dist = rng.uniform(4, 7, (N, R)).astype(np.float32)
    points = rng.uniform(8, 40, (N, 3)).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, N))[::-1]
    a = nms_polyhedra(dist, points, rays, scores=scores, thresh=0.3,
                      dense_max=10 ** 9, samples=24)
    b = nms3d_native(dist, points, rays, thresh=0.3)
    assert np.array_equal(a, b)


def test_raster2d_native_vs_jax():
    from stardist_tpu.ops.rasterize import rasterize_polygons
    rng = np.random.RandomState(1)
    N, R = 20, 16
    dist = rng.uniform(4, 9, (N, R)).astype(np.float32)
    points = rng.uniform(12, 52, (N, 2)).astype(np.float32)
    order = np.arange(1, N + 1, dtype=np.int32)
    a, _ = rasterize_polygons(dist, points, (64, 64), order)
    b = polygons_to_label_native(dist, points, (64, 64), order)
    assert np.array_equal(a, b)


def test_raster3d_native_vs_jax():
    from stardist_tpu.ops.rasterize import rasterize_polyhedra
    from stardist_tpu.lib import polyhedra_to_label_native
    from stardist_tpu.rays3d import Rays_GoldenSpiral

    rays = Rays_GoldenSpiral(32)
    rng = np.random.RandomState(4)
    N = 15
    dist = rng.uniform(3, 7, (N, 32)).astype(np.float32)
    points = rng.uniform(10, 40, (N, 3)).astype(np.float32)
    order = np.arange(1, N + 1, dtype=np.int32)
    labels = rng.permutation(N).astype(np.int32) + 1
    a, cnt_a = rasterize_polyhedra(dist, points, rays, (48, 48, 48), order,
                                   return_count=True, labels=labels)
    b, cnt_b = polyhedra_to_label_native(dist, points, rays, (48, 48, 48),
                                         order, return_count=True,
                                         labels=labels)
    assert np.array_equal(a, b), (a != b).sum()
    assert np.array_equal(cnt_a, cnt_b)


def test_polyhedron_to_label_native_dispatch_equals_device():
    import os
    from stardist_tpu.geometry.geom3d import polyhedron_to_label
    from stardist_tpu.rays3d import Rays_GoldenSpiral

    rays = Rays_GoldenSpiral(24)
    rng = np.random.RandomState(5)
    N = 12
    dist = rng.uniform(3, 7, (N, 24)).astype(np.float32)
    points = rng.uniform(10, 40, (N, 3)).astype(np.float32)
    prob = rng.uniform(0.2, 1.0, N).astype(np.float32)
    try:
        os.environ["STARDIST_TPU_RASTER3D"] = "native"
        a = polyhedron_to_label(dist, points, rays, (48, 48, 48), prob=prob,
                                verbose=False, overlap_label=-1)
        a2 = polyhedron_to_label(dist, points, rays, (48, 48, 48), prob=prob,
                                 verbose=False)
        os.environ["STARDIST_TPU_RASTER3D"] = "device"
        b = polyhedron_to_label(dist, points, rays, (48, 48, 48), prob=prob,
                                verbose=False, overlap_label=-1)
        b2 = polyhedron_to_label(dist, points, rays, (48, 48, 48), prob=prob,
                                 verbose=False)
    finally:
        del os.environ["STARDIST_TPU_RASTER3D"]
    assert np.array_equal(a, b)
    assert np.array_equal(a2, b2)


def test_dist_to_volume_native():
    rays = Rays_GoldenSpiral(32)
    rng = np.random.RandomState(2)
    dist = rng.uniform(3, 8, (5, 7, 32)).astype(np.float32)
    v = dist_to_volume_native(dist, rays)
    assert v.shape == (5, 7)
    assert np.allclose(v, rays.volume(dist), rtol=1e-4)
