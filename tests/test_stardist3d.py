import numpy as np
import pytest

from stardist_tpu import (
    star_dist3D,
    relabel_image_stardist3D,
    polyhedron_to_label,
    Rays_GoldenSpiral,
    Rays_Octo,
    Rays_Tetra,
    Rays_Cartesian,
    rays_from_json,
)
from utils import random_image, circle_image


@pytest.mark.parametrize("grid", ((1, 1, 1), (1, 2, 2)))
@pytest.mark.parametrize("n_rays", (16, 32))
def test_types_and_shape(n_rays, grid):
    img = random_image((25, 27, 29)).astype(np.uint16)
    rays = Rays_GoldenSpiral(n_rays)
    d = star_dist3D(img, rays, grid=grid, mode="jax")
    assert d.dtype == np.float32
    assert d.shape == tuple((s - 1) // g + 1 for s, g in zip(img.shape, grid)) + (n_rays,)


@pytest.mark.parametrize("grid", ((1, 1, 1), (1, 2, 2)))
def test_jax_vs_numpy_oracle(grid):
    img = random_image((9, 11, 12)).astype(np.uint16)
    rays = Rays_GoldenSpiral(8)
    a = star_dist3D(img, rays, grid=grid, mode="jax")
    b = star_dist3D(img, rays, grid=grid, mode="numpy")
    assert np.allclose(a, b, atol=1e-5), np.abs(a - b).max()


def test_rays_json_roundtrip():
    for rays in (Rays_GoldenSpiral(32), Rays_Octo(2), Rays_Tetra(2), Rays_Cartesian(8, 5)):
        rays2 = rays_from_json(rays.to_json())
        assert np.allclose(rays.vertices, rays2.vertices)
        assert np.allclose(rays.faces, rays2.faces)
        assert repr(rays) == repr(rays2)


def test_rays_volume_surface():
    """Analytic volume/surface vs rasterized voxel count (cf. reference
    tests/test_nms3D.py:100-122)."""
    n_rays = 96
    rays = Rays_GoldenSpiral(n_rays)
    shape = (55, 56, 58)
    center = np.array(shape) // 2
    rng = np.random.RandomState(0)
    dist = 0.4 * rng.uniform(0.3 * min(shape), 0.5 * min(shape), n_rays)

    lbl = polyhedron_to_label([dist], [center], rays=rays, shape=shape, verbose=False)
    volume_analytic = rays.volume(dist)
    volume_voxels = np.count_nonzero(lbl)
    assert abs(volume_analytic - volume_voxels) / volume_voxels < 0.1
    # broadcast form
    vol_b = rays.volume(np.broadcast_to(dist, (13, 17) + dist.shape))
    assert vol_b.shape == (13, 17) and np.allclose(vol_b, volume_analytic)
    surf = rays.surface(dist)
    assert surf > 0
    surf_b = rays.surface(np.broadcast_to(dist, (3,) + dist.shape))
    assert surf_b.shape == (3,) and np.allclose(surf_b, surf)


def test_relabel_consistency():
    img = circle_image((40, 42, 44), radius=12)
    rays = Rays_GoldenSpiral(64)
    img2 = relabel_image_stardist3D(img, rays)
    diff = np.count_nonzero((img > 0) != (img2 > 0))
    assert diff / np.count_nonzero(img > 0) < 0.15


def test_polyhedron_label_overlap():
    """First-writer-wins on descending prob + overlap_label marking."""
    n_rays = 32
    rays = Rays_GoldenSpiral(n_rays)
    dist = 10 * np.ones((2, n_rays))
    points = np.array([[20, 20, 20], [20, 20, 26]])
    prob = np.array([0.9, 0.5])
    lbl = polyhedron_to_label(dist, points, rays, shape=(40, 40, 48), prob=prob, verbose=False)
    assert lbl[20, 20, 22] == 1  # overlap claimed by higher prob
    assert lbl[20, 20, 33] == 2
    lbl_o = polyhedron_to_label(dist, points, rays, shape=(40, 40, 48), prob=prob,
                                verbose=False, overlap_label=-1)
    assert lbl_o[20, 20, 23] == -1
