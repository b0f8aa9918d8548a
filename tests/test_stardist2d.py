import numpy as np
import pytest

from stardist_tpu import star_dist, relabel_image_stardist, polygons_to_label
from stardist_tpu.matching import matching
from utils import random_image, circle_image


@pytest.mark.parametrize("grid", ((1, 1), (2, 2), (4, 1)))
@pytest.mark.parametrize("n_rays", (4, 16, 32))
def test_types_and_shape(n_rays, grid):
    img = random_image((65, 67))
    d = star_dist(img, n_rays=n_rays, grid=grid, mode="jax")
    assert d.dtype == np.float32
    assert d.shape == tuple((s - 1) // g + 1 for s, g in zip(img.shape, grid)) + (n_rays,)


@pytest.mark.parametrize("grid", ((1, 1), (2, 2)))
@pytest.mark.parametrize("n_rays", (8, 17, 32))
def test_jax_vs_numpy_oracle(n_rays, grid):
    img = random_image((41, 45))
    a = star_dist(img, n_rays=n_rays, grid=grid, mode="jax")
    b = star_dist(img, n_rays=n_rays, grid=grid, mode="numpy")
    assert np.allclose(a, b, atol=1e-5), np.abs(a - b).max()


def test_background_zero():
    img = np.zeros((32, 33), np.uint16)
    d = star_dist(img, 8)
    assert np.all(d == 0)


@pytest.mark.parametrize("n_rays", (32, 64))
def test_relabel_consistency(n_rays):
    """Star-convex shapes survive a dist -> label round trip (cf. reference
    tests/test_stardist2D.py:44-66, <10% pixel error)."""
    img = circle_image((100, 103))
    img2 = relabel_image_stardist(img, n_rays)
    diff = np.count_nonzero((img > 0) != (img2 > 0))
    assert diff / np.count_nonzero(img > 0) < 0.1


def test_grid_equals_subsampled_fullres():
    """Grid subsampling must equal slicing of the full-res computation
    (centers at multiples of grid; cf. reference test_grid)."""
    img = random_image((64, 64))
    a = star_dist(img, 16, grid=(2, 2))
    b = star_dist(img, 16, grid=(1, 1))[::2, ::2]
    assert np.allclose(a, b)


def test_polygons_to_label_order():
    """Higher-prob polygon wins overlaps; label ids follow input order."""
    dist = np.array([[10.0] * 16, [10.0] * 16])
    points = np.array([[20.0, 20.0], [20.0, 26.0]])
    prob = np.array([0.9, 0.5])
    lbl = polygons_to_label(dist, points, shape=(48, 48), prob=prob)
    assert lbl[20, 22] == 1  # overlap region claimed by higher prob (index 0)
    assert lbl[20, 34] == 2
    # swap probs -> overlap claimed by the other
    lbl2 = polygons_to_label(dist, points, shape=(48, 48), prob=prob[::-1])
    assert lbl2[20, 22] == 2


def test_reconstruction_accuracy():
    from stardist_tpu import edt_prob, non_maximum_suppression

    img = random_image((128, 128))
    prob = edt_prob(img)
    dist = star_dist(img, n_rays=32)
    points, probi, disti = non_maximum_suppression(dist, prob, prob_thresh=0.4)
    img2 = polygons_to_label(disti, points, shape=img.shape)
    acc = matching(img.astype(np.int32), img2).accuracy
    assert acc > 0.9


def test_star_dist_max_dist_cap():
    # objects larger than max_dist report the cap, not 0 (regression: rays
    # alive at the step cap fell through with distance 0)
    from stardist_tpu.ops.stardist2d import star_dist2d_jax
    lbl = np.ones((64, 64), np.int32)  # one object covering everything
    d = star_dist2d_jax(lbl, n_rays=8, max_dist=10)
    center = d[32, 32]
    assert np.all(center >= 9.0) and np.all(center <= 10.0), center


def test_star_dist3d_max_dist_cap():
    from stardist_tpu.ops.stardist3d import star_dist3d_jax
    from stardist_tpu.rays3d import Rays_GoldenSpiral
    lbl = np.ones((24, 24, 24), np.int32)
    d = star_dist3d_jax(lbl, Rays_GoldenSpiral(8), max_dist=6)
    center = d[12, 12, 12]
    assert np.all(center >= 5.0) and np.all(center <= 6.0), center
