"""Shared test helpers (synthetic data generators; analog of reference tests/utils.py)."""
import numpy as np
from scipy.ndimage import gaussian_filter, label as ndi_label
from timeit import default_timer


class Timer(object):
    def __init__(self, message="elapsed"):
        self.message = message

    def __enter__(self):
        self.start = default_timer()
        return self

    def __exit__(self, *args):
        self.t = default_timer() - self.start
        print(f"{self.message}: {1000 * self.t:.2f} ms")


def random_image(shape=(128, 128)):
    """Thresholded smoothed noise -> connected-component labels."""
    img = gaussian_filter(np.random.normal(size=shape), min(shape) / 20)
    img = img > np.percentile(img, 80)
    img = ndi_label(img)[0]
    img[img > 255] = img[img > 255] % 254 + 1
    return img.astype(np.uint16)


def circle_image(shape=(128, 128), radius=None, center=None, eps=None):
    if center is None:
        center = (0,) * len(shape)
    if radius is None:
        radius = min(shape) // 4
    if eps is None:
        eps = (1,) * len(shape)
    assert len(shape) == len(eps)
    xs = tuple(np.arange(s) - s // 2 for s in shape)
    Xs = np.meshgrid(*xs, indexing="ij")
    R = np.sqrt(np.sum([(X - c) ** 2 / _e ** 2 for X, c, _e in zip(Xs, center, eps)], axis=0))
    return (R < radius).astype(np.uint16)


def overlap_image(shape=(128, 128)):
    img1 = circle_image(shape, center=(0.1,) * len(shape))
    img2 = circle_image(shape, center=(-0.1,) * len(shape))
    img = np.maximum(img1, 2 * img2)
    overlap = np.count_nonzero(np.bitwise_and(img1 > 0, img2 > 0))
    A1 = np.count_nonzero(img1 > 0)
    A2 = np.count_nonzero(img2 > 0)
    iou = overlap / min(A1, A2)
    return img, iou


def synthetic_nuclei_2d(shape=(256, 256), n=40, r_range=(6, 14), seed=0):
    """Synthetic fluorescence-like nuclei image + label mask (deterministic)."""
    rng = np.random.RandomState(seed)
    lbl = np.zeros(shape, np.uint16)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    k = 0
    for _ in range(n):
        r = rng.uniform(*r_range)
        cy = rng.uniform(r, shape[0] - r)
        cx = rng.uniform(r, shape[1] - r)
        ar = rng.uniform(0.7, 1.3)
        mask = ((yy - cy) ** 2 * ar + (xx - cx) ** 2 / ar) < r ** 2
        if (lbl[mask] > 0).mean() > 0.2 if mask.any() else True:
            continue
        k += 1
        lbl[mask & (lbl == 0)] = k
    img = (lbl > 0).astype(np.float32)
    img = gaussian_filter(img, 1.5)
    img += 0.05 * rng.normal(size=shape)
    return img.astype(np.float32), lbl


def synthetic_nuclei_3d(shape=(48, 64, 64), n=15, r_range=(4, 8), seed=0):
    rng = np.random.RandomState(seed)
    lbl = np.zeros(shape, np.uint16)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    k = 0
    for _ in range(n):
        r = rng.uniform(*r_range)
        cz = rng.uniform(r, shape[0] - r)
        cy = rng.uniform(r, shape[1] - r)
        cx = rng.uniform(r, shape[2] - r)
        mask = ((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2
        if (lbl[mask] > 0).mean() > 0.2 if mask.any() else True:
            continue
        k += 1
        lbl[mask & (lbl == 0)] = k
    img = (lbl > 0).astype(np.float32)
    img = gaussian_filter(img, 1.0)
    img += 0.05 * rng.normal(size=shape)
    return img.astype(np.float32), lbl


def check_similar(x, y):
    delta = np.abs(np.asarray(x, float) - np.asarray(y, float))
    assert np.allclose(x, y), f"avg abs err = {delta.mean():.10f}, max abs err = {delta.max():.10f}"
