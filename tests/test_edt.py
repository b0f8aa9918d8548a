import numpy as np
import pytest

from stardist_tpu.utils import edt_prob
from utils import random_image, circle_image


@pytest.mark.parametrize("shape", [(64, 67), (33, 35)])
def test_edt_jax_vs_scipy_2d(shape):
    lbl = random_image(shape).astype(np.int32)
    a = edt_prob(lbl, engine="scipy")
    b = edt_prob(lbl, engine="jax")
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


def test_edt_jax_vs_scipy_3d():
    lbl = random_image((17, 19, 21)).astype(np.int32)
    a = edt_prob(lbl, engine="scipy")
    b = edt_prob(lbl, engine="jax")
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


def test_edt_jax_anisotropy():
    lbl = circle_image((32, 40), radius=8).astype(np.int32)
    a = edt_prob(lbl, anisotropy=(2.0, 1.0), engine="scipy")
    b = edt_prob(lbl, anisotropy=(2.0, 1.0), engine="jax")
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


def test_edt_jax_many_labels():
    rng = np.random.RandomState(0)
    lbl = np.zeros((64, 64), np.int32)
    k = 0
    for i in range(0, 64, 7):
        for j in range(0, 64, 7):
            k += 1
            lbl[i:i + 5, j:j + 5] = k
    assert k > 64  # exercises label chunking (label_block=64)
    a = edt_prob(lbl, engine="scipy")
    b = edt_prob(lbl, engine="jax")
    assert np.allclose(a, b, atol=1e-4)
