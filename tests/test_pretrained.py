"""Golden-number integration tests on the committed demo models
(analog of the reference's pretrained-model goldens,
tests/test_model2D.py:17-23 / test_model3D.py:17-23)."""
from pathlib import Path

import numpy as np
import pytest

from stardist_tpu.models import StarDist2D, StarDist3D
from stardist_tpu.matching import matching
from utils import synthetic_nuclei_2d, synthetic_nuclei_3d

EXAMPLES = Path(__file__).resolve().parents[1] / "models" / "examples"

pytestmark = pytest.mark.skipif(
    not (EXAMPLES / "2D_demo" / "config.json").exists(),
    reason="demo models not present",
)


@pytest.fixture(scope="module")
def model2d():
    return StarDist2D(None, name="2D_demo", basedir=str(EXAMPLES))


@pytest.fixture(scope="module")
def model3d():
    return StarDist3D(None, name="3D_demo", basedir=str(EXAMPLES))


def test_golden_2d(model2d):
    img, lbl = synthetic_nuclei_2d((128, 128), seed=0)
    labels, details = model2d.predict_instances(img)
    # golden numbers recorded at model-training time; loose tolerances guard
    # against float nondeterminism across jax versions
    assert abs(int(labels.max()) - 18) <= 2
    assert abs(np.count_nonzero(labels) - 5581) < 400
    m = matching(lbl.astype(np.int32), labels)
    assert m.tp >= 16


def test_golden_3d(model3d):
    img, lbl = synthetic_nuclei_3d((32, 64, 64), seed=0)
    labels, details = model3d.predict_instances(img)
    assert abs(int(labels.max()) - 16) <= 3
    assert abs(np.count_nonzero(labels) - 13420) < 1500
    m = matching(lbl.astype(np.int32), labels)
    assert m.tp >= 9


def test_from_pretrained_registry(model2d):
    from stardist_tpu.models import get_registered_models
    models, aliases = get_registered_models(StarDist2D)
    assert "2D_demo" in models
    m = StarDist2D.from_pretrained("2D_demo")
    assert m.config.n_rays == model2d.config.n_rays


def test_thresholds_loaded(model2d):
    # optimized thresholds were persisted with the demo model
    assert 0 < model2d.thresholds.prob < 1
    assert model2d.thresholds.nms in (0.3, 0.4, 0.5)


def test_dense_sparse_same_on_pretrained(model2d):
    img, _ = synthetic_nuclei_2d((128, 128), seed=3)
    a, _ = model2d.predict_instances(img, sparse=True)
    b, _ = model2d.predict_instances(img, sparse=False)
    assert np.array_equal(a, b)


def test_big_equals_monolithic_pretrained(model2d):
    img, _ = synthetic_nuclei_2d((256, 256), seed=5)
    ref, _ = model2d.predict_instances(img)
    res, _ = model2d.predict_instances_big(img, axes="YX", block_size=160,
                                           min_overlap=32, context=32,
                                           show_progress=False)
    if ref.max() == 0:
        pytest.skip("no objects")
    m = matching(ref, res, thresh=0.99)
    assert m.accuracy == 1.0
