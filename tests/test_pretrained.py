"""Golden-number integration tests on the committed demo models, pinned on
the reference's real bundled images (analog of the reference's pretrained
goldens: 120 labels / |fg-55985|<10 for 2D_versatile_fluo,
tests/test_model2D.py:17-23; 31 labels / |fg-32962|<10 for 3D_demo,
tests/test_model3D.py:17-23). The demo models here are small committed
networks trained on the same bundled images (models/examples/)."""
from pathlib import Path

import numpy as np
import pytest

from stardist_tpu.core.normalize import normalize
# aliased so pytest does not collect the data loaders as test functions
from stardist_tpu.data import test_image_nuclei_2d as _image_nuclei_2d
from stardist_tpu.data import test_image_nuclei_3d as _image_nuclei_3d
from stardist_tpu.models import StarDist2D, StarDist3D
from stardist_tpu.matching import matching
from utils import synthetic_nuclei_2d

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


def _real_2d():
    img, mask = _image_nuclei_2d(return_mask=True)
    if img.shape != (512, 512):
        pytest.skip("real bundled DSB image unavailable")
    return normalize(img.astype(np.float32), 1, 99.8), mask.astype(np.int32)


def _real_3d():
    img, mask = _image_nuclei_3d(return_mask=True)
    if img.shape != (31, 61, 57):
        pytest.skip("real bundled 3D volume unavailable")
    return normalize(img.astype(np.float32), 1, 99.8), mask.astype(np.int32)


def test_golden_2d(model2d):
    """Exact goldens on the real DSB2018 image (reference-grade tightness;
    pinned at demo-model training time on this image)."""
    img, lbl = _real_2d()
    labels, details = model2d.predict_instances(img)
    assert int(labels.max()) == 118
    assert abs(int(np.count_nonzero(labels)) - 41734) <= 50
    m = matching(lbl, labels, thresh=0.5)
    assert (m.tp, m.fp, m.fn) == (109, 9, 16)


@pytest.mark.slow
def test_golden_3d(model3d):
    img, lbl = _real_3d()
    labels, details = model3d.predict_instances(img)
    assert int(labels.max()) == 46
    assert abs(int(np.count_nonzero(labels)) - 31961) <= 80
    m = matching(lbl, labels, thresh=0.5)
    assert (m.tp, m.fp, m.fn) == (38, 8, 13)


def test_thresholds_optimized_2d(model2d):
    # optimize_thresholds ran on the real image at training time
    # (reference test_model2D.py:121-133 pins prob~0.5495, nms=0.5)
    assert abs(model2d.thresholds.prob - 0.49198) < 2e-3
    assert model2d.thresholds.nms == 0.3


def test_from_pretrained_registry(model2d):
    from stardist_tpu.models import get_registered_models
    models, aliases = get_registered_models(StarDist2D)
    assert "2D_demo" in models
    m = StarDist2D.from_pretrained("2D_demo")
    assert m.config.n_rays == model2d.config.n_rays


def test_dense_sparse_same_on_pretrained(model2d):
    img, _ = _real_2d()
    a, _ = model2d.predict_instances(img, sparse=True)
    b, _ = model2d.predict_instances(img, sparse=False)
    assert np.array_equal(a, b)


@pytest.mark.slow
def test_big_equals_monolithic_pretrained(model2d):
    img, _ = _real_2d()
    ref, _ = model2d.predict_instances(img)
    res, _ = model2d.predict_instances_big(img, axes="YX", block_size=288,
                                           min_overlap=64, context=64,
                                           show_progress=False)
    if ref.max() == 0:
        pytest.skip("no objects")
    m = matching(ref, res, thresh=0.99)
    assert m.accuracy == 1.0
