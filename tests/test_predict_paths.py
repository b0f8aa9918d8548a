"""Prediction-path edge cases: generators, return_predict, return_labels,
channel axes, receptive field."""
import numpy as np
import pytest

from stardist_tpu.models import Config2D, StarDist2D
from utils import synthetic_nuclei_2d


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pp")
    imgs, lbls = [], []
    for i in range(2):
        img, lbl = synthetic_nuclei_2d((96, 96), seed=i)
        imgs.append(img)
        lbls.append(lbl.astype(np.int32))
    cfg = Config2D(n_rays=16, grid=(2, 2), unet_n_depth=2, unet_n_filter_base=8,
                   net_conv_after_unet=16, train_patch_size=(64, 64),
                   train_batch_size=2, train_reduce_lr=None)
    m = StarDist2D(cfg, name="pp", basedir=str(tmp))
    m.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]), seed=0,
            epochs=2, steps_per_epoch=6)
    return m


def test_generator_protocol(model):
    """The generator yields progress markers then the result (napari contract,
    reference base.py:775-790)."""
    img, _ = synthetic_nuclei_2d((96, 96), seed=9)
    events = list(model._predict_instances_generator(img, prob_thresh=0.6))
    assert events[0] == "predict"
    assert "nms" in events
    labels, details = events[-1]
    assert isinstance(details, dict)


def test_return_predict(model):
    img, _ = synthetic_nuclei_2d((96, 96), seed=9)
    (labels, details), (prob, dist) = model.predict_instances(
        img, prob_thresh=0.6, return_predict=True)
    assert prob.shape == (48, 48)
    assert dist.shape == (48, 48, 16)


def test_return_labels_false(model):
    img, _ = synthetic_nuclei_2d((96, 96), seed=9)
    labels, details = model.predict_instances(img, prob_thresh=0.6, return_labels=False)
    assert labels is None and "points" in details


def test_channel_axis(model):
    img, _ = synthetic_nuclei_2d((96, 96), seed=9)
    labels1, _ = model.predict_instances(img, prob_thresh=0.6)
    labels2, _ = model.predict_instances(img[..., np.newaxis], axes="YXC", prob_thresh=0.6)
    assert np.array_equal(labels1, labels2)
    # channel-first input is permuted
    labels3, _ = model.predict_instances(img[np.newaxis], axes="CYX", prob_thresh=0.6)
    assert np.array_equal(labels1, labels3)


def test_receptive_field(model):
    rf = model._compute_receptive_field()
    assert len(rf) == 2
    assert all(lo > 0 and hi > 0 for lo, hi in rf)
    overlap = model._axes_tile_overlap("YX")
    assert all(o > 0 for o in overlap)


def test_guess_n_tiles(model):
    img = np.zeros((1024, 1024), np.float32)
    nt = model._guess_n_tiles(img)
    assert len(nt) == 2 and all(t >= 1 for t in nt)


def test_uncapped_candidate_extraction(model):
    """With max_candidates=None (default) extraction grows its top-K until
    every above-threshold pixel is a candidate — no silent truncation
    (reference processes all candidates, stardist/nms.py:135-183)."""
    import warnings as _warnings

    img, _ = synthetic_nuclei_2d((96, 96), seed=9)
    ref = model.predict_sparse(img, prob_thresh=0.3)
    n_ref = len(ref[0])
    assert n_ref > 32

    # force the initial bucket far below the candidate count: the grow-and-
    # retry loop must recover the exact same candidate set, warning-free
    old = model._extract_k0
    model._sparse_extract_fn.cache_clear()
    try:
        model._extract_k0 = 16
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            grown = model.predict_sparse(img, prob_thresh=0.3)
    finally:
        model._extract_k0 = old
        model._sparse_extract_fn.cache_clear()
    assert len(grown[0]) == n_ref
    np.testing.assert_array_equal(grown[2], ref[2])
    np.testing.assert_allclose(grown[0], ref[0], rtol=1e-6)

    # an explicit numeric cap still truncates, with a warning
    model._sparse_extract_fn.cache_clear()
    try:
        model._extract_k0 = 16
        with pytest.warns(UserWarning, match="exceeds max_candidates"):
            capped = model.predict_sparse(img, prob_thresh=0.3, max_candidates=16)
    finally:
        model._extract_k0 = old
        model._sparse_extract_fn.cache_clear()
    assert len(capped[0]) == 16


def test_odd_sizes_padding(model):
    """Non-divisible image sizes are padded and cropped transparently."""
    for shape in ((97, 101), (65, 130)):
        img, _ = synthetic_nuclei_2d((160, 160), seed=3)
        img = img[: shape[0], : shape[1]]
        labels, details = model.predict_instances(img, prob_thresh=0.6)
        assert labels.shape == shape
        if len(details["points"]):
            assert details["points"].max(axis=0)[0] < shape[0]
            assert details["points"].max(axis=0)[1] < shape[1]


def test_device_predict_matches_host(model):
    """predict_instances_device (single fused dispatch: forward + extract +
    NMS + raster on device) must reproduce the host-orchestrated
    predict_instances exactly — same label image, same survivor set."""
    for shape, seed in (((96, 96), 9), ((97, 101), 3)):
        img, _ = synthetic_nuclei_2d((160, 160), seed=seed)
        img = img[: shape[0], : shape[1]]
        ref_labels, ref = model.predict_instances(img, prob_thresh=0.6)
        labels, det = model.predict_instances_device(img, prob_thresh=0.6)
        assert labels.shape == ref_labels.shape
        assert len(det["prob"]) == len(ref["prob"])
        np.testing.assert_allclose(det["prob"], ref["prob"], rtol=1e-6)
        np.testing.assert_array_equal(det["points"], ref["points"])
        np.testing.assert_allclose(det["coord"], ref["coord"], rtol=1e-5,
                                   atol=1e-4)
        np.testing.assert_array_equal(labels, ref_labels)


def test_device_predict_capacity_retries(model):
    """Deliberately tiny starting capacities: the flag-checked retry cascade
    must converge to the same result (compile-cache-friendly buckets)."""
    img, _ = synthetic_nuclei_2d((96, 96), seed=9)
    ref_labels, ref = model.predict_instances(img, prob_thresh=0.3)
    old_k0 = model._extract_k0
    model._device_predict_caps = {"legacy": dict(K=1024, M=2048, W=16)}
    try:
        model._extract_k0 = 1024
        labels, det = model.predict_instances_device(img, prob_thresh=0.3)
    finally:
        model._extract_k0 = old_k0
        model._device_predict_caps = {}
    assert len(det["prob"]) == len(ref["prob"])
    np.testing.assert_array_equal(labels, ref_labels)


def test_device_predict_no_fetch_returns_device_arrays(model):
    import jax

    img, _ = synthetic_nuclei_2d((96, 96), seed=9)
    labels, det = model.predict_instances_device(img, prob_thresh=0.6,
                                                 fetch=False)
    assert isinstance(labels, jax.Array)
    assert isinstance(det["dist"], jax.Array)
    ref_labels, _ = model.predict_instances(img, prob_thresh=0.6)
    np.testing.assert_array_equal(np.asarray(labels).astype(np.int32),
                                  ref_labels)


def test_device_predict_device_array_input(model):
    """A pre-staged device array (already normalized, stride-divisible) runs
    with zero host-side image work and matches the numpy-input path."""
    import jax.numpy as jnp

    img, _ = synthetic_nuclei_2d((96, 96), seed=9)
    ref_labels, ref = model.predict_instances(img, prob_thresh=0.6)
    labels, det = model.predict_instances_device(jnp.asarray(img),
                                                 prob_thresh=0.6)
    np.testing.assert_array_equal(labels, ref_labels)
    np.testing.assert_array_equal(det["points"], ref["points"])
