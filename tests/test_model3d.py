import numpy as np
import pytest

from stardist_tpu.models import Config3D, StarDist3D, StarDistData3D
from stardist_tpu.rays3d import Rays_GoldenSpiral, rays_from_json
from utils import synthetic_nuclei_3d


def _small_config(**kwargs):
    base = dict(rays=Rays_GoldenSpiral(16), grid=(1, 2, 2), unet_n_depth=1,
                unet_n_filter_base=8, net_conv_after_unet=16,
                train_patch_size=(16, 32, 32), train_batch_size=1,
                train_reduce_lr=None)
    base.update(kwargs)
    return Config3D(**base)


def _data(n=2, shape=(24, 48, 48)):
    imgs, lbls = [], []
    for i in range(n):
        img, lbl = synthetic_nuclei_3d(shape, seed=i)
        imgs.append(img)
        lbls.append(lbl.astype(np.int32))
    return imgs, lbls


def test_config_rays_roundtrip(tmp_path):
    cfg = _small_config()
    m = StarDist3D(cfg, name="m3", basedir=str(tmp_path))
    m2 = StarDist3D(None, name="m3", basedir=str(tmp_path))
    rays = rays_from_json(m2.config.rays_json)
    assert len(rays) == 16
    assert m2.config.n_rays == 16


def test_data_targets():
    imgs, lbls = _data(1)
    rays = Rays_GoldenSpiral(8)
    data = StarDistData3D(imgs, lbls, batch_size=1, rays=rays, length=2,
                          patch_size=(16, 32, 32), grid=(1, 2, 2))
    (x,), (prob, dist) = data[0]
    assert x.shape == (1, 16, 32, 32, 1)
    assert prob.shape == (1, 16, 16, 16, 1)
    assert dist.shape == (1, 16, 16, 16, 9)


def test_train_and_predict(tmp_path):
    imgs, lbls = _data(2)
    cfg = _small_config(train_epochs=1, train_steps_per_epoch=4)
    model = StarDist3D(cfg, name="tiny3", basedir=str(tmp_path))
    history = model.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]), seed=0)
    assert "loss" in history.history

    labels, details = model.predict_instances(imgs[0], prob_thresh=0.6)
    assert labels.shape == imgs[0].shape
    assert set(details.keys()) >= {"dist", "points", "prob", "rays_vertices", "rays_faces"}

    model2 = StarDist3D(None, name="tiny3", basedir=str(tmp_path))
    labels2, _ = model2.predict_instances(imgs[0], prob_thresh=0.6)
    assert np.array_equal(labels, labels2)


@pytest.mark.slow
def test_resnet_backbone(tmp_path):
    imgs, lbls = _data(1)
    cfg = Config3D(rays=Rays_GoldenSpiral(8), grid=(1, 2, 2), backbone="resnet",
                   resnet_n_blocks=2, resnet_n_filter_base=8, net_conv_after_resnet=16,
                   train_patch_size=(16, 32, 32), train_batch_size=1, train_reduce_lr=None)
    model = StarDist3D(cfg, name="res3", basedir=str(tmp_path))
    model.train(imgs, lbls, validation_data=(imgs, lbls), seed=0, epochs=1, steps_per_epoch=2)
    prob, dist = model.predict(imgs[0])
    assert prob.shape == tuple(s // g for s, g in zip(imgs[0].shape, (1, 2, 2)))
    assert dist.shape == prob.shape + (8,)


def test_dense_vs_sparse(tmp_path):
    imgs, lbls = _data(1)
    cfg = _small_config(train_epochs=1, train_steps_per_epoch=2)
    model = StarDist3D(cfg, name="ds3", basedir=str(tmp_path))
    model.train(imgs, lbls, validation_data=(imgs, lbls), seed=0)
    labels_s, _ = model.predict_instances(imgs[0], sparse=True, prob_thresh=0.6)
    labels_d, _ = model.predict_instances(imgs[0], sparse=False, prob_thresh=0.6)
    assert np.array_equal(labels_s, labels_d)


@pytest.mark.slow
def test_device_predict_matches_host_3d(tmp_path):
    """predict_instances_device (single fused dispatch: forward + extract +
    banded polyhedron NMS + raster on device) must reproduce the
    host-orchestrated predict_instances exactly — same label volume, same
    survivor set (3D analog of test_predict_paths.py
    test_device_predict_matches_host)."""
    imgs, lbls = _data(2)
    cfg = _small_config(train_epochs=1, train_steps_per_epoch=4)
    model = StarDist3D(cfg, name="dev3", basedir=str(tmp_path))
    model.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]), seed=0)
    img = imgs[0]
    ref_labels, ref = model.predict_instances(img, prob_thresh=0.5)
    labels, det = model.predict_instances_device(img, prob_thresh=0.5)
    assert labels.shape == ref_labels.shape
    assert len(det["prob"]) == len(ref["prob"])
    np.testing.assert_allclose(det["prob"], ref["prob"], rtol=1e-6)
    np.testing.assert_array_equal(det["points"], ref["points"])
    np.testing.assert_allclose(det["dist"], ref["dist"], rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(labels, ref_labels)


@pytest.mark.slow
def test_device_predict_capacity_retries_3d(tmp_path):
    """Tiny starting capacities: the flag-checked retry cascade must converge
    to the same result."""
    imgs, lbls = _data(1)
    cfg = _small_config(train_epochs=1, train_steps_per_epoch=4)
    model = StarDist3D(cfg, name="devr3", basedir=str(tmp_path))
    model.train(imgs, lbls, validation_data=(imgs, lbls), seed=0)
    img = imgs[0]
    ref_labels, ref = model.predict_instances(img, prob_thresh=0.4)
    old_k0 = model._extract_k0
    model._device_predict_caps = {"legacy": dict(K=512, M=256, W=8, P=64)}
    try:
        model._extract_k0 = 512
        labels, det = model.predict_instances_device(img, prob_thresh=0.4)
    finally:
        model._extract_k0 = old_k0
        model._device_predict_caps = {}
    assert len(det["prob"]) == len(ref["prob"])
    np.testing.assert_array_equal(labels, ref_labels)
