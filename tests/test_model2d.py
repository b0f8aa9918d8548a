import numpy as np
import pytest

from stardist_tpu.models import Config2D, StarDist2D, StarDistData2D
from stardist_tpu.matching import matching
from utils import synthetic_nuclei_2d, random_image


def _small_config(**kwargs):
    base = dict(n_rays=16, grid=(2, 2), unet_n_depth=2, unet_n_filter_base=8,
                net_conv_after_unet=16, train_patch_size=(64, 64),
                train_batch_size=2, train_reduce_lr=None)
    base.update(kwargs)
    return Config2D(**base)


def _data(n=3, shape=(96, 96)):
    imgs, lbls = [], []
    for i in range(n):
        img, lbl = synthetic_nuclei_2d(shape, seed=i)
        imgs.append(img)
        lbls.append(lbl.astype(np.int32))
    return imgs, lbls


def test_config_json_roundtrip(tmp_path):
    cfg = _small_config()
    m = StarDist2D(cfg, name="m", basedir=str(tmp_path))
    m2 = StarDist2D(None, name="m", basedir=str(tmp_path))
    assert vars(m2.config)["n_rays"] == 16
    assert tuple(m2.config.grid) == (2, 2)


def test_reference_config_schema_loads(tmp_path):
    """A config.json with the reference's exact keys must load."""
    import json
    ref_cfg = {
        "n_dim": 2, "axes": "YXC", "n_channel_in": 1, "n_channel_out": 33,
        "train_checkpoint": "weights_best.h5", "train_checkpoint_last": "weights_last.h5",
        "train_checkpoint_epoch": "weights_now.h5", "n_rays": 32, "grid": [2, 2],
        "backbone": "unet", "unet_n_depth": 3, "unet_kernel_size": [3, 3],
        "unet_n_filter_base": 32, "unet_n_conv_per_depth": 2, "unet_pool": [2, 2],
        "unet_activation": "relu", "unet_last_activation": "relu",
        "unet_batch_norm": False, "unet_dropout": 0.0, "unet_prefix": "",
        "net_conv_after_unet": 128, "net_input_shape": [None, None, 1],
        "net_mask_shape": [None, None, 1], "train_shape_completion": False,
        "train_completion_crop": 32, "train_patch_size": [256, 256],
        "train_background_reg": 0.0001, "train_dist_loss": "mae",
        "train_loss_weights": [1, 0.2], "train_epochs": 400,
        "train_steps_per_epoch": 100, "train_learning_rate": 0.0003,
        "train_batch_size": 4, "train_n_val_patches": None,
        "train_tensorboard": True,
        "train_reduce_lr": {"factor": 0.5, "patience": 40, "min_delta": 0},
        "use_gpu": False,
    }
    d = tmp_path / "refmodel"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(ref_cfg))
    (d / "thresholds.json").write_text(json.dumps({"prob": 0.48, "nms": 0.5}))
    m = StarDist2D(None, name="refmodel", basedir=str(tmp_path))
    assert m.config.n_rays == 32
    assert abs(m.thresholds.prob - 0.48) < 1e-6
    assert m.thresholds.nms == 0.5


def test_stardist_data_targets():
    imgs, lbls = _data(2)
    data = StarDistData2D(imgs, lbls, batch_size=2, n_rays=8, length=4,
                          patch_size=(64, 64), grid=(2, 2))
    (x,), (prob, dist) = data[0]
    assert x.shape == (2, 64, 64, 1)
    assert prob.shape == (2, 32, 32, 1)
    assert dist.shape == (2, 32, 32, 9)  # 8 rays + mask channel
    assert prob.min() >= 0 and prob.max() <= 1
    # determinism given the numpy seed (patch sampling uses np.random)
    np.random.seed(7)
    (x1,), (prob1, dist1) = data[0]
    np.random.seed(7)
    (x2,), (prob2, dist2) = data[0]
    assert np.allclose(x1, x2) and np.allclose(dist1, dist2)


def test_stardist_data_negative_labels():
    imgs, lbls = _data(1)
    lbls[0][:20] *= -1  # mark region as unlabeled
    data = StarDistData2D(imgs, lbls, batch_size=1, n_rays=8, length=2,
                          patch_size=(96, 96), grid=(1, 1))
    (x,), (prob, dist) = data[0]
    assert (prob == -1).any()


def test_train_and_predict(tmp_path):
    imgs, lbls = _data(3)
    cfg = _small_config(train_epochs=2, train_steps_per_epoch=8)
    model = StarDist2D(cfg, name="tiny", basedir=str(tmp_path))
    history = model.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]), seed=0)
    assert "loss" in history.history and len(history.history["loss"]) == 2
    # weights files written
    assert (model.logdir / "weights_last.h5").exists()

    labels, details = model.predict_instances(imgs[0], prob_thresh=0.5)
    assert labels.shape == imgs[0].shape
    assert set(details.keys()) >= {"coord", "points", "prob"}

    # reload and verify identical prediction
    model2 = StarDist2D(None, name="tiny", basedir=str(tmp_path))
    labels2, _ = model2.predict_instances(imgs[0], prob_thresh=0.5)
    assert np.array_equal(labels, labels2)


def test_dense_vs_sparse(tmp_path):
    imgs, lbls = _data(2)
    cfg = _small_config(train_epochs=1, train_steps_per_epoch=4)
    model = StarDist2D(cfg, name="ds", basedir=str(tmp_path))
    model.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]), seed=0)
    labels_s, d_s = model.predict_instances(imgs[0], sparse=True, prob_thresh=0.4)
    labels_d, d_d = model.predict_instances(imgs[0], sparse=False, prob_thresh=0.4)
    assert np.array_equal(labels_s, labels_d)
    assert np.allclose(np.sort(d_s["prob"]), np.sort(d_d["prob"]))


def test_tiled_vs_untiled(tmp_path):
    imgs, lbls = _data(1, shape=(128, 128))
    cfg = _small_config(train_epochs=1, train_steps_per_epoch=2)
    model = StarDist2D(cfg, name="tile", basedir=str(tmp_path))
    model.train(imgs, lbls, validation_data=(imgs, lbls), seed=0)
    p1, d1 = model.predict(imgs[0])
    p2, d2 = model.predict(imgs[0], n_tiles=(2, 2))
    assert np.allclose(p1, p2, atol=1e-4), np.abs(p1 - p2).max()
    assert np.allclose(d1, d2, atol=1e-3)
