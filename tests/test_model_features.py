"""Feature-path tests: multiclass, shape completion, scale=, thread safety,
3D big-prediction (mirrors reference test coverage, SURVEY.md section 4)."""
import numpy as np
import pytest

from stardist_tpu.models import Config2D, StarDist2D, StarDistData2D
from stardist_tpu.matching import matching
from utils import synthetic_nuclei_2d, synthetic_nuclei_3d


def _data2d(n=2, shape=(96, 96)):
    imgs, lbls = [], []
    for i in range(n):
        img, lbl = synthetic_nuclei_2d(shape, seed=i)
        imgs.append(img)
        lbls.append(lbl.astype(np.int32))
    return imgs, lbls


def test_multiclass_training(tmp_path):
    imgs, lbls = _data2d(2)
    cfg = Config2D(n_rays=8, grid=(1, 1), n_classes=1, unet_n_depth=1,
                   unet_n_filter_base=4, net_conv_after_unet=8,
                   train_patch_size=(32, 32), train_batch_size=1, train_reduce_lr=None)
    model = StarDist2D(cfg, name="mc", basedir=str(tmp_path))
    assert model._is_multiclass()
    history = model.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]),
                          classes="auto", seed=0, epochs=1, steps_per_epoch=2)
    assert "prob_class_loss" in history.history
    labels, details = model.predict_instances(imgs[0], prob_thresh=0.7)
    assert "class_id" in details and "class_prob" in details


def test_multiclass_device_predict_matches_host(tmp_path):
    """predict_instances_device supports multiclass (VERDICT r2 item 10):
    labels, class ids and class probabilities agree with the host path
    (reference multiclass flow: stardist/models/model2d.py:109-119,512-563)."""
    imgs, lbls = _data2d(2, shape=(96, 96))
    cfg = Config2D(n_rays=16, grid=(2, 2), n_classes=1, unet_n_depth=2,
                   unet_n_filter_base=8, net_conv_after_unet=16,
                   train_patch_size=(64, 64), train_batch_size=2,
                   train_reduce_lr=None)
    model = StarDist2D(cfg, name="mcd", basedir=str(tmp_path))
    model.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]),
                classes="auto", seed=0, epochs=2, steps_per_epoch=6)
    img, _ = synthetic_nuclei_2d((96, 96), seed=7)
    labels_h, det_h = model.predict_instances(img, prob_thresh=0.6)
    labels_d, det_d = model.predict_instances_device(img, prob_thresh=0.6)
    assert "class_prob" in det_d and "class_id" in det_d
    assert np.array_equal(labels_h, labels_d)
    assert np.array_equal(det_h["class_id"], det_d["class_id"])
    assert np.allclose(det_h["class_prob"], det_d["class_prob"],
                       atol=1e-5)


def test_shape_completion_data():
    imgs, lbls = _data2d(1, shape=(128, 128))
    data = StarDistData2D(imgs, lbls, batch_size=1, n_rays=8, length=2,
                          patch_size=(128, 128), grid=(1, 1),
                          shape_completion=True, b=16)
    (x,), (prob, dist) = data[0]
    # completion crop: input and targets shrink by 2*b
    assert x.shape == (1, 96, 96, 1)
    assert prob.shape == (1, 96, 96, 1)
    assert dist.shape == (1, 96, 96, 9)


def test_shape_completion_training(tmp_path):
    imgs, lbls = _data2d(1, shape=(128, 128))
    cfg = Config2D(n_rays=8, grid=(1, 1), unet_n_depth=1, unet_n_filter_base=4,
                   net_conv_after_unet=8, train_patch_size=(96, 96),
                   train_batch_size=1, train_shape_completion=True,
                   train_completion_crop=16, train_reduce_lr=None)
    model = StarDist2D(cfg, name="sc", basedir=str(tmp_path))
    model.train(imgs, lbls, validation_data=(imgs, lbls), seed=0,
                epochs=1, steps_per_epoch=2)


@pytest.mark.slow
def test_scale_prediction(tmp_path):
    imgs, lbls = _data2d(2, shape=(128, 128))
    cfg = Config2D(n_rays=16, grid=(2, 2), unet_n_depth=2, unet_n_filter_base=8,
                   net_conv_after_unet=16, train_patch_size=(64, 64),
                   train_batch_size=2, train_reduce_lr=None)
    model = StarDist2D(cfg, name="sc2", basedir=str(tmp_path))
    model.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]), seed=0,
                epochs=2, steps_per_epoch=8)
    labels1, d1 = model.predict_instances(imgs[0], prob_thresh=0.45)
    labels2, d2 = model.predict_instances(imgs[0], prob_thresh=0.45, scale=2.0)
    if labels1.max() == 0 or labels2.max() == 0:
        pytest.skip("prediction too weak after short training")
    # scaled prediction must land in the unscaled coordinate frame
    assert labels2.shape == labels1.shape
    m = matching(labels1, labels2, thresh=0.3)
    assert m.n_pred > 0
    assert d2["points"].max() <= max(labels1.shape)


def test_data_generator_thread_safety():
    """Concurrent __getitem__ calls must not corrupt the index caches
    (reference tests/test_model2D.py:287-320)."""
    from concurrent.futures import ThreadPoolExecutor

    imgs, lbls = _data2d(4)
    data = StarDistData2D(imgs, lbls, batch_size=2, n_rays=8, length=32,
                          patch_size=(64, 64), grid=(1, 1), foreground_prob=0.9)
    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(lambda i: data[i], range(16)))
    for (x,), (prob, dist) in results:
        assert x.shape == (2, 64, 64, 1)
        assert np.isfinite(dist).all()


def test_predict_big_3d(tmp_path):
    from stardist_tpu.models import Config3D, StarDist3D
    from stardist_tpu.rays3d import Rays_GoldenSpiral

    img, lbl = synthetic_nuclei_3d((32, 64, 64), seed=0)
    cfg = Config3D(rays=Rays_GoldenSpiral(16), grid=(1, 2, 2), unet_n_depth=1,
                   unet_n_filter_base=8, net_conv_after_unet=16,
                   train_patch_size=(16, 32, 32), train_batch_size=1,
                   train_reduce_lr=None)
    model = StarDist3D(cfg, name="big3", basedir=str(tmp_path))
    model.train([img], [lbl.astype(np.int32)],
                validation_data=([img], [lbl.astype(np.int32)]),
                seed=0, epochs=1, steps_per_epoch=4)
    ref_labels, _ = model.predict_instances(img, prob_thresh=0.6)
    res_labels, polys = model.predict_instances_big(
        img, axes="ZYX", block_size=(32, 48, 48), min_overlap=(8, 16, 16),
        context=(4, 8, 8), prob_thresh=0.6, show_progress=False)
    assert res_labels.shape == img.shape
    if ref_labels.max() > 0:
        m = matching(ref_labels, res_labels, thresh=0.9)
        assert m.accuracy > 0.9


def test_tensorboard_image_panels(tmp_path):
    """train_tensorboard logs per-epoch IMAGE panels (input, prob true/pred,
    dist ray slices) alongside scalars — the reference wires
    CARETensorBoardImage for the same purpose (reference
    stardist/models/model2d.py:452-472)."""
    import glob
    import os
    img, lbl = synthetic_nuclei_2d((64, 64), seed=1)
    cfg = Config2D(n_rays=8, grid=(2, 2), unet_n_depth=1, unet_n_filter_base=4,
                   net_conv_after_unet=8, train_patch_size=(32, 32),
                   train_batch_size=1, train_tensorboard=True,
                   train_reduce_lr=None)
    model = StarDist2D(cfg, name="tb", basedir=str(tmp_path))
    model.train([img], [lbl], validation_data=([img], [lbl]),
                seed=0, epochs=1, steps_per_epoch=1)
    evs = glob.glob(os.path.join(str(tmp_path), "tb", "logs", "**",
                                 "events.*"), recursive=True)
    assert evs, "no TensorBoard event files written"
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    ea = EventAccumulator(os.path.dirname(evs[0]))
    ea.Reload()
    tags = ea.Tags()
    assert any(t.startswith("prob/pred") for t in tags.get("images", []))
    assert any(t.startswith("dist/pred") for t in tags.get("images", []))
    assert "loss" in tags.get("scalars", [])
