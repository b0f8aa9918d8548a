"""Fused (in-step device) target generation == classic host pipeline."""
import numpy as np
import pytest

from stardist_tpu.models import Config2D, StarDist2D
from stardist_tpu.models.model2d import StarDistData2D
from utils import synthetic_nuclei_2d


def _data(seed=0, n=3, shape=(128, 128)):
    imgs, lbls = [], []
    for i in range(n):
        img, lbl = synthetic_nuclei_2d(shape, seed=seed + i)
        imgs.append(img)
        lbls.append(lbl)
    return imgs, lbls


@pytest.mark.parametrize("grid", [(1, 1), (2, 2)])
def test_fused_targets_equal_classic(grid):
    imgs, lbls = _data()
    cfg = Config2D(n_rays=16, grid=grid, unet_n_depth=1, unet_n_filter_base=8,
                   net_conv_after_unet=8, train_patch_size=(64, 64),
                   train_batch_size=3)
    model = StarDist2D(cfg, name="fused2d", basedir=None)
    model.prepare_for_training()
    assert model._train_step_raw is not None
    fn = model._device_targets_fn()

    data = StarDistData2D(imgs, lbls, batch_size=3, n_rays=16, length=8,
                          patch_size=(64, 64), grid=grid)
    assert data.supports_raw
    for i in range(2):
        np.random.seed(100 + i)
        (x_c,), (prob_c, dist_c) = data[i]
        np.random.seed(100 + i)
        raw = data.raw_item(i)
        out = fn({k: np.asarray(v) for k, v in raw.items()})
        assert np.array_equal(np.asarray(raw["x"], np.float32), x_c.astype(np.float32))
        np.testing.assert_allclose(np.asarray(out["prob"]), prob_c, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["dist"]), dist_c, atol=1e-4)


def test_fused_targets_negative_labels():
    imgs, lbls = _data(seed=5)
    # mark a region with negative labels: losses must be disabled there
    lbls = [l.astype(np.int32) for l in lbls]
    lbls[0][:40, :40] = -1
    cfg = Config2D(n_rays=8, grid=(2, 2), unet_n_depth=1, unet_n_filter_base=8,
                   net_conv_after_unet=8, train_patch_size=(64, 64),
                   train_batch_size=3)
    model = StarDist2D(cfg, name="fused2dneg", basedir=None)
    model.prepare_for_training()
    fn = model._device_targets_fn()
    data = StarDistData2D(imgs, lbls, batch_size=3, n_rays=8, length=8,
                          patch_size=(64, 64), grid=(2, 2))
    for i in range(3):
        np.random.seed(200 + i)
        (x_c,), (prob_c, dist_c) = data[i]
        np.random.seed(200 + i)
        raw = data.raw_item(i)
        out = fn({k: np.asarray(v) for k, v in raw.items()})
        np.testing.assert_allclose(np.asarray(out["prob"]), prob_c, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["dist"]), dist_c, atol=1e-4)


def test_fused_targets_3d_equal_classic():
    from stardist_tpu.models import Config3D, StarDist3D
    from stardist_tpu.models.model3d import StarDistData3D
    from stardist_tpu.rays3d import Rays_GoldenSpiral
    from utils import synthetic_nuclei_3d

    imgs, lbls = [], []
    for i in range(2):
        im, lb = synthetic_nuclei_3d((24, 48, 48), seed=i)
        imgs.append(im)
        lbls.append(lb)
    rays = Rays_GoldenSpiral(16)
    cfg = Config3D(rays=rays, grid=(1, 2, 2), anisotropy=(2.0, 1.0, 1.0),
                   unet_n_depth=1, unet_n_filter_base=8,
                   train_patch_size=(16, 32, 32), train_batch_size=2)
    model = StarDist3D(cfg, name="fused3d", basedir=None)
    model.prepare_for_training()
    assert model._train_step_raw is not None
    fn = model._device_targets_fn()

    from stardist_tpu.rays3d import rays_from_json
    data = StarDistData3D(imgs, lbls, rays=rays_from_json(cfg.rays_json),
                          batch_size=2, length=4,
                          patch_size=(16, 32, 32), grid=(1, 2, 2),
                          anisotropy=(2.0, 1.0, 1.0))
    assert data.supports_raw
    for i in range(2):
        np.random.seed(300 + i)
        (x_c,), (prob_c, dist_c) = data[i]
        np.random.seed(300 + i)
        raw = data.raw_item(i)
        out = fn({k: np.asarray(v) for k, v in raw.items()})
        assert np.array_equal(np.asarray(raw["x"], np.float32), x_c.astype(np.float32))
        np.testing.assert_allclose(np.asarray(out["prob"]), prob_c, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["dist"]), dist_c, atol=1e-4)


def test_fused_training_runs_and_learns():
    imgs, lbls = _data(seed=9, n=2)
    cfg = Config2D(n_rays=8, grid=(2, 2), unet_n_depth=1, unet_n_filter_base=8,
                   net_conv_after_unet=8, train_patch_size=(64, 64),
                   train_batch_size=2, train_reduce_lr=None)
    model = StarDist2D(cfg, name="fused2dtrain", basedir=None)
    h = model.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]),
                    seed=0, epochs=2, steps_per_epoch=4)
    losses = np.asarray(h.history["loss"], float)
    assert losses.shape == (2,) and np.isfinite(losses).all()
