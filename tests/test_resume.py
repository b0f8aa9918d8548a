"""Optimizer-state checkpoint/resume: an interrupted training resumed from
train_state.msgpack reproduces the uninterrupted trajectory bitwise
(SURVEY §5 checkpoint row; extends the reference's weights-only Keras
checkpoints)."""
import numpy as np

from stardist_tpu.models import Config2D, StarDist2D
from utils import synthetic_nuclei_2d


def _cfg():
    return Config2D(n_rays=8, grid=(2, 2), unet_n_depth=1, unet_n_filter_base=8,
                    net_conv_after_unet=8, train_patch_size=(32, 32),
                    train_batch_size=2, train_reduce_lr=None)


def _data():
    imgs, lbls = [], []
    for i in range(3):
        img, lbl = synthetic_nuclei_2d((64, 64), seed=i)
        imgs.append(img)
        lbls.append(lbl.astype(np.int32))
    return imgs, lbls


def _leaves(params):
    import jax
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]


def test_resume_bitwise(tmp_path):
    imgs, lbls = _data()
    val = (imgs[:1], lbls[:1])

    # uninterrupted run: 4 epochs
    mA = StarDist2D(_cfg(), name="runA", basedir=str(tmp_path))
    histA = mA.train(imgs, lbls, validation_data=val, seed=7, epochs=4,
                     steps_per_epoch=3)

    # interrupted run: 2 epochs, then resume to 4
    mB = StarDist2D(_cfg(), name="runB", basedir=str(tmp_path))
    mB.train(imgs, lbls, validation_data=val, seed=7, epochs=2,
             steps_per_epoch=3)
    mB2 = StarDist2D(_cfg(), name="runB", basedir=str(tmp_path))
    histB = mB2.train(imgs, lbls, validation_data=val, seed=7, epochs=4,
                      steps_per_epoch=3, resume=True)

    # trajectory continues exactly: epochs 3-4 of the resumed run equal the
    # uninterrupted run's, and the full history is stitched together
    assert len(histB.history["loss"]) == 4
    np.testing.assert_array_equal(np.asarray(histA.history["loss"]),
                                  np.asarray(histB.history["loss"]))
    np.testing.assert_array_equal(np.asarray(histA.history["val_loss"]),
                                  np.asarray(histB.history["val_loss"]))
    for a, b in zip(_leaves(mA.params), _leaves(mB2.params)):
        np.testing.assert_array_equal(a, b)


def test_resume_already_complete(tmp_path):
    imgs, lbls = _data()
    m = StarDist2D(_cfg(), name="done", basedir=str(tmp_path))
    m.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]), seed=1,
            epochs=2, steps_per_epoch=2)
    m2 = StarDist2D(_cfg(), name="done", basedir=str(tmp_path))
    h = m2.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]), seed=1,
                 epochs=2, steps_per_epoch=2, resume=True)
    assert len(h.history["loss"]) == 2


def test_resume_without_state_warns(tmp_path):
    import pytest
    imgs, lbls = _data()
    m = StarDist2D(_cfg(), name="fresh", basedir=str(tmp_path))
    with pytest.warns(UserWarning, match="no train_state"):
        m.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]), seed=1,
                epochs=1, steps_per_epoch=2, resume=True)
