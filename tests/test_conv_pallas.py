"""Pallas CHW conv kernel + CHW U-Net forward: equivalence with the XLA path.

On CPU the kernel runs in Pallas interpret mode — semantics identical to the
Mosaic TPU lowering (same program, reference interpreter)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stardist_tpu.ops.conv_pallas import conv2d_hcw


@pytest.mark.parametrize("C,Cout,H,W", [
    (1, 8, 17, 23),       # first conv, ragged shape
    (8, 8, 32, 64),
    (32, 16, 40, 130),    # ragged width > one tile
    (16, 32, 64, 512),
])
def test_conv2d_chw_matches_xla(C, Cout, H, W):
    rng = np.random.RandomState(C + Cout + H)
    x = rng.randn(H, C, W).astype(np.float32)
    w = (rng.randn(3, 3, C, Cout) * 0.1).astype(np.float32)
    b = rng.randn(Cout).astype(np.float32)
    y = np.asarray(conv2d_hcw(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                              act="relu"), np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.bfloat16).transpose(0, 2, 1)[None],
        jnp.asarray(w, jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)[0] + b
    ref = np.asarray(jnp.maximum(ref, 0).astype(jnp.bfloat16), np.float32
                     ).transpose(0, 2, 1)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(y - ref).max() / scale < 5e-3


def test_conv2d_chw_linear_and_elu():
    rng = np.random.RandomState(0)
    x = rng.randn(24, 4, 40).astype(np.float32)
    w = (rng.randn(3, 3, 4, 8) * 0.1).astype(np.float32)
    for act, post in (("linear", lambda v: v),
                      ("elu", lambda v: np.where(v > 0, v, np.expm1(v)))):
        y = np.asarray(conv2d_hcw(jnp.asarray(x), jnp.asarray(w), None,
                                  act=act), np.float32)
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x, jnp.bfloat16).transpose(0, 2, 1)[None],
            jnp.asarray(w, jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)[0]
        ref = post(np.asarray(ref, np.float32)).transpose(0, 2, 1)
        assert np.abs(y - ref).max() < 2e-2


def test_chw_forward_matches_flax():
    import dataclasses
    from stardist_tpu.models import Config2D, StarDist2D
    from stardist_tpu.models.unet_chw import chw_forward, supports_chw
    cfg = Config2D(n_rays=16, grid=(2, 2), unet_n_depth=2,
                   unet_n_filter_base=8, net_conv_after_unet=32,
                   train_patch_size=(64, 64), train_batch_size=1)
    m = StarDist2D(cfg, name=None, basedir=None)
    net = dataclasses.replace(m.net, dtype=jnp.bfloat16)
    assert supports_chw(net)
    rng = np.random.RandomState(1)
    x = rng.rand(64, 96, 1).astype(np.float32)
    ref = net.apply({"params": m.params}, jnp.asarray(x[None]), train=False)
    prob_ref = np.asarray(ref[0][0, ..., 0])
    dist_ref = np.asarray(ref[1][0])
    prob, dist = chw_forward(net, m.params, jnp.asarray(x))
    prob = np.asarray(prob)
    dist = np.moveaxis(np.asarray(dist), 0, -1)   # channel-major head
    assert dist.shape == dist_ref.shape
    assert np.abs(prob - prob_ref).max() < 1e-3
    assert np.abs(dist - dist_ref).max() < 1e-3 * max(1.0, np.abs(dist_ref).max())


def test_predict_instances_chw_path(tmp_path, monkeypatch):
    """predict_instances through the forced CHW path == the Flax path."""
    from stardist_tpu.models import Config2D, StarDist2D
    from tests.utils import synthetic_nuclei_2d
    np.random.seed(0)
    img, lbl = synthetic_nuclei_2d((96, 96), seed=3)
    cfg = Config2D(n_rays=16, grid=(2, 2), unet_n_depth=2,
                   unet_n_filter_base=8, net_conv_after_unet=32,
                   train_patch_size=(64, 64), train_batch_size=2,
                   train_reduce_lr=None)
    m = StarDist2D(cfg, name=None, basedir=None)
    m.train([img], [lbl], validation_data=([img], [lbl]),
            seed=0, epochs=1, steps_per_epoch=4)
    m.set_inference_precision("bfloat16")
    monkeypatch.setenv("STARDIST_TPU_CHW", "0")
    m._sparse_extract_fn.cache_clear()
    m._forward_fn.cache_clear()
    lab_ref, res_ref = m.predict_instances(img, prob_thresh=0.3)
    monkeypatch.setenv("STARDIST_TPU_CHW", "1")
    m._sparse_extract_fn.cache_clear()
    m._forward_fn.cache_clear()
    lab_chw, res_chw = m.predict_instances(img, prob_thresh=0.3)
    # bf16 rounding differences can flip borderline candidates; the object
    # sets must agree (same count, near-identical centers)
    assert len(res_chw["prob"]) == len(res_ref["prob"])
    assert np.abs(np.sort(res_chw["points"], 0)
                  - np.sort(res_ref["points"], 0)).max() <= 1


@pytest.mark.parametrize("C,Cout,D,H,W", [
    (1, 8, 5, 9, 19),     # first conv, ragged shape
    (8, 8, 4, 16, 40),
    (16, 8, 3, 24, 130),  # ragged width > one tile
])
def test_conv3d_chw_matches_xla(C, Cout, D, H, W):
    from stardist_tpu.ops.conv_pallas import conv3d_hcw
    rng = np.random.RandomState(C + Cout + H)
    x = rng.randn(D, H, C, W).astype(np.float32)
    w = (rng.randn(3, 3, 3, C, Cout) * 0.1).astype(np.float32)
    b = rng.randn(Cout).astype(np.float32)
    y = np.asarray(conv3d_hcw(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                              act="relu"), np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.bfloat16).transpose(0, 1, 3, 2)[None],
        jnp.asarray(w, jnp.bfloat16), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)[0] + b
    ref = np.asarray(jnp.maximum(ref, 0).astype(jnp.bfloat16), np.float32
                     ).transpose(0, 1, 3, 2)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(y - ref).max() / scale < 5e-3


def test_chw_forward_3d_matches_flax():
    import dataclasses
    from stardist_tpu.models import Config3D, StarDist3D
    from stardist_tpu.models.unet_chw import chw_forward, supports_chw
    cfg = Config3D(rays=8, grid=(1, 2, 2), unet_n_depth=1,
                   unet_n_filter_base=8, net_conv_after_unet=16,
                   train_patch_size=(16, 32, 32), train_batch_size=1)
    m = StarDist3D(cfg, name=None, basedir=None)
    net = dataclasses.replace(m.net, dtype=jnp.bfloat16)
    assert supports_chw(net)
    rng = np.random.RandomState(1)
    x = rng.rand(16, 32, 48, 1).astype(np.float32)
    ref = net.apply({"params": m.params}, jnp.asarray(x[None]), train=False)
    prob_ref = np.asarray(ref[0][0, ..., 0])
    dist_ref = np.asarray(ref[1][0])
    prob, dist = chw_forward(net, m.params, jnp.asarray(x))
    prob = np.asarray(prob)
    dist = np.moveaxis(np.asarray(dist), 0, -1)   # channel-major head
    assert dist.shape == dist_ref.shape
    assert prob.shape == prob_ref.shape
    assert np.abs(prob - prob_ref).max() < 1e-3
    assert np.abs(dist - dist_ref).max() < 1e-3 * max(1.0, np.abs(dist_ref).max())
