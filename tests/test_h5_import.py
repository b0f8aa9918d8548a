"""Keras HDF5 weight import: build the reference 2D topology in Keras
(stardist/models/model2d.py:310-349 + csbdeep unet_block), save h5 weights,
import into the flax model, and check forward-output agreement.

This validates the h5->flax mapping without the (unavailable) pretrained zoo
blobs, per the reference's flagship `from_pretrained` flow
(stardist/models/__init__.py:19-27)."""
import numpy as np
import pytest

from stardist_tpu.models import Config2D, StarDist2D

tfk = pytest.importorskip("tf_keras")  # legacy Keras 2: writes the real zoo HDF5 layout


def _keras_reference_model(cfg):
    """Keras replica of the reference StarDist2D._build topology
    (model2d.py:310-349; unet_block per csbdeep internal/blocks.py)."""
    L = tfk.layers

    inp = L.Input((None, None, cfg.n_channel_in), name="input")
    x = inp
    pooled = np.array([1, 1])
    while tuple(pooled) != tuple(cfg.grid):
        pool = 1 + (np.asarray(cfg.grid) > pooled)
        pooled *= pool
        for _ in range(cfg.unet_n_conv_per_depth):
            x = L.Conv2D(cfg.unet_n_filter_base, cfg.unet_kernel_size,
                         padding="same", activation=cfg.unet_activation)(x)
        x = L.MaxPooling2D(tuple(pool))(x)

    # unet_block
    skips = []
    base = cfg.unet_n_filter_base
    n_depth = cfg.unet_n_depth
    n_conv = cfg.unet_n_conv_per_depth
    for n in range(n_depth):
        for _ in range(n_conv):
            x = L.Conv2D(base * 2 ** n, cfg.unet_kernel_size, padding="same",
                         activation=cfg.unet_activation)(x)
        skips.append(x)
        x = L.MaxPooling2D(tuple(cfg.unet_pool))(x)
    for _ in range(n_conv - 1):
        x = L.Conv2D(base * 2 ** n_depth, cfg.unet_kernel_size, padding="same",
                     activation=cfg.unet_activation)(x)
    x = L.Conv2D(base * 2 ** max(0, n_depth - 1), cfg.unet_kernel_size,
                 padding="same", activation=cfg.unet_activation)(x)
    for n in reversed(range(n_depth)):
        x = L.Concatenate()([L.UpSampling2D(tuple(cfg.unet_pool))(x), skips[n]])
        for _ in range(n_conv - 1):
            x = L.Conv2D(base * 2 ** n, cfg.unet_kernel_size, padding="same",
                         activation=cfg.unet_activation)(x)
        x = L.Conv2D(base * 2 ** max(0, n - 1), cfg.unet_kernel_size,
                     padding="same",
                     activation=cfg.unet_activation if n > 0 else cfg.unet_last_activation)(x)

    if cfg.net_conv_after_unet > 0:
        x = L.Conv2D(cfg.net_conv_after_unet, cfg.unet_kernel_size,
                     name="features", padding="same",
                     activation=cfg.unet_activation)(x)
    prob = L.Conv2D(1, (1, 1), name="prob", padding="same",
                    activation="sigmoid")(x)
    dist = L.Conv2D(cfg.n_rays, (1, 1), name="dist", padding="same",
                    activation="linear")(x)
    return tfk.Model(inp, [prob, dist])


@pytest.mark.parametrize("grid,depth", [((2, 2), 2), ((1, 1), 1)])
def test_h5_roundtrip_forward_agreement(tmp_path, grid, depth):
    cfg = Config2D(n_rays=8, grid=grid, unet_n_depth=depth,
                   unet_n_filter_base=8, net_conv_after_unet=16,
                   train_patch_size=(32, 32), train_batch_size=1)
    keras_model = _keras_reference_model(cfg)
    h5 = tmp_path / "m" / "weights_best.h5"
    h5.parent.mkdir()
    keras_model.save_weights(str(h5))

    model = StarDist2D(cfg, name="h5imp", basedir=str(tmp_path / "flax"))
    model.load_weights(str(h5))

    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)
    prob_k, dist_k = [np.asarray(t) for t in keras_model(x)]
    prob_f, dist_f = [np.asarray(t) for t in
                      model.net.apply(model._variables(), x, train=False)]
    assert prob_f.shape == prob_k.shape and dist_f.shape == dist_k.shape
    assert np.max(np.abs(prob_f - prob_k)) < 1e-4
    assert np.max(np.abs(dist_f - dist_k)) < 1e-4


def test_h5_import_shape_mismatch_raises(tmp_path):
    cfg = Config2D(n_rays=8, grid=(1, 1), unet_n_depth=1,
                   unet_n_filter_base=8, net_conv_after_unet=16,
                   train_patch_size=(32, 32), train_batch_size=1)
    keras_model = _keras_reference_model(cfg)
    h5 = tmp_path / "weights_best.h5"
    keras_model.save_weights(str(h5))
    cfg2 = Config2D(n_rays=16, grid=(1, 1), unet_n_depth=1,
                    unet_n_filter_base=8, net_conv_after_unet=16,
                    train_patch_size=(32, 32), train_batch_size=1)
    model = StarDist2D(cfg2, name="h5bad", basedir=str(tmp_path / "flax"))
    with pytest.raises(ValueError):
        model.load_weights(str(h5))


def test_from_pretrained_url_zip(tmp_path, monkeypatch):
    """Full zoo flow without network: a reference-layout zip (folder with
    config.json + thresholds.json + Keras h5 weights) served via file:// URL —
    download, md5 check, cache, unzip, h5 import
    (reference stardist/models/__init__.py:19-27 + csbdeep from_pretrained)."""
    import hashlib
    import json
    import zipfile

    from stardist_tpu.models import register_model, register_aliases
    from stardist_tpu import models as _m
    saved = ({k: dict(v) for k, v in _m._MODELS.items()},
             {k: dict(v) for k, v in _m._ALIASES.items()})

    cfg = Config2D(n_rays=8, grid=(2, 2), unet_n_depth=1,
                   unet_n_filter_base=8, net_conv_after_unet=16,
                   train_patch_size=(32, 32), train_batch_size=1)
    keras_model = _keras_reference_model(cfg)
    mdir = tmp_path / "payload" / "2D_test_zoo"
    mdir.mkdir(parents=True)
    keras_model.save_weights(str(mdir / "weights_best.h5"))
    with open(mdir / "config.json", "w") as f:
        json.dump(cfg.to_dict(), f)
    with open(mdir / "thresholds.json", "w") as f:
        json.dump({"prob": 0.6, "nms": 0.3}, f)
    zip_path = tmp_path / "python_2D_test_zoo.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in mdir.rglob("*"):
            z.write(p, p.relative_to(mdir.parent))
    md5 = hashlib.md5(zip_path.read_bytes()).hexdigest()

    monkeypatch.setenv("STARDIST_TPU_MODEL_CACHE", str(tmp_path / "cache"))
    register_model(StarDist2D, "2D_test_zoo", zip_path.as_uri(), md5)
    register_aliases(StarDist2D, "2D_test_zoo", "Test zoo model")
    try:
        model = StarDist2D.from_pretrained("Test zoo model")
        assert model.thresholds.prob == 0.6 and model.thresholds.nms == 0.3
        rng = np.random.RandomState(0)
        x = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
        prob_k, _ = [np.asarray(t) for t in keras_model(x)]
        prob_f, _ = [np.asarray(t) for t in
                     model.net.apply(model._variables(), x, train=False)]
        assert np.max(np.abs(prob_f - prob_k)) < 1e-4
        # second load hits the cache (delete the zip to prove no re-download)
        zip_path.unlink()
        model2 = StarDist2D.from_pretrained("2D_test_zoo")
        assert model2.thresholds.prob == 0.6
    finally:
        _m._MODELS.clear(); _m._MODELS.update(saved[0])
        _m._ALIASES.clear(); _m._ALIASES.update(saved[1])


def test_h5_import_via_model_dir(tmp_path):
    """A model dir holding only config.json + Keras h5 weights loads like the
    reference (StarDist2D(None, name, basedir))."""
    import json

    cfg = Config2D(n_rays=8, grid=(2, 2), unet_n_depth=1,
                   unet_n_filter_base=8, net_conv_after_unet=16,
                   train_patch_size=(32, 32), train_batch_size=1)
    keras_model = _keras_reference_model(cfg)
    mdir = tmp_path / "kmodel"
    mdir.mkdir()
    keras_model.save_weights(str(mdir / "weights_best.h5"))
    with open(mdir / "config.json", "w") as f:
        json.dump(cfg.to_dict(), f)

    model = StarDist2D(None, name="kmodel", basedir=str(tmp_path))
    rng = np.random.RandomState(1)
    x = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
    prob_k, dist_k = [np.asarray(t) for t in keras_model(x)]
    prob_f, dist_f = [np.asarray(t) for t in
                      model.net.apply(model._variables(), x, train=False)]
    assert np.max(np.abs(prob_f - prob_k)) < 1e-4
