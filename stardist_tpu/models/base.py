"""StarDist model base: persistence, training loop, prediction pipelines.

TPU-native re-design of the reference ``StarDistBase``
(stardist/models/base.py:228-1211) plus the csbdeep ``BaseModel`` surface it
inherits: model directory with ``config.json`` / ``thresholds.json`` /
checkpoint weights, training with Adam + ReduceLROnPlateau, dense and sparse
(tiled) prediction, instance extraction, threshold optimization, receptive
field probing.

TPU-first design choices:
- training step is a single jitted function with batch data-parallel
  sharding over a ``jax.sharding.Mesh`` (NamedSharding on the batch axis);
- sparse prediction extracts the top-K above-threshold candidates *on
  device* (threshold + top_k) so only a small candidate list crosses to the
  host, instead of the full (H/g, W/g, n_rays+1) tensor;
- tiled prediction uses equal-shaped tiles so one compiled forward function
  serves every tile.
"""
from __future__ import annotations

import functools
import json
import math
import time
import warnings
import threading
from collections import namedtuple
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import serialization
from flax.core import freeze, unfreeze

from ..core.axes import axes_check_and_normalize, axes_dict, move_image_axes
from ..core.normalize import NoNormalizer, Normalizer, PercentileNormalizer
from ..core.tiling import tile_iterator, total_n_tiles
from ..nms import _ind_prob_thresh
from ..sample_patches import get_valid_inds
from ..utils import (
    _is_floatarray,
    _is_power_of_2,
    grid_divisible_patch_size,
    optimize_threshold,
)
from . import losses as L
from .unet import StarDistNet


# ---------------------------------------------------------------------------
# data sequences
# ---------------------------------------------------------------------------

class RollingSequence:
    """Epoch-reshuffled infinite batch index sequence (csbdeep RollingSequence
    semantics; reference stardist/models/base.py:25,129)."""

    def __init__(self, data_size, batch_size, length, shuffle=True, seed=0, keras_kwargs=None):
        self.data_size = int(data_size)
        self.batch_size = int(batch_size)
        self.length = int(length)
        self.shuffle = bool(shuffle)
        self.seed = int(seed)
        self._perm_cache = {}

    def __len__(self):
        return self.length

    def _perm(self, epoch):
        if not self.shuffle:
            return np.arange(self.data_size)
        if epoch not in self._perm_cache:
            self._perm_cache[epoch] = np.random.RandomState(self.seed + epoch).permutation(self.data_size)
            if len(self._perm_cache) > 64:
                self._perm_cache.pop(next(iter(self._perm_cache)))
        return self._perm_cache[epoch]

    def batch(self, i):
        pos = np.arange(i * self.batch_size, (i + 1) * self.batch_size)
        return np.array([self._perm(p // self.data_size)[p % self.data_size] for p in pos])

    def __getitem__(self, i):
        raise NotImplementedError

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class StarDistDataBase(RollingSequence):
    """Shared training-data machinery (reference base.py:129-224):
    foreground-biased patch center sampling with per-image caches, grid
    slicing, augmenter hook."""

    @property
    def supports_raw(self):
        """True when the fused device target generation can replace the
        classic host path for this data configuration."""
        return (self.n_classes is None
                and not getattr(self, "shape_completion", False))

    def raw_item(self, i):
        """Raw batch for the fused training step: patches + label image +
        per-patch unique positive labels (padded; capacity bucketed so the
        jitted step compiles for a few sizes only). Requires the subclass's
        ``_sample_batch``."""
        _, X, Y = self._sample_batch(i)
        X = np.stack(X)
        if X.ndim == len(self.patch_size) + 1:  # no channel axis
            X = np.expand_dims(X, -1)
        Yi = np.stack([y.astype(np.int32, copy=False) for y in Y])
        labs = [np.unique(y[y > 0]) for y in Yi]
        cap = 8
        need = max([1] + [len(l) for l in labs])
        while cap < need:
            cap *= 2
        labels = np.zeros((len(labs), cap), np.int32)
        for j, l in enumerate(labs):
            labels[j, :len(l)] = l
        return {"x": X.astype(np.float32, copy=False), "y": Yi,
                "labels": labels}

    def __init__(self, X, Y, n_rays, grid, batch_size, patch_size, length,
                 n_classes=None, classes=None, use_gpu=False, sample_ind_cache=True,
                 maxfilter_patch_size=None, augmenter=None, foreground_prob=0,
                 keras_kwargs=None):
        super().__init__(data_size=len(X), batch_size=batch_size, length=length, shuffle=True)

        if isinstance(X, (np.ndarray, tuple, list)):
            X = [x.astype(np.float32, copy=False) for x in X]

        if not (len(X) == len(Y) and len(X) > 0):
            raise ValueError("X and Y can't be empty and must have same length")

        if classes is None:
            classes = (None,) * len(X)
        elif n_classes is None:
            warnings.warn("Ignoring classes since n_classes is None")
        if len(classes) != len(X):
            raise ValueError("X and classes must have same length")

        self.n_classes, self.classes = n_classes, classes
        patch_size = grid_divisible_patch_size(patch_size, grid)

        nD = len(patch_size)
        assert nD in (2, 3)
        x_ndim = X[0].ndim
        assert x_ndim in (nD, nD + 1)

        if isinstance(X, (np.ndarray, tuple, list)) and isinstance(Y, (np.ndarray, tuple, list)):
            if not all(y.ndim == nD and x.ndim == x_ndim and x.shape[:nD] == y.shape for x, y in zip(X, Y)):
                raise ValueError("images and masks should have corresponding shapes/dimensions")
            if not all(x.shape[:nD] >= tuple(patch_size) for x in X):
                raise ValueError(f"Some images are too small for given patch_size {patch_size}")

        self.n_channel = None if x_ndim == nD else X[0].shape[-1]
        if self.n_channel is not None and isinstance(X, (np.ndarray, tuple, list)):
            assert all(x.shape[-1] == self.n_channel for x in X)

        assert 0 <= foreground_prob <= 1

        self.X, self.Y = X, Y
        self.n_rays = n_rays
        self.patch_size = patch_size
        self.ss_grid = (slice(None),) + tuple(slice(0, None, g) for g in grid)
        self.grid = tuple(grid)
        self.use_gpu = bool(use_gpu)
        if augmenter is None:
            augmenter = lambda *args: args
        if not callable(augmenter):
            raise ValueError("augmenter must be None or callable")
        self.augmenter = augmenter
        self.foreground_prob = foreground_prob

        from scipy.ndimage import maximum_filter
        self.max_filter = lambda y, patch_size: maximum_filter(y, patch_size, mode="constant")
        self.maxfilter_patch_size = maxfilter_patch_size if maxfilter_patch_size is not None else self.patch_size

        self.sample_ind_cache = sample_ind_cache
        self._ind_cache_fg = {}
        self._ind_cache_all = {}
        self.lock = threading.Lock()

    def get_valid_inds(self, k, foreground_prob=None):
        if foreground_prob is None:
            foreground_prob = self.foreground_prob
        foreground_only = np.random.uniform() < foreground_prob
        _ind_cache = self._ind_cache_fg if foreground_only else self._ind_cache_all
        if k in _ind_cache:
            inds = _ind_cache[k]
        else:
            patch_filter = (
                (lambda y, p: self.max_filter(y, self.maxfilter_patch_size) > 0)
                if foreground_only else None
            )
            inds = get_valid_inds(self.Y[k], self.patch_size, patch_filter=patch_filter)
            if self.sample_ind_cache:
                with self.lock:
                    _ind_cache[k] = inds
        if foreground_only and len(inds[0]) == 0:
            return self.get_valid_inds(k, foreground_prob=0)
        return inds

    def channels_as_tuple(self, x):
        if self.n_channel is None:
            return (x,)
        return tuple(x[..., i] for i in range(self.n_channel))


# ---------------------------------------------------------------------------
# pad/crop resizer
# ---------------------------------------------------------------------------

class StarDistPadAndCropResizer:
    """Pads the input at the end to network divisibility; crops the (grid-
    subsampled) output back; filters candidate points that fall into padding
    (reference base.py:1162-1211)."""

    def __init__(self, grid, mode="reflect", **kwargs):
        assert isinstance(grid, dict)
        self.mode = mode
        self.grid = grid
        self.kwargs = kwargs

    def before(self, x, axes, axes_div_by):
        assert all(a % g == 0 for g, a in zip((self.grid.get(a, 1) for a in axes), axes_div_by))
        axes = axes_check_and_normalize(axes, x.ndim)
        self.pad = {
            a: (0, (div_n - s % div_n) % div_n)
            for a, div_n, s in zip(axes, axes_div_by, x.shape)
        }
        x_pad = np.pad(x, tuple(self.pad[a] for a in axes), mode=self.mode, **self.kwargs)
        self.padded_shape = dict(zip(axes, x_pad.shape))
        self.padded_shape.pop("C", None)
        return x_pad

    def after(self, x, axes):
        axes = axes_check_and_normalize(axes, x.ndim)
        assert all(
            s_pad == s * g
            for s, s_pad, g in zip(
                x.shape,
                (self.padded_shape.get(a, _s) for a, _s in zip(axes, x.shape)),
                (self.grid.get(a, 1) for a in axes),
            )
        )
        crop = tuple(
            slice(0, -(math.floor(p[1] / g)) if p[1] >= g else None)
            for p, g in zip(
                (self.pad.get(a, (0, 0)) for a in axes),
                (self.grid.get(a, 1) for a in axes),
            )
        )
        return x[crop]

    def filter_points(self, ndim, points, axes):
        """Indices of points located inside the unpadded region."""
        assert points.ndim == 2
        axes = axes_check_and_normalize(axes, ndim)
        bounds = np.array(tuple(
            self.padded_shape[a] - self.pad[a][1]
            for a in axes if a.lower() in ("z", "y", "x")
        ))
        return np.where(np.all(points < bounds, 1))


# ---------------------------------------------------------------------------
# training state / step
# ---------------------------------------------------------------------------

class History:
    def __init__(self):
        self.history = {}

    def append(self, logs):
        for k, v in logs.items():
            self.history.setdefault(k, []).append(float(v))


def _make_optimizer(lr):
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


# ---------------------------------------------------------------------------
# model base
# ---------------------------------------------------------------------------

class StarDistBase:

    # initial top-K bucket for sparse candidate extraction; grows in
    # power-of-two steps when an image has more above-threshold pixels
    # (overridable per instance, e.g. tiny values in tests)
    _extract_k0 = 1 << 17

    def __init__(self, config, name=None, basedir="."):
        from .. import _enable_persistent_compilation_cache
        _enable_persistent_compilation_cache()
        self.config = config
        self.basedir = Path(basedir) if basedir is not None else None
        if config is None:
            if self.basedir is None or name is None:
                raise ValueError("config=None requires 'name' and 'basedir' to load a saved model")
            cfg_path = self.basedir / name / "config.json"
            if not cfg_path.exists():
                raise FileNotFoundError(f"config file doesn't exist: {cfg_path}")
            with open(cfg_path) as f:
                cfg_dict = json.load(f)
            self.config = self._config_class(**_strip_derived(cfg_dict))
        else:
            if not config.is_valid():
                raise ValueError("Invalid configuration")

        if name is None:
            import datetime
            name = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S.%f")
        self.name = name
        self._model_prepared = False

        self.net = self._build()
        self.params = self._init_params()
        self.opt_state = None

        if self.basedir is not None:
            self.logdir.mkdir(parents=True, exist_ok=True)
            if config is not None:
                with open(self.logdir / "config.json", "w") as f:
                    json.dump(self.config.to_dict(), f)
            else:
                self._find_and_load_weights()

        # thresholds (reference base.py:230-252)
        threshs = dict(prob=None, nms=None)
        if self.basedir is not None:
            try:
                with open(self.logdir / "thresholds.json") as f:
                    threshs = json.load(f)
                print("Loading thresholds from 'thresholds.json'.")
                if threshs.get("prob") is None or not (0 < threshs.get("prob") < 1):
                    print("- Invalid 'prob' threshold (%s), using default value." % str(threshs.get("prob")))
                    threshs["prob"] = None
                if threshs.get("nms") is None or not (0 < threshs.get("nms") < 1):
                    print("- Invalid 'nms' threshold (%s), using default value." % str(threshs.get("nms")))
                    threshs["nms"] = None
            except FileNotFoundError:
                pass
        self.thresholds = dict(
            prob=0.5 if threshs.get("prob") is None else threshs["prob"],
            nms=0.4 if threshs.get("nms") is None else threshs["nms"],
        )
        print("Using default values: prob_thresh={prob:g}, nms_thresh={nms:g}.".format(
            prob=self.thresholds.prob, nms=self.thresholds.nms))

    # -- misc properties ----------------------------------------------------

    @property
    def logdir(self):
        return self.basedir / self.name

    @property
    def thresholds(self):
        return self._thresholds

    @thresholds.setter
    def thresholds(self, d):
        self._thresholds = namedtuple("Thresholds", d.keys())(*d.values())

    def _is_multiclass(self):
        return self.config.n_classes is not None

    # -- device-path capacity persistence ------------------------------------
    # The fused device-predict dispatch sizes its static capacities (top-K,
    # band widths, pair slots, ...) from the candidate field; each distinct
    # combination is one XLA compile. Persisting the learned values next to
    # the model (thresholds.json-style) lets a fresh process dispatch the
    # warm variant directly instead of walking the capacity-retry ladder.

    def _load_device_caps(self):
        """Load the workload-keyed capacity map: {workload_key: {cap: int}}.
        Caps are keyed by the padded input shape so alternating image sizes
        don't overwrite each other's learned capacities (and re-trigger
        compiles). Legacy flat files (one cap dict) load under one key."""
        if self.basedir is None:
            return {}
        try:
            import json
            with open(self.logdir / "device_caps.json") as f:
                raw = json.load(f)
            if raw and all(isinstance(v, dict) for v in raw.values()):
                return {k: {ck: int(cv) for ck, cv in v.items()}
                        for k, v in raw.items()}
            # legacy flat single-workload file
            return {"legacy": {k: int(v) for k, v in raw.items()
                               if not isinstance(v, list)}}
        except (OSError, ValueError, TypeError):
            return {}

    def _device_caps_for(self, key):
        """The mutable caps dict for one workload key (padded input shape)."""
        caps_map = getattr(self, "_device_predict_caps", None)
        if caps_map is None:
            caps_map = self._device_predict_caps = self._load_device_caps()
        caps = caps_map.get(key)
        if caps is None:
            # seed a new workload from the legacy entry if present
            caps = caps_map[key] = dict(caps_map.get("legacy", {}))
        return caps

    def _save_device_caps(self, caps_map):
        """Persist the caps map atomically (tmp + os.replace): the multihost
        drivers run several processes against one model dir, and a torn
        concurrent write must never corrupt the file. Skips the write when
        nothing changed since the last save."""
        if self.basedir is None:
            return
        try:
            import json
            import os
            payload = json.dumps(caps_map, sort_keys=True)
            if payload == getattr(self, "_device_caps_saved", None):
                return
            self.logdir.mkdir(parents=True, exist_ok=True)
            tmp = self.logdir / f"device_caps.json.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(payload)
            os.replace(tmp, self.logdir / "device_caps.json")
            self._device_caps_saved = payload
        except OSError:  # pragma: no cover - persistence is best-effort
            pass

    @property
    def _config_class(self):
        raise NotImplementedError()

    def _build(self):
        cfg = self.config
        kwargs = dict(
            n_dim=cfg.n_dim, n_rays=cfg.n_rays, grid=tuple(cfg.grid),
            n_classes=cfg.n_classes, backbone=cfg.backbone,
        )
        for k, v in vars(cfg).items():
            if k.startswith("unet_") or k.startswith("resnet_") or k.startswith("net_conv_after"):
                if k in StarDistNet.__dataclass_fields__:
                    if isinstance(v, list):
                        v = tuple(v)
                    kwargs[k] = v
        return StarDistNet(**kwargs)

    def _init_params(self, seed=42):
        cfg = self.config
        div_by = self._axes_div_by(cfg.axes.replace("C", ""))
        shape = (1,) + tuple(2 * d for d in div_by) + (cfg.n_channel_in,)
        variables = self.net.init(jax.random.PRNGKey(seed), jnp.zeros(shape, jnp.float32), train=False)
        self._extra_vars = {k: v for k, v in variables.items() if k != "params"}
        return variables["params"]

    def _variables(self, params=None):
        v = dict(self._extra_vars)
        v["params"] = self.params if params is None else params
        return v

    # -- weights persistence -------------------------------------------------

    def save_weights(self, name="weights_best.h5"):
        data = serialization.to_bytes({"params": self.params, **self._extra_vars})
        (self.logdir / name).write_bytes(data)

    def load_weights(self, name="weights_best.h5"):
        path = self.logdir / name if not Path(name).is_absolute() else Path(name)
        raw = path.read_bytes()
        if raw[:4] == b"\x89HDF":
            self.params = self._import_keras_h5(path)
            return
        template = {"params": self.params, **self._extra_vars}
        restored = serialization.from_bytes(template, raw)
        self.params = restored["params"]
        self._extra_vars = {k: v for k, v in restored.items() if k != "params"}

    # -- Keras HDF5 import ---------------------------------------------------

    def _flax_conv_slots(self):
        """Ordered conv-parameter paths of the flax net, in construction
        (= forward topological) order — mirrors StarDistNet.__call__ and the
        reference Keras build (stardist/models/model2d.py:310-349,
        csbdeep unet_block). Returns a list of path tuples into params, each
        addressing a module with kernel+bias."""
        net = self.net
        grid = tuple(net.grid)
        slots = []
        outer = 0
        if net.backbone != "unet":
            raise NotImplementedError(
                "Keras HDF5 import currently supports the unet backbone only")
        if net.unet_batch_norm:
            raise NotImplementedError(
                "Keras HDF5 import with batch_norm is not supported yet")
        # grid pre-pooling convs
        pooled = np.ones(net.n_dim, int)
        while tuple(pooled) != grid:
            pool = 1 + (np.asarray(grid) > pooled)
            pooled *= pool
            for _ in range(net.unet_n_conv_per_depth):
                slots.append((f"ConvBlock_{outer}", "Conv_0"))
                outer += 1
        # unet_block: down path, middle, up path
        inner = 0
        for _n in range(net.unet_n_depth):
            for _ in range(net.unet_n_conv_per_depth):
                slots.append(("UNetBackbone_0", f"ConvBlock_{inner}", "Conv_0"))
                inner += 1
        for _ in range(net.unet_n_conv_per_depth):      # middle: n_conv convs
            slots.append(("UNetBackbone_0", f"ConvBlock_{inner}", "Conv_0"))
            inner += 1
        for _n in range(net.unet_n_depth):
            for _ in range(net.unet_n_conv_per_depth):
                slots.append(("UNetBackbone_0", f"ConvBlock_{inner}", "Conv_0"))
                inner += 1
        named = {}
        if net.net_conv_after_unet > 0:
            named["features"] = (f"ConvBlock_{outer}", "Conv_0")
            slots.append(named["features"])
            outer += 1
        named["prob"] = ("head_prob",)
        named["dist"] = ("head_dist",)
        slots.append(named["prob"])
        slots.append(named["dist"])
        if self._is_multiclass():
            if net.net_conv_after_unet > 0:
                named["features_class"] = (f"ConvBlock_{outer}", "Conv_0")
                slots.append(named["features_class"])
                outer += 1
            named["prob_class"] = ("head_prob_class",)
            slots.append(named["prob_class"])
        return slots, named

    def _import_keras_h5(self, path):
        """Map a Keras ``save_weights`` HDF5 file (reference zoo layout,
        csbdeep-built unet topology) onto the flax param tree.

        Named layers ('features', 'prob', 'dist', 'features_class',
        'prob_class' — reference model2d.py:330-347) are pinned by name; the
        remaining conv layers match the flax conv slots in forward
        (topological) order, with shape checks at every position."""
        import h5py

        with h5py.File(path, "r") as f:
            g = f["model_weights"] if "model_weights" in f else f
            if "layer_names" not in g.attrs:
                raise ValueError(f"not a Keras weights HDF5 file: {path}")
            layer_names = [n.decode() if isinstance(n, bytes) else n
                           for n in g.attrs["layer_names"]]
            entries = []
            for ln in layer_names:
                lg = g[ln]
                wnames = [n.decode() if isinstance(n, bytes) else n
                          for n in lg.attrs.get("weight_names", [])]
                if not wnames:
                    continue
                entries.append((ln, [np.asarray(lg[wn]) for wn in wnames]))

        slots, named = self._flax_conv_slots()

        # split keras entries into name-pinned and anonymous
        assign = {}      # path tuple -> [kernel, bias]
        anon = []
        for ln, ws in entries:
            if len(ws) != 2:
                raise NotImplementedError(
                    f"layer '{ln}' has {len(ws)} weights; only conv "
                    "kernel+bias layers are supported")
            if ln in named:
                assign[named[ln]] = ws
            else:
                anon.append((ln, ws))
        open_slots = [s for s in slots if s not in assign]
        if len(anon) != len(open_slots):
            raise ValueError(
                f"Keras file has {len(anon)} unnamed conv layers but the "
                f"network expects {len(open_slots)} "
                f"({[ln for ln, _ in anon]} vs {open_slots})")
        for (ln, ws), s in zip(anon, open_slots):
            assign[s] = ws

        params = _to_mutable(self.params)
        for s, (kernel, bias) in assign.items():
            node = params
            for k in s:
                node = node[k]
            cur_k, cur_b = node["kernel"], node["bias"]
            if tuple(cur_k.shape) != tuple(kernel.shape) or \
                    tuple(cur_b.shape) != tuple(bias.shape):
                raise ValueError(
                    f"shape mismatch at {s}: flax {tuple(cur_k.shape)}/"
                    f"{tuple(cur_b.shape)} vs h5 {tuple(kernel.shape)}/"
                    f"{tuple(bias.shape)}")
            node["kernel"] = jnp.asarray(kernel, jnp.float32)
            node["bias"] = jnp.asarray(bias, jnp.float32)
        return params

    def _find_and_load_weights(self, prefer="best"):
        from itertools import chain
        weights_ext = ("*.h5", "*.hdf5", "*.msgpack", "*.weights")
        weights_files = chain(*(sorted(self.logdir.glob(ext)) for ext in weights_ext))
        weights_files = [f for f in weights_files if f.is_file()]
        if len(weights_files) == 0:
            warnings.warn(f"Couldn't find any network weights ({', '.join(weights_ext)}) in {self.logdir}.")
            return
        weights_preferred = [f for f in weights_files if prefer in f.name]
        weights_chosen = (weights_preferred + weights_files)[0]
        print(f"Loading network weights from '{weights_chosen.name}'.")
        self.load_weights(weights_chosen.name)

    # -- training-state checkpoint / resume -----------------------------------

    def _save_train_state(self, epoch, jax_rng, lr, best_ckpt, best_plateau,
                          plateau_wait, history_dict, np_state):
        """Persist the full training trajectory state (params + optimizer
        state + step/epoch + rngs + LR/plateau trackers + history) so an
        interrupted training can resume bitwise (SURVEY §5 checkpoint row;
        the reference only checkpoints weights via Keras ModelCheckpoint)."""
        state = {
            "epoch": np.int64(epoch),
            "jax_rng": np.asarray(jax_rng),
            "lr": np.float64(lr),
            "best_ckpt": np.float64(best_ckpt),
            "best_plateau": np.float64(best_plateau),
            "plateau_wait": np.int64(plateau_wait),
            "history": {k: np.asarray(v, np.float64)
                        for k, v in history_dict.items()},
            "params": np.frombuffer(
                serialization.to_bytes(self.params), np.uint8),
            "opt_state": np.frombuffer(
                serialization.to_bytes(self.opt_state), np.uint8),
        }
        if np_state is not None:
            state["np_rng"] = {
                "keys": np.asarray(np_state[1], np.uint32),
                "pos": np.int64(np_state[2]),
                "has_gauss": np.int64(np_state[3]),
                "cached_gaussian": np.float64(np_state[4]),
            }
        (self.logdir / "train_state.msgpack").write_bytes(
            serialization.to_bytes(state))

    def _load_train_state(self):
        path = self.logdir / "train_state.msgpack" if self.basedir is not None else None
        if path is None or not path.exists():
            return None
        return serialization.msgpack_restore(path.read_bytes())

    # -- training -------------------------------------------------------------

    def prepare_for_training(self, optimizer=None):
        """Set up the optimizer and jitted, data-parallel training step."""
        cfg = self.config
        if optimizer is None:
            optimizer = _make_optimizer(cfg.train_learning_rate)
        self.optimizer = optimizer
        self.opt_state = optimizer.init(self.params)
        loss_weights = tuple(cfg.train_loss_weights)
        dist_kind = cfg.train_dist_loss
        reg_weight = float(cfg.train_background_reg)
        multiclass = self._is_multiclass()
        class_weights = tuple(getattr(cfg, "train_class_weights", (1, 1)))
        n_rays = cfg.n_rays
        net = self.net

        def loss_and_metrics(params, batch, rng):
            x = batch["x"]
            prob_true = batch["prob"]
            dist_and_mask = batch["dist"]
            dist_true = dist_and_mask[..., :n_rays]
            dist_mask = dist_and_mask[..., n_rays:]
            variables = dict(self._extra_vars)
            variables["params"] = params
            outs = net.apply(variables, x, train=True, rngs={"dropout": rng})
            prob_pred, dist_pred = outs[0], outs[1]
            lp = L.prob_loss(prob_true[..., 0], prob_pred[..., 0])
            ld = L.dist_loss(dist_true, dist_mask, dist_pred, kind=dist_kind, reg_weight=reg_weight)
            loss = loss_weights[0] * lp + loss_weights[1] * ld
            metrics = {
                "loss": loss,
                "prob_loss": lp,
                "dist_loss": ld,
                "prob_kld": L.kld_metric(prob_true[..., 0], prob_pred[..., 0]),
                "dist_relevant_mae": L.relevant_mae(dist_true, dist_mask, dist_pred),
                "dist_relevant_mse": L.relevant_mse(dist_true, dist_mask, dist_pred),
                "dist_dist_iou_metric": L.dist_iou_metric(dist_true, dist_mask, dist_pred),
            }
            if multiclass:
                lc = L.class_loss(batch["prob_class"], outs[2], class_weights)
                loss = loss + loss_weights[2] * lc
                metrics["loss"] = loss
                metrics["prob_class_loss"] = lc
            return loss, metrics

        @jax.jit
        def train_step(params, opt_state, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(loss_and_metrics, has_aux=True)(params, batch, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        @jax.jit
        def eval_step(params, batch, rng):
            _, metrics = loss_and_metrics(params, batch, rng)
            return metrics

        # fused path: raw (x, labels) batches, targets (EDT prob + star
        # distances) computed inside the SAME jit as the update — per step
        # only the raw patches cross the host->device link and no target
        # tensors ever come back (the classic path downloads them from the
        # target-gen kernels and re-uploads for the step)
        targets_fn = self._device_targets_fn()
        if targets_fn is not None:
            @jax.jit
            def train_step_raw(params, opt_state, raw, rng):
                batch = targets_fn(raw)
                (loss, metrics), grads = jax.value_and_grad(
                    loss_and_metrics, has_aux=True)(params, batch, rng)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, metrics
            self._train_step_raw = train_step_raw
        else:
            self._train_step_raw = None

        self._train_step = train_step
        self._eval_step = eval_step
        self._setup_data_sharding()
        self._model_prepared = True

    def _setup_data_sharding(self):
        """Batch data-parallelism: shard batches over all devices when the
        batch size divides the device count."""
        from ..parallel.mesh import data_parallel_sharding
        self._batch_sharding, self._replicated_sharding = data_parallel_sharding(
            self.config.train_batch_size)
        if self._replicated_sharding is not None:
            self.params = jax.device_put(self.params, self._replicated_sharding)

    def _put_batch(self, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self._batch_sharding is not None:
            n_dev = self._batch_sharding.mesh.size
            if all(v.shape[0] % n_dev == 0 for v in batch.values()):
                batch = {k: jax.device_put(v, self._batch_sharding) for k, v in batch.items()}
        return batch

    def _fit(self, data_train, data_val_batch, epochs, steps_per_epoch,
             resume=False):
        """Training loop: per-step jitted update, per-epoch validation,
        ReduceLROnPlateau + best/last checkpoints (reference
        prepare_for_training callbacks, base.py:291-368).

        ``resume=True`` restores the full training state saved each epoch in
        ``train_state.msgpack`` (params, optimizer state, jax rng, LR/plateau
        trackers, history, and the numpy global RNG state captured at the
        epoch boundary of the data stream) and continues with a trajectory
        bitwise-identical to an uninterrupted run."""
        cfg = self.config
        rng = jax.random.PRNGKey(0)
        history = History()
        best_ckpt = np.inf       # best monitor value for 'weights_best'
        best_plateau = np.inf    # best monitor value for LR plateau detection
        rlrop = cfg.train_reduce_lr
        plateau_wait, lr = 0, float(cfg.train_learning_rate)
        factor = patience = min_delta = None
        if rlrop is not None:
            factor = float(rlrop.get("factor", 0.5))
            patience = int(rlrop.get("patience", 10))
            min_delta = float(rlrop.get("min_delta", rlrop.get("epsilon", 0)))

        start_epoch = 0
        resume_state = None
        if resume:
            resume_state = self._load_train_state()
            if resume_state is None:
                warnings.warn("resume=True but no train_state.msgpack found; "
                              "starting from scratch")
            else:
                start_epoch = int(resume_state["epoch"])
                if start_epoch >= epochs:
                    print(f"resume: training already completed ({start_epoch}/{epochs} epochs)")
                    history.history = {k: list(v) for k, v in
                                       resume_state["history"].items()}
                    return history
                rng = jnp.asarray(resume_state["jax_rng"], jnp.uint32)
                lr = float(resume_state["lr"])
                best_ckpt = float(resume_state["best_ckpt"])
                best_plateau = float(resume_state["best_plateau"])
                plateau_wait = int(resume_state["plateau_wait"])
                history.history = {k: list(v) for k, v in
                                   resume_state["history"].items()}
                if "np_rng" in resume_state:
                    np.random.set_state(_np_rng_state_from(resume_state["np_rng"]))
                self.opt_state = serialization.from_bytes(
                    self.opt_state, bytes(resume_state["opt_state"]))
                self.params = serialization.from_bytes(
                    self.params, bytes(resume_state["params"]))

        val_batch = self._put_batch(data_val_batch) if data_val_batch is not None else None

        # observability: JSONL history + optional TensorBoard scalars
        # (reference wires Keras TensorBoard callbacks, base.py:351-366)
        jsonl_path = tb_writer = None
        if self.basedir is not None:
            log_dir = self.logdir / "logs"
            log_dir.mkdir(parents=True, exist_ok=True)
            jsonl_path = log_dir / "history.jsonl"
            if getattr(cfg, "train_tensorboard", False):
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    tb_writer = SummaryWriter(log_dir=str(log_dir))
                except Exception:
                    tb_writer = None

        # background prefetch: overlap host-side patch/target generation with
        # the device train step (the reference uses keras multi-worker data
        # loading for the same purpose, model2d.py:434-439)
        import queue as _queue

        prefetch_q = _queue.Queue(maxsize=4)
        n_total_steps = epochs * steps_per_epoch
        stop_flag = []
        # np.random state snapshots at each epoch's first data item — the
        # producer runs ahead of the consumer, so the state must be captured
        # in the data stream (not at checkpoint-save time) for bitwise resume
        epoch_np_rng = {}
        epoch_np_rng_lock = threading.Lock()

        def _producer():
            for s in range(start_epoch * steps_per_epoch, n_total_steps):
                if stop_flag:
                    return
                if s % steps_per_epoch == 0:
                    with epoch_np_rng_lock:
                        epoch_np_rng[s // steps_per_epoch] = np.random.get_state()
                try:
                    prefetch_q.put(data_train[s])
                except Exception as e:  # surface errors in the consumer
                    prefetch_q.put(e)
                    return
            # boundary state AFTER the last item: where a longer run's next
            # epoch would start — needed to resume past this run's last epoch
            with epoch_np_rng_lock:
                epoch_np_rng[epochs] = np.random.get_state()

        producer = threading.Thread(target=_producer, daemon=True)
        producer.start()

        trackers = dict(best_ckpt=best_ckpt, best_plateau=best_plateau,
                        plateau_wait=plateau_wait, lr=lr)
        try:
            self._fit_epochs(
                epochs, steps_per_epoch, prefetch_q, rng, history,
                jsonl_path, tb_writer, trackers, factor, patience, min_delta,
                rlrop, val_batch, start_epoch, epoch_np_rng, epoch_np_rng_lock)
        finally:
            if tb_writer is not None:
                tb_writer.close()   # flush buffered scalar/image events
            stop_flag.append(True)
            try:
                while True:
                    prefetch_q.get_nowait()
            except _queue.Empty:
                pass
        self._training_finished()
        return history

    def _tb_log_images(self, tb_writer, val_batch, step, n_images=3):
        """Per-epoch TensorBoard image panels on the validation batch,
        mirroring the reference's CARETensorBoardImage wiring (reference
        stardist/models/model2d.py:452-472, model3d.py:547-575): input,
        true vs predicted object probability, and three evenly spaced
        star-dist ray channels (plus the class map when multiclass). 3D
        volumes log their middle z-slice."""

        def panels(arr):
            a = np.asarray(jax.device_get(arr))[:n_images]
            if a.ndim == 5:                      # (B, Z, Y, X, C) -> mid z
                a = a[:, a.shape[1] // 2]
            return a

        x = panels(val_batch["x"])
        outs = self.net.apply(self._variables(),
                              jnp.asarray(val_batch["x"])[:n_images],
                              train=False)
        prob_p, dist_p = panels(outs[0]), panels(outs[1])
        prob_t = panels(val_batch["prob"])
        n_rays = self.config.n_rays
        ray_sl = slice(0, (n_rays // min(3, n_rays)) * min(3, n_rays),
                       n_rays // min(3, n_rays))
        groups = {"input": x[..., :1], "prob/true": prob_t[..., :1],
                  "prob/pred": prob_p[..., :1], "dist/pred": dist_p[..., ray_sl]}
        if self._is_multiclass() and len(outs) > 2:
            pc = panels(outs[2])
            groups["class/pred"] = pc[..., 1:2] if pc.shape[-1] > 1 else pc
        for name, g in groups.items():
            for i in range(g.shape[0]):
                for c in range(g.shape[-1]):
                    img = g[i, ..., c].astype(np.float32)
                    lo, hi = float(img.min()), float(img.max())
                    img = (img - lo) / (hi - lo) if hi > lo else img * 0
                    tag = name if g.shape[-1] == 1 else f"{name}/ch{c}"
                    tb_writer.add_image(f"{tag}/{i}", img[None], step)

    def _fit_epochs(self, epochs, steps_per_epoch, prefetch_q, rng, history,
                    jsonl_path, tb_writer, trackers, factor, patience,
                    min_delta, rlrop, val_batch, start_epoch=0,
                    epoch_np_rng=None, epoch_np_rng_lock=None):
        cfg = self.config
        best_ckpt = trackers["best_ckpt"]
        best_plateau = trackers["best_plateau"]
        plateau_wait = trackers["plateau_wait"]
        lr = trackers["lr"]
        if start_epoch > 0 and rlrop is not None:
            self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
        step = start_epoch * steps_per_epoch
        for epoch in range(start_epoch, epochs):
            train_logs = []
            for _ in range(steps_per_epoch):
                batch = prefetch_q.get()
                if isinstance(batch, Exception):
                    raise batch
                rng, sub = jax.random.split(rng)
                step_fn = (self._train_step_raw
                           if "y" in batch and self._train_step_raw is not None
                           else self._train_step)
                self.params, self.opt_state, metrics = step_fn(
                    self.params, self.opt_state, self._put_batch(batch), sub)
                train_logs.append(metrics)
                step += 1
            logs = {k: float(np.mean([jax.device_get(m[k]) for m in train_logs]))
                    for k in train_logs[0]}
            logs["lr"] = lr
            if val_batch is not None:
                rng, sub = jax.random.split(rng)
                val_metrics = jax.device_get(self._eval_step(self.params, val_batch, sub))
                logs.update({f"val_{k}": float(v) for k, v in val_metrics.items()})
            history.append(logs)
            monitor = logs.get("val_loss", logs["loss"])
            print(f"epoch {epoch + 1}/{epochs} - " +
                  " - ".join(f"{k}: {v:.4f}" for k, v in logs.items()), flush=True)
            if jsonl_path is not None:
                with open(jsonl_path, "a") as f:
                    f.write(json.dumps({"epoch": epoch + 1, **logs}) + "\n")
            if tb_writer is not None:
                for k, v in logs.items():
                    tb_writer.add_scalar(k, v, epoch + 1)
                if val_batch is not None:
                    try:
                        self._tb_log_images(tb_writer, val_batch, epoch + 1)
                    except Exception as e:  # observability must never kill training
                        print(f"TensorBoard image logging failed: {e}", flush=True)

            if self.basedir is not None:
                self.save_weights(cfg.train_checkpoint_epoch)
                self.save_weights(cfg.train_checkpoint_last)
                if monitor < best_ckpt:
                    self.save_weights(cfg.train_checkpoint)
            best_ckpt = min(best_ckpt, monitor)
            if monitor < best_plateau - (min_delta or 0):
                best_plateau = monitor
                plateau_wait = 0
            else:
                plateau_wait += 1
                if rlrop is not None and plateau_wait >= patience:
                    lr *= factor
                    self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
                    plateau_wait = 0
                    print(f"ReduceLROnPlateau: reducing learning rate to {lr:g}", flush=True)

            if self.basedir is not None:
                # np.random state at the NEXT epoch's data-stream boundary
                # (the producer thread snapshots it before generating the
                # epoch's first item; wait briefly if it hasn't got there yet)
                np_state = None
                if epoch_np_rng is not None:
                    for _ in range(2000):
                        with epoch_np_rng_lock:
                            np_state = epoch_np_rng.get(epoch + 1)
                        if np_state is not None:
                            break
                        time.sleep(0.005)
                self._save_train_state(epoch + 1, rng, lr, best_ckpt,
                                       best_plateau, plateau_wait,
                                       history.history, np_state)

    def _training_finished(self):
        if self.basedir is not None:
            self.save_weights(self.config.train_checkpoint_last)

    def _parse_classes_arg(self, classes, length):
        if isinstance(classes, str):
            if classes != "auto":
                raise ValueError(f"classes = '{classes}': only 'auto' supported as string")
            if self.config.n_classes is None:
                classes = None
            elif self.config.n_classes == 1:
                classes = (1,) * length
            else:
                raise ValueError("using classes = 'auto' for n_classes > 1 not supported")
        elif isinstance(classes, (tuple, list, np.ndarray)):
            if len(classes) != length:
                raise ValueError(f"len(classes) should be {length}!")
        else:
            raise ValueError("classes should either be 'auto' or a list of scalars/label dicts")
        return classes

    # -- prediction -----------------------------------------------------------

    def _normalize_axes(self, img, axes):
        if axes is None:
            axes = self.config.axes
            assert "C" in axes
            if img.ndim == len(axes) - 1 and self.config.n_channel_in == 1:
                axes = axes.replace("C", "")
        return axes_check_and_normalize(axes, img.ndim)

    def _make_permute_axes(self, axes_in, axes_out):
        def _permute(x):
            return move_image_axes(x, axes_in, axes_out, adjust_singletons=True)
        return _permute

    def _check_normalizer_resizer(self, normalizer):
        if normalizer is None:
            normalizer = NoNormalizer()
        if not isinstance(normalizer, Normalizer):
            raise ValueError("normalizer must be a Normalizer instance or None")
        return normalizer

    @functools.lru_cache(maxsize=None)
    def _forward_fn(self):
        """Jitted dense forward on ONE image (batched input (1, sp..., C)).

        Contract: returns CHANNEL-MAJOR, unbatched outputs —
        ``prob (sp...)``, ``dist (R, sp...)``[, ``prob_class (ncls, sp...)``]
        — the natural output layout of the CHW head, so the jit emits no
        layout-conversion passes (channels-last f32 dist at 4096^2 cost
        ~5 ms of relayout copies on v5e). Hosts convert with free numpy
        moveaxis views (`_predict_direct_np`)."""
        net = self._inference_net()
        use_chw = self._use_chw_forward()

        @jax.jit
        def forward(params, extra_vars, x):
            x = x.astype(jnp.float32)
            if use_chw:
                from .unet_chw import chw_forward
                return chw_forward(net, params, x[0])
            variables = dict(extra_vars)
            variables["params"] = params
            outs = net.apply(variables, x, train=False)
            nd = outs[0].ndim - 2                # spatial rank
            to_first = (nd,) + tuple(range(nd))  # (sp..., C) -> (C, sp...)
            res = [outs[0][0, ..., 0]]
            res += [jnp.transpose(o[0], to_first) for o in outs[1:]]
            return tuple(res)

        return forward

    def _use_chw_forward(self):
        """Whether inference uses the Pallas CHW conv path: TPU backend (or
        forced via STARDIST_TPU_CHW=1), supported topology, bf16 inference."""
        import os
        mode = os.environ.get("STARDIST_TPU_CHW", "auto")
        if mode == "0":
            return False
        try:
            from .unet_chw import supports_chw
            ok = supports_chw(self._inference_net())
        except Exception:
            return False
        if not ok:
            return False
        return mode == "1" or jax.default_backend() == "tpu"

    def _predict_direct_np(self, x):
        """Forward pass on a single (spatial..., C) numpy array; returns
        channels-LAST numpy parts (prob (sp..., 1), dist (sp..., R), ...).
        The forward emits channel-major device arrays (no device-side
        relayout); the conversion here is a numpy moveaxis view."""
        forward = self._forward_fn()
        outs = forward(self.params, freeze(self._extra_vars) if not isinstance(self._extra_vars, dict) else self._extra_vars, jnp.asarray(x[np.newaxis]))
        res = [np.asarray(outs[0])[..., np.newaxis]]
        res += [np.moveaxis(np.asarray(y), 0, -1) for y in outs[1:]]
        return tuple(res)

    def _inference_net(self):
        """Network instance used for inference; convolutions run in bfloat16
        on the MXU when ``self.inference_dtype == 'bfloat16'`` (params stay
        float32; heads cast back to float32)."""
        import dataclasses
        dtype = getattr(self, "inference_dtype", None)
        if dtype == "bfloat16":
            return dataclasses.replace(self.net, dtype=jnp.bfloat16)
        return self.net

    def set_inference_precision(self, dtype):
        """dtype: None or 'float32' (full precision) or 'bfloat16'."""
        if dtype == "float32":
            dtype = None
        assert dtype in (None, "bfloat16")
        self.inference_dtype = dtype
        # jitted closures capture the net; clear caches
        self._sparse_extract_fn.cache_clear()
        self._forward_fn.cache_clear()
        fused = getattr(self, "_device_instances_fn", None)
        if fused is not None and hasattr(fused, "cache_clear"):
            fused.cache_clear()

    @functools.lru_cache(maxsize=None)
    def _sparse_extract_fn(self, K, b_key, multiclass):
        """Jitted forward + on-device candidate extraction: threshold + border
        mask + top-K gather. Only the K candidate rows cross to the host
        (vs. the full dist tensor) — the TPU-native version of the reference's
        host-side `_ind_prob_thresh` gather (stardist/models/base.py:585-593).
        """
        net = self._inference_net()
        n_dim = self.config.n_dim
        use_chw = self._use_chw_forward()

        @jax.jit
        def extract(params, extra_vars, x, prob_thresh):
            x = x.astype(jnp.float32)
            if use_chw:
                from .unet_chw import chw_forward
                outs = chw_forward(net, params, x[0])
                prob = outs[0]                 # (sp...)
                dist = None                    # channel-major; gathered below
                dist_t = outs[1].reshape(outs[1].shape[0], -1)  # (R, n_pix)
            else:
                variables = dict(extra_vars)
                variables["params"] = params
                outs = net.apply(variables, x, train=False)
                prob = outs[0][0, ..., 0]      # (sp...)
                dist = outs[1][0]              # (sp..., R)
            shape = prob.shape
            mask = prob > prob_thresh
            # border exclusion (b_key: per-axis (b_lo, b_hi), -1 = none)
            for ax, (blo, bhi) in enumerate(b_key):
                idx = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
                if blo > 0:
                    mask = mask & (idx >= blo)
                if bhi > 0:
                    mask = mask & (idx < shape[ax] - bhi)
            score = jnp.where(mask, prob, -1.0)
            vals, flat_idx = jax.lax.top_k(score.ravel(), K)
            points = jnp.stack(jnp.unravel_index(flat_idx, shape), axis=1)  # (K, n_dim)
            if use_chw:
                d = jnp.take(dist_t, flat_idx, axis=1).T       # (K, R)
            else:
                d = dist.reshape(-1, dist.shape[-1])[flat_idx]
            d = jnp.maximum(d, 1e-3)
            valid = vals > -1.0
            n_above = jnp.sum(mask)
            # max dist over valid candidates (banded-NMS band width; avoids a
            # separate device sync later)
            dmax = jnp.max(jnp.where(valid[:, None], d, 0.0))
            if multiclass:
                if use_chw:
                    pc_t = outs[2].reshape(outs[2].shape[0], -1)
                    pc = jnp.take(pc_t, flat_idx, axis=1).T
                else:
                    pc_full = outs[2][0]
                    pc = pc_full.reshape(-1, pc_full.shape[-1])[flat_idx]
                return vals, d, points, valid, n_above, dmax, pc
            return vals, d, points, valid, n_above, dmax

        return extract

    def _sparse_extract_np(self, x, prob_thresh, b, max_candidates=None,
                           transfer_dtype=None, device_dist=False):
        """Run the on-device sparse extraction; returns
        (prob, dist, points[, prob_class]) of valid candidates (points in
        output-grid units, unscaled). ``transfer_dtype`` (e.g. np.float16)
        reduces the host->device upload volume; values are cast back to
        float32 on device. With ``device_dist=True`` the dist rows — by far
        the largest candidate payload — are returned as a device (jax) array
        instead of numpy, so the downstream device NMS consumes them without
        a host round trip (top_k ordering = descending prob, which is the
        NMS sort order).

        ``max_candidates=None`` (default) means *every* above-threshold pixel
        becomes a candidate, like the reference's host gather
        (stardist/nms.py:135-183): extraction starts with a 2^17-wide top-K
        and, if the on-device count exceeds it, re-runs with K grown to the
        next power of two (bucketed so retries hit the jit cache). A numeric
        ``max_candidates`` restores the hard cap (with a truncation warning).
        """
        n_dim = self.config.n_dim
        if np.isscalar(b) or b is None:
            b = ((b, b) if b is not None else (-1, -1),) * n_dim
        b_key = tuple((int(lo), int(hi)) for lo, hi in b)
        out_size = int(np.prod([s // g for s, g in
                                zip(x.shape[:-1], self.config.grid)]))
        cap = out_size if max_candidates is None else int(min(out_size, max_candidates))
        K = min(self._extract_k0, cap)
        multiclass = self._is_multiclass()
        transfer_dtype = getattr(self, "transfer_dtype", None) if transfer_dtype is None else transfer_dtype
        x_up = x[np.newaxis].astype(transfer_dtype) if transfer_dtype is not None else x[np.newaxis]
        x_dev = jnp.asarray(x_up)
        while True:
            fn = self._sparse_extract_fn(K, b_key, multiclass)
            outs = list(fn(self.params, self._extra_vars, x_dev,
                           jnp.float32(prob_thresh)))
            d_dev = outs[1]
            if device_dist:
                outs[1] = None         # keep dist on device: no host download
            outs = jax.device_get(outs)    # one batched D2H transfer
            n_above = int(outs[4])
            if n_above <= K or K >= cap:
                break
            # grow to the next power-of-two bucket that fits every candidate
            K_new = 1 << int(np.ceil(np.log2(n_above)))
            K = min(max(K_new, K * 2), cap)
        vals, d, points, valid, n_above, dmax = outs[:6]
        n_above = int(n_above)
        if n_above > K:
            warnings.warn(
                f"number of candidates ({n_above}) exceeds max_candidates ({K}); "
                "keeping the top-K by probability")
        n_valid = int(valid.sum())
        # top_k puts all valid (score > -1) rows first; fail loudly if not
        # (e.g. non-finite scores) rather than silently slicing a wrong prefix
        assert bool(valid[:n_valid].all()), "top_k valid rows are not a prefix"
        vals = vals[:n_valid]
        points = points[:n_valid]
        d = d_dev[:n_valid] if device_dist else d[:n_valid]
        if device_dist:
            self._last_extract_dmax = float(dmax)
        if multiclass:
            return vals, d, points, outs[6][:n_valid]
        return vals, d, points

    def _device_border_key(self, b, x, axes_net, resizer):
        """Per-axis (lo, hi) candidate exclusion (output-grid units) for the
        device-side extraction mask: the user border ``b`` plus the resizer's
        end padding — folds ``resizer.filter_points`` into the kernel so no
        host-side point filtering is needed."""
        sp_axes = [a for a in axes_net if a != "C"]
        if np.isscalar(b) or b is None:
            b_tup = ((b, b) if b is not None else (-1, -1),) * len(sp_axes)
        else:
            b_tup = tuple(b)
        bs = []
        for (blo, bhi), a, g, sp in zip(
                b_tup, sp_axes, self.config.grid,
                [s for s, a in zip(x.shape, axes_net) if a != "C"]):
            bound = resizer.padded_shape[a] - resizer.pad[a][1]
            ub_grid = (bound - 1) // g + 1
            sg = sp // g
            bs.append((blo, max(bhi if bhi is not None and bhi > 0 else 0,
                                sg - ub_grid)))
        return tuple(bs)

    def _predict_setup(self, img, axes, normalizer, n_tiles, show_tile_progress, predict_kwargs):
        if n_tiles is None:
            n_tiles = [1] * img.ndim
        try:
            n_tiles = tuple(n_tiles)
            if img.ndim != len(n_tiles):
                raise TypeError()
        except TypeError:
            raise ValueError(f"n_tiles must be an iterable of length {img.ndim}")
        if not all(np.isscalar(t) and 1 <= t and int(t) == t for t in n_tiles):
            raise ValueError("all values of n_tiles must be integer values >= 1")
        n_tiles = tuple(map(int, n_tiles))

        axes = self._normalize_axes(img, axes)
        axes_net = self.config.axes

        _permute_axes = self._make_permute_axes(axes, axes_net)
        x = _permute_axes(img)

        channel = axes_dict(axes_net)["C"]
        if self.config.n_channel_in != x.shape[channel]:
            raise ValueError(
                f"expected {self.config.n_channel_in} input channel(s), got {x.shape[channel]}")
        axes_net_div_by = self._axes_div_by(axes_net)

        grid = tuple(self.config.grid)
        assert len(grid) == len(axes_net) - 1
        grid_dict = dict(zip(axes_net.replace("C", ""), grid))

        normalizer = self._check_normalizer_resizer(normalizer)
        resizer = StarDistPadAndCropResizer(grid=grid_dict)

        x = normalizer.before(x, axes_net)
        x = resizer.before(x, axes_net, axes_net_div_by)
        if not _is_floatarray(x):
            warnings.warn("Predicting on non-float input... ( forgot to normalize? )")

        def tiling_setup():
            assert np.prod(n_tiles) > 1
            tiling_axes = axes_net.replace("C", "")
            x_tiling_axis = tuple(axes_dict(axes_net)[a] for a in tiling_axes)
            axes_net_tile_overlaps = self._axes_tile_overlap(axes_net)
            _n_tiles = _permute_axes(np.empty(n_tiles, bool)).shape
            if not all(_n_tiles[i] == 1 for i in range(x.ndim) if i not in x_tiling_axis):
                raise ValueError(f"entry of n_tiles > 1 only allowed for axes '{tiling_axes}'")

            sh = [s // grid_dict.get(a, 1) for a, s in zip(axes_net, x.shape)]
            sh[channel] = None

            def create_empty_output(n_channel, dtype=np.float32):
                sh[channel] = n_channel
                return np.empty(sh, dtype)

            n_block_overlaps = [
                int(np.ceil(overlap / blocksize))
                for overlap, blocksize in zip(axes_net_tile_overlaps, axes_net_div_by)
            ]
            num_tiles_used = total_n_tiles(x, _n_tiles, block_sizes=axes_net_div_by,
                                           n_block_overlaps=n_block_overlaps)
            tile_generator = tile_iterator(x, _n_tiles, block_sizes=axes_net_div_by,
                                           n_block_overlaps=n_block_overlaps, equal_tiles=True)
            return tile_generator, tuple(sh), create_empty_output, num_tiles_used

        return (x, axes, axes_net, axes_net_div_by, _permute_axes, resizer,
                n_tiles, grid, grid_dict, channel, tiling_setup)

    def _predict_generator(self, img, axes=None, normalizer=None, n_tiles=None,
                           show_tile_progress=True, **predict_kwargs):
        """Dense prediction; final yield is (prob, dist[, prob_class]) with
        channels last and grid-subsampled spatial axes."""
        (x, axes, axes_net, axes_net_div_by, _permute_axes, resizer, n_tiles,
         grid, grid_dict, channel, tiling_setup) = self._predict_setup(
            img, axes, normalizer, n_tiles, show_tile_progress, predict_kwargs)

        if np.prod(n_tiles) > 1:
            tile_generator, output_shape, create_empty_output, _ = tiling_setup()
            prob = create_empty_output(1)
            dist = create_empty_output(self.config.n_rays)
            if self._is_multiclass():
                prob_class = create_empty_output(self.config.n_classes + 1)
                result = (prob, dist, prob_class)
            else:
                result = (prob, dist)

            for tile, s_src, s_dst in tile_generator:
                result_tile = self._predict_direct_np(tile)
                s_src = [slice(s.start // grid_dict.get(a, 1), s.stop // grid_dict.get(a, 1))
                         for s, a in zip(s_src, axes_net)]
                s_dst = [slice(s.start // grid_dict.get(a, 1), s.stop // grid_dict.get(a, 1))
                         for s, a in zip(s_dst, axes_net)]
                s_src[channel] = slice(None)
                s_dst[channel] = slice(None)
                s_src, s_dst = tuple(s_src), tuple(s_dst)
                for part, part_tile in zip(result, result_tile):
                    part[s_dst] = part_tile[s_src]
                yield
        else:
            result = self._predict_direct_np(x)

        result = [resizer.after(part, axes_net) for part in result]
        result[0] = np.take(result[0], 0, axis=channel)
        # clamp tiny dists (reference base.py:521 does this for Qhull safety;
        # kept for behavioral parity)
        result[1] = np.maximum(1e-3, result[1])
        result[1] = np.moveaxis(result[1], channel, -1)
        if self._is_multiclass():
            result[2] = np.moveaxis(result[2], channel, -1)
        yield tuple(result)

    @functools.wraps(_predict_generator)
    def predict(self, *args, **kwargs):
        r = None
        for r in self._predict_generator(*args, **kwargs):
            pass
        return r

    def _predict_sparse_generator(self, img, prob_thresh=None, axes=None, normalizer=None,
                                  n_tiles=None, show_tile_progress=True, b=2,
                                  max_candidates=None, device_dist=False,
                                  **predict_kwargs):
        """Sparse prediction: returns flat candidate lists
        (prob, dist, [prob_class], points). Candidate extraction (threshold,
        border exclusion, gather) runs on device — only candidate rows are
        transferred to the host. With ``device_dist=True`` (single-tile path)
        the dist rows stay on device (consumed directly by the device NMS)
        and the padding filter is folded into the device-side mask."""
        if prob_thresh is None:
            prob_thresh = self.thresholds.prob

        (x, axes, axes_net, axes_net_div_by, _permute_axes, resizer, n_tiles,
         grid, grid_dict, channel, tiling_setup) = self._predict_setup(
            img, axes, normalizer, n_tiles, show_tile_progress, predict_kwargs)

        proba, dista, pointsa, prob_classa = [], [], [], []
        grid_arr = np.array(self.config.grid).reshape((1, len(self.config.grid)))

        if np.prod(n_tiles) > 1:
            tile_generator, output_shape, create_empty_output, _ = tiling_setup()
            sh = list(output_shape)
            sh[channel] = 1

            for tile, s_src, s_dst in tile_generator:
                s_src = [slice(s.start // grid_dict.get(a, 1), s.stop // grid_dict.get(a, 1))
                         for s, a in zip(s_src, axes_net)]
                s_dst = [slice(s.start // grid_dict.get(a, 1), s.stop // grid_dict.get(a, 1))
                         for s, a in zip(s_dst, axes_net)]
                s_src[channel] = slice(None)
                s_dst[channel] = slice(None)
                s_src, s_dst = tuple(s_src), tuple(s_dst)

                # device-side mask: tile core minus global-border exclusion
                tile_out_shape = tuple(
                    s // grid_dict.get(a, 1)
                    for s, a in zip(tile.shape, axes_net) if a != "C")
                ssrc_sp = [s for s, a in zip(s_src, axes_net) if a != "C"]
                sdst_sp = [s for s, a in zip(s_dst, axes_net) if a != "C"]
                sh_sp = [s for s, a in zip(sh, axes_net) if a != "C"]
                bs = []
                for s_s, s_d, t_len, _sh in zip(ssrc_sp, sdst_sp, tile_out_shape, sh_sp):
                    blo = s_s.start + (b if s_d.start == 0 else 0)
                    bhi = (t_len - s_s.stop) + (b if s_d.stop == _sh else 0)
                    bs.append((blo, bhi))

                res = self._sparse_extract_np(tile, prob_thresh, tuple(bs),
                                              max_candidates=max_candidates)
                probi, disti, points = res[:3]
                proba.extend(probi)
                dista.extend(disti)
                offset = np.array([s_d.start - s_s.start
                                   for s_s, s_d in zip(ssrc_sp, sdst_sp)]).reshape(1, -1)
                pointsa.extend((points + offset) * grid_arr)
                if self._is_multiclass():
                    prob_classa.extend(res[3])
                yield
        else:
            b_eff = self._device_border_key(b, x, axes_net, resizer) \
                if device_dist else b
            res = self._sparse_extract_np(x, prob_thresh, b_eff,
                                          max_candidates=max_candidates,
                                          device_dist=device_dist)
            proba, dista, _points = res[:3]
            pointsa = _points * grid_arr
            if self._is_multiclass():
                prob_classa = res[3]

        # single-tile device_dist path: padding filter already folded into the
        # device mask, dist rows live on device
        filtered_on_device = device_dist and np.prod(n_tiles) == 1
        dist_on_device = filtered_on_device and not isinstance(dista, (list, np.ndarray))

        proba = np.asarray(proba)
        if dist_on_device:
            dista = dista.reshape((-1, self.config.n_rays))
        else:
            dista = np.asarray(dista).reshape((-1, self.config.n_rays))
        pointsa = np.asarray(pointsa).reshape((-1, self.config.n_dim))

        if not filtered_on_device:
            idx = resizer.filter_points(x.ndim, pointsa, axes_net)
            proba = proba[idx]
            dista = dista[idx]  # dist_on_device is always False on this branch
            pointsa = pointsa[idx]
        else:
            idx = None

        if self._is_multiclass():
            prob_classa = np.asarray(prob_classa).reshape((-1, self.config.n_classes + 1))
            if idx is not None:
                prob_classa = prob_classa[idx]
            yield proba, dista, prob_classa, pointsa
        else:
            yield proba, dista, pointsa

    @functools.wraps(_predict_sparse_generator)
    def predict_sparse(self, *args, **kwargs):
        r = None
        for r in self._predict_sparse_generator(*args, **kwargs):
            pass
        return r

    def _predict_instances_generator(self, img, axes=None, normalizer=None,
                                     sparse=True, prob_thresh=None, nms_thresh=None,
                                     scale=None, n_tiles=None, show_tile_progress=True,
                                     verbose=False, return_labels=True,
                                     predict_kwargs=None, nms_kwargs=None,
                                     overlap_label=None, return_predict=False):
        """Predict -> NMS -> rasterize orchestration (reference base.py:645-772)."""
        import numbers
        from scipy import ndimage as ndi

        if predict_kwargs is None:
            predict_kwargs = {}
        if nms_kwargs is None:
            nms_kwargs = {}

        if return_predict and sparse:
            sparse = False
            warnings.warn("Setting sparse to False because return_predict is True")

        nms_kwargs.setdefault("verbose", verbose)

        _axes = self._normalize_axes(img, axes)
        _axes_net = self.config.axes
        _permute_axes = self._make_permute_axes(_axes, _axes_net)
        _shape_inst = tuple(s for s, a in zip(_permute_axes(img).shape, _axes_net) if a != "C")

        if scale is not None:
            if isinstance(scale, numbers.Number):
                scale = tuple(scale if a in "XYZ" else 1 for a in _axes)
            scale = tuple(scale)
            if len(scale) != len(_axes):
                raise ValueError(f"scale {scale} must be of length {len(_axes)}")
            for s, a in zip(scale, _axes):
                if not s > 0:
                    raise ValueError("scale values must be greater than 0")
                if not (s in (1, None) or a in "XYZ"):
                    warnings.warn(f"replacing scale value {s} for non-spatial axis {a} with 1")
            scale = tuple(s if a in "XYZ" else 1 for s, a in zip(scale, _axes))
            verbose and print(f"scaling image by factors {scale} for axes {_axes}")
            img = ndi.zoom(img, scale, order=1)

        yield "predict"
        res = None
        extract_dmax = None
        self._last_extract_dmax = None
        if sparse:
            for res in self._predict_sparse_generator(
                    img, axes=axes, normalizer=normalizer, n_tiles=n_tiles,
                    prob_thresh=prob_thresh, show_tile_progress=show_tile_progress,
                    device_dist=predict_kwargs.pop("device_dist", True),
                    **predict_kwargs):
                if res is None:
                    yield "tile"
            # capture before any further yield: interleaved generators on the
            # same model must not see each other's value
            extract_dmax = getattr(self, "_last_extract_dmax", None)
            self._last_extract_dmax = None
        else:
            for res in self._predict_generator(
                    img, axes=axes, normalizer=normalizer, n_tiles=n_tiles,
                    show_tile_progress=show_tile_progress, **predict_kwargs):
                if res is None:
                    yield "tile"
            res = tuple(res) + (None,)

        if self._is_multiclass():
            prob, dist, prob_class, points = res
        else:
            prob, dist, points = res
            prob_class = None

        yield "nms"
        if sparse and extract_dmax is not None:
            # known max candidate dist from the device extraction: saves the
            # banded NMS a device round trip for dist.max()
            nms_kwargs.setdefault("dist_max", extract_dmax)
        res_instances = self._instances_from_prediction(
            _shape_inst, prob, dist, points=points, prob_class=prob_class,
            prob_thresh=prob_thresh, nms_thresh=nms_thresh,
            scale=(None if scale is None else dict(zip(_axes, scale))),
            return_labels=return_labels, overlap_label=overlap_label, **nms_kwargs)

        if return_predict:
            yield res_instances, tuple(res[:-1])
        else:
            yield res_instances

    @functools.wraps(_predict_instances_generator)
    def predict_instances(self, *args, **kwargs):
        r = None
        for r in self._predict_instances_generator(*args, **kwargs):
            pass
        return r

    def predict_instances_big(self, img, axes, block_size, min_overlap, context=None,
                              labels_out=None, labels_out_dtype=np.int32,
                              show_progress=True, **kwargs):
        """Block-wise prediction for very large images; see stardist_tpu/big.py
        and reference base.py:838-983."""
        from ..big import _grid_divisible, BlockND, OBJECT_KEYS
        from ..matching import relabel_sequential

        n = img.ndim
        axes = axes_check_and_normalize(axes, length=n)
        grid = self._axes_div_by(axes)
        axes_out = self.config.axes.replace("C", "")
        shape_dict = dict(zip(axes, img.shape))
        shape_out = tuple(shape_dict[a] for a in axes_out)

        if context is None:
            context = self._axes_tile_overlap(axes)

        if np.isscalar(block_size):
            block_size = n * [block_size]
        if np.isscalar(min_overlap):
            min_overlap = n * [min_overlap]
        if np.isscalar(context):
            context = n * [context]
        block_size, min_overlap, context = list(block_size), list(min_overlap), list(context)
        assert n == len(block_size) == len(min_overlap) == len(context)

        if "C" in axes:
            i = axes_dict(axes)["C"]
            block_size[i] = img.shape[i]
            min_overlap[i] = context[i] = 0

        block_size = tuple(_grid_divisible(g, v, name="block_size", verbose=False)
                           for v, g in zip(block_size, grid))
        min_overlap = tuple(_grid_divisible(g, v, name="min_overlap", verbose=False)
                            for v, g in zip(min_overlap, grid))
        context = tuple(_grid_divisible(g, v, name="context", verbose=False)
                        for v, g in zip(context, grid))

        print(f"effective: block_size={block_size}, min_overlap={min_overlap}, context={context}",
              flush=True)

        for a, c, o in zip(axes, context, self._axes_tile_overlap(axes)):
            if c < o:
                print(f"{a}: context of {c} is small, recommended to use at least {o}", flush=True)

        blocks = BlockND.cover(img.shape, axes, block_size, min_overlap, context, grid)

        if np.isscalar(labels_out) and bool(labels_out) is False:
            labels_out = None
        elif labels_out is None:
            labels_out = np.zeros(shape_out, dtype=labels_out_dtype)
        elif labels_out.shape != shape_out:
            raise ValueError(f"'labels_out' must have shape {shape_out} (axes {axes_out}).")

        polys_all = {}
        label_offset = 1

        kwargs_override = dict(axes=axes, overlap_label=None, return_labels=True, return_predict=False)
        if show_progress:
            kwargs_override["show_tile_progress"] = False
        for k, v in kwargs_override.items():
            if k in kwargs:
                print(f"changing '{k}' from {kwargs[k]} to {v}", flush=True)
            kwargs[k] = v

        for block in blocks:
            labels, polys = self.predict_instances(block.read(img, axes=axes), **kwargs)
            labels = block.crop_context(labels, axes=axes_out)
            labels, polys = block.filter_objects(labels, polys, axes=axes_out)
            labels = relabel_sequential(labels, label_offset)[0]
            if labels_out is not None:
                block.write(labels_out, labels, axes=axes_out)
            for k, v in polys.items():
                polys_all.setdefault(k, []).append(v)
            label_offset += len(polys["prob"])
            del labels

        polys_all = {
            k: (np.concatenate(v) if k in OBJECT_KEYS else v[0])
            for k, v in polys_all.items()
        }
        return labels_out, polys_all

    def optimize_thresholds(self, X_val, Y_val, nms_threshs=(0.3, 0.4, 0.5),
                            iou_threshs=(0.3, 0.5, 0.7), predict_kwargs=None,
                            optimize_kwargs=None, save_to_json=True):
        """Grid search over nms_thresh x golden-section search over prob_thresh
        maximizing mean matching accuracy (reference base.py:986-1043)."""
        if predict_kwargs is None:
            predict_kwargs = {}
        if optimize_kwargs is None:
            optimize_kwargs = {}

        def _predict_kwargs(x):
            if "n_tiles" in predict_kwargs:
                return predict_kwargs
            return {**predict_kwargs, "n_tiles": self._guess_n_tiles(x), "show_tile_progress": False}

        Yhat_val = [self.predict(x, **_predict_kwargs(x))[:2] for x in X_val]

        opt_prob_thresh, opt_measure, opt_nms_thresh = None, -np.inf, None
        for _opt_nms_thresh in nms_threshs:
            _opt_prob_thresh, _opt_measure = optimize_threshold(
                Y_val, Yhat_val, model=self, nms_thresh=_opt_nms_thresh,
                iou_threshs=list(iou_threshs), **optimize_kwargs)
            if _opt_measure > opt_measure:
                opt_prob_thresh, opt_measure, opt_nms_thresh = (
                    _opt_prob_thresh, _opt_measure, _opt_nms_thresh)
        opt_threshs = dict(prob=float(opt_prob_thresh), nms=float(opt_nms_thresh))

        self.thresholds = opt_threshs
        print("Using optimized values: prob_thresh={prob:g}, nms_thresh={nms:g}.".format(
            prob=self.thresholds.prob, nms=self.thresholds.nms))
        if save_to_json and self.basedir is not None:
            print("Saving to 'thresholds.json'.")
            with open(self.logdir / "thresholds.json", "w") as f:
                json.dump(opt_threshs, f)
        return opt_threshs

    def _guess_n_tiles(self, img):
        axes = self._normalize_axes(img, axes=None)
        shape = list(img.shape)
        if "C" in axes:
            del shape[axes_dict(axes)["C"]]
        b = self.config.train_batch_size ** (1.0 / self.config.n_dim)
        n_tiles = [int(np.ceil(s / (p * b))) for s, p in zip(shape, self.config.train_patch_size)]
        if "C" in axes:
            n_tiles.insert(axes_dict(axes)["C"], 1)
        return tuple(n_tiles)

    def _compute_receptive_field(self, img_size=None):
        """Empirical receptive field: delta image through the network
        (reference base.py:1068-1097)."""
        from scipy.ndimage import zoom
        if img_size is None:
            img_size = tuple(g * (128 if self.config.n_dim == 2 else 64) for g in self.config.grid)
        if np.isscalar(img_size):
            img_size = (img_size,) * self.config.n_dim
        img_size = tuple(img_size)
        assert all(_is_power_of_2(s) for s in img_size)
        mid = tuple(s // 2 for s in img_size)
        x = np.zeros((1,) + img_size + (self.config.n_channel_in,), dtype=np.float32)
        z = np.zeros_like(x)
        x[(0,) + mid + (slice(None),)] = 1
        forward = self._forward_fn()
        y = np.asarray(forward(self.params, self._extra_vars, jnp.asarray(x))[0])
        y0 = np.asarray(forward(self.params, self._extra_vars, jnp.asarray(z))[0])
        grid = tuple((np.array(x.shape[1:-1]) / np.array(y.shape)).astype(int))
        assert grid == tuple(self.config.grid)
        y = zoom(y, grid, order=0)
        y0 = zoom(y0, grid, order=0)
        ind = np.where(np.abs(y - y0) > 0)
        if any(len(i) == 0 for i in ind):
            # fall back to a freshly initialized network (e.g. degenerate weights)
            fresh = type(self)(self.config, basedir=None)
            return fresh._compute_receptive_field(img_size=img_size)
        return [(m - np.min(i), np.max(i) - m) for (m, i) in zip(mid, ind)]

    def _axes_tile_overlap(self, query_axes):
        query_axes = axes_check_and_normalize(query_axes)
        try:
            self._tile_overlap
        except AttributeError:
            self._tile_overlap = self._compute_receptive_field()
        overlap = dict(zip(
            self.config.axes.replace("C", ""),
            tuple(max(rf) for rf in self._tile_overlap),
        ))
        return tuple(overlap.get(a, 0) for a in query_axes)

    def _axes_div_by(self, query_axes):
        raise NotImplementedError()

    def _device_targets_fn(self):
        """Traceable (raw batch dict) -> (targets batch dict) builder for the
        fused training step, or None when unsupported (then the classic
        host-side target generation is used). Overridden per model class."""
        return None

    def _instances_from_prediction(self, *args, **kwargs):
        raise NotImplementedError()

    def export_TF(self, fname=None, single_output=True, upsample_grid=True):
        """Export the model as a zipped TF SavedModel for the CSBDeep/StarDist
        Fiji plugin (reference base.py:1113-1158): plain-TF-op replay of the
        flax network, optional grid upsampling (sparse transposed-conv prob +
        nearest dist), optional single concatenated output. Returns the path
        of the written zip."""
        from .export_tf import export_tf_saved_model
        return export_tf_saved_model(self, fname=fname,
                                     single_output=single_output,
                                     upsample_grid=upsample_grid)


def _np_rng_state_from(d):
    """Stored dict -> np.random.set_state tuple."""
    return ("MT19937", np.asarray(d["keys"], np.uint32), int(d["pos"]),
            int(d["has_gauss"]), float(d["cached_gaussian"]))


def _to_mutable(tree):
    """Nested FrozenDict/dict -> plain nested dict (leaves unchanged)."""
    if hasattr(tree, "items") :
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _strip_derived(cfg_dict):
    d = dict(cfg_dict)
    return d
