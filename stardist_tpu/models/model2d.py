"""2D StarDist model (reference stardist/models/model2d.py).

``Config2D`` serializes to the same config.json schema as the reference
(model2d.py:198-262), ``StarDistData2D`` generates (prob, dist+mask
[, prob_class]) training targets, and ``StarDist2D`` wires the Flax network
to the training loop and the TPU instance-prediction pipeline.
"""
from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import zoom

from ..core.config import BaseConfig
from ..core.axes import axes_check_and_normalize
from ..geometry import star_dist, dist_to_coord, polygons_to_label
from ..nms import non_maximum_suppression, non_maximum_suppression_sparse
from ..sample_patches import sample_patches
from ..utils import edt_prob, _normalize_grid, mask_to_categorical, clear_border
from .base import StarDistBase, StarDistDataBase


class StarDistData2D(StarDistDataBase):
    """Training batch generator: random patches -> augmenter -> EDT prob +
    star-dist targets (reference model2d.py:29-119). The star-dist target
    computation runs on device (JAX ray-march kernel)."""

    def __init__(self, X, Y, batch_size, n_rays, length, n_classes=None, classes=None,
                 patch_size=(256, 256), b=32, grid=(1, 1), shape_completion=False,
                 augmenter=None, foreground_prob=0, **kwargs):
        super().__init__(X=X, Y=Y, n_rays=n_rays, grid=grid,
                         n_classes=n_classes, classes=classes,
                         batch_size=batch_size, patch_size=patch_size, length=length,
                         augmenter=augmenter, foreground_prob=foreground_prob, **kwargs)

        self.shape_completion = bool(shape_completion)
        if self.shape_completion and b > 0:
            if not all(b % g == 0 for g in self.grid):
                raise ValueError(
                    f"'shape_completion' requires that crop size {b} "
                    f"('train_completion_crop' in config) is evenly divisible by all grid values {self.grid}")
            self.b = slice(b, -b), slice(b, -b)
        else:
            self.b = slice(None), slice(None)

        self.sd_mode = "jax"

    def _sample_batch(self, i):
        """Shared host prefix: fg-biased patch sampling + augmentation."""
        idx = self.batch(i)
        arrays = [
            sample_patches((self.Y[k],) + self.channels_as_tuple(self.X[k]),
                           patch_size=self.patch_size, n_samples=1,
                           valid_inds=self.get_valid_inds(k))
            for k in idx
        ]

        if self.n_channel is None:
            X, Y = list(zip(*[(x[0][self.b], y[0]) for y, x in arrays]))
        else:
            X, Y = list(zip(*[
                (np.stack([_x[0] for _x in x], axis=-1)[self.b], y[0]) for y, *x in arrays
            ]))

        X, Y = tuple(zip(*tuple(self.augmenter(_x, _y) for _x, _y in zip(X, Y))))
        return idx, X, Y

    def __getitem__(self, i):
        idx, X, Y = self._sample_batch(i)

        mask_neg_labels = tuple(y[self.b][self.ss_grid[1:3]] < 0 for y in Y)
        has_neg_labels = any(m.any() for m in mask_neg_labels)
        if has_neg_labels:
            mask_neg_labels = np.stack(mask_neg_labels)
            Y = tuple(np.maximum(y, 0) for y in Y)

        prob = np.stack([edt_prob(lbl[self.b][self.ss_grid[1:3]]) for lbl in Y])

        from ..ops.stardist2d import star_dist2d_batch
        if self.shape_completion:
            Y_cleared = [clear_border(lbl) for lbl in Y]
            _dist = star_dist2d_batch(np.stack(Y_cleared), self.n_rays)[
                (slice(None),) + self.b + (slice(None),)]
            dist = _dist[self.ss_grid]
            dist_mask = np.stack([edt_prob(lbl[self.b][self.ss_grid[1:3]]) for lbl in Y_cleared])
        else:
            # one batched device call for the whole batch (avoids per-patch
            # dispatch latency)
            dist = star_dist2d_batch(np.stack(Y), self.n_rays, grid=self.grid)
            dist_mask = prob

        X = np.stack(X)
        if X.ndim == 3:  # no channel axis
            X = np.expand_dims(X, -1)
        prob = np.expand_dims(prob, -1)
        dist_mask = np.expand_dims(dist_mask, -1)

        # dist target carries the mask as an extra last channel
        dist_and_mask = np.empty(dist.shape[:-1] + (self.n_rays + 1,), np.float32)
        dist_and_mask[..., :-1] = dist
        dist_and_mask[..., -1:] = dist_mask

        if has_neg_labels:
            prob[mask_neg_labels] = -1  # disables the loss at these pixels

        if self.n_classes is None:
            return (X,), (prob, dist_and_mask)

        prob_class = np.stack(tuple(
            mask_to_categorical(y[self.b], self.n_classes, self.classes[k])
            for y, k in zip(Y, idx)
        ))
        prob_class = zoom(prob_class, (1,) + tuple(1 / g for g in self.grid) + (1,), order=0)
        if has_neg_labels:
            prob_class[mask_neg_labels] = -1
        return (X,), (prob, dist_and_mask, prob_class)


class Config2D(BaseConfig):
    """Configuration for StarDist2D; same keys/defaults as the reference
    Config2D (model2d.py:123-269), serialized verbatim to config.json."""

    def __init__(self, axes="YX", n_rays=32, n_channel_in=1, grid=(1, 1),
                 n_classes=None, backbone="unet", **kwargs):
        super().__init__(axes=axes, n_channel_in=n_channel_in, n_channel_out=1 + n_rays)

        self.n_rays = int(n_rays)
        self.grid = _normalize_grid(grid, 2)
        self.backbone = str(backbone).lower()
        self.n_classes = None if n_classes is None else int(n_classes)

        if self.backbone == "unet":
            self.unet_n_depth = 3
            self.unet_kernel_size = 3, 3
            self.unet_n_filter_base = 32
            self.unet_n_conv_per_depth = 2
            self.unet_pool = 2, 2
            self.unet_activation = "relu"
            self.unet_last_activation = "relu"
            self.unet_batch_norm = False
            self.unet_dropout = 0.0
            self.unet_prefix = ""
            self.net_conv_after_unet = 128
        else:
            raise ValueError("backbone '%s' not supported." % self.backbone)

        # channels-last (TPU native layout)
        self.net_input_shape = None, None, self.n_channel_in
        self.net_mask_shape = None, None, 1

        self.train_shape_completion = False
        self.train_completion_crop = 32
        self.train_patch_size = 256, 256
        self.train_background_reg = 1e-4
        self.train_foreground_only = 0.9
        self.train_sample_cache = True

        self.train_dist_loss = "mae"
        self.train_loss_weights = (1, 0.2) if self.n_classes is None else (1, 0.2, 1)
        self.train_class_weights = (1, 1) if self.n_classes is None else (1,) * (self.n_classes + 1)
        self.train_epochs = 400
        self.train_steps_per_epoch = 100
        self.train_learning_rate = 0.0003
        self.train_batch_size = 4
        self.train_n_val_patches = None
        self.train_tensorboard = True
        self.train_reduce_lr = {"factor": 0.5, "patience": 40, "min_delta": 0}

        self.use_gpu = False

        for k in ("n_dim", "n_channel_out"):
            kwargs.pop(k, None)

        self.update_parameters(False, **kwargs)

        if not len(self.train_loss_weights) == (2 if self.n_classes is None else 3):
            raise ValueError(
                f"train_loss_weights {self.train_loss_weights} not compatible with "
                f"n_classes ({self.n_classes}): must be 3 weights if n_classes is not None, otherwise 2")
        if not len(self.train_class_weights) == (2 if self.n_classes is None else self.n_classes + 1):
            raise ValueError(
                f"train_class_weights {self.train_class_weights} not compatible with "
                f"n_classes ({self.n_classes}): must be 'n_classes + 1' weights if "
                f"n_classes is not None, otherwise 2")


class StarDist2D(StarDistBase):
    """2D StarDist model: Flax U-Net + TPU instance-prediction pipeline."""

    def __init__(self, config="__default__", name=None, basedir="."):
        # reference signature has config=Config2D() as default; config=None
        # explicitly loads a saved model from basedir/name
        if config == "__default__":
            config = Config2D()
        super().__init__(config, name=name, basedir=basedir)

    def train(self, X, Y, validation_data, classes="auto", augmenter=None, seed=None,
              epochs=None, steps_per_epoch=None, workers=1, resume=False):
        """Train the network (reference model2d.py:352-483).

        Negative label values disable all losses at those pixels.
        ``resume=True`` continues an interrupted training from the last
        epoch checkpoint (train_state.msgpack) with a bitwise-identical
        trajectory.
        """
        if seed is not None:
            np.random.seed(seed)
        if epochs is None:
            epochs = self.config.train_epochs
        if steps_per_epoch is None:
            steps_per_epoch = self.config.train_steps_per_epoch

        classes = self._parse_classes_arg(classes, len(X))
        if not self._is_multiclass() and classes is not None:
            warnings.warn("Ignoring given classes as n_classes is set to None")

        if not isinstance(validation_data, (list, tuple)):
            raise ValueError("validation_data must be a tuple/list")
        if self._is_multiclass() and len(validation_data) == 2:
            validation_data = tuple(validation_data) + ("auto",)
        if len(validation_data) != (3 if self._is_multiclass() else 2):
            raise ValueError(
                f"len(validation_data) = {len(validation_data)}, but should be "
                f"{3 if self._is_multiclass() else 2}")

        patch_size = self.config.train_patch_size
        axes = self.config.axes.replace("C", "")
        b = self.config.train_completion_crop if self.config.train_shape_completion else 0
        div_by = self._axes_div_by(axes)
        for p, d, a in zip(patch_size, div_by, axes):
            if (p - 2 * b) % d != 0:
                raise ValueError(
                    f"'train_patch_size' - 2*'train_completion_crop' must be divisible by {d} along axis '{a}'"
                    if self.config.train_shape_completion else
                    f"'train_patch_size' must be divisible by {d} along axis '{a}'")

        if not self._model_prepared:
            self.prepare_for_training()

        data_kwargs = dict(
            n_rays=self.config.n_rays,
            patch_size=self.config.train_patch_size,
            grid=self.config.grid,
            shape_completion=self.config.train_shape_completion,
            b=self.config.train_completion_crop,
            use_gpu=self.config.use_gpu,
            foreground_prob=self.config.train_foreground_only,
            n_classes=self.config.n_classes,
            sample_ind_cache=self.config.train_sample_cache,
        )

        n_data_val = len(validation_data[0])
        classes_val = self._parse_classes_arg(validation_data[2], n_data_val) \
            if self._is_multiclass() else None
        n_take = self.config.train_n_val_patches if self.config.train_n_val_patches is not None else n_data_val
        _data_val = StarDistData2D(validation_data[0], validation_data[1], classes=classes_val,
                                   batch_size=n_take, length=1, **data_kwargs)
        data_val = _data_val[0]

        self.data_train = StarDistData2D(X, Y, classes=classes,
                                         batch_size=self.config.train_batch_size,
                                         augmenter=augmenter,
                                         length=epochs * steps_per_epoch, **data_kwargs)

        val_batch = _as_batch_dict(data_val, self._is_multiclass())
        use_raw = (getattr(self, "_train_step_raw", None) is not None
                   and getattr(self.data_train, "supports_raw", False))
        train_data = _BatchDictAdapter(self.data_train, self._is_multiclass(),
                                       raw=use_raw)
        return self._fit(train_data, val_batch, epochs, steps_per_epoch,
                         resume=resume)

    def _device_targets_fn(self):
        """Traceable targets builder for the fused training step: EDT prob
        (exact separable min-plus, one-vs-rest over the patch's labels) and
        star distances (shift-compare ray march) computed on device from the
        raw label patches — same values as the classic host pipeline
        (StarDistData2D.__getitem__), no host round trip."""
        import os
        if self._is_multiclass() or self.config.train_shape_completion:
            return None
        if os.environ.get("STARDIST_TPU_FUSED_TARGETS", "1") == "0":
            return None
        import jax
        from ..ops.edt import edt_prob_core
        from ..ops.stardist2d import _star_dist2d_batch_impl, _default_max_dist

        gy, gx = (int(g) for g in self.config.grid)
        n_rays = int(self.config.n_rays)

        def fn(raw):
            x = raw["x"].astype(jnp.float32)
            y = raw["y"]                      # (B, H, W) int32, may be < 0
            labels = raw["labels"]            # (B, L) int32, 0-padded
            y_pos = jnp.maximum(y, 0)
            y_sub = y[:, ::gy, ::gx]
            mask_neg = y_sub < 0
            lbl_sub = y_pos[:, ::gy, ::gx]
            prob_raw = jax.vmap(
                lambda l, lab: edt_prob_core(l, lab, (1.0, 1.0)))(lbl_sub, labels)
            max_dist = _default_max_dist(y.shape[1:])
            dist = _star_dist2d_batch_impl(y_pos, n_rays, (gy, gx), max_dist)
            dist_and_mask = jnp.concatenate(
                [dist, prob_raw[..., None]], axis=-1)
            prob = jnp.where(mask_neg, -1.0, prob_raw)[..., None]
            return {"x": x, "prob": prob, "dist": dist_and_mask}

        return fn

    def _instances_from_prediction(self, img_shape, prob, dist, points=None,
                                   prob_class=None, prob_thresh=None, nms_thresh=None,
                                   overlap_label=None, return_labels=True, scale=None,
                                   **nms_kwargs):
        """NMS + rasterization -> (labels, polygon dict); reference
        model2d.py:512-563."""
        if prob_thresh is None:
            prob_thresh = self.thresholds.prob
        if nms_thresh is None:
            nms_thresh = self.thresholds.nms
        if overlap_label is not None:
            raise NotImplementedError("overlap_label not supported for 2D yet!")

        if points is not None:  # sparse
            points, probi, disti, indsi = non_maximum_suppression_sparse(
                dist, prob, points, nms_thresh=nms_thresh, **nms_kwargs)
            if prob_class is not None:
                prob_class = prob_class[indsi]
        else:  # dense
            points, probi, disti = non_maximum_suppression(
                dist, prob, grid=self.config.grid,
                prob_thresh=prob_thresh, nms_thresh=nms_thresh, **nms_kwargs)
            if prob_class is not None:
                inds = tuple(p // g for p, g in zip(points.T, self.config.grid))
                prob_class = prob_class[inds]

        if scale is not None:
            if not (isinstance(scale, dict) and "X" in scale and "Y" in scale):
                raise ValueError("scale must be a dictionary with entries for 'X' and 'Y'")
            rescale = (1 / scale["Y"], 1 / scale["X"])
            points = points * np.array(rescale).reshape(1, 2)
        else:
            rescale = (1, 1)

        labels, res_dict = self._render_survivors(
            img_shape, disti, points, probi, prob_class=prob_class,
            rescale=rescale, return_labels=return_labels)
        from ..ops.nms import LAST_NMS_COUNTERS
        if LAST_NMS_COUNTERS:
            res_dict["nms_counters"] = dict(LAST_NMS_COUNTERS)
        return labels, res_dict

    def _nms_keep(self, prob, dist, points, nms_thresh):
        """Greedy-NMS keep flags for a descending-prob-sorted candidate
        list with full-resolution points (used by the threshold optimizer's
        prefix-NMS trick, utils.optimize_threshold)."""
        from ..ops.nms import nms_polygons
        import numpy as np
        return np.asarray(nms_polygons(dist, points, thresh=float(nms_thresh)))

    def _render_survivors(self, img_shape, disti, points, probi,
                          prob_class=None, rescale=(1, 1), return_labels=True):
        """Rasterize NMS survivors + build the result dict — the tail of
        :meth:`_instances_from_prediction` (after NMS), shared with the
        distributed stitch drivers (parallel/multihost.py) so their
        per-block polys match the sequential driver's keys and dtypes
        exactly."""
        if return_labels:
            labels = polygons_to_label(disti, points, prob=probi, shape=img_shape,
                                       scale_dist=rescale)
        else:
            labels = None

        coord = dist_to_coord(disti, points, scale_dist=rescale)
        res_dict = dict(coord=coord, points=points, prob=probi)

        if prob_class is not None:
            prob_class = np.asarray(prob_class)
            res_dict.update(dict(class_prob=prob_class, class_id=np.argmax(prob_class, axis=-1)))

        return labels, res_dict

    # -- fully device-resident prediction ----------------------------------

    @functools.lru_cache(maxsize=None)
    def _device_instances_fn(self, K, b_key, nms_statics, M, W, chunk, shape):
        """One jitted device program for the ENTIRE instance-prediction
        pipeline: forward pass, sparse candidate extraction (threshold +
        border + top-K), fused NMS (the two-layout global-pair-list kernel,
        ops/nms2d_fast.py, with its Pallas pair stages), survivor
        compaction and packed-label rasterization. No intermediate touches
        the host; every data-dependent size decision is a static capacity
        with an in-kernel validity flag the (host) caller inspects once per
        image.

        ``nms_statics`` = (axis, Q, NB, ES, RS, RMAX, S, use_pallas) as in
        ops/nms2d_fast.py ``_nms2d_v2``; ``M`` = survivor slot capacity,
        ``W`` = raster window, ``shape`` = output label shape.
        """
        from ..ops.nms import _bucket
        from ..ops.nms2d_fast import _nms2d_v2_traced
        from ..ops.rasterize import _raster2d_packed_dyn
        multiclass = self._is_multiclass()
        extract = self._sparse_extract_fn(K, b_key, multiclass)
        grid = tuple(int(g) for g in self.config.grid)
        (axis, Q, NB, ES, RS, RMAX, S, use_pallas) = nms_statics
        # top_k requires K <= n output pixels, but the NMS kernels want
        # power-of-two-bucketed shapes (compile-cache hits): pad up on device
        Npad = _bucket(K, minimum=2 * Q)

        @jax.jit
        def run(params, extra_vars, x, prob_thresh, nms_thresh):
            outs = extract(params, extra_vars, x, prob_thresh)
            vals, d, points, valid, n_above, dmax = outs[:6]
            pc = outs[6] if multiclass else None
            if Npad > K:
                d = jnp.pad(d, ((0, Npad - K), (0, 0)), constant_values=1e-3)
                points = jnp.pad(points, ((0, Npad - K), (0, 0)))
                vals = jnp.pad(vals, (0, Npad - K), constant_values=-1.0)
                valid = jnp.pad(valid, (0, Npad - K))
                if multiclass:
                    pc = jnp.pad(pc, ((0, Npad - K), (0, 0)))
            # host candidate-order contract (nms.py non_maximum_suppression_
            # sparse): np.argsort(prob, kind="stable")[::-1] — descending
            # prob with TIES in descending list order; top_k gives ties in
            # ascending order, so re-sort by (-prob, -index)
            iota = jnp.arange(Npad, dtype=jnp.int32)
            _, _, perm_h = jax.lax.sort((-vals, -iota, iota), dimension=0,
                                        num_keys=2)
            vals = jnp.take(vals, perm_h, axis=0)
            d = jnp.take(d, perm_h, axis=0)
            points = jnp.take(points, perm_h, axis=0)
            valid = jnp.take(valid, perm_h, axis=0)
            if multiclass:
                pc = jnp.take(pc, perm_h, axis=0)
            n_valid = jnp.minimum(n_above, K).astype(jnp.int32)
            keep, nms_flags, stats = _nms2d_v2_traced(
                d, points, n_valid, nms_thresh, grid,
                axis, Q, NB, ES, RS, RMAX, S, use_pallas)
            kf = keep & valid
            n_surv = jnp.sum(kf.astype(jnp.int32))
            # compact survivors (already in descending-prob = NMS rank order)
            # into M fixed slots via one stable sort
            surv_rank = jnp.cumsum(kf.astype(jnp.int32)) - 1
            key = jnp.where(kf, surv_rank, jnp.int32(2 ** 30))
            _, perm = jax.lax.sort(
                (key, jnp.arange(Npad, dtype=jnp.int32)), dimension=0,
                num_keys=1)
            Me = min(M, Npad)  # static; there are at most Npad survivors
            permM = perm[:Me]
            slot = jnp.arange(Me, dtype=jnp.int32)
            validM = slot < n_surv
            dM = jnp.take(d, permM, axis=0)
            pM = jnp.take(points, permM, axis=0).astype(jnp.float32) \
                * jnp.asarray(grid, jnp.float32)[None]
            probM = jnp.where(validM, jnp.take(vals, permM, axis=0), 0.0)
            pcM = jnp.take(pc, permM, axis=0) if multiclass else None
            # raster ordering contract (geometry/geom2d.py _render_polygons):
            # order value = rank in a STABLE ascending-prob sort (+1), so for
            # tied probs the later candidate wins the scatter-max exactly like
            # the host's np.argsort(prob, kind="stable"); pixel value =
            # descending-prob index + 1
            sort_prob = jnp.where(validM, probM, -1.0)  # invalid slots first
            _, ind = jax.lax.sort((sort_prob, slot), dimension=0, num_keys=1)
            pos = jnp.zeros(Me, jnp.int32).at[ind].set(slot + 1)
            order_vals = jnp.where(validM, pos - (Me - n_surv), 0)
            labsM = jnp.where(validM, slot + 1, 0)
            labels_img = _raster2d_packed_dyn(
                dM, pM, order_vals, labsM, n_surv, shape, W, chunk)
            fits_surv = n_surv <= jnp.minimum(Me, 2 ** 15 - 1)
            # dist is in full-resolution pixels (targets are computed on the
            # full-res labels); the window must cover the largest polygon
            w_ok = 2.0 * dmax + 4.0 <= jnp.float32(W)
            flags = nms_flags + (fits_surv, w_ok)
            if multiclass:
                return (labels_img, dM, pM, probM, n_surv, n_above, dmax,
                        flags, stats, pcM)
            return labels_img, dM, pM, probM, n_surv, n_above, dmax, flags, stats

        return run

    def predict_instances_device(self, img, axes=None, normalizer=None,
                                 prob_thresh=None, nms_thresh=None, b=2,
                                 verbose=False, fetch=True):
        """Instance prediction with the whole pipeline resident on device:
        ONE jitted dispatch runs forward pass, candidate extraction, NMS and
        label rasterization (`_device_instances_fn`); the host only uploads
        the image and reads back a handful of scalars (validity flags +
        counts). Retries with the next capacity bucket on overflow
        (compile-cached), falling back to :meth:`predict_instances` when the
        field exceeds the device path's limits (>2^15 survivors).

        Returns ``(labels, details)`` like :meth:`predict_instances`. With
        ``fetch=False`` the label image and the candidate arrays in
        ``details`` are returned as device (jax) arrays — for serving
        pipelines that keep post-processing on device, and for benchmarking
        the device-resident path without the D2H transfer.

        TPU-native counterpart of the reference's predict->NMS->render flow
        (stardist/models/base.py:645-772) with zero host round trips in the
        steady state.
        """
        from ..ops.nms import _bucket, LAST_NMS_COUNTERS
        multiclass = self._is_multiclass()
        if prob_thresh is None:
            prob_thresh = self.thresholds.prob
        if nms_thresh is None:
            nms_thresh = self.thresholds.nms

        grid = tuple(self.config.grid)
        if isinstance(img, jax.Array):
            # pre-staged device input (serving fast path): already
            # normalized, (Y, X) or (Y, X, C), spatial dims divisible by the
            # network stride — zero host-side image work before the dispatch
            if normalizer is not None or axes not in (None, "YX", "YXC"):
                raise ValueError("device-array input must be pre-normalized "
                                 "with default axes")
            x_dev = img[..., None] if img.ndim == 2 else img
            if x_dev.ndim != 3 or x_dev.shape[-1] != self.config.n_channel_in:
                raise ValueError(
                    f"expected (Y, X[, C={self.config.n_channel_in}]) input")
            div_by = self._axes_div_by("YX")
            if any(s % d for s, d in zip(x_dev.shape[:2], div_by)):
                raise ValueError("device-array input spatial dims must be "
                                 f"divisible by {div_by}")
            shape_inst = tuple(int(s) for s in x_dev.shape[:2])
            x_shape = tuple(x_dev.shape)
            x_dev = x_dev[None]
            if np.isscalar(b) or b is None:
                b_key = (((b, b) if b is not None else (-1, -1)),) * 2
            else:
                b_key = tuple((int(lo), int(hi)) for lo, hi in b)
        else:
            (x, axes, axes_net, axes_net_div_by, _permute_axes, resizer,
             n_tiles, _grid, grid_dict, channel, tiling_setup) = \
                self._predict_setup(img, axes, normalizer, None, False, {})
            shape_inst = tuple(s for s, a in zip(_permute_axes(img).shape,
                                                 axes_net) if a != "C")
            b_key = self._device_border_key(b, x, axes_net, resizer)
            x_shape = x.shape
            tdt = getattr(self, "transfer_dtype", None)
            x_up = x[np.newaxis].astype(tdt) if tdt is not None \
                else x[np.newaxis]
            x_dev = jnp.asarray(x_up)

        # top_k caps K at the number of output pixels; the fused fn pads the
        # NMS shapes up to the next power-of-two bucket internally
        out_size = int(np.prod([s // g for s, g in zip(x_shape[:-1], grid)]))
        # capacities are keyed by the padded input shape: alternating image
        # sizes each keep their own learned caps (no compile thrash)
        caps_key = "x".join(str(int(s)) for s in x_shape[:-1])
        caps = self._device_caps_for(caps_key)
        K = min(caps.get("K", self._extract_k0), out_size)
        M = caps.get("M", 16384)
        Wwin = caps.get("W", 64)
        NB = caps.get("NB", 1)
        ES = caps.get("ES", 1 << 19)
        RS = caps.get("RS", 16384)
        RMAX = caps.get("RMAX", 24)
        Q, S, chunk = 128, 16, 256
        use_pallas = jax.default_backend() == "tpu"
        axis = 0 if shape_inst[0] >= shape_inst[1] else 1

        pt, nt = jnp.float32(prob_thresh), jnp.float32(nms_thresh)
        for _ in range(16):
            Npad = _bucket(K, minimum=2 * Q)
            RS = min(RS, Npad)
            fn = self._device_instances_fn(
                K, b_key, (axis, Q, NB, ES, RS, RMAX, S, use_pallas),
                M, Wwin, chunk, shape_inst)
            outs = fn(self.params, self._extra_vars, x_dev, pt, nt)
            labels_dev, dM, pM, probM = outs[:4]
            pcM = outs[9] if multiclass else None
            n_surv, n_above, dmax, flags, stats = jax.device_get(outs[4:9])
            n_surv, n_above, dmax = int(n_surv), int(n_above), float(dmax)
            band_ok, rounds_ok, fits_surv, w_ok = (bool(f) for f in flags)
            (max_amb, n_pairs, n_eval, n_rounds, n_iters) = (int(s) for s in stats)
            retried = False
            if n_above > K:
                if K >= out_size:
                    break  # cannot happen: n_above <= out_size
                K = min(out_size, 1 << int(np.ceil(np.log2(n_above))))
                retried = True
            if not band_ok:
                if NB >= 8:
                    break
                NB *= 2
                retried = True
            elif not rounds_ok:
                # rounds exhausted: evaluate more rows per round (same
                # policy as ops/nms2d_fast.py nms2d_twolayout_host)
                if RS >= Npad:
                    break
                RS = min(RS * 4, Npad)
                ES = min(ES * 2, 1 << 22)
                retried = True
            if not fits_surv:
                if n_surv > 2 ** 15 - 1:
                    break  # beyond the packed-raster limit: host path
                M = 1 << int(np.ceil(np.log2(n_surv)))
                retried = True
            if not w_ok:
                need = 2.0 * dmax + 4.0
                Wwin = max(16, int(np.ceil(need / 16)) * 16)
                retried = True
            if retried:
                continue
            # success: remember the working capacities (and persist them
            # next to the model, thresholds.json-style, so a fresh process
            # compiles ONE fused variant instead of walking the retry
            # ladder — with the persistent XLA cache that warm variant is a
            # cache hit, not a multi-minute compile)
            caps.update(K=K, M=M, W=Wwin, NB=NB, ES=ES, RS=RS, RMAX=RMAX)
            self._save_device_caps(self._device_predict_caps)
            LAST_NMS_COUNTERS.clear()
            LAST_NMS_COUNTERS.update(
                n_candidates=min(n_above, K), n_peel_survivor=0,
                n_peel_suppressed=0, n_survivors=n_surv,
                n_amb_pairs=n_pairs, n_eval_pairs=n_eval, n_rounds=n_rounds)
            if verbose:
                print(f"device predict: {min(n_above, K)} candidates, "
                      f"{n_pairs} ambiguous pairs ({n_eval} evaluated in "
                      f"{n_rounds} rounds), {n_surv} survivors", flush=True)
            details = dict(dist=dM[:n_surv], points=pM[:n_surv],
                           prob=probM[:n_surv],
                           nms_counters=dict(LAST_NMS_COUNTERS))
            if multiclass:
                details["class_prob"] = pcM[:n_surv]
                details["class_id"] = jnp.argmax(pcM[:n_surv], axis=-1)
            if fetch:
                dist_h, points_h, prob_h = (np.asarray(a) for a in jax.device_get(
                    (details["dist"], details["points"], details["prob"])))
                details.update(dist=dist_h,
                               points=points_h.astype(np.int32),
                               prob=prob_h,
                               coord=dist_to_coord(dist_h, points_h))
                if multiclass:
                    pc_h = np.asarray(jax.device_get(details["class_prob"]))
                    details.update(class_prob=pc_h,
                                   class_id=np.argmax(pc_h, axis=-1))
                labels = np.asarray(labels_dev).astype(np.int32)
            else:
                labels = labels_dev
            return labels, details
        # capacity cascade exhausted (or unsupported field): host-orchestrated path
        if isinstance(img, jax.Array):
            img = np.asarray(img)
        return self.predict_instances(img, axes=axes, normalizer=normalizer,
                                      prob_thresh=prob_thresh,
                                      nms_thresh=nms_thresh,
                                      show_tile_progress=False)

    def _axes_div_by(self, query_axes):
        if self.config.backbone != "unet":
            raise NotImplementedError()
        query_axes = axes_check_and_normalize(query_axes)
        assert len(self.config.unet_pool) == len(self.config.grid)
        div_by = dict(zip(
            self.config.axes.replace("C", ""),
            tuple(p ** self.config.unet_n_depth * g
                  for p, g in zip(self.config.unet_pool, self.config.grid)),
        ))
        return tuple(div_by.get(a, 1) for a in query_axes)

    @property
    def _config_class(self):
        return Config2D


def _as_batch_dict(batch_tuple, multiclass):
    (x,), targets = batch_tuple
    d = {"x": x, "prob": targets[0], "dist": targets[1]}
    if multiclass:
        d["prob_class"] = targets[2]
    return d


class _BatchDictAdapter:
    def __init__(self, seq, multiclass, raw=False):
        self.seq = seq
        self.multiclass = multiclass
        self.raw = raw

    def __getitem__(self, i):
        if self.raw:
            return self.seq.raw_item(i)
        return _as_batch_dict(self.seq[i], self.multiclass)
