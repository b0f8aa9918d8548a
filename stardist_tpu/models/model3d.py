"""3D StarDist model (reference stardist/models/model3d.py).

``Config3D`` serializes to the same config.json schema as the reference
(model3d.py:214-311) including the rays JSON round trip; ``StarDist3D``
supports both 'unet' and 'resnet' backbones.
"""
from __future__ import annotations

import functools
import warnings

import numpy as np
from scipy.ndimage import zoom

from ..core.config import BaseConfig
from ..core.axes import axes_check_and_normalize
from ..geometry import star_dist3D, polyhedron_to_label
from ..matching import relabel_sequential
from ..nms import non_maximum_suppression_3d, non_maximum_suppression_3d_sparse
from ..rays3d import Rays_GoldenSpiral, rays_from_json
from ..sample_patches import sample_patches
from ..utils import edt_prob, _normalize_grid, mask_to_categorical
from .base import StarDistBase, StarDistDataBase
from .model2d import _as_batch_dict, _BatchDictAdapter


class StarDistData3D(StarDistDataBase):
    """Training batch generator for 3D (reference model3d.py:30-125)."""

    def __init__(self, X, Y, batch_size, rays, length, n_classes=None, classes=None,
                 patch_size=(128, 128, 128), grid=(1, 1, 1), anisotropy=None,
                 augmenter=None, foreground_prob=0, **kwargs):
        super().__init__(X=X, Y=Y, n_rays=len(rays), grid=grid,
                         n_classes=n_classes, classes=classes,
                         batch_size=batch_size, patch_size=patch_size, length=length,
                         augmenter=augmenter, foreground_prob=foreground_prob, **kwargs)
        self.rays = rays
        self.anisotropy = anisotropy
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
            X, Y = list(zip(*[(x[0], y[0]) for y, x in arrays]))
        else:
            X, Y = list(zip(*[
                (np.stack([_x[0] for _x in x], axis=-1), y[0]) for y, *x in arrays
            ]))

        X, Y = tuple(zip(*tuple(self.augmenter(_x, _y) for _x, _y in zip(X, Y))))
        return idx, X, Y

    def __getitem__(self, i):
        idx, X, Y = self._sample_batch(i)

        mask_neg_labels = tuple(y[self.ss_grid[1:4]] < 0 for y in Y)
        has_neg_labels = any(m.any() for m in mask_neg_labels)
        if has_neg_labels:
            mask_neg_labels = np.stack(mask_neg_labels)
            Y = tuple(np.maximum(y, 0) for y in Y)

        # note: in 3D the EDT is computed at full resolution and then grid-
        # subsampled (unlike 2D; reference model3d.py:87-92)
        prob = np.stack([
            edt_prob(lbl, anisotropy=self.anisotropy)[self.ss_grid[1:4]] for lbl in Y
        ])
        from ..ops.stardist3d import star_dist3d_batch
        dist = star_dist3d_batch(np.stack(Y), self.rays, grid=self.grid)
        dist_mask = prob

        X = np.stack(X)
        if X.ndim == 4:  # input has no channel axis
            X = np.expand_dims(X, -1)
        prob = np.expand_dims(prob, -1)
        dist_mask = np.expand_dims(dist_mask, -1)

        dist_and_mask = np.empty(dist.shape[:-1] + (self.n_rays + 1,), np.float32)
        dist_and_mask[..., :-1] = dist
        dist_and_mask[..., -1:] = dist_mask

        if has_neg_labels:
            prob[mask_neg_labels] = -1

        if self.n_classes is None:
            return (X,), (prob, dist_and_mask)

        prob_class = np.stack(tuple(
            mask_to_categorical(y, self.n_classes, self.classes[k])
            for y, k in zip(Y, idx)
        ))
        prob_class = zoom(prob_class, (1,) + tuple(1 / g for g in self.grid) + (1,), order=0)
        if has_neg_labels:
            prob_class[mask_neg_labels] = -1
        return (X,), (prob, dist_and_mask, prob_class)


class Config3D(BaseConfig):
    """Configuration for StarDist3D; same keys/defaults as reference Config3D."""

    def __init__(self, axes="ZYX", rays=None, n_channel_in=1, grid=(1, 1, 1),
                 n_classes=None, anisotropy=None, backbone="unet", **kwargs):
        if rays is None:
            if "rays_json" in kwargs:
                rays = rays_from_json(kwargs["rays_json"])
            elif "n_rays" in kwargs:
                rays = Rays_GoldenSpiral(kwargs["n_rays"])
            else:
                rays = Rays_GoldenSpiral(96)
        elif np.isscalar(rays):
            rays = Rays_GoldenSpiral(rays)

        super().__init__(axes=axes, n_channel_in=n_channel_in, n_channel_out=1 + len(rays))

        self.n_rays = len(rays)
        self.grid = _normalize_grid(grid, 3)
        self.anisotropy = anisotropy if anisotropy is None else tuple(anisotropy)
        self.backbone = str(backbone).lower()
        self.rays_json = rays.to_json()
        self.n_classes = None if n_classes is None else int(n_classes)

        if "anisotropy" in self.rays_json["kwargs"]:
            if self.rays_json["kwargs"]["anisotropy"] is None and self.anisotropy is not None:
                self.rays_json["kwargs"]["anisotropy"] = self.anisotropy
                print("Changing 'anisotropy' of rays to %s" % str(anisotropy))
            elif self.rays_json["kwargs"]["anisotropy"] != self.anisotropy:
                warnings.warn("Mismatch of 'anisotropy' of rays and 'anisotropy'.")

        if self.backbone == "unet":
            self.unet_n_depth = 2
            self.unet_kernel_size = 3, 3, 3
            self.unet_n_filter_base = 32
            self.unet_n_conv_per_depth = 2
            self.unet_pool = 2, 2, 2
            self.unet_activation = "relu"
            self.unet_last_activation = "relu"
            self.unet_batch_norm = False
            self.unet_dropout = 0.0
            self.unet_prefix = ""
            self.net_conv_after_unet = 128
        elif self.backbone == "resnet":
            self.resnet_n_blocks = 4
            self.resnet_kernel_size = 3, 3, 3
            self.resnet_kernel_init = "he_normal"
            self.resnet_n_filter_base = 32
            self.resnet_n_conv_per_block = 3
            self.resnet_activation = "relu"
            self.resnet_batch_norm = False
            self.net_conv_after_resnet = 128
        else:
            raise ValueError("backbone '%s' not supported." % self.backbone)

        self.net_input_shape = None, None, None, self.n_channel_in
        self.net_mask_shape = None, None, None, 1

        self.train_patch_size = 128, 128, 128
        self.train_background_reg = 1e-4
        self.train_foreground_only = 0.9
        self.train_sample_cache = True

        self.train_dist_loss = "mae"
        self.train_loss_weights = (1, 0.2) if self.n_classes is None else (1, 0.2, 1)
        self.train_class_weights = (1, 1) if self.n_classes is None else (1,) * (self.n_classes + 1)
        self.train_epochs = 400
        self.train_steps_per_epoch = 100
        self.train_learning_rate = 0.0003
        self.train_batch_size = 1
        self.train_n_val_patches = None
        self.train_tensorboard = True
        self.train_reduce_lr = {"factor": 0.5, "patience": 40, "min_delta": 0}

        self.use_gpu = False

        for k in ("n_dim", "n_channel_out", "n_rays", "rays_json"):
            kwargs.pop(k, None)

        self.update_parameters(False, **kwargs)

        if not len(self.train_loss_weights) == (2 if self.n_classes is None else 3):
            raise ValueError(
                f"train_loss_weights {self.train_loss_weights} not compatible with "
                f"n_classes ({self.n_classes})")
        if not len(self.train_class_weights) == (2 if self.n_classes is None else self.n_classes + 1):
            raise ValueError(
                f"train_class_weights {self.train_class_weights} not compatible with "
                f"n_classes ({self.n_classes})")


class StarDist3D(StarDistBase):
    """3D StarDist model with unet/resnet backbones."""

    def __init__(self, config="__default__", name=None, basedir="."):
        if config == "__default__":
            config = Config3D()
        super().__init__(config, name=name, basedir=basedir)

    @property
    def rays(self):
        return rays_from_json(self.config.rays_json)

    def train(self, X, Y, validation_data, classes="auto", augmenter=None, seed=None,
              epochs=None, steps_per_epoch=None, workers=1, resume=False):
        """Train the network (reference model3d.py:450-586)."""
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
        div_by = self._axes_div_by(axes)
        for p, d, a in zip(patch_size, div_by, axes):
            if p % d != 0:
                raise ValueError(f"'train_patch_size' must be divisible by {d} along axis '{a}'")

        if not self._model_prepared:
            self.prepare_for_training()

        data_kwargs = dict(
            rays=rays_from_json(self.config.rays_json),
            grid=self.config.grid,
            patch_size=self.config.train_patch_size,
            anisotropy=self.config.anisotropy,
            use_gpu=self.config.use_gpu,
            foreground_prob=self.config.train_foreground_only,
            n_classes=self.config.n_classes,
            sample_ind_cache=self.config.train_sample_cache,
        )

        n_data_val = len(validation_data[0])
        classes_val = self._parse_classes_arg(validation_data[2], n_data_val) \
            if self._is_multiclass() else None
        n_take = self.config.train_n_val_patches if self.config.train_n_val_patches is not None else n_data_val
        _data_val = StarDistData3D(validation_data[0], validation_data[1], classes=classes_val,
                                   batch_size=n_take, length=1, **data_kwargs)
        data_val = _data_val[0]

        self.data_train = StarDistData3D(X, Y, classes=classes,
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
        """Traceable targets builder for the fused 3D training step (see
        StarDist2D._device_targets_fn). Note: in 3D the EDT runs at full
        resolution (with anisotropy spacing) and is then grid-subsampled
        (reference model3d.py:87-92)."""
        import os
        if self._is_multiclass():
            return None
        if os.environ.get("STARDIST_TPU_FUSED_TARGETS", "1") == "0":
            return None
        import jax
        import jax.numpy as jnp
        from ..ops.edt import edt_prob_core
        from ..ops.stardist3d import _star_dist3d_batch_impl, _default_max_dist

        cfg = self.config
        gz, gy, gx = (int(g) for g in cfg.grid)
        rays = rays_from_json(cfg.rays_json)
        dirs = jnp.asarray(np.asarray(rays.vertices, np.float32))
        spacing = tuple(float(a) for a in (cfg.anisotropy if cfg.anisotropy
                                           is not None else (1.0, 1.0, 1.0)))

        def fn(raw):
            x = raw["x"].astype(jnp.float32)
            y = raw["y"]                      # (B, D, H, W) int32
            labels = raw["labels"]            # (B, L) int32, 0-padded
            y_pos = jnp.maximum(y, 0)
            y_sub = y[:, ::gz, ::gy, ::gx]
            mask_neg = y_sub < 0
            prob_full = jax.vmap(
                lambda l, lab: edt_prob_core(l, lab, spacing))(y_pos, labels)
            prob_raw = prob_full[:, ::gz, ::gy, ::gx]
            max_dist = _default_max_dist(y.shape[1:])
            dist = _star_dist3d_batch_impl(y_pos, dirs, (gz, gy, gx), max_dist)
            dist_and_mask = jnp.concatenate(
                [dist, prob_raw[..., None]], axis=-1)
            prob = jnp.where(mask_neg, -1.0, prob_raw)[..., None]
            return {"x": x, "prob": prob, "dist": dist_and_mask}

        return fn

    def _instances_from_prediction(self, img_shape, prob, dist, points=None,
                                   prob_class=None, prob_thresh=None, nms_thresh=None,
                                   overlap_label=None, return_labels=True, scale=None,
                                   **nms_kwargs):
        """NMS + rasterization -> (labels, polyhedra dict); reference
        model3d.py:589-674."""
        if prob_thresh is None:
            prob_thresh = self.thresholds.prob
        if nms_thresh is None:
            nms_thresh = self.thresholds.nms

        rays = rays_from_json(self.config.rays_json)

        if points is not None:  # sparse
            points, probi, disti, indsi = non_maximum_suppression_3d_sparse(
                dist, prob, points, rays, nms_thresh=nms_thresh, **nms_kwargs)
            if prob_class is not None:
                prob_class = prob_class[indsi]
        else:  # dense
            points, probi, disti = non_maximum_suppression_3d(
                dist, prob, rays, grid=self.config.grid,
                prob_thresh=prob_thresh, nms_thresh=nms_thresh, **nms_kwargs)
            if prob_class is not None:
                inds = tuple(p // g for p, g in zip(points.T, self.config.grid))
                prob_class = prob_class[inds]

        verbose = nms_kwargs.get("verbose", False)
        verbose and print("render polygons...")

        if scale is not None:
            if not (isinstance(scale, dict) and all(a in scale for a in "XYZ")):
                raise ValueError("scale must be a dictionary with entries for 'X', 'Y', and 'Z'")
            rescale = (1 / scale["Z"], 1 / scale["Y"], 1 / scale["X"])
            points = points * np.array(rescale).reshape(1, 3)
            rays = rays.copy(scale=rescale)
        else:
            rescale = (1, 1, 1)

        labels, res_dict = self._render_survivors(
            img_shape, disti, points, probi, prob_class=prob_class,
            rays=rays, overlap_label=overlap_label,
            return_labels=return_labels, verbose=verbose)
        from ..ops.nms import LAST_NMS_COUNTERS
        if LAST_NMS_COUNTERS:
            res_dict["nms_counters"] = dict(LAST_NMS_COUNTERS)
        return labels, res_dict

    def _nms_keep(self, prob, dist, points, nms_thresh):
        """Greedy-NMS keep flags for a descending-prob-sorted candidate
        list with full-resolution points (used by the threshold optimizer's
        prefix-NMS trick, utils.optimize_threshold)."""
        import numpy as np
        from ..nms import non_maximum_suppression_3d_inds
        rays = rays_from_json(self.config.rays_json)
        return np.asarray(non_maximum_suppression_3d_inds(
            np.asarray(dist), np.asarray(points), rays=rays,
            scores=np.asarray(prob), thresh=float(nms_thresh), verbose=0))

    def _render_survivors(self, img_shape, disti, points, probi,
                          prob_class=None, rays=None, overlap_label=None,
                          return_labels=True, verbose=False):
        """Rasterize NMS survivors + build the result dict — the tail of
        :meth:`_instances_from_prediction` (after NMS), shared with the
        distributed stitch drivers (parallel/multihost.py) so their
        per-block polys match the sequential driver's keys and dtypes
        exactly."""
        if rays is None:
            rays = rays_from_json(self.config.rays_json)
        if return_labels:
            labels = polyhedron_to_label(disti, points, rays=rays, prob=probi,
                                         shape=img_shape, overlap_label=overlap_label,
                                         verbose=verbose)
            # relabel (keeping the overlap_label, which may be negative)
            if overlap_label is not None and overlap_label < 0 and (overlap_label in labels):
                overlap_mask = labels == overlap_label
                overlap_label2 = max(set(np.unique(labels)) - {overlap_label}) + 1
                labels[overlap_mask] = overlap_label2
                labels, fwd, _ = relabel_sequential(labels)
                labels[labels == fwd[overlap_label2]] = overlap_label
            else:
                labels, _, _ = relabel_sequential(labels)
        else:
            labels = None

        res_dict = dict(dist=disti, points=points, prob=probi, rays=rays,
                        rays_vertices=rays.vertices, rays_faces=rays.faces)

        if prob_class is not None:
            prob_class = np.asarray(prob_class)
            res_dict.update(dict(class_prob=prob_class, class_id=np.argmax(prob_class, axis=-1)))

        return labels, res_dict

    # -- fully device-resident prediction ----------------------------------

    @functools.lru_cache(maxsize=None)
    def _device_instances_fn(self, K, b_key, nms_statics, M, W, chunk, shape):
        """One jitted device program for the ENTIRE 3D instance-prediction
        pipeline: forward pass (Pallas CHW conv on TPU), sparse candidate
        extraction (threshold + border + top-K), banded polyhedron NMS
        (ops/nms.py ``_nms3d_banded_traced`` — the TPU-native replacement
        for the reference's hottest loop, stardist/lib/
        stardist3d_impl.cpp:956-1385), survivor compaction and packed-label
        rasterization. No intermediate touches the host; every
        data-dependent size decision is a static capacity with an in-kernel
        validity flag the (host) caller inspects once per volume.

        ``nms_statics`` = (axis, Q, NB, A_max, P, S): banding axis, block
        rows, band half-width in blocks, ambiguous-row and pair-slot
        capacities, lattice samples per axis."""
        from ..ops.nms import _bucket, _nms3d_banded_traced
        from ..ops.rasterize import _raster3d_packed_dyn
        import jax
        import jax.numpy as jnp
        multiclass = self._is_multiclass()
        extract = self._sparse_extract_fn(K, b_key, multiclass)
        grid = tuple(int(g) for g in self.config.grid)
        rays = rays_from_json(self.config.rays_json)
        ray_dirs = jnp.asarray(np.asarray(rays.vertices, np.float32))
        faces = jnp.asarray(np.asarray(rays.faces, np.int32))
        (axis, Q, NB, A_max, P, S) = nms_statics
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
            # 3d_sparse): np.argsort(prob, kind="stable")[::-1] — descending
            # prob with ties in descending list order
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
            keep, nms_flags, stats = _nms3d_banded_traced(
                d, points, ray_dirs, faces, n_valid, nms_thresh, grid,
                axis, Q, NB, A_max, P, S)
            kf = keep & valid
            n_surv = jnp.sum(kf.astype(jnp.int32))
            # compact survivors (in descending-prob = NMS rank order) into M
            # fixed slots via one stable sort
            surv_rank = jnp.cumsum(kf.astype(jnp.int32)) - 1
            key = jnp.where(kf, surv_rank, jnp.int32(2 ** 30))
            _, perm = jax.lax.sort(
                (key, jnp.arange(Npad, dtype=jnp.int32)), dimension=0,
                num_keys=1)
            Me = min(M, Npad)
            permM = perm[:Me]
            slot = jnp.arange(Me, dtype=jnp.int32)
            validM = slot < n_surv
            dM = jnp.take(d, permM, axis=0)
            pM = jnp.take(points, permM, axis=0).astype(jnp.float32) \
                * jnp.asarray(grid, jnp.float32)[None]
            probM = jnp.where(validM, jnp.take(vals, permM, axis=0), 0.0)
            pcM = jnp.take(pc, permM, axis=0) if multiclass else None
            # raster ordering contract (geometry/geom3d.py
            # polyhedron_to_label): decreasing probability, first writer
            # wins, ties -> EARLIER in the survivor list. Slots are already
            # in that list order, so order value = n_surv - slot handles
            # both the prob order and the tie rule in one expression.
            order_vals = jnp.where(validM, n_surv - slot, 0)
            labsM = jnp.where(validM, slot + 1, 0)
            labels_img = _raster3d_packed_dyn(
                dM, pM, order_vals, labsM, ray_dirs, faces, n_surv, shape,
                W, chunk)
            fits_surv = n_surv <= jnp.minimum(Me, 2 ** 15 - 1)
            # dist is in full-resolution voxels; the window must cover the
            # largest polyhedron
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
        """3D instance prediction with the whole pipeline resident on
        device — ONE jitted dispatch runs forward pass, candidate
        extraction, banded polyhedron NMS and label rasterization
        (`_device_instances_fn`); the host only uploads the volume and reads
        back a handful of scalars (validity flags + counts), retrying with
        the next capacity bucket on overflow and falling back to
        :meth:`predict_instances` when the field exceeds the device path's
        limits. Returns ``(labels, details)`` like
        :meth:`predict_instances` (labels relabeled sequentially, same as
        the host renderer). ``fetch=False`` keeps labels/candidates as
        device arrays.

        TPU-native counterpart of the reference's 3D predict->NMS->render
        flow (stardist/models/model3d.py:462-551 and stardist3d_impl.cpp
        greedy NMS + rasterizer) with zero host round trips in the steady
        state."""
        import jax
        import jax.numpy as jnp
        from ..ops.nms import _bucket, LAST_NMS_COUNTERS
        multiclass = self._is_multiclass()
        if prob_thresh is None:
            prob_thresh = self.thresholds.prob
        if nms_thresh is None:
            nms_thresh = self.thresholds.nms

        grid = tuple(self.config.grid)
        (x, axes, axes_net, axes_net_div_by, _permute_axes, resizer,
         n_tiles, _grid, grid_dict, channel, tiling_setup) = \
            self._predict_setup(img, axes, normalizer, None, False, {})
        shape_inst = tuple(s for s, a in zip(_permute_axes(img).shape,
                                             axes_net) if a != "C")
        b_key = self._device_border_key(b, x, axes_net, resizer)
        x_shape = x.shape
        tdt = getattr(self, "transfer_dtype", None)
        x_up = x[np.newaxis].astype(tdt) if tdt is not None else x[np.newaxis]
        x_dev = jnp.asarray(x_up)

        out_size = int(np.prod([s // g for s, g in zip(x_shape[:-1], grid)]))
        caps_key = "x".join(str(int(s)) for s in x_shape[:-1])
        caps = self._device_caps_for(caps_key)
        K = min(caps.get("K", self._extract_k0 >> 2), out_size)
        M = caps.get("M", 8192)
        Wwin = caps.get("W", 32)
        NB = caps.get("NB", 1)
        A = caps.get("A", 32)
        P = caps.get("P", 4096)
        Q, S, chunk = 256, 10, 16

        pt, nt = jnp.float32(prob_thresh), jnp.float32(nms_thresh)
        axis = int(np.argmax(shape_inst))
        for _ in range(16):
            fn = self._device_instances_fn(
                K, b_key, (axis, Q, NB, A, P, S), M, Wwin, chunk, shape_inst)
            outs = fn(self.params, self._extra_vars, x_dev, pt, nt)
            labels_dev, dM, pM, probM = outs[:4]
            pcM = outs[9] if multiclass else None
            n_surv, n_above, dmax, flags, stats = jax.device_get(outs[4:9])
            n_surv, n_above, dmax = int(n_surv), int(n_above), float(dmax)
            band_ok, amb_ok, pairs_ok, fits_surv, w_ok = (bool(f) for f in flags)
            max_amb, max_pairs = (int(s) for s in stats)
            if verbose:
                print(f"device predict 3D ladder: K={K} M={M} W={Wwin} "
                      f"NB={NB} A={A} P={P} -> n_above={n_above} "
                      f"n_surv={n_surv} dmax={dmax:.1f} band={band_ok} "
                      f"amb={amb_ok}/{max_amb} pairs={pairs_ok}/{max_pairs} "
                      f"fits={fits_surv} w={w_ok}", flush=True)
            retried = False
            if n_above > K:
                if K >= out_size:
                    break
                K = min(out_size, 1 << int(np.ceil(np.log2(n_above))))
                retried = True
            if not band_ok:
                if NB >= 8:
                    break
                NB *= 2
                retried = True
            if not amb_ok:
                A = min(1 << int(np.ceil(np.log2(max(max_amb, 2)))), Q)
                if A > Q:
                    break
                retried = True
            if not pairs_ok:
                if P >= 1 << 20:
                    break
                P = 1 << int(np.ceil(np.log2(max(max_pairs, 2))))
                retried = True
            if not fits_surv:
                if n_surv > 2 ** 15 - 1:
                    break
                M = 1 << int(np.ceil(np.log2(n_surv)))
                retried = True
            if not w_ok:
                need = 2.0 * dmax + 4.0
                Wwin = max(16, int(np.ceil(need / 8)) * 8)
                retried = True
            if retried:
                continue
            caps.update(K=K, M=M, W=Wwin, NB=NB, A=A, P=P)
            self._save_device_caps(self._device_predict_caps)
            LAST_NMS_COUNTERS.clear()
            LAST_NMS_COUNTERS.update(
                n_candidates=min(n_above, K), n_survivors=n_surv,
                n_amb_pairs=max_pairs, n_eval_pairs=max_pairs, n_rounds=1)
            if verbose:
                print(f"device predict 3D: {min(n_above, K)} candidates, "
                      f"{n_surv} survivors", flush=True)
            rays = rays_from_json(self.config.rays_json)
            details = dict(dist=dM[:n_surv], points=pM[:n_surv],
                           prob=probM[:n_surv], rays=rays,
                           rays_vertices=rays.vertices,
                           rays_faces=rays.faces,
                           nms_counters=dict(LAST_NMS_COUNTERS))
            if multiclass:
                details["class_prob"] = pcM[:n_surv]
                details["class_id"] = jnp.argmax(pcM[:n_surv], axis=-1)
            if fetch:
                dist_h, points_h, prob_h = (np.asarray(a) for a in jax.device_get(
                    (details["dist"], details["points"], details["prob"])))
                details.update(dist=dist_h,
                               points=points_h.astype(np.int32),
                               prob=prob_h)
                if multiclass:
                    pc_h = np.asarray(jax.device_get(details["class_prob"]))
                    details.update(class_prob=pc_h,
                                   class_id=np.argmax(pc_h, axis=-1))
                labels = np.asarray(labels_dev).astype(np.int32)
                labels, _, _ = relabel_sequential(labels)
            else:
                labels = labels_dev
            return labels, details
        # capacity cascade exhausted (or unsupported field): host path
        return self.predict_instances(img, axes=axes, normalizer=normalizer,
                                      prob_thresh=prob_thresh,
                                      nms_thresh=nms_thresh,
                                      show_tile_progress=False)

    def _axes_div_by(self, query_axes):
        if self.config.backbone == "unet":
            query_axes = axes_check_and_normalize(query_axes)
            assert len(self.config.unet_pool) == len(self.config.grid)
            div_by = dict(zip(
                self.config.axes.replace("C", ""),
                tuple(p ** self.config.unet_n_depth * g
                      for p, g in zip(self.config.unet_pool, self.config.grid)),
            ))
            return tuple(div_by.get(a, 1) for a in query_axes)
        elif self.config.backbone == "resnet":
            grid_dict = dict(zip(self.config.axes.replace("C", ""), self.config.grid))
            return tuple(grid_dict.get(a, 1) for a in query_axes)
        else:
            raise NotImplementedError()

    @property
    def _config_class(self):
        return Config3D
