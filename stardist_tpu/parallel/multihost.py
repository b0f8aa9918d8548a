"""Multi-host (multi-process) big-image block distribution.

The reference processes BlockND covers sequentially in one process
(stardist/models/base.py:952-975). Blocks are independent until the final
ownership stitch, so the pod-scale distribution story (SURVEY.md section
2.3: "shard blocks across TPU cores/hosts") is:

1. every process builds the same deterministic ``BlockND.cover``;
2. blocks are partitioned over processes; each process runs the network
   forward + candidate extraction + NMS for its blocks on its own
   addressable devices (ICI-local — no cross-host traffic);
3. ONE ``process_allgather`` (DCN) exchanges only the per-block *surviving
   candidates* (points/prob/dist — a few hundred KB), never images or
   label blocks;
4. every process replays the deterministic ownership stitch (rasterize →
   crop context → ``Block.filter_objects`` → ``relabel_sequential`` →
   masked write) from the gathered survivors, in block order — bit-identical
   to the sequential driver because rasterization and the ownership rule
   (``Block.is_responsible``, big.py) are pure functions of the survivor
   geometry.

Requires ``jax.distributed.initialize()`` before first JAX use; degrades to
the single-process path when jax has one process.
"""
from __future__ import annotations

import numpy as np
import jax

from ..big import _grid_divisible, BlockND, OBJECT_KEYS
from ..core.axes import axes_check_and_normalize, axes_dict
from ..matching import relabel_sequential


def _allgather_survivors(my, n_procs):
    """Exchange per-process survivor tables of varying length.

    ``my``: dict of equal-leading-dim arrays (block_id (n,), points (n, 2),
    prob (n,), dist (n, R)). Returns the concatenated global table (sorted
    by block_id, stable in the original per-process order)."""
    from jax.experimental import multihost_utils

    n = np.int32(len(my["block_id"]))
    counts = np.asarray(multihost_utils.process_allgather(n))
    cap = int(counts.max(initial=0))
    out = {}
    for k, v in my.items():
        v = np.asarray(v)
        pad = [(0, cap - v.shape[0])] + [(0, 0)] * (v.ndim - 1)
        g = np.asarray(multihost_utils.process_allgather(np.pad(v, pad)))
        out[k] = np.concatenate([g[p][: counts[p]] for p in range(n_procs)])
    return out


def predict_instances_big_multihost(model, img, axes, block_size, min_overlap,
                                    context=None, labels_out=None,
                                    labels_out_dtype=np.int32,
                                    prob_thresh=None, nms_thresh=None,
                                    **kwargs):
    """Blockwise 2D instance prediction distributed over jax processes.

    Returns ``(labels_out, polys_all)`` — identical on every process, and
    bit-identical to ``model.predict_instances_big`` of the same arguments
    run in one process (tests/test_multihost.py asserts this on a
    2-process CPU dryrun). ``img`` must be a normalized full image (every
    process holds it or a zarr-like view of it).
    """
    from ..geometry import polygons_to_label
    from ..geometry.geom2d import dist_to_coord

    if model.config.n_dim != 2 or model._is_multiclass():
        raise NotImplementedError(
            "multihost big-prediction is 2D single-class only for now")
    if prob_thresh is None:
        prob_thresh = model.thresholds.prob
    if nms_thresh is None:
        nms_thresh = model.thresholds.nms

    pid = jax.process_index()
    n_procs = jax.process_count()

    n = img.ndim
    axes = axes_check_and_normalize(axes, length=n)
    grid = model._axes_div_by(axes)
    axes_out = model.config.axes.replace("C", "")
    shape_dict = dict(zip(axes, img.shape))
    shape_out = tuple(shape_dict[a] for a in axes_out)

    if context is None:
        context = model._axes_tile_overlap(axes)
    if np.isscalar(block_size):
        block_size = n * [block_size]
    if np.isscalar(min_overlap):
        min_overlap = n * [min_overlap]
    if np.isscalar(context):
        context = n * [context]
    block_size, min_overlap, context = (list(block_size), list(min_overlap),
                                        list(context))
    channel = axes_dict(axes)["C"] if "C" in axes else None
    if channel is not None:
        block_size[channel] = img.shape[channel]
        min_overlap[channel] = context[channel] = 0
    block_size = tuple(_grid_divisible(g, v, name="block_size", verbose=False)
                       for v, g in zip(block_size, grid))
    min_overlap = tuple(_grid_divisible(g, v, name="min_overlap", verbose=False)
                        for v, g in zip(min_overlap, grid))
    context = tuple(_grid_divisible(g, v, name="context", verbose=False)
                    for v, g in zip(context, grid))

    blocks = BlockND.cover(img.shape, axes, block_size, min_overlap, context, grid)

    # -- local phase: forward + NMS for this process's block partition ------
    my = dict(block_id=np.zeros(0, np.int32),
              points=np.zeros((0, 2), np.float32),
              prob=np.zeros(0, np.float32),
              dist=np.zeros((0, model.config.n_rays), np.float32))
    from ..nms import non_maximum_suppression_sparse
    for bi in range(pid, len(blocks), n_procs):
        block = blocks[bi]
        x = np.asarray(block.read(img, axes=axes))
        prob_s, dist_s, points_s = model.predict_sparse(
            x, axes=axes, prob_thresh=prob_thresh,
            show_tile_progress=False, **kwargs)[:3]
        pointsi, probi, disti, _ = non_maximum_suppression_sparse(
            dist_s, prob_s, points_s, nms_thresh=nms_thresh)
        my["block_id"] = np.concatenate(
            [my["block_id"], np.full(len(probi), bi, np.int32)])
        my["points"] = np.concatenate(
            [my["points"], np.asarray(pointsi, np.float32)])
        my["prob"] = np.concatenate(
            [my["prob"], np.asarray(probi, np.float32)])
        my["dist"] = np.concatenate(
            [my["dist"], np.asarray(disti, np.float32)])

    # -- DCN exchange: survivors only ---------------------------------------
    table = (_allgather_survivors(my, n_procs) if n_procs > 1 else my)
    order = np.argsort(table["block_id"], kind="stable")
    table = {k: v[order] for k, v in table.items()}
    starts = np.searchsorted(table["block_id"], np.arange(len(blocks) + 1))

    # -- deterministic replay of the sequential stitch ----------------------
    if np.isscalar(labels_out) and bool(labels_out) is False:
        labels_out = None
    elif labels_out is None:
        labels_out = np.zeros(shape_out, dtype=labels_out_dtype)

    polys_all = {}
    label_offset = 1
    for bi, block in enumerate(blocks):
        sl = slice(starts[bi], starts[bi + 1])
        probi = table["prob"][sl]
        disti = table["dist"][sl]
        pointsi = table["points"][sl]
        block_shape = tuple(s.stop - s.start
                            for s in block.slice_read(axes_out))
        labels = polygons_to_label(disti, pointsi, prob=probi,
                                   shape=block_shape)
        polys = dict(points=pointsi, prob=probi, dist=disti,
                     coord=dist_to_coord(disti, pointsi))
        labels = block.crop_context(labels, axes=axes_out)
        labels, polys = block.filter_objects(labels, polys, axes=axes_out)
        labels = relabel_sequential(labels, label_offset)[0]
        if labels_out is not None:
            block.write(labels_out, labels, axes=axes_out)
        for key, v in polys.items():
            polys_all.setdefault(key, []).append(v)
        label_offset += len(polys["prob"])

    polys_all = {
        k: (np.concatenate(v) if k in OBJECT_KEYS else v[0])
        for k, v in polys_all.items()
    }
    return labels_out, polys_all
