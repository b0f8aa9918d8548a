"""Multi-host (multi-process) big-image block distribution — 2D and 3D,
single- and multi-class.

The reference processes BlockND covers sequentially in one process
(stardist/models/base.py:952-975). Blocks are independent until the final
ownership stitch, so the pod-scale distribution story (SURVEY.md section
2.3: "shard blocks across TPU cores/hosts") is:

1. every process builds the same deterministic ``BlockND.cover``;
2. blocks are partitioned over processes; each process runs the network
   forward + candidate extraction + NMS for its blocks on its own
   addressable devices (ICI-local — no cross-host traffic);
3. ONE ``process_allgather`` (DCN) exchanges only the per-block *surviving
   candidates* (points/prob/dist[/class_prob] — a few hundred KB), never
   images or label blocks;
4. the deterministic ownership stitch (rasterize → crop context →
   ``Block.filter_objects`` → ``relabel_sequential`` → masked write) runs
   from the gathered survivors, in block order — bit-identical to the
   sequential driver because rasterization and the ownership rule
   (``Block.is_responsible``, big.py) are pure functions of the survivor
   geometry. Two modes:

   - ``stitch="replicated"`` (default): every process replays the full
     stitch, so every process ends with the complete ``labels_out`` and
     ``polys_all`` in memory.
   - ``stitch="partitioned"``: each process rasterizes only its OWN
     ~n_blocks/n_procs blocks (the stitch CPU cost shrinks by n_procs);
     one extra tiny allgather exchanges per-block owned-object counts (for
     the global label offsets) and the owned survivor rows (so
     ``polys_all`` is complete and identical everywhere). ``labels_out``
     is written only for this process's blocks — complete when it is a
     shared store (zarr on shared storage; block write regions are
     disjoint by construction), a per-process partial image otherwise.

Result parity with ``predict_instances_big``: identical ``labels_out``
(replicated mode) and identical ``polys_all`` keys/dtypes/values, except
``nms_counters`` (per-process NMS diagnostics, intentionally omitted — they
would differ between processes).

Requires ``jax.distributed.initialize()`` before first JAX use; degrades to
the single-process path when jax has one process.
"""
from __future__ import annotations

import numpy as np
import jax

from ..big import _grid_divisible, BlockND, OBJECT_KEYS
from ..core.axes import axes_check_and_normalize, axes_dict
from ..matching import relabel_sequential


def _allgather_tables(my, n_procs):
    """Exchange per-process survivor tables of varying length.

    ``my``: dict of equal-leading-dim arrays (dtypes preserved). Returns the
    concatenated global table in process order (sort by block_id afterwards
    for block order)."""
    from jax.experimental import multihost_utils

    lead = len(next(iter(my.values())))
    n = np.int32(lead)
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
                                    stitch="replicated", **kwargs):
    """Blockwise instance prediction distributed over jax processes (2D/3D,
    single-/multi-class). Returns ``(labels_out, polys_all)``; see module
    docstring for the parity contract and the two stitch modes. ``img``
    must be a normalized full image (every process holds it or a zarr-like
    view of it)."""
    if stitch not in ("replicated", "partitioned"):
        raise ValueError(f"unknown stitch mode: {stitch!r}")
    multiclass = model._is_multiclass()
    ndim = model.config.n_dim
    if prob_thresh is None:
        prob_thresh = model.thresholds.prob
    if nms_thresh is None:
        nms_thresh = model.thresholds.nms
    if ndim == 3:
        from ..rays3d import rays_from_json
        rays = rays_from_json(model.config.rays_json)
        from ..nms import non_maximum_suppression_3d_sparse as _nms_sparse
        nms_sparse = lambda d, p, pts: _nms_sparse(d, p, pts, rays,
                                                   nms_thresh=nms_thresh)
    else:
        rays = None
        from ..nms import non_maximum_suppression_sparse as _nms_sparse
        nms_sparse = lambda d, p, pts: _nms_sparse(d, p, pts,
                                                   nms_thresh=nms_thresh)

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
    my_blocks = list(range(pid, len(blocks), n_procs))

    # -- local phase: forward + NMS for this process's block partition ------
    my = dict(block_id=np.zeros(0, np.int32),
              points=np.zeros((0, ndim), np.int64),
              prob=np.zeros(0, np.float32),
              dist=np.zeros((0, model.config.n_rays), np.float32))
    if multiclass:
        my["class_prob"] = np.zeros((0, model.config.n_classes + 1), np.float32)
    pts_dtype = None
    for bi in my_blocks:
        block = blocks[bi]
        x = np.asarray(block.read(img, axes=axes))
        res = model.predict_sparse(x, axes=axes, prob_thresh=prob_thresh,
                                   show_tile_progress=False, **kwargs)
        if multiclass:
            prob_s, dist_s, pc_s, points_s = res[:4]
        else:
            prob_s, dist_s, points_s = res[:3]
            pc_s = None
        pointsi, probi, disti, indsi = nms_sparse(dist_s, prob_s, points_s)
        pts_dtype = np.asarray(pointsi).dtype
        my["block_id"] = np.concatenate(
            [my["block_id"], np.full(len(probi), bi, np.int32)])
        my["points"] = np.concatenate(
            [my["points"], np.asarray(pointsi, np.int64)])
        my["prob"] = np.concatenate([my["prob"], np.asarray(probi, np.float32)])
        my["dist"] = np.concatenate([my["dist"], np.asarray(disti, np.float32)])
        if multiclass:
            my["class_prob"] = np.concatenate(
                [my["class_prob"], np.asarray(pc_s, np.float32)[indsi]])

    # -- DCN exchange: survivors only ---------------------------------------
    table = (_allgather_tables(my, n_procs) if n_procs > 1 else my)
    order = np.argsort(table["block_id"], kind="stable")
    table = {k: v[order] for k, v in table.items()}
    starts = np.searchsorted(table["block_id"], np.arange(len(blocks) + 1))
    # points dtype must match the sequential driver's exactly (allgather
    # shipped them as int64); the model's NMS wrappers return int points
    from jax.experimental import multihost_utils
    codes = {np.dtype(np.int32): 0, np.dtype(np.int64): 1}
    code = -1 if pts_dtype is None else codes.get(np.dtype(pts_dtype), 1)
    if n_procs > 1:
        # a process whose partition was empty never saw the NMS points dtype
        # (code -1); take the max over processes that did
        code = int(np.asarray(
            multihost_utils.process_allgather(np.int32(code))).max())
    table["points"] = table["points"].astype(
        {-1: np.int64, 0: np.int32, 1: np.int64}[code])

    if np.isscalar(labels_out) and bool(labels_out) is False:
        labels_out = None
    elif labels_out is None:
        labels_out = np.zeros(shape_out, dtype=labels_out_dtype)

    def _stitch_block(bi):
        """Rasterize + ownership-filter one block from the gathered table.
        Returns (labels_filtered, polys_filtered) — polys coords already
        global (translated by filter_objects)."""
        block = blocks[bi]
        sl = slice(starts[bi], starts[bi + 1])
        pc_i = table["class_prob"][sl] if multiclass else None
        block_shape = tuple(s.stop - s.start
                            for s in block.slice_read(axes_out))
        labels, polys = model._render_survivors(
            block_shape, table["dist"][sl], table["points"][sl],
            table["prob"][sl], prob_class=pc_i)
        labels = block.crop_context(labels, axes=axes_out)
        return block.filter_objects(labels, polys, axes=axes_out)

    polys_all = {}

    if stitch == "replicated":
        label_offset = 1
        for bi, block in enumerate(blocks):
            labels, polys = _stitch_block(bi)
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

    # -- partitioned stitch: each process rasterizes only its blocks --------
    # Exchange only (block_id, owned table-row index) — a few bytes per
    # object; every process then rebuilds polys_all deterministically from
    # the (already global) survivor table.
    from ..big import COORD_KEYS
    counts = np.zeros(len(blocks), np.int64)
    mine = {}
    own = dict(block_id=np.zeros(0, np.int32), row=np.zeros(0, np.int64))
    for bi in my_blocks:
        labels, polys = _stitch_block(bi)
        # surviving label ids map (id-1) to rows of the block's table slice
        # (the render-order contract, see Block.filter_objects)
        ids = np.unique(labels)
        rows = (ids[ids > 0] - 1).astype(np.int64)
        labels = relabel_sequential(labels, 1)[0]  # local ids 1..n
        counts[bi] = len(rows)
        mine[bi] = labels
        own["block_id"] = np.concatenate(
            [own["block_id"], np.full(len(rows), bi, np.int32)])
        own["row"] = np.concatenate([own["row"], rows])
    if n_procs > 1:
        counts = np.asarray(
            multihost_utils.process_allgather(counts)).max(axis=0)
    offsets = 1 + np.concatenate([[0], np.cumsum(counts)[:-1]])

    if labels_out is not None:
        for bi in my_blocks:
            labels = mine[bi]
            shifted = np.where(labels > 0, labels + (offsets[bi] - 1),
                               0).astype(labels.dtype)
            blocks[bi].write(labels_out, shifted, axes=axes_out)

    gathered = (_allgather_tables(own, n_procs) if n_procs > 1 else own)
    g_order = np.argsort(gathered["block_id"], kind="stable")
    g_bid = gathered["block_id"][g_order]
    g_row = gathered["row"][g_order]
    g_starts = np.searchsorted(g_bid, np.arange(len(blocks) + 1))

    # deterministic polys reconstruction, identical on every process and to
    # the sequential driver: per block, render the per-object dict from the
    # owned table rows (same construction as _render_survivors) and
    # translate coordinates exactly as Block.filter_objects does
    for bi, block in enumerate(blocks):
        sl = slice(starts[bi], starts[bi + 1])
        rows = g_row[g_starts[bi]: g_starts[bi + 1]]
        pc_i = table["class_prob"][sl][rows] if multiclass else None
        _, polys = model._render_survivors(
            None, table["dist"][sl][rows], table["points"][sl][rows],
            table["prob"][sl][rows], prob_class=pc_i, return_labels=False)
        for k in COORD_KEYS:
            if k in polys:
                polys[k] = block.translate_coordinates(polys[k], axes=axes_out)
        for key, v in polys.items():
            polys_all.setdefault(key, []).append(v)
    polys_all = {
        k: (np.concatenate(v) if k in OBJECT_KEYS else v[0])
        for k, v in polys_all.items()
    }
    return labels_out, polys_all
