"""Non-maximum suppression — Python API layer (reference stardist/nms.py).

Thresholding/sorting/marshalling happens here; the pairwise-overlap and
greedy-suppression compute runs on TPU (see stardist_tpu/ops/nms.py).
"""
from __future__ import annotations

from time import time

import numpy as np

from .utils import _normalize_grid
from .ops.nms import nms_polygons, nms_polyhedra


def _ind_prob_thresh(prob, prob_thresh, b=2):
    """Candidate mask: prob above threshold and at least ``b`` pixels from the
    border (reference nms.py:6-17)."""
    if b is not None and np.isscalar(b):
        b = ((b, b),) * prob.ndim
    ind_thresh = prob > prob_thresh
    if b is not None:
        _ind_thresh = np.zeros_like(ind_thresh)
        ss = tuple(
            slice(_bs[0] if _bs[0] > 0 else None, -_bs[1] if _bs[1] > 0 else None)
            for _bs in b
        )
        _ind_thresh[ss] = True
        ind_thresh &= _ind_thresh
    return ind_thresh


def _non_maximum_suppression_old(coord, prob, grid=(1, 1), b=2, nms_thresh=0.5,
                                 prob_thresh=0.5, verbose=False, max_bbox_search=True):
    """Legacy NMS on a dense coordinate map (reference nms.py:20-74).

    coord.shape = (Ny, Nx, 2, n_rays); returns the retained grid-index points.
    """
    assert prob.ndim == 2 and coord.ndim == 4
    grid = _normalize_grid(grid, 2)
    mask = _ind_prob_thresh(prob, prob_thresh, b)
    points = np.stack(np.where(mask), axis=1)
    scores = prob[mask]
    # recover (dist, center): center = grid * point; dist_k = |coord_k - center|
    centers = points * np.array(grid).reshape(1, 2)
    coords = coord[mask]  # (n, 2, n_rays)
    rel = coords - centers[:, :, None]
    dist = np.sqrt(np.sum(rel ** 2, axis=1)).astype(np.float32)

    ind = np.argsort(scores, kind="stable")[::-1]
    survivors = np.zeros(len(ind), bool)
    survivors[ind] = nms_polygons(dist[ind], centers[ind].astype(np.float32),
                                  scores=scores[ind], thresh=float(nms_thresh),
                                  verbose=verbose)
    if verbose:
        print("keeping %s/%s polygons" % (np.count_nonzero(survivors), len(survivors)))
    return points[survivors]


def non_maximum_suppression(dist, prob, grid=(1, 1), b=2, nms_thresh=0.5,
                            prob_thresh=0.5, use_bbox=True, use_kdtree=True,
                            verbose=False, **nms_opts):
    """NMS of dense 2D predictions. dist (Ny,Nx,R), prob (Ny,Nx).

    Returns (points, prob, dist) of the retained polygons; points are in
    full-resolution coordinates (grid applied)."""
    assert prob.ndim == 2 and dist.ndim == 3 and prob.shape == dist.shape[:2]
    dist = np.asarray(dist)
    prob = np.asarray(prob)
    grid = _normalize_grid(grid, 2)

    mask = _ind_prob_thresh(prob, prob_thresh, b)
    points = np.stack(np.where(mask), axis=1)
    disti = dist[mask]
    scores = prob[mask]

    ind = np.argsort(scores, kind="stable")[::-1]
    disti = disti[ind]
    scores = scores[ind]
    points = points[ind]
    points = points * np.array(grid).reshape((1, 2))

    if verbose:
        t = time()
    inds = non_maximum_suppression_inds(disti, points.astype(np.int32, copy=False),
                                        scores=scores, use_bbox=use_bbox,
                                        use_kdtree=use_kdtree, thresh=nms_thresh,
                                        verbose=verbose, **nms_opts)
    if verbose:
        print("keeping %s/%s polygons" % (np.count_nonzero(inds), len(inds)))
        print("NMS took %.4f s" % (time() - t))

    return points[inds], scores[inds], disti[inds]


def non_maximum_suppression_sparse(dist, prob, points, b=2, nms_thresh=0.5,
                                   use_bbox=True, use_kdtree=True, verbose=False,
                                   **nms_opts):
    """NMS from sparse candidate lists. Returns (points, prob, dist, inds_original).

    ``dist`` may be a device (jax) array — it is consumed by the device NMS
    without a host round trip; only the surviving rows are transferred back
    (the on-device candidate extraction path, models/base.py)."""
    dist_on_device = not isinstance(dist, (list, tuple, np.ndarray))
    if not dist_on_device:
        dist = np.asarray(dist)
    prob = np.asarray(prob)
    points = np.asarray(points)

    assert dist.ndim == 2 and prob.ndim == 1 and points.ndim == 2 \
        and points.shape[-1] == 2 and len(prob) == len(dist) == len(points)

    inds_original = np.arange(len(prob))
    _sorted = np.argsort(prob, kind="stable")[::-1]
    if np.array_equal(_sorted, inds_original):
        probi, disti, pointsi = prob, dist, points
    else:
        probi = prob[_sorted]
        disti = dist[_sorted]
        pointsi = points[_sorted]
        inds_original = inds_original[_sorted]

    if verbose:
        print("non-maximum suppression...")
        t = time()
    inds = non_maximum_suppression_inds(disti, pointsi, scores=probi,
                                        thresh=nms_thresh, use_kdtree=use_kdtree,
                                        verbose=verbose, **nms_opts)
    if verbose:
        print("keeping %s/%s polygons" % (np.count_nonzero(inds), len(inds)))
        print("NMS took %.4f s" % (time() - t))

    if dist_on_device:
        # download only the surviving rows
        disti = np.asarray(disti[np.flatnonzero(inds)])
        return pointsi[inds], probi[inds], disti, inds_original[inds]
    return pointsi[inds], probi[inds], disti[inds], inds_original[inds]


def non_maximum_suppression_inds(dist, points, scores, thresh=0.5, use_bbox=True,
                                 use_kdtree=True, verbose=1, **nms_opts):
    """Greedy NMS over score-sorted polygons: P1 suppresses P2 if
    overlap(P1,P2) = A_inter / min(A1,A2) > thresh. Returns bool survivors."""
    assert dist.ndim == 2 and points.ndim == 2
    n_poly = dist.shape[0]
    if scores is None:
        scores = np.ones(n_poly)
    assert len(scores) == n_poly and points.shape[0] == n_poly
    if isinstance(dist, np.ndarray):
        dist = dist.astype(np.float32, copy=False)
    return nms_polygons(dist,
                        points.astype(np.float32, copy=False),
                        scores=scores, thresh=float(thresh), use_bbox=use_bbox,
                        use_kdtree=use_kdtree, verbose=verbose, **nms_opts)


# ---------------------------------------------------------------------------
# 3D
# ---------------------------------------------------------------------------

def non_maximum_suppression_3d(dist, prob, rays, grid=(1, 1, 1), b=2,
                               nms_thresh=0.5, prob_thresh=0.5, use_bbox=True,
                               use_kdtree=True, verbose=False, **nms_opts):
    """NMS of dense 3D predictions. dist (Nz,Ny,Nx,R), prob (Nz,Ny,Nx)."""
    dist = np.asarray(dist)
    prob = np.asarray(prob)
    assert prob.ndim == 3 and dist.ndim == 4 and dist.shape[-1] == len(rays) \
        and prob.shape == dist.shape[:3]
    grid = _normalize_grid(grid, 3)

    verbose and print(
        f"predicting instances with prob_thresh = {prob_thresh} and nms_thresh = {nms_thresh}",
        flush=True)

    ind_thresh = _ind_prob_thresh(prob, prob_thresh, b)
    points = np.stack(np.where(ind_thresh), axis=1)
    verbose and print(f"found {len(points)} candidates")
    probi = prob[ind_thresh]
    disti = dist[ind_thresh]

    _sorted = np.argsort(probi, kind="stable")[::-1]
    probi = probi[_sorted]
    disti = disti[_sorted]
    points = points[_sorted]

    verbose and print("non-maximum suppression...")
    points = points * np.array(grid).reshape((1, 3))

    inds = non_maximum_suppression_3d_inds(disti, points, rays=rays, scores=probi,
                                           thresh=nms_thresh, use_bbox=use_bbox,
                                           use_kdtree=use_kdtree, verbose=verbose,
                                           **nms_opts)
    verbose and print("keeping %s/%s polyhedra" % (np.count_nonzero(inds), len(inds)))
    return points[inds], probi[inds], disti[inds]


def non_maximum_suppression_3d_sparse(dist, prob, points, rays, b=2, nms_thresh=0.5,
                                      use_kdtree=True, verbose=False, **nms_opts):
    """NMS from sparse 3D candidate lists. Returns (points, prob, dist, inds_original).

    ``dist`` may be a device (jax) array — consumed by the device NMS where
    it lives; only surviving rows transfer back."""
    dist_on_device = not isinstance(dist, (list, tuple, np.ndarray))
    if not dist_on_device:
        dist = np.asarray(dist)
    prob = np.asarray(prob)
    points = np.asarray(points)
    assert dist.ndim == 2 and prob.ndim == 1 and points.ndim == 2 \
        and dist.shape[-1] == len(rays) and points.shape[-1] == 3 \
        and len(prob) == len(dist) == len(points)

    inds_original = np.arange(len(prob))
    _sorted = np.argsort(prob, kind="stable")[::-1]
    if np.array_equal(_sorted, inds_original):
        probi, disti, pointsi = prob, dist, points
    else:
        probi = prob[_sorted]
        disti = dist[_sorted]
        pointsi = points[_sorted]
        inds_original = inds_original[_sorted]

    verbose and print("non-maximum suppression...")
    inds = non_maximum_suppression_3d_inds(disti, pointsi, rays=rays, scores=probi,
                                           thresh=nms_thresh, use_kdtree=use_kdtree,
                                           verbose=verbose, **nms_opts)
    verbose and print("keeping %s/%s polyhedra" % (np.count_nonzero(inds), len(inds)))
    if dist_on_device:
        disti = np.asarray(disti[np.flatnonzero(inds)])
        return pointsi[inds], probi[inds], disti, inds_original[inds]
    return pointsi[inds], probi[inds], disti[inds], inds_original[inds]


def non_maximum_suppression_3d_inds(dist, points, rays, scores, thresh=0.5,
                                    use_bbox=True, use_kdtree=True, verbose=1,
                                    **nms_opts):
    """Greedy NMS over 3D star polyhedra (sorted internally by scores)."""
    assert dist.ndim == 2 and points.ndim == 2 and dist.shape[1] == len(rays)
    n_poly = dist.shape[0]
    if scores is None:
        scores = np.ones(n_poly)
    assert len(scores) == n_poly and points.shape[0] == n_poly

    ind = np.argsort(scores, kind="stable")[::-1]
    survivors = np.ones(n_poly, bool)
    if verbose:
        t = time()
    disti = dist[ind] if not isinstance(dist, np.ndarray) else \
        dist[ind].astype(np.float32, copy=False)
    survivors[ind] = nms_polyhedra(
        disti,
        points[ind].astype(np.float32, copy=False),
        rays, scores=np.asarray(scores)[ind], thresh=float(thresh),
        use_bbox=use_bbox, use_kdtree=use_kdtree, verbose=verbose, **nms_opts)
    if verbose:
        print("NMS took %.4f s" % (time() - t))
    return survivors
