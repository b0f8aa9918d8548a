"""Label/data utilities.

TPU-native re-implementation of the reference ``stardist/utils.py`` surface
(edt_prob, fill_label_holes, calculate_extents, sample_points,
mask_to_categorical, optimize_threshold, export_imagej_rois, grid helpers).
Self-contained: no csbdeep / scikit-image / numba / edt dependencies.
"""
from __future__ import annotations

import datetime
import os
import struct
import warnings
from collections import defaultdict, namedtuple
from collections.abc import Iterable
from pathlib import Path
from zipfile import ZIP_DEFLATED, ZipFile

import numpy as np
from scipy.ndimage import binary_fill_holes, distance_transform_edt, find_objects
from scipy.optimize import minimize_scalar

from .matching import matching_dataset, _check_label_array


def path_absolute(path_relative):
    """Absolute path to a package resource."""
    return os.path.join(os.path.abspath(os.path.dirname(__file__)), path_relative)


def abspath(root, relpath):
    root = Path(root)
    base = root if root.is_dir() else root.parent
    return str((base / relpath).absolute())


def _is_power_of_2(i):
    assert i > 0
    e = np.log2(i)
    return e == int(e)


def _is_floatarray(x):
    return isinstance(x.dtype.type(0), np.floating)


def _normalize_grid(grid, n):
    try:
        grid = tuple(grid)
        if not (len(grid) == n and all(map(np.isscalar, grid)) and all(map(_is_power_of_2, grid))):
            raise TypeError()
        return tuple(int(g) for g in grid)
    except (TypeError, AssertionError):
        raise ValueError(
            f"grid = {grid} must be a list/tuple of length {n} with values that are power of 2"
        )


def grid_divisible_patch_size(patch_size, grid, warn=True):
    patch_size, grid = tuple(patch_size), tuple(grid)
    assert len(patch_size) == len(grid)
    rounded = tuple(int(np.ceil(p / g) * g) for p, g in zip(patch_size, grid))
    if rounded != patch_size and warn:
        warnings.warn(
            f"increasing patch_size from {patch_size} to {rounded}, "
            f"since it was not evenly divisible by grid {grid}"
        )
    return rounded


# ---------------------------------------------------------------------------
# region properties (minimal scikit-image regionprops replacement)
# ---------------------------------------------------------------------------

Region = namedtuple("Region", ("label", "slice", "bbox", "centroid", "area"))


def regions(lbl):
    """Minimal regionprops: per-label slice, bbox, integer-free centroid, area.

    bbox follows skimage convention: (min_0, ..., min_n, max_0, ..., max_n)
    with exclusive max.
    """
    _check_label_array(lbl, "lbl")
    out = []
    for i, sl in enumerate(find_objects(lbl), 1):
        if sl is None:
            continue
        mask = lbl[sl] == i
        idx = np.nonzero(mask)
        centroid = tuple(float(np.mean(ii)) + s.start for ii, s in zip(idx, sl))
        bbox = tuple(s.start for s in sl) + tuple(s.stop for s in sl)
        out.append(Region(label=i, slice=sl, bbox=bbox, centroid=centroid, area=int(len(idx[0]))))
    return out


def calculate_extents(lbl, func=np.median):
    """Aggregate bounding-box sizes of objects in label image(s)."""
    if (isinstance(lbl, np.ndarray) and lbl.ndim == 4) or (
        not isinstance(lbl, np.ndarray) and isinstance(lbl, Iterable)
    ):
        return func(np.stack([calculate_extents(y, func) for y in lbl], axis=0), axis=0)
    n = lbl.ndim
    if n not in (2, 3):
        raise ValueError("label image should be 2- or 3-dimensional (or pass a list of these)")
    regs = regions(lbl)
    if len(regs) == 0:
        return np.zeros(n)
    extents = np.array([np.array(r.bbox[n:]) - np.array(r.bbox[:n]) for r in regs])
    return func(extents, axis=0)


# ---------------------------------------------------------------------------
# EDT-based probability targets
# ---------------------------------------------------------------------------

def edt_prob(lbl_img, anisotropy=None, engine="scipy"):
    """Per-object normalized Euclidean distance transform.

    For every pixel of object ``l``: distance to the nearest pixel NOT labeled
    ``l``, normalized by the object's maximum distance. Background stays 0.
    Semantics follow the reference scipy fallback
    (stardist/utils.py:98-125): each object is processed in its bounding box
    grown by one pixel for interior sides.

    engine='jax' runs the exact separable min-plus EDT on device
    (stardist_tpu/ops/edt.py).
    """
    if engine == "jax":
        from .ops.edt import edt_prob_jax
        return edt_prob_jax(lbl_img, anisotropy=anisotropy)
    constant_img = lbl_img.min() == lbl_img.max() and lbl_img.flat[0] > 0
    if constant_img:
        lbl_img = np.pad(lbl_img, ((1, 1),) * lbl_img.ndim, mode="constant")
        warnings.warn("EDT of constant label image is ill-defined. (Assuming background around it.)")
    prob = np.zeros(lbl_img.shape, np.float32)
    for i, sl in enumerate(find_objects(lbl_img), 1):
        if sl is None:
            continue
        interior = [(s.start > 0, s.stop < sz) for s, sz in zip(sl, lbl_img.shape)]
        grown = tuple(
            slice(s.start - int(w[0]), s.stop + int(w[1])) for s, w in zip(sl, interior)
        )
        shrink = tuple(slice(int(w[0]), -1 if w[1] else None) for w in interior)
        grown_mask = lbl_img[grown] == i
        mask = grown_mask[shrink]
        edt = distance_transform_edt(grown_mask, sampling=anisotropy)[shrink][mask]
        prob[sl][mask] = edt / (np.max(edt) + 1e-10)
    if constant_img:
        prob = prob[(slice(1, -1),) * lbl_img.ndim].copy()
    return prob


def fill_label_holes(lbl_img, **kwargs):
    """Fill small holes in a label image (per object, within grown bbox)."""
    filled = np.zeros_like(lbl_img)
    for i, sl in enumerate(find_objects(lbl_img), 1):
        if sl is None:
            continue
        interior = [(s.start > 0, s.stop < sz) for s, sz in zip(sl, lbl_img.shape)]
        grown = tuple(
            slice(s.start - int(w[0]), s.stop + int(w[1])) for s, w in zip(sl, interior)
        )
        shrink = tuple(slice(int(w[0]), -1 if w[1] else None) for w in interior)
        mask_filled = binary_fill_holes(lbl_img[grown] == i, **kwargs)[shrink]
        filled[sl][mask_filled] = i
    return filled


def clear_border(lbl):
    """Remove objects touching the image border (skimage.segmentation.clear_border
    replacement, used for shape-completion training; reference model2d.py:76)."""
    border = np.zeros(lbl.shape, bool)
    for ax in range(lbl.ndim):
        sl0 = [slice(None)] * lbl.ndim
        sl1 = [slice(None)] * lbl.ndim
        sl0[ax] = 0
        sl1[ax] = -1
        border[tuple(sl0)] = True
        border[tuple(sl1)] = True
    touching = np.unique(lbl[border & (lbl > 0)])
    out = lbl.copy()
    if len(touching):
        out[np.isin(out, touching)] = 0
    return out


def sample_points(n_samples, mask, prob=None, b=2):
    """Sample point locations from a boolean mask (away from the border)."""
    if b is not None and b > 0:
        mask_b = np.zeros_like(mask)
        mask_b[b:-b, b:-b] = True
    else:
        mask_b = True
    points = np.nonzero(mask & mask_b)
    if prob is not None:
        w = prob[points[0], points[1]].astype(np.float64)
        w /= np.sum(w)
        ind = np.random.choice(len(points[0]), n_samples, replace=True, p=w)
    else:
        ind = np.random.choice(len(points[0]), n_samples, replace=True)
    return np.stack((points[0][ind], points[1][ind]), axis=-1)


# ---------------------------------------------------------------------------
# multiclass helpers
# ---------------------------------------------------------------------------

def _invert_dict(d):
    res = defaultdict(list)
    for k, v in d.items():
        res[v].append(k)
    return res


def mask_to_categorical(y, n_classes, classes, return_cls_dict=False):
    """Generate a multi-channel categorical class map of shape y.shape+(n_classes+1,).

    ``classes`` maps label id -> class id (0=background, 1..n_classes=object
    class, None=ignore: those pixels get -1 except background channel).
    A scalar or None broadcasts to all labels.
    """
    _check_label_array(y, "y")
    if not (np.issubdtype(type(n_classes), np.integer) and n_classes >= 1):
        raise ValueError(f"n_classes is '{n_classes}' but should be a positive integer")

    y_labels = np.unique(y[y > 0]).tolist()

    if np.issubdtype(type(classes), np.integer) or classes is None:
        classes = dict((k, classes) for k in y_labels)
    elif not isinstance(classes, dict):
        raise ValueError("classes should be dict, single scalar, or None!")

    if not set(y_labels).issubset(set(classes.keys())):
        raise ValueError(
            f"all gt labels should be present in class dict provided \n"
            f"gt_labels found\n{set(y_labels)}\nclass dict labels provided\n{set(classes.keys())}"
        )

    cls_dict = _invert_dict(classes)
    y_mask = np.zeros(y.shape + (n_classes + 1,), np.float32)
    for cls, labels in cls_dict.items():
        if cls is None:
            y_mask[np.isin(y, labels), :] = -1
        elif np.issubdtype(type(cls), np.integer) and 0 <= cls <= n_classes:
            y_mask[np.isin(y, labels), cls] = 1
        else:
            raise ValueError(f"Wrong class id '{cls}' (for n_classes={n_classes})")
    y_mask[..., 0] = y == 0

    return (y_mask, cls_dict) if return_cls_dict else y_mask


# ---------------------------------------------------------------------------
# threshold optimization
# ---------------------------------------------------------------------------

def optimize_threshold(Y, Yhat, model, nms_thresh, measure="accuracy",
                       iou_threshs=(0.3, 0.5, 0.7), bracket=None, tol=1e-2,
                       maxiter=20, verbose=1):
    """Golden-section search over prob_thresh maximizing the mean matching
    score at fixed nms_thresh (reference stardist/utils.py:271-307).

    Per-probe work is minimized by extracting each image's candidate list
    ONCE at the bracket's lower edge (sorted by descending prob): every
    probed ``prob_thresh`` then corresponds to a *prefix* of that list —
    identical to re-thresholding the dense maps (same strict ``>`` and
    border-exclusion semantics) but without the per-probe dense
    threshold/sort pass. The reference re-runs the dense pipeline per probe
    (stardist/utils.py:288)."""
    if not np.isscalar(nms_thresh):
        raise ValueError("nms_thresh must be a scalar")
    iou_threshs = [iou_threshs] if np.isscalar(iou_threshs) else list(iou_threshs)
    values = {}

    if bracket is None:
        max_prob = max(np.max(prob) for prob, dist in Yhat)
        bracket = max_prob / 2, max_prob

    # one-time sparse candidate extraction per image at the lower bracket
    # edge (b=2 border exclusion and grid scaling as in the dense NMS path,
    # stardist_tpu/nms.py non_maximum_suppression)
    grid = np.array(model.config.grid).reshape(1, -1)
    pre = []
    for prob, dist in Yhat:
        from .nms import _ind_prob_thresh
        mask = _ind_prob_thresh(np.asarray(prob), bracket[0], b=2)
        points = np.stack(np.where(mask), axis=1)
        probi = np.asarray(prob)[mask]
        disti = np.asarray(dist)[mask]
        order = np.argsort(probi, kind="stable")[::-1]
        pre.append((probi[order], disti[order],
                    (points[order] * grid).astype(np.float32)))

    # ONE NMS per image for the whole search: greedy NMS has an exact
    # prefix property — a candidate's keep/suppress decision depends only
    # on higher-ranked candidates (all inside any prefix containing it),
    # so NMS on the bracket-low candidate list yields, restricted to the
    # first n entries, exactly the NMS result of prob_thresh'es whose
    # prefix length is n. Each golden-section probe then only rasterizes
    # its prefix survivors + runs matching (the reference re-runs the
    # whole NMS per probe, stardist/utils.py:288).
    keeps = [model._nms_keep(probi, disti, pointsi, nms_thresh)
             for probi, disti, pointsi in pre]

    def fn(thr):
        prob_thresh = float(np.clip(thr, *bracket))
        value = values.get(prob_thresh)
        if value is None:
            Y_instances = []
            for y, (probi, disti, pointsi), keep in zip(Y, pre, keeps):
                # count of probi > prob_thresh (strict, like _ind_prob_thresh)
                n = int(np.searchsorted(-probi, -prob_thresh, side="left"))
                sel = keep[:n]
                labels, _ = model._render_survivors(
                    y.shape, disti[:n][sel], pointsi[:n][sel], probi[:n][sel])
                Y_instances.append(labels)
            stats = matching_dataset(Y, Y_instances, thresh=iou_threshs, show_progress=False, parallel=True)
            values[prob_thresh] = value = float(np.mean([s._asdict()[measure] for s in stats]))
        if verbose > 1:
            now = datetime.datetime.now().strftime("%H:%M:%S")
            print(f"{now}   thresh: {prob_thresh:f}   {measure}: {value:f}", flush=True)
        return -value

    opt = minimize_scalar(fn, method="golden", bracket=bracket, tol=tol, options={"maxiter": maxiter})
    return opt.x, -opt.fun


# ---------------------------------------------------------------------------
# ImageJ ROI export
# ---------------------------------------------------------------------------

def polyroi_bytearray(x, y, pos=None, subpixel=True):
    """Byte array of an ImageJ polygon ROI (RoiDecoder format, version 227)."""
    def _i16(v):
        return int(v).to_bytes(2, byteorder="big", signed=True)

    def _u16(v):
        return int(v).to_bytes(2, byteorder="big", signed=False)

    def _i32(v):
        return int(v).to_bytes(4, byteorder="big", signed=True)

    subpixel = bool(subpixel)
    # ImageJ pixel centers are at (0.5, 0.5)
    x_raw = np.asarray(x).ravel() + 0.5
    y_raw = np.asarray(y).ravel() + 0.5
    x = np.round(x_raw)
    y = np.round(y_raw)
    assert len(x) == len(y)
    top, left, bottom, right = y.min(), x.min(), y.max(), x.max()

    n = len(x)
    header = 64
    total = header + n * 4 + subpixel * n * 8
    B = bytearray(total)
    B[0:4] = b"Iout"                      # magic
    B[4:6] = _i16(227)                    # version
    B[6:8] = _i16(0)                      # roi type: polygon
    B[8:10] = _i16(top)
    B[10:12] = _i16(left)
    B[12:14] = _i16(bottom)
    B[14:16] = _i16(right)
    B[16:18] = _u16(n)
    if subpixel:
        B[50:52] = _i16(128)              # subpixel-resolution flag
    if pos is not None:
        B[56:60] = _i32(pos)

    for i, (_x, _y) in enumerate(zip(x, y)):
        xs = header + 2 * i
        ys = xs + 2 * n
        B[xs:xs + 2] = _i16(_x - left)
        B[ys:ys + 2] = _i16(_y - top)

    if subpixel:
        base1 = header + n * 4
        base2 = base1 + n * 4
        for i, (_x, _y) in enumerate(zip(x_raw, y_raw)):
            B[base1 + 4 * i:base1 + 4 * i + 4] = struct.pack(">f", _x)
            B[base2 + 4 * i:base2 + 4 * i + 4] = struct.pack(">f", _y)

    return B


def export_imagej_rois(fname, polygons, set_position=True, subpixel=True, compression=ZIP_DEFLATED):
    """Export polygons (list of arrays of shape (id, 2, c)) to an ImageJ ROI zip."""
    if isinstance(polygons, np.ndarray):
        polygons = (polygons,)
    fname = Path(fname)
    if fname.suffix == ".zip":
        fname = fname.with_suffix("")
    with ZipFile(str(fname) + ".zip", mode="w", compression=compression) as roizip:
        for pos, polygroup in enumerate(polygons, start=1):
            for i, poly in enumerate(polygroup, start=1):
                roi = polyroi_bytearray(
                    poly[1], poly[0], pos=(pos if set_position else None), subpixel=subpixel
                )
                roizip.writestr(f"{pos:03d}_{i:03d}.roi", roi)


def gputools_available():
    """Kept for API parity with the reference; OpenCL is not used on TPU."""
    return False
