import numpy as np
import pytest
from scipy.ndimage import distance_transform_edt

from stardist_tpu.matching import (
    matching,
    matching_dataset,
    relabel_sequential,
    group_matching_labels,
    label_overlap,
)
from stardist_tpu.utils import (
    edt_prob,
    fill_label_holes,
    calculate_extents,
    mask_to_categorical,
    _normalize_grid,
    grid_divisible_patch_size,
)
from stardist_tpu.sample_patches import sample_patches, get_valid_inds
from utils import random_image, overlap_image, circle_image


def test_matching_trivial():
    y = np.zeros((100, 100), np.uint16)
    y[10:20, 10:20] = 1
    y_pred = np.roll(y, 5, axis=0)
    stats = matching(y, y_pred)
    assert stats.fp == 1 and stats.tp == 0 and stats.fn == 1
    stats2 = matching(y, y, thresh=0.99)
    assert stats2.tp == 1 and stats2.accuracy == 1.0


def test_matching_iou_flip():
    img, iou = overlap_image((64, 64))
    y1 = (img == 1).astype(np.uint16)
    y2 = (img == 2).astype(np.uint16) | ((img == 1) & (img == 1))  # not used
    a = (circle_image((64, 64), center=(0.1, 0.1)) > 0).astype(np.uint16)
    b = (circle_image((64, 64), center=(-0.1, -0.1)) > 0).astype(np.uint16)
    inter = np.count_nonzero(a & b)
    union = np.count_nonzero(a | b)
    iou_ab = inter / union
    s_lo = matching(a, b, thresh=iou_ab - 0.01)
    s_hi = matching(a, b, thresh=iou_ab + 0.01)
    assert s_lo.tp == 1 and s_hi.tp == 0


def test_matching_dataset_accumulation():
    ys = [random_image((64, 64)).astype(np.int32) for _ in range(4)]
    res = matching_dataset(ys, ys, thresh=0.5)
    assert res.accuracy == 1.0 and res.fp == 0 and res.fn == 0
    res_multi = matching_dataset(ys, ys, thresh=[0.3, 0.7])
    assert len(res_multi) == 2 and all(r.accuracy == 1.0 for r in res_multi)
    res_parallel = matching_dataset(ys, ys, thresh=0.5, parallel=True)
    assert res_parallel.tp == res.tp


def test_relabel_sequential():
    lbl = np.array([1, 1, 5, 5, 8, 99, 42])
    relab, fw, inv = relabel_sequential(lbl)
    assert np.array_equal(relab, [1, 1, 2, 2, 3, 5, 4])
    assert np.array_equal(fw[lbl], relab)
    assert np.array_equal(inv[relab], lbl)
    relab5, _, _ = relabel_sequential(lbl, offset=5)
    assert np.array_equal(relab5, [5, 5, 6, 6, 7, 9, 8])


def test_label_overlap():
    x = np.array([0, 0, 1, 1, 2])
    y = np.array([0, 1, 1, 2, 2])
    ov = label_overlap(x, y)
    assert ov.shape == (3, 3)
    assert ov[1, 1] == 1 and ov[1, 2] == 1 and ov[2, 2] == 1 and ov[0, 0] == 1


def test_group_matching_labels():
    y = random_image((80, 80)).astype(np.int32)
    ys = np.stack([y, 2 * np.roll(y, 3, axis=0)])
    grouped = group_matching_labels(ys)
    # most objects should keep their ids across frames
    same = np.count_nonzero((grouped[0] == grouped[1]) & (grouped[0] > 0))
    total = np.count_nonzero(grouped[0] > 0)
    assert same / total > 0.5


def test_edt_prob_matches_per_object_edt():
    lbl = random_image((96, 97)).astype(np.int32)
    prob = edt_prob(lbl)
    assert prob.shape == lbl.shape
    assert np.all(prob[lbl == 0] == 0)
    assert np.all(prob[lbl > 0] > 0)
    assert prob.max() <= 1.0
    # per-object max must be ~1
    for l in np.unique(lbl[lbl > 0]):
        assert prob[lbl == l].max() > 0.99


def test_edt_prob_constant_image():
    with pytest.warns(UserWarning):
        prob = edt_prob(np.ones((32, 32), np.int32))
    assert prob.max() <= 1 and prob[16, 16] > 0.9


def test_fill_label_holes():
    lbl = np.zeros((32, 32), np.int32)
    lbl[5:25, 5:25] = 3
    lbl[10:15, 10:15] = 0  # hole
    filled = fill_label_holes(lbl)
    assert np.all(filled[5:25, 5:25] == 3)


def test_calculate_extents():
    lbl = circle_image((64, 64), radius=10).astype(np.int32)
    ext = calculate_extents(lbl)
    assert np.allclose(ext, [19, 19], atol=2)
    ext_list = calculate_extents([lbl, lbl])
    assert np.allclose(ext_list, ext)


def test_mask_to_categorical():
    y = random_image((48, 48)).astype(np.int32)
    m = mask_to_categorical(y, 2, 1)
    assert m.shape == y.shape + (3,)
    assert np.all(m[y == 0, 0] == 1)
    assert np.all(m[y > 0, 1] == 1)
    # None -> ignore (object channels -1, background channel reset to y==0)
    m2 = mask_to_categorical(y, 2, None)
    assert np.all(m2[y > 0][:, 1:] == -1) and np.all(m2[y > 0][:, 0] == 0)


def test_normalize_grid():
    assert _normalize_grid((2, 4), 2) == (2, 4)
    with pytest.raises(ValueError):
        _normalize_grid((3, 2), 2)
    assert grid_divisible_patch_size((100, 100), (8, 8), warn=False) == (104, 104)


def test_sample_patches():
    img = random_image((64, 64)).astype(np.float32)
    lbl = random_image((64, 64))
    res = sample_patches((lbl, img), patch_size=(32, 32), n_samples=3)
    assert res[0].shape == (3, 32, 32) and res[1].shape == (3, 32, 32)
    inds = get_valid_inds(lbl, (32, 32))
    assert len(inds) == 2 and len(inds[0]) == 33 * 33
    inds_f = get_valid_inds(lbl, (32, 32), patch_filter=lambda y, p: y > 0)
    assert len(inds_f[0]) <= len(inds[0])
