import numpy as np
import pytest

from stardist_tpu.big import Block, BlockND
from stardist_tpu.matching import matching
from stardist_tpu.utils import calculate_extents
from utils import synthetic_nuclei_2d, synthetic_nuclei_3d


def repeat(mask, reps):
    if np.isscalar(reps):
        reps = (reps,) * mask.ndim

    def shift(m, v):
        _m = m.copy()
        _m[_m > 0] += v
        return _m

    _shift = shift if np.issubdtype(mask.dtype, np.integer) else (lambda x, *a: x)
    for d, rep in enumerate(reps):
        n_labels = mask.max()
        mask = np.concatenate([_shift(mask, n_labels * i) for i in range(rep)], axis=d)
    return mask


def reassemble(lbl, axes, block_size, min_overlap, context, grid):
    """Blockwise read -> crop -> ownership filter -> write must reproduce the
    input exactly (each object written by exactly one responsible block)."""
    blocks = BlockND.cover(lbl.shape, axes=axes, block_size=block_size,
                           min_overlap=min_overlap, context=context, grid=grid)
    result = np.zeros_like(lbl)
    for block in blocks:
        x = block.read(lbl)
        x = block.crop_context(x)
        x = block.filter_objects(x, polys=None)
        block.write(result, x)
    assert np.all(lbl == result)


@pytest.mark.parametrize("grid", [1, 3, 6])
@pytest.mark.parametrize("block_size, context", [(40, 0), (55, 3), (80, 10), (128, 17)])
def test_cover2d(block_size, context, grid):
    lbl = synthetic_nuclei_2d((100, 100), r_range=(3, 6), seed=1)[1].astype(np.int32)
    max_sizes = tuple(calculate_extents(lbl, func=np.max))
    min_overlap = tuple(1 + int(v) for v in max_sizes)
    lbl = repeat(lbl, 3)
    reassemble(lbl, "YX", block_size, min_overlap, context, grid)


@pytest.mark.parametrize("grid", [1, 3])
@pytest.mark.parametrize("block_size, context", [((33, 48, 48), 3), ((30, 62, 60), (0, 11, 9))])
def test_cover3d(block_size, context, grid):
    lbl = synthetic_nuclei_3d((40, 56, 56), r_range=(3, 6), seed=1)[1].astype(np.int32)
    max_sizes = tuple(calculate_extents(lbl, func=np.max))
    min_overlap = tuple(1 + int(v) for v in max_sizes)
    lbl = repeat(lbl, (1, 2, 2))
    reassemble(lbl, "ZYX", block_size, min_overlap, context, grid)


def test_edgecases():
    """Extra-context injection must keep write regions of non-neighboring
    blocks disjoint for all sizes (reference tests/test_big.py:79-83)."""
    for size in range(7800, 8000):
        Block.cover(size=size, block_size=4096, min_overlap=128, context=128, grid=16)


def test_cover_sweep_small():
    for size in range(130, 180):
        for block_size in (64, 96):
            Block.cover(size=size, block_size=block_size, min_overlap=16, context=8, grid=4)


def test_block_properties():
    blocks = Block.cover(size=1000, block_size=256, min_overlap=32, context=32, grid=2)
    assert blocks[0].start == 0 and blocks[-1].end == 1000
    # write regions tile [0, 1000) with only neighboring overlaps
    covered = np.zeros(1000, int)
    for b in blocks:
        covered[b.slice_write] += 1
    assert covered.min() >= 1
