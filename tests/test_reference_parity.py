"""Direct parity against the REFERENCE C++ kernels.

Compiles the reference implementation's own `stardist2d.cpp` (+ vendored
Clipper) out-of-tree and compares on identical inputs:
- `c_star_dist` vs our shift-compare ray-march kernel (expected: bitwise),
- `c_non_max_suppression_inds` (exact Clipper polygon clipping, kd-tree)
  vs our bound-cascade + sampled-overlap greedy NMS (expected: identical
  decisions on realistic candidate fields).

Skipped when the reference tree or a C++ toolchain is unavailable.
"""
import hashlib
import os
import subprocess
import sys
import sysconfig
from pathlib import Path

import numpy as np
import pytest

REF = Path(os.environ.get("STARDIST_REFERENCE", "/root/reference"))
SRC = REF / "stardist" / "lib" / "stardist2d.cpp"

pytestmark = pytest.mark.skipif(not SRC.exists(),
                                reason="reference tree not available")


@pytest.fixture(scope="module")
def ref2d():
    import numpy as _np
    cache = Path(os.environ.get("STARDIST_TPU_CACHE",
                                Path.home() / ".cache" / "stardist_tpu"))
    cache.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha256(SRC.read_bytes()).hexdigest()[:12]
    build = cache / f"refext_{tag}"
    so = build / "stardist2d.so"
    if not so.exists():
        build.mkdir(parents=True, exist_ok=True)
        cmd = [
            "g++", "-O2", "-std=c++11", "-shared", "-fPIC",
            f"-I{REF}/stardist/lib/external/clipper",
            f"-I{REF}/stardist/lib/external/nanoflann",
            f"-I{_np.get_include()}",
            f"-I{sysconfig.get_paths()['include']}",
            str(SRC),
            f"{REF}/stardist/lib/external/clipper/clipper.cpp",
            f"{REF}/stardist/lib/utils.cpp",
            "-o", str(so),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build reference extension: {e}")
    sys.path.insert(0, str(build))
    try:
        import stardist2d as mod
    except ImportError as e:
        pytest.skip(f"cannot import reference extension: {e}")
    finally:
        sys.path.remove(str(build))
    return mod


def _prep(x, dt):
    return np.ascontiguousarray(x.astype(dt, copy=False))


@pytest.mark.parametrize("grid", [(1, 1), (2, 2), (1, 4)])
@pytest.mark.parametrize("n_rays", [8, 32])
def test_star_dist_bitwise_vs_reference(ref2d, grid, n_rays):
    from stardist_tpu.ops.stardist2d import star_dist2d_jax
    from utils import synthetic_nuclei_2d

    _, lbl = synthetic_nuclei_2d((192, 192), seed=1)
    ours = star_dist2d_jax(lbl.astype(np.int32), n_rays=n_rays, grid=grid)
    theirs = ref2d.c_star_dist(_prep(lbl, np.uint16), np.int32(n_rays),
                               np.int32(grid[0]), np.int32(grid[1]))
    # identical march; the overshoot-correction term may differ by float
    # evaluation order (<= ~1e-5 px)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-4)


@pytest.mark.parametrize("seed,thresh", [(10, 0.3), (11, 0.4), (12, 0.5)])
def test_nms_decisions_vs_reference(ref2d, seed, thresh):
    from stardist_tpu.ops.nms import nms_polygons
    from stardist_tpu.ops.stardist2d import star_dist2d_numpy
    from stardist_tpu.utils import edt_prob
    from utils import synthetic_nuclei_2d

    _, lbl = synthetic_nuclei_2d((256, 256), seed=seed)
    prob = edt_prob(lbl.astype(np.int32))
    mask = prob > 0.4
    pts = np.stack(np.where(mask), 1)
    dists = star_dist2d_numpy(lbl.astype(np.int32), 32)[mask]
    probs = prob[mask]
    order = np.argsort(-probs, kind="stable")
    d = dists[order].astype(np.float32)
    p = pts[order].astype(np.float32)
    s = probs[order]

    ref_keep = np.asarray(ref2d.c_non_max_suppression_inds(
        _prep(d, np.float32), _prep(p, np.float32), 1, 1, 0,
        np.float32(thresh)), bool)
    our_keep = nms_polygons(d, p, scores=s, thresh=thresh, device_nms=False)
    assert np.array_equal(ref_keep, our_keep), (
        ref_keep.sum(), our_keep.sum(),
        np.flatnonzero(ref_keep != our_keep)[:10])
