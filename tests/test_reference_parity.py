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
SRC3 = REF / "stardist" / "lib" / "stardist3d.cpp"

pytestmark = pytest.mark.skipif(not SRC.exists(),
                                reason="reference tree not available")


def _build_dir():
    cache = Path(os.environ.get("STARDIST_TPU_CACHE",
                                Path.home() / ".cache" / "stardist_tpu"))
    cache.mkdir(parents=True, exist_ok=True)
    return cache


@pytest.fixture(scope="module")
def ref2d():
    import numpy as _np
    tag = hashlib.sha256(SRC.read_bytes()).hexdigest()[:12]
    build = _build_dir() / f"refext_{tag}"
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


@pytest.fixture(scope="module")
def ref3d():
    import glob
    import numpy as _np
    if not SRC3.exists():
        pytest.skip("reference 3D sources not available")
    tag = hashlib.sha256(SRC3.read_bytes()).hexdigest()[:12]
    build = _build_dir() / f"refext3_{tag}"
    so = build / "stardist3d.so"
    if not so.exists():
        build.mkdir(parents=True, exist_ok=True)
        q = REF / "stardist" / "lib" / "external" / "qhull_src" / "src"
        objs = []
        try:
            for f in sorted(glob.glob(str(q / "libqhull_r" / "*.c"))):
                o = build / (Path(f).stem + ".o")
                subprocess.run(["gcc", "-O2", "-fPIC", f"-I{q}", "-c", f,
                                "-o", str(o)], check=True, capture_output=True)
                objs.append(str(o))
            for f in sorted(glob.glob(str(q / "libqhullcpp" / "*.cpp"))):
                o = build / (Path(f).stem + "_cpp.o")
                subprocess.run(["g++", "-O2", "-std=c++11", "-fPIC",
                                f"-I{q}", "-c", f, "-o", str(o)],
                               check=True, capture_output=True)
                objs.append(str(o))
            subprocess.run([
                "g++", "-O2", "-std=c++11", "-shared", "-fPIC",
                f"-I{q}",
                f"-I{REF}/stardist/lib/external/nanoflann",
                f"-I{_np.get_include()}",
                f"-I{sysconfig.get_paths()['include']}",
                str(SRC3),
                f"{REF}/stardist/lib/stardist3d_impl.cpp",
                f"{REF}/stardist/lib/utils.cpp",
                *objs, "-o", str(so)], check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build reference 3D extension: {e}")
    sys.path.insert(0, str(build))
    try:
        import stardist3d as mod
    except ImportError as e:
        pytest.skip(f"cannot import reference 3D extension: {e}")
    finally:
        sys.path.remove(str(build))
    return mod


@pytest.mark.parametrize("grid", [(1, 1, 1), (1, 2, 2)])
def test_star_dist3d_vs_reference(ref3d, grid):
    from stardist_tpu.ops.stardist3d import star_dist3d_jax
    from stardist_tpu.rays3d import Rays_GoldenSpiral
    from utils import synthetic_nuclei_3d

    rays = Rays_GoldenSpiral(32)
    _, lbl = synthetic_nuclei_3d((32, 64, 64), seed=2)
    ours = star_dist3d_jax(lbl.astype(np.int32), rays, grid=grid)
    dz, dy, dx = np.asarray(rays.vertices, np.float32).T
    theirs = ref3d.c_star_dist3d(_prep(lbl, np.uint16),
                                 _prep(dz, np.float32), _prep(dy, np.float32),
                                 _prep(dx, np.float32), int(len(rays)),
                                 *(int(g) for g in grid))
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-3)


@pytest.mark.parametrize("seed,thresh", [(0, 0.3), (1, 0.4)])
@pytest.mark.slow
def test_nms3d_decisions_vs_reference(ref3d, seed, thresh):
    from stardist_tpu.ops.nms import nms_polyhedra
    from stardist_tpu.rays3d import Rays_GoldenSpiral

    rng = np.random.RandomState(seed)
    rays = Rays_GoldenSpiral(48)
    n = 600
    n_obj = n // 6
    centers = np.stack([rng.uniform(10, 54, n_obj), rng.uniform(10, 118, n_obj),
                        rng.uniform(10, 118, n_obj)], 1)
    obj = rng.randint(0, n_obj, n)
    points = (centers[obj] + rng.normal(0, 1.0, (n, 3))).astype(np.float32)
    radii = rng.uniform(4, 8, n_obj)[obj]
    dist = (radii[:, None] * rng.uniform(0.85, 1.15, (n, 48))).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n))[::-1].astype(np.float32).copy()
    ref_keep = np.asarray(ref3d.c_non_max_suppression_inds(
        _prep(dist, np.float32), _prep(points, np.float32),
        _prep(np.asarray(rays.vertices), np.float32),
        _prep(np.asarray(rays.faces), np.int32),
        _prep(scores, np.float32), 1, 1, 0, np.float32(thresh)), bool)
    our_keep = nms_polyhedra(dist, points, rays, scores=scores, thresh=thresh,
                             device_nms=False)
    assert np.array_equal(ref_keep, our_keep), (
        ref_keep.sum(), our_keep.sum(),
        np.flatnonzero(ref_keep != our_keep)[:10])
