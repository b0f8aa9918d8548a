"""Single-call device NMS vs the host blocked/dense paths: identical decisions."""
import numpy as np
import pytest

from stardist_tpu.ops.nms import nms_polygons, _nms_polygons_device


def _candidates(n, seed=0, spread=200):
    rng = np.random.RandomState(seed)
    dist = rng.uniform(5, 10, (n, 16)).astype(np.float32)
    points = rng.uniform(12, spread, (n, 2)).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n))[::-1]
    return dist, points, scores


@pytest.mark.parametrize("n,thresh", [(60, 0.3), (300, 0.5), (1000, 0.3)])
def test_device_nms_equals_blocked(n, thresh):
    dist, points, scores = _candidates(n, seed=n)
    a = nms_polygons(dist, points, scores=scores, thresh=thresh, device_nms=False)
    b = _nms_polygons_device(dist, points, thresh)
    assert np.array_equal(a, b), (a.sum(), b.sum(), np.flatnonzero(a != b)[:10])


@pytest.mark.slow
def test_device_nms_overflow_retry():
    # dense cluster: everything ambiguous/overlapping -> exercises the
    # A_max overflow retry
    dist, points, scores = _candidates(600, seed=1, spread=40)
    a = nms_polygons(dist, points, scores=scores, thresh=0.98, device_nms=False)
    b = _nms_polygons_device(dist, points, 0.98, amb_max=64)
    assert np.array_equal(a, b)


def test_device_nms_thresh_zero():
    dist, points, scores = _candidates(200, seed=2, spread=100)
    a = nms_polygons(dist, points, scores=scores, thresh=0.0, device_nms=False)
    b = _nms_polygons_device(dist, points, 0.0)
    assert np.array_equal(a, b)


@pytest.mark.slow
def test_bounds_paths_equal_exact_dense_with_containment():
    # Regression: the arccos-free box upper bound formerly used the
    # radical-line chord as the lens height, which is invalid when one disc
    # (nearly) contains the other — heavily overlapping size-mismatched
    # pairs were declared "definitely below threshold" and silently kept by
    # both bounds-using paths (blocked AND device). Pin both against the
    # exact dense path on geometry with strong size variation.
    rng = np.random.RandomState(0)
    for trial in range(3):
        n = 400
        points = rng.uniform(0, 80, (n, 2)).astype(np.float32)  # crowded field
        dist = (rng.uniform(2, 14, (n, 1))
                * rng.uniform(0.7, 1.3, (n, 32))).astype(np.float32)
        scores = np.sort(rng.uniform(0.2, 1, n))[::-1].copy()
        exact = nms_polygons(dist, points, scores=scores, thresh=0.4,
                             device_nms=False, dense_max=1 << 20)
        blocked = nms_polygons(dist, points, scores=scores, thresh=0.4,
                               device_nms=False)
        device = nms_polygons(dist, points, scores=scores, thresh=0.4,
                              device_nms=True)
        assert np.array_equal(blocked, exact), trial
        assert np.array_equal(device, exact), trial


def test_contained_polygon_suppressed():
    # a small polygon strictly inside a larger one: overlap/min-area = 1
    dist = np.stack([np.full(32, 12.0), np.full(32, 4.0)]).astype(np.float32)
    points = np.array([[50.0, 50.0], [52.0, 51.0]], np.float32)
    for device_nms in (False, True):
        keep = nms_polygons(dist, points, scores=np.array([0.9, 0.8]),
                            thresh=0.5, device_nms=device_nms)
        assert keep.tolist() == [True, False]


def _clustered_candidates(n, seed=0, field=1200.0, per_obj=10, n_rays=16):
    """Nuclei-like candidate fields: clusters of near-concentric polygons."""
    rng = np.random.RandomState(seed)
    n_obj = max(1, n // per_obj)
    centers = rng.uniform(30, field - 30, (n_obj, 2))
    obj = rng.randint(0, n_obj, n)
    points = (centers[obj] + rng.normal(0, 2.0, (n, 2))).astype(np.float32)
    radii = rng.uniform(6, 13, n_obj)[obj]
    dist = (radii[:, None] * rng.uniform(0.85, 1.15, (n, n_rays))).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n))[::-1].copy()
    return dist, points, scores


@pytest.mark.parametrize("n,thresh,q", [(500, 0.3, 32), (1500, 0.4, 64),
                                        (3000, 0.5, 128)])
def test_banded_nms_equals_blocked(n, thresh, q):
    from stardist_tpu.ops.nms import _nms_polygons_device_banded

    dist, points, scores = _clustered_candidates(n, seed=n)
    a = nms_polygons(dist, points, scores=scores, thresh=thresh,
                     device_nms=False)
    b = _nms_polygons_device_banded(dist, points, thresh, samples=16, Q=q)
    assert b is not None
    assert np.array_equal(a, b), (a.sum(), b.sum(), np.flatnonzero(a != b)[:10])


def test_banded_nms_uniform_field_equals_blocked():
    from stardist_tpu.ops.nms import _nms_polygons_device_banded

    dist, points, scores = _candidates(2500, seed=7, spread=900)
    a = nms_polygons(dist, points, scores=scores, thresh=0.4, device_nms=False)
    b = _nms_polygons_device_banded(dist, points, 0.4, samples=16, Q=128)
    assert b is not None
    assert np.array_equal(a, b)


@pytest.mark.slow
def test_peel_preserves_greedy_exactness():
    """Candidate peeling (definite survivors + lb-suppressed removal) must
    leave the greedy result bit-identical — it only removes candidates whose
    fate is provable (ops/nms.py _peel_2d)."""
    from stardist_tpu.ops.nms import _nms_polygons_device_banded, LAST_NMS_COUNTERS

    dist, points, scores = _clustered_candidates(6000, seed=11)
    a = _nms_polygons_device_banded(dist, points, 0.4, samples=16, Q=128,
                                    peel=False)
    b = _nms_polygons_device_banded(dist, points, 0.4, samples=16, Q=128,
                                    peel=True)
    assert a is not None and b is not None
    assert np.array_equal(a, b), (a.sum(), b.sum())
    # the per-stage counters are populated (reference-style cascade
    # instrumentation) and the peel actually did work on this field
    assert LAST_NMS_COUNTERS["n_candidates"] == 6000
    assert LAST_NMS_COUNTERS["n_peel_survivor"] > 0
    assert LAST_NMS_COUNTERS["n_peel_suppressed"] > 0
    assert LAST_NMS_COUNTERS["n_survivors"] == int(b.sum())


@pytest.mark.parametrize("n,thresh", [(3000, 0.4), (8000, 0.3)])
def test_onepass_nms_equals_blocked(n, thresh):
    """The single-dispatch fused NMS (peel + on-device remainder compaction
    + banded kernel, ops/nms.py _nms_2d_onepass) must match the host blocked
    path exactly."""
    from stardist_tpu.ops.nms import (_nms_polygons_device_onepass,
                                      LAST_NMS_COUNTERS)

    dist, points, scores = _clustered_candidates(n, seed=n + 1)
    a = nms_polygons(dist, points, scores=scores, thresh=thresh,
                     device_nms=False)
    b = _nms_polygons_device_onepass(dist, points, thresh)
    assert b is not None
    assert np.array_equal(a, b), (a.sum(), b.sum(), np.flatnonzero(a != b)[:10])
    assert LAST_NMS_COUNTERS["n_survivors"] == int(b.sum())
    assert LAST_NMS_COUNTERS["n_peel_suppressed"] > 0


@pytest.mark.slow
def test_onepass_nms_dense_field_retries_capacities():
    """A poorly-peeling uniform-random field forces the remainder-capacity
    (fits) retry ladder; the result must still be exact."""
    from stardist_tpu.ops.nms import _nms_polygons_device_onepass, _RETRY_CAPS

    _RETRY_CAPS.pop("onepass_R16", None)   # force the optimistic start
    dist, points, scores = _candidates(4000, seed=13, spread=1500)
    a = nms_polygons(dist, points, scores=scores, thresh=0.4,
                     device_nms=False)
    b = _nms_polygons_device_onepass(dist, points, 0.4)
    assert b is not None
    assert np.array_equal(a, b)
    # the working remainder fraction is cached for the next call
    assert _RETRY_CAPS.get("onepass_R16", 0) >= 2


def test_banded_nms_horizontal_strip_uses_wide_axis():
    # all candidates in one horizontal strip: banding along y would cover
    # everything, but the driver picks the larger-extent axis (x) and the
    # banded kernel still applies
    from stardist_tpu.ops.nms import _nms_polygons_device_banded

    rng = np.random.RandomState(3)
    n = 3000
    dist = rng.uniform(5, 10, (n, 16)).astype(np.float32)
    points = np.stack([rng.uniform(100, 104, n),
                       rng.uniform(0, 5000, n)], axis=1).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n))[::-1].copy()
    a = nms_polygons(dist, points, scores=scores, thresh=0.4, device_nms=False)
    b = _nms_polygons_device_banded(dist, points, 0.4, samples=16, Q=128)
    assert b is not None
    assert np.array_equal(a, b)


@pytest.mark.slow
def test_banded_nms_tight_cluster_falls_back():
    # candidates concentrated in a region smaller than the interaction
    # radius in BOTH axes: the band covers everything and the banded driver
    # must decline (returns None) instead of mis-sizing
    from stardist_tpu.ops.nms import _nms_polygons_device_banded

    rng = np.random.RandomState(4)
    n = 512
    dist = rng.uniform(5, 10, (n, 16)).astype(np.float32)
    points = rng.uniform(100, 104, (n, 2)).astype(np.float32)
    out = _nms_polygons_device_banded(dist, points, 0.9, samples=16, Q=128)
    assert out is None
    # and the public driver still returns correct results via fallback
    scores = np.sort(rng.uniform(0, 1, n))[::-1].copy()
    a = nms_polygons(dist, points, scores=scores, thresh=0.9, device_nms=False)
    b = _nms_polygons_device(dist, points, 0.9)
    assert np.array_equal(a, b)


def test_banded_nms_bucket_padding_does_not_inflate_band():
    # regression: the band width used to be computed over the PADDED array,
    # whose identical sentinel coordinates inflated NB by the number of pad
    # blocks — N just above a bucket boundary then lost the banded path
    from stardist_tpu.ops.nms import (_bucket, _pad, _band_width_blocks,
                                      _nms_polygons_device_banded)

    dist, points, scores = _clustered_candidates(2100, seed=21, field=2000)
    Q = 128
    Npad = _bucket(2100, minimum=2 * Q)      # 4096 -> ~15 pad blocks
    order = np.argsort(points[:, 0], kind="stable")
    p = _pad(points[order], Npad, value=1e9)
    T = 2.0 * float(dist.max()) + 1.0
    nb = _band_width_blocks(p[:, 0], Q, T, n_real=2100)
    assert nb <= 4, nb                        # real band is narrow
    a = nms_polygons(dist, points, scores=scores, thresh=0.4, device_nms=False)
    b = _nms_polygons_device_banded(dist, points, 0.4, samples=16, Q=Q)
    assert b is not None
    assert np.array_equal(a, b)


def test_banded_nms_established_survivors():
    # chunked-round contract: the first `established` ranks are final
    # survivors — they suppress but are never suppressed
    from stardist_tpu.ops.nms import _nms_polygons_device_banded

    dist, points, scores = _clustered_candidates(800, seed=11, field=400)
    full = _nms_polygons_device_banded(dist, points, 0.4, samples=16, Q=64)
    n_est = 100
    est = _nms_polygons_device_banded(dist, points, 0.4, samples=16, Q=64,
                                      established=n_est)
    assert est is not None and full is not None
    # established rows all kept
    assert est[:n_est].all()
    # chunk identity: running with the prefix-greedy survivors as established
    # plus the tail must reproduce the full greedy result
    keep_prefix = nms_polygons(dist[:n_est], points[:n_est],
                               scores=scores[:n_est], thresh=0.4,
                               device_nms=False)
    surv_idx = np.flatnonzero(keep_prefix)
    cand_idx = np.concatenate([surv_idx, np.arange(n_est, len(dist))])
    est2 = _nms_polygons_device_banded(
        dist[cand_idx], points[cand_idx], 0.4, samples=16, Q=64,
        established=len(surv_idx))
    ref = nms_polygons(dist, points, scores=scores, thresh=0.4,
                       device_nms=False)
    out = np.zeros(len(dist), bool)
    out[cand_idx[est2]] = True
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("n,thresh", [(40, 0.3), (150, 0.5)])
def test_device_nms_3d_equals_host(n, thresh):
    from stardist_tpu.ops.nms import nms_polyhedra, _nms_polyhedra_device
    from stardist_tpu.rays3d import Rays_GoldenSpiral

    rays = Rays_GoldenSpiral(16)
    rng = np.random.RandomState(n)
    dist = rng.uniform(4, 7, (n, 16)).astype(np.float32)
    points = rng.uniform(8, 60, (n, 3)).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n))[::-1]
    a = nms_polyhedra(dist, points, rays, scores=scores, thresh=thresh,
                      device_nms=False, samples=12)
    b = _nms_polyhedra_device(dist, points, rays, thresh, samples=12)
    assert np.array_equal(a, b), np.flatnonzero(a != b)[:10]


@pytest.mark.parametrize("n,thresh,q", [(400, 0.3, 32), (1200, 0.4, 64)])
@pytest.mark.slow
def test_banded_nms_3d_equals_host(n, thresh, q):
    from stardist_tpu.ops.nms import nms_polyhedra, _nms_polyhedra_device_banded
    from stardist_tpu.rays3d import Rays_GoldenSpiral

    rays = Rays_GoldenSpiral(16)
    rng = np.random.RandomState(n)
    # clustered, elongated volume so the band is narrow along x
    n_obj = max(1, n // 8)
    centers = np.stack([rng.uniform(10, 50, n_obj),
                        rng.uniform(10, 100, n_obj),
                        rng.uniform(10, 800, n_obj)], axis=1)
    obj = rng.randint(0, n_obj, n)
    points = (centers[obj] + rng.normal(0, 1.0, (n, 3))).astype(np.float32)
    radii = rng.uniform(4, 7, n_obj)[obj]
    dist = (radii[:, None] * rng.uniform(0.85, 1.15, (n, 16))).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n))[::-1].copy()
    a = nms_polyhedra(dist, points, rays, scores=scores, thresh=thresh,
                      device_nms=False, samples=10)
    b = _nms_polyhedra_device_banded(dist, points, rays, thresh, samples=10,
                                     Q=q)
    assert b is not None
    assert np.array_equal(a, b), (a.sum(), b.sum(), np.flatnonzero(a != b)[:10])


def test_banded_nms_3d_traced_empty_field_band_ok():
    """An all-invalid candidate field must report band_ok=True: before the
    round-5 fix, empty blocks (lo/hi = +-inf) failed the window check, so
    the fused 3D device path walked its whole NB retry ladder and fell back
    to the host on EVERY call for images with no detections."""
    import jax.numpy as jnp
    from stardist_tpu.ops.nms import _nms3d_banded_traced
    from stardist_tpu.rays3d import Rays_GoldenSpiral

    rays = Rays_GoldenSpiral(16)
    Npad, R = 512, 16
    dist = jnp.full((Npad, R), 1e-3, jnp.float32)
    points = jnp.full((Npad, 3), 1e9, jnp.float32)
    keep, flags, stats = _nms3d_banded_traced(
        dist, points, jnp.asarray(rays.vertices, jnp.float32),
        jnp.asarray(rays.faces, jnp.int32), jnp.int32(0), jnp.float32(0.4),
        (1, 1, 1), 0, 256, 1, 32, 64, 10)
    band_ok, amb_ok, pairs_ok = (bool(f) for f in flags)
    assert band_ok and amb_ok and pairs_ok
    assert not bool(np.asarray(keep).any())
