"""Benchmark: 2D instance segmentation throughput on one TPU chip.

Times the flagship end-to-end path — `StarDist2D.predict_instances` on a
4096x4096 synthetic fluorescence nuclei image (forward U-Net + on-device
sparse candidate extraction + TPU NMS + TPU rasterization) — and prints one
JSON line. Baseline target (BASELINE.md): 4096^2 in <100 ms on one v5e chip
=> 167.77 Mpix/s.

A tiny seeded training run first gives the network realistic response
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
    n = int(density * shape[0] * shape[1])
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

    from stardist_tpu.models import Config2D, StarDist2D

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

    # inference-path optimizations: bfloat16 convs on the MXU, float16
    # host->device image upload
    model.set_inference_precision("bfloat16")
    model.transfer_dtype = np.float16

    # -- benchmark image -----------------------------------------------------
    H = W = 4096
    img, _ = _synthetic_nuclei((H, W), seed=123)

    def run():
        labels, polys = model.predict_instances(
            img, prob_thresh=0.5, show_tile_progress=False)
        return labels, polys

    # warmup (compilation)
    t0 = time.perf_counter()
    labels, polys = run()
    print(f"warmup (incl. compile): {time.perf_counter() - t0:.1f} s", file=sys.stderr)
    n_obj = len(polys["prob"])

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
    print(json.dumps({
        "metric": "predict2d_throughput",
        "value": round(mpix_per_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_per_s / baseline, 4),
    }))


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
