"""Per-stage timing of the flagship 2D predict path on the current backend.

Stages mirror `StarDist2D.predict_instances` (device-resident where the
pipeline is): forward+extract, NMS peel, banded NMS kernel, rasterization,
plus the end-to-end host->host number. Expects a trained model; train one
with bench.py's configuration, e.g.::

    python examples/profile_predict2d.py --basedir /tmp/sd_bench --name bench2d \
        --image /tmp/sd_bench/bench_img.npz
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, fn, n=3, sync=None):
    import jax
    r = fn()
    (sync or jax.block_until_ready)(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        (sync or jax.block_until_ready)(r)
        ts.append(time.perf_counter() - t0)
    print(f"{label:<44s} {min(ts) * 1e3:9.1f} ms")
    return r, min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--basedir", default="/tmp/sd_bench")
    ap.add_argument("--name", default="bench2d")
    ap.add_argument("--image", default="/tmp/sd_bench/bench_img.npz")
    ap.add_argument("--prob-thresh", type=float, default=0.5)
    ap.add_argument("--nms-thresh", type=float, default=0.4)
    ap.add_argument("--f32", action="store_true", help="skip bf16/f16 fast path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    cache_dir = os.path.expanduser("~/.cache/stardist_tpu/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from stardist_tpu.models import StarDist2D

    model = StarDist2D(None, name=args.name, basedir=args.basedir)
    if not args.f32:
        model.set_inference_precision("bfloat16")
        model.transfer_dtype = np.float16

    dat = np.load(args.image)
    img = dat["img"]
    H, W = img.shape
    print(f"image {H}x{W}, backend {jax.default_backend()}")

    # ---- end-to-end (host->host), the bench.py number --------------------
    def e2e():
        return model.predict_instances(img, prob_thresh=args.prob_thresh,
                                       nms_thresh=args.nms_thresh,
                                       show_tile_progress=False)
    (labels, polys), t_e2e = timed("predict_instances end-to-end", e2e,
                                   sync=lambda r: None)
    print(f"  -> {len(polys['prob'])} objects, "
          f"{(H * W / 1e6) / t_e2e:.1f} Mpix/s")
    for k, v in sorted(polys.get("nms_counters", {}).items()):
        print(f"  counter {k} = {v}")

    # ---- device-resident stages ------------------------------------------
    x = img[..., None]
    tdt = getattr(model, "transfer_dtype", None)
    x_up = x[np.newaxis].astype(tdt) if tdt is not None else x[np.newaxis]
    x_dev = jnp.asarray(x_up)
    jax.block_until_ready(x_dev)

    t0 = time.perf_counter()
    x_dev2 = jnp.asarray(x_up)
    jax.block_until_ready(x_dev2)
    print(f"{'H2D image upload':<44s} {(time.perf_counter() - t0) * 1e3:9.1f} ms")

    # forward + candidate extraction (jit, device-resident)
    bs = []
    for g, sp in zip(model.config.grid, x.shape[:-1]):
        bs.append((2, 2))
    b_key = tuple(bs)
    K = model._extract_k0
    fn = model._sparse_extract_fn(K, b_key, False)
    pt = jnp.float32(args.prob_thresh)
    outs, t_fwd = timed(f"forward + extract (K={K})", lambda: fn(
        model.params, model._extra_vars, x_dev, pt))
    n_above = int(outs[4])
    print(f"  -> {n_above} candidates above threshold")
    if n_above > K:
        K2 = 1 << int(np.ceil(np.log2(n_above)))
        fn = model._sparse_extract_fn(K2, b_key, False)
        outs, t_fwd = timed(f"forward + extract (K={K2})", lambda: fn(
            model.params, model._extra_vars, x_dev, pt))

    vals, d_dev, points, valid, _, dmax = outs[:6]
    n_valid = int(jax.device_get(valid).sum())
    prob_h = np.asarray(jax.device_get(vals))[:n_valid]
    points_h = np.asarray(jax.device_get(points))[:n_valid]
    d_dev = d_dev[:n_valid]
    dmax = float(dmax)
    print(f"  -> n_valid {n_valid}, dmax {dmax:.1f}")

    # NMS (host-orchestrated device kernels, dist on device)
    from stardist_tpu.ops import nms as nms_ops
    grid_arr = np.array(model.config.grid).reshape(1, -1)
    pts_g = (points_h * grid_arr).astype(np.float32)

    def run_nms():
        return nms_ops.nms_polygons(d_dev, pts_g, thresh=args.nms_thresh,
                                    dist_max=dmax * float(max(model.config.grid)))
    keep, t_nms = timed("nms_polygons (device, incl host orchestration)",
                        run_nms, sync=lambda r: None)
    print(f"  -> {int(np.asarray(keep).sum())} survivors")
    for k, v in sorted(nms_ops.LAST_NMS_COUNTERS.items()):
        print(f"  counter {k} = {v}")

    # rasterize survivors (device scatter path)
    from stardist_tpu.ops.rasterize import rasterize_polygons
    keep_h = np.asarray(keep)
    d_surv = np.asarray(jax.device_get(d_dev))[keep_h] * float(max(model.config.grid))
    p_surv = pts_g[keep_h]
    prob_surv = prob_h[keep_h]
    ind = np.argsort(prob_surv, kind="stable")
    order_values = np.empty(len(ind), np.int32)
    order_values[ind] = np.arange(1, len(ind) + 1)
    lbl_ids = np.arange(len(ind))

    def run_raster():
        img_out, _ = rasterize_polygons(d_surv, p_surv, (H, W), order_values,
                                        labels=lbl_ids)
        return img_out
    _, t_ras = timed("rasterize survivors (device+D2H)", run_raster,
                     sync=lambda r: None)

    print(f"\nsum of device stages: "
          f"{(t_fwd + t_nms + t_ras) * 1e3:.1f} ms  "
          f"(e2e {t_e2e * 1e3:.1f} ms)")

    # ---- fused single-dispatch device-resident path ------------------------
    # pre-staged f32 device image, labels left on device (serving config)
    x_f32 = jnp.asarray(img[..., None])
    jax.block_until_ready(x_f32)

    def dev():
        return model.predict_instances_device(x_f32,
                                              prob_thresh=args.prob_thresh,
                                              nms_thresh=args.nms_thresh,
                                              fetch=False)
    (labels_dev, det), t_dev = timed("predict_instances_device (fused, no D2H)",
                                     dev, sync=lambda r: None)
    print(f"  -> {det['nms_counters'].get('n_survivors', '?')} survivors, "
          f"{(H * W / 1e6) / t_dev:.1f} Mpix/s")
    for k, v in sorted(det.get("nms_counters", {}).items()):
        print(f"  counter {k} = {v}")


if __name__ == "__main__":
    main()
