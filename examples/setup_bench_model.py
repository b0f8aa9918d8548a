"""Train and persist the bench-configuration 2D model + 4096^2 image so the
per-stage profilers (profile_predict2d.py, bench_nms.py) can run without
retraining. Mirrors bench.py's seeded training exactly."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    basedir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sd_bench"
    import jax
    cache_dir = os.path.expanduser("~/.cache/stardist_tpu/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import bench
    from stardist_tpu.models import Config2D, StarDist2D

    np.random.seed(0)
    imgs, lbls = [], []
    for i in range(4):
        img, lbl = bench._synthetic_nuclei((256, 256), seed=i)
        imgs.append(img)
        lbls.append(lbl)
    cfg = Config2D(n_rays=32, grid=(2, 2), train_patch_size=(256, 256),
                   train_batch_size=4, train_reduce_lr=None)
    model = StarDist2D(cfg, name="bench2d", basedir=basedir)
    t0 = time.perf_counter()
    model.train(imgs, lbls, validation_data=(imgs[:1], lbls[:1]),
                seed=0, epochs=3, steps_per_epoch=40)
    print(f"train: {time.perf_counter() - t0:.1f} s")

    img, lbl = bench._synthetic_nuclei((4096, 4096), seed=123)
    np.savez_compressed(os.path.join(basedir, "bench_img.npz"), img=img, lbl=lbl)
    print(f"saved model + image under {basedir}")


if __name__ == "__main__":
    main()
