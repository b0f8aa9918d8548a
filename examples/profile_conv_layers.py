"""Per-layer timing of the Pallas HCW conv at the bench U-Net's shapes.

Prints achieved TFLOP/s and the M-limited roofline (Cout/128 of peak) per
layer, so the gap between kernel efficiency and the 4096^2 forward's
end-to-end MFU is attributable.

Usage: python examples/profile_conv_layers.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import stardist_tpu  # persistent compile cache
    from stardist_tpu.ops.conv_pallas import conv2d_hcw

    peak = 197e12
    # (H, W, Cin, Cout) of the bench net (4096^2, grid 2, depth 3, base 32,
    # n_conv_per_depth 2, feature conv 128)
    layers = [
        (4096, 4096, 1, 32),
        (4096, 4096, 32, 32),
        (2048, 2048, 32, 32),
        (2048, 2048, 96, 32),   # up-path concat
        (1024, 1024, 32, 64),
        (1024, 1024, 64, 64),
        (1024, 1024, 192, 64),  # up-path concat
        (512, 512, 64, 128),
        (512, 512, 128, 128),
        (2048, 2048, 32, 128),  # feature conv
    ]
    total_t, total_f = 0.0, 0.0
    for (H, W, C, Co) in layers:
        x = jnp.asarray(np.random.RandomState(0).rand(H, C, W).astype(np.float32))
        w = jnp.asarray(np.random.RandomState(1).rand(3, 3, C, Co).astype(np.float32) * 0.1)
        b = jnp.zeros(Co, jnp.float32)
        y = conv2d_hcw(x, w, b)
        jax.device_get(y[:1, :1, :1])
        # the axon tunnel costs ~28 ms per blocking dispatch round trip:
        # issue REPS async dispatches back-to-back and sync once, so the
        # RTT is paid once, not per iteration (REPS=40 leaves <1 ms of it
        # in each per-layer number)
        REPS = 40
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(REPS - 1):
                conv2d_hcw(x, w, b)          # async; ref dropped -> freed
            conv2d_hcw(x, w, b).block_until_ready()
            ts.append((time.perf_counter() - t0) / REPS)
        t = min(ts)
        flops = 2 * H * W * Co * 9 * C
        roof = min(Co, 128) / 128
        total_t += t
        total_f += flops
        print(f"({H:5d},{W:5d}) C={C:3d}->{Co:3d}: {t*1e3:7.2f} ms "
              f"{flops/t/1e12:6.1f} TF/s  mfu={flops/t/peak:5.1%} "
              f"(roofline {roof:4.0%})", flush=True)
    print(f"sum: {total_t*1e3:.1f} ms, {total_f/1e12:.2f} TFLOP, "
          f"mfu={total_f/total_t/peak:.1%}", flush=True)


if __name__ == "__main__":
    main()
