"""Op-level profile of the v2 global-pair-list NMS kernel on the device.

Runs the warm kernel under jax.profiler.trace and prints the top device ops
by self-time from the captured xplane (parsed with tensorboard_plugin_profile
if available, else a raw xplane walk).

Usage: python examples/profile_nms_v2_ops.py [N]
"""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_nms import clustered_candidates  # noqa: E402


def _xplane_top_ops(logdir, top=40):
    """Parse the raw xplane proto and aggregate device event durations."""
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    agg = {}
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            name = plane.name
            if "TPU" not in name and "tpu" not in name and "Device" not in name:
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    md = ev_meta.get(ev.metadata_id)
                    if md is None:
                        continue
                    key = md.name
                    agg.setdefault(key, [0.0, 0])
                    agg[key][0] += ev.duration_ps / 1e9  # ms
                    agg[key][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for _, v in rows)
    print(f"total device event time: {total:.1f} ms over {len(rows)} op kinds")
    for k, (ms, n) in rows[:top]:
        print(f"{ms:9.2f} ms  x{n:5d}  {k[:130]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    import jax
    import stardist_tpu  # noqa: F401
    from stardist_tpu import _enable_persistent_compilation_cache
    _enable_persistent_compilation_cache()
    from stardist_tpu.ops.nms2d_fast import nms2d_twolayout_host

    dist, points, prob = clustered_candidates(n)
    # warm (compile + capacity retries)
    keep = nms2d_twolayout_host(dist, points, 0.4, verbose=True)
    assert keep is not None

    logdir = "/tmp/nms_v2_trace"
    os.system(f"rm -rf {logdir}")
    import time
    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        nms2d_twolayout_host(dist, points, 0.4)
        dt = time.perf_counter() - t0
    print(f"traced run: {dt * 1e3:.1f} ms wall")
    _xplane_top_ops(logdir)


if __name__ == "__main__":
    main()
