"""Worker process for tests/test_multihost.py: joins a 2-process jax CPU
cluster, loads the shared model, runs the multihost block driver, and (on
process 0) saves the result for the parent to compare."""
import os
import sys


def main():
    pid = int(sys.argv[1])
    n_procs = int(sys.argv[2])
    port = sys.argv[3]
    modeldir = sys.argv[4]
    data_npz = sys.argv[5]
    out_npz = sys.argv[6]

    import jax
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=n_procs, process_id=pid)
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from stardist_tpu.models import StarDist2D
    from stardist_tpu.parallel import predict_instances_big_multihost

    model = StarDist2D(None, name="mh", basedir=modeldir)
    img = np.load(data_npz)["img"]
    labels, polys = predict_instances_big_multihost(
        model, img, axes="YX", block_size=96, min_overlap=32, context=16,
        prob_thresh=0.5)
    if pid == 0:
        np.savez(out_npz, labels=labels, prob=polys["prob"],
                 points=polys["points"])
    print(f"worker {pid}: {labels.max()} labels", flush=True)


if __name__ == "__main__":
    main()
