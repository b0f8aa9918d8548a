"""Worker process for tests/test_multihost.py: joins a jax CPU cluster,
loads the shared model, runs the multihost block driver, and saves this
process's result for the parent to compare."""
import os
import sys


def main():
    pid = int(sys.argv[1])
    n_procs = int(sys.argv[2])
    port = sys.argv[3]
    modeldir = sys.argv[4]
    data_npz = sys.argv[5]
    out_npz = sys.argv[6]
    model_kind = sys.argv[7] if len(sys.argv) > 7 else "2d"
    stitch = sys.argv[8] if len(sys.argv) > 8 else "replicated"

    import jax
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=n_procs, process_id=pid)
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from stardist_tpu.models import StarDist2D, StarDist3D
    from stardist_tpu.parallel import predict_instances_big_multihost

    if model_kind == "3d":
        model = StarDist3D(None, name="mh", basedir=modeldir)
        pred_kwargs = dict(axes="ZYX", block_size=(32, 64, 64),
                           min_overlap=(12, 16, 16), context=(4, 12, 12))
    else:
        model = StarDist2D(None, name="mh", basedir=modeldir)
        pred_kwargs = dict(axes="YX", block_size=96, min_overlap=32,
                           context=16)
    img = np.load(data_npz)["img"]
    labels, polys = predict_instances_big_multihost(
        model, img, prob_thresh=0.5, stitch=stitch, **pred_kwargs)
    # replicated: every process holds the full result (save from pid 0);
    # partitioned: each process holds its own blocks' labels (parent
    # combines) but identical full polys — save from every process
    if stitch == "partitioned" or pid == 0:
        np.savez(out_npz.replace(".npz", f".{pid}.npz") if stitch == "partitioned"
                 else out_npz,
                 labels=labels, prob=polys["prob"], points=polys["points"])
    print(f"worker {pid}: {labels.max()} labels", flush=True)


if __name__ == "__main__":
    main()
