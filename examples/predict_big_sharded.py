"""Example: block-wise prediction of a very large image, with the network
forward sharded over all available TPU devices."""
import numpy as np

from stardist_tpu.core.normalize import normalize
from stardist_tpu.models import StarDist2D
from stardist_tpu.parallel.bigpredict import predict_instances_big_sharded


def main():
    model = StarDist2D(None, name="2D_demo", basedir="models/examples")

    # stand-in for a gigapixel image (use a zarr/memmap array in practice)
    rng = np.random.RandomState(0)
    img = normalize(rng.uniform(0, 1, (4096, 4096)).astype(np.float32), 1, 99.8)

    labels, polys = predict_instances_big_sharded(
        model, img, axes="YX", block_size=1024, min_overlap=64, context=64)
    print("objects:", len(polys["prob"]))


if __name__ == "__main__":
    main()
