"""Example: train a 3D StarDist-TPU model (analog of the reference's
examples/3D notebooks)."""
import numpy as np

from stardist_tpu.data import test_image_nuclei_3d
from stardist_tpu.core.normalize import normalize
from stardist_tpu.models import Config3D, StarDist3D
from stardist_tpu.rays3d import Rays_GoldenSpiral
from stardist_tpu.utils import calculate_extents, fill_label_holes


def main():
    img, mask = test_image_nuclei_3d(return_mask=True)
    X = [normalize(img.astype(np.float32), 1, 99.8) for _ in range(4)]
    Y = [fill_label_holes(mask.astype(np.int32)) for _ in range(4)]

    extents = calculate_extents(Y[0])
    anisotropy = tuple(np.max(extents) / extents)
    print("median object extents:", extents, "anisotropy:", anisotropy)

    rays = Rays_GoldenSpiral(96, anisotropy=anisotropy)
    config = Config3D(
        rays=rays, grid=(1, 2, 2), anisotropy=anisotropy,
        train_patch_size=(32, 64, 64), train_batch_size=2,
        train_epochs=20, train_steps_per_epoch=25,
    )
    model = StarDist3D(config, name="example3d", basedir="models")
    model.train(X[:3], Y[:3], validation_data=(X[3:], Y[3:]), seed=0)
    model.optimize_thresholds(X[3:], Y[3:])

    labels, details = model.predict_instances(X[0])
    print(f"objects: {len(details['prob'])}")

    # export meshes for visualization
    from stardist_tpu import export_to_obj_file3D
    export_to_obj_file3D(details, "example3d.obj")


if __name__ == "__main__":
    main()
