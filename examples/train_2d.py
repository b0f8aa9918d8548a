"""Example: train a 2D StarDist-TPU model (analog of the reference's
examples/2D notebooks)."""
import numpy as np

from stardist_tpu.core.normalize import normalize
from stardist_tpu.data import test_image_nuclei_2d
from stardist_tpu.models import Config2D, StarDist2D
from stardist_tpu.utils import calculate_extents, fill_label_holes
from stardist_tpu.matching import matching_dataset


def random_fliprot(img, mask):
    ax = tuple(range(mask.ndim))
    perm = tuple(np.random.permutation(ax))
    img = img.transpose(perm + tuple(range(mask.ndim, img.ndim)))
    mask = mask.transpose(perm)
    for a in ax:
        if np.random.rand() > 0.5:
            img = np.flip(img, axis=a)
            mask = np.flip(mask, axis=a)
    return img, mask


def augmenter(x, y):
    """Flips/rotations + intensity jitter (safe for star-convexity)."""
    x, y = random_fliprot(x, y)
    x = x * np.random.uniform(0.6, 2) + np.random.uniform(-0.2, 0.2)
    x = x + 0.02 * np.random.normal(0, 1, x.shape)
    return x, y


def main():
    # toy dataset from the bundled synthetic generator; replace with your own
    # (img, mask) pairs
    img, mask = test_image_nuclei_2d(return_mask=True)
    X = [normalize(img.astype(np.float32), 1, 99.8) for _ in range(8)]
    Y = [fill_label_holes(mask.astype(np.int32)) for _ in range(8)]

    print("median object extents:", calculate_extents(Y[0]))

    config = Config2D(n_rays=32, grid=(2, 2), train_patch_size=(128, 128),
                      train_batch_size=4, train_epochs=20, train_steps_per_epoch=25)
    model = StarDist2D(config, name="example2d", basedir="models")
    model.train(X[:6], Y[:6], validation_data=(X[6:], Y[6:]), augmenter=augmenter, seed=0)
    model.optimize_thresholds(X[6:], Y[6:])

    labels, details = model.predict_instances(X[7])
    stats = matching_dataset(Y[7:], [labels], thresh=0.5)
    print(f"objects: {len(details['prob'])}, accuracy@0.5: {stats.accuracy:.3f}")


if __name__ == "__main__":
    main()
