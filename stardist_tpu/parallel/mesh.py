"""Device mesh + sharding helpers for data-parallel training and sharded
big-image inference.

The reference is single-process/single-node (SURVEY.md section 2.3); the
TPU-native distribution story is: batch data-parallelism over an ICI mesh
for training (NamedSharding on the batch axis, XLA inserts the gradient
all-reduce), and block-sharded big-image prediction (see
stardist_tpu/parallel/bigpredict.py).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices=None, axis_name="data"):
    """1D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def data_parallel_sharding(batch_size, devices=None):
    """Return (batch_sharding, replicated_sharding) for batch-DP, or
    (None, None) when DP is not applicable (single device, or batch size not
    divisible by the device count)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n <= 1 or batch_size % n != 0:
        return None, None
    mesh = get_mesh(devices)
    return (
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P()),
    )
