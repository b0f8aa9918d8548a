"""stardist_tpu — TPU-native star-convex instance segmentation.

A from-scratch JAX/XLA/Pallas re-implementation of the full StarDist
capability surface (stardist/stardist): dense per-pixel star-convex shape
prediction (2D polygons / 3D polyhedra) with a Flax U-Net, TPU-side
geometry kernels (ray casting, NMS, rasterization), big-image block
processing, matching metrics, and training/prediction pipelines.

Flat namespace mirrors the reference package __init__ (stardist/__init__.py).
"""
from .version import __version__

from .nms import (
    non_maximum_suppression,
    non_maximum_suppression_sparse,
    non_maximum_suppression_3d,
    non_maximum_suppression_3d_sparse,
)
from .utils import (
    edt_prob,
    fill_label_holes,
    sample_points,
    calculate_extents,
    export_imagej_rois,
    gputools_available,
    mask_to_categorical,
)
from .geometry import (
    star_dist,
    polygons_to_label,
    relabel_image_stardist,
    ray_angles,
    dist_to_coord,
    star_dist3D,
    polyhedron_to_label,
    relabel_image_stardist3D,
    dist_to_coord3D,
    export_to_obj_file3D,
)
from .rays3d import (
    Rays_Base,
    Rays_Explicit,
    Rays_Cartesian,
    Rays_SubDivide,
    Rays_Tetra,
    Rays_Octo,
    Rays_GoldenSpiral,
    rays_from_json,
    reorder_faces,
)
from .sample_patches import sample_patches
from .plot.plot import random_label_cmap, draw_polygons, _draw_polygons
from .plot.render import render_label, render_label_pred
from .bioimageio_utils import export_bioimageio, import_bioimageio
