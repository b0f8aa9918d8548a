"""stardist_tpu — TPU-native star-convex instance segmentation.

A from-scratch JAX/XLA/Pallas re-implementation of the full StarDist
capability surface (stardist/stardist): dense per-pixel star-convex shape
prediction (2D polygons / 3D polyhedra) with a Flax U-Net, TPU-side
geometry kernels (ray casting, NMS, rasterization), big-image block
processing, matching metrics, and training/prediction pipelines.

Flat namespace mirrors the reference package __init__ (stardist/__init__.py).
"""
from .version import __version__


_cache_checked = False


def _enable_persistent_compilation_cache():
    """Opt-out persistent XLA compilation cache (STARDIST_TPU_NO_CACHE=1 to
    disable). First-run compiles through a remote-TPU tunnel take minutes;
    the cache amortizes them across processes (the warm path of the fused
    device-predict dispatch is one cache hit instead of a 5+ minute build).

    Called lazily from the heavy entry points (model construction, device
    NMS) — NOT at import — so the decision is made on the *resolved* backend:
    CPU AOT cache entries are machine-feature-specific (a cache shared across
    heterogeneous hosts, e.g. on NFS, risks SIGILL), so the cache is enabled
    only when the default backend is an accelerator. Does nothing if the
    user already configured jax_compilation_cache_dir."""
    global _cache_checked
    if _cache_checked:
        return
    _cache_checked = True
    import os
    if os.environ.get("STARDIST_TPU_NO_CACHE", "0") == "1":
        return
    try:
        import jax
        if jax.default_backend() == "cpu":
            return
        if (jax.config.jax_compilation_cache_dir
                or os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            return
        cache_dir = os.environ.get(
            "STARDIST_TPU_JAX_CACHE",
            os.path.expanduser("~/.cache/stardist_tpu/jax_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

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
