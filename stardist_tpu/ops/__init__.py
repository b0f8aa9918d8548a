from .stardist2d import star_dist2d_jax, star_dist2d_numpy
from .stardist3d import star_dist3d_jax, star_dist3d_numpy
from .polygon import (
    ray_angles_jnp,
    polygon_vertices,
    polygon_areas,
    points_in_polygons,
)
from .polyhedron import (
    polyhedron_face_inverses,
    points_in_polyhedra,
    polyhedron_volumes,
)
from .rasterize import rasterize_polygons, rasterize_polyhedra
from .nms import nms_polygons, nms_polyhedra
