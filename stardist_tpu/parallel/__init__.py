from .mesh import get_mesh, data_parallel_sharding
