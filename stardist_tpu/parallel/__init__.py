from .mesh import get_mesh, data_parallel_sharding
from .bigpredict import predict_instances_big_sharded
from .multihost import predict_instances_big_multihost
