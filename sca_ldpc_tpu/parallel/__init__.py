from .mesh import make_mesh, data_sharding, replicated
from .fer import sharded_fer_simulation, make_sharded_fer_step

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "sharded_fer_simulation",
    "make_sharded_fer_step",
]
