from .mesh import make_mesh, data_sharding, replicated
from .fer import sharded_fer_simulation, make_sharded_fer_step
from .attack import make_sharded_masked_decode

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "sharded_fer_simulation",
    "make_sharded_fer_step",
    "make_sharded_masked_decode",
]
