from .mesh import make_mesh, data_sharding, replicated
from .fer import sharded_fer_simulation, make_sharded_fer_step
from .attack import make_sharded_masked_decode
from .distributed import init_distributed

__all__ = [
    "init_distributed",
    "make_mesh",
    "data_sharding",
    "replicated",
    "sharded_fer_simulation",
    "make_sharded_fer_step",
    "make_sharded_masked_decode",
]
