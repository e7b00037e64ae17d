from .mesh import make_mesh, DATA_AXIS, ROW_AXIS, COL_AXIS
from .sharded import sharded_decompose, sharded_wow
from .reductions import distributed_median, kth_smallest

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "ROW_AXIS",
    "COL_AXIS",
    "sharded_decompose",
    "sharded_wow",
    "distributed_median",
    "kth_smallest",
]
