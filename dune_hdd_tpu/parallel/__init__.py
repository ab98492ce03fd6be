from .distributed import initialize_distributed, is_distributed, process_info
from .sharded import (
    ShardedAffineSystem,
    make_device_mesh,
    sharded_cg,
    sharded_parameter_sweep,
)

__all__ = [
    "initialize_distributed",
    "is_distributed",
    "process_info",
    "ShardedAffineSystem",
    "make_device_mesh",
    "sharded_cg",
    "sharded_parameter_sweep",
]
