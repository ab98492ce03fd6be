from .sharded import (
    ShardedAffineSystem,
    make_device_mesh,
    sharded_cg,
    sharded_parameter_sweep,
)

__all__ = [
    "ShardedAffineSystem",
    "make_device_mesh",
    "sharded_cg",
    "sharded_parameter_sweep",
]
