from .base import StationaryDiscretization
from .cg import CGDiscretization
from .swipdg import SWIPDGDiscretization
from .tensor_cg import TensorCGDiscretization

__all__ = [
    "StationaryDiscretization",
    "CGDiscretization",
    "SWIPDGDiscretization",
    "TensorCGDiscretization",
]
