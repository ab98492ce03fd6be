from .base import StationaryDiscretization
from .cg import CGDiscretization

__all__ = ["StationaryDiscretization", "CGDiscretization"]
