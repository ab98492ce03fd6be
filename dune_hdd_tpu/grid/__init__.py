from .structured import (
    Grid,
    RefinementInfo,
    alu_cube_grid,
    bisect,
    rectangle_grid,
    refine,
    TRIANGLE,
    QUAD,
)
from .boundaryinfo import BoundaryInfo, make_boundary_info
from .hierarchy import GridHierarchy, GridProviders, prolong_vertex_values

__all__ = [
    "Grid",
    "RefinementInfo",
    "alu_cube_grid",
    "bisect",
    "rectangle_grid",
    "refine",
    "TRIANGLE",
    "QUAD",
    "BoundaryInfo",
    "make_boundary_info",
    "GridHierarchy",
    "GridProviders",
    "prolong_vertex_values",
]
