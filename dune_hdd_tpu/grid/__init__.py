from .structured import Grid, RefinementInfo, rectangle_grid, refine, TRIANGLE, QUAD
from .boundaryinfo import BoundaryInfo, make_boundary_info
from .hierarchy import GridHierarchy, GridProviders, prolong_vertex_values

__all__ = [
    "Grid",
    "RefinementInfo",
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
