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
from .tensor import (
    TensorBoundaryInfo,
    TensorGrid,
    TensorGridHierarchy,
    make_tensor_boundary_info,
    tensor_grid,
)

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
    "TensorBoundaryInfo",
    "TensorGrid",
    "TensorGridHierarchy",
    "make_tensor_boundary_info",
    "tensor_grid",
]
