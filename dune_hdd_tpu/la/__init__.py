from .sparse import SparseMatrix, SparsityPattern, build_pattern
from .solvers import make_preconditioner, solve, solver_options, solver_types

__all__ = [
    "SparseMatrix",
    "SparsityPattern",
    "build_pattern",
    "solve",
    "solver_options",
    "solver_types",
    "make_preconditioner",
]
