from .quadrature import edge_rule, quad_rule, tri_rule
from .spaces import Space, cg_space, dg_space
from .assembly import (
    assemble_cell_matrix,
    boundary_face_functional,
    boundary_face_l2_matrices,
    cell_quadrature,
    diffusion_pairs,
    elliptic_cell_matrices,
    face_quadrature,
    force_cell_vectors,
    l2_cell_matrices,
    scatter_cell_vectors,
    volume_pattern,
)
from .norms import error_norms, evaluate_discrete, evaluate_discrete_gradient, induced_norm

__all__ = [
    "edge_rule",
    "quad_rule",
    "tri_rule",
    "Space",
    "cg_space",
    "dg_space",
    "assemble_cell_matrix",
    "boundary_face_functional",
    "boundary_face_l2_matrices",
    "cell_quadrature",
    "diffusion_pairs",
    "elliptic_cell_matrices",
    "face_quadrature",
    "force_cell_vectors",
    "l2_cell_matrices",
    "scatter_cell_vectors",
    "volume_pattern",
    "error_norms",
    "evaluate_discrete",
    "evaluate_discrete_gradient",
    "induced_norm",
]
