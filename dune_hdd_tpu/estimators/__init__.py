from .swipdg import (
    SWIPDGEstimators,
    min_diffusion_eigenvalue,
    oswald_interpolation,
    rt0_divergence,
    rt0_evaluate,
    rt0_flux_reconstruction,
)

__all__ = [
    "SWIPDGEstimators",
    "oswald_interpolation",
    "rt0_flux_reconstruction",
    "rt0_evaluate",
    "rt0_divergence",
    "min_diffusion_eigenvalue",
]
