"""ESV2007 testcase-1 data functions (Ern/Stephansen/Vohralik 2007).

Replaces Stuff::Functions::ESV2007::{Testcase1Force, Testcase1ExactSolution,
Cutoff} used by problems/ESV2007.hh:44 and estimators/swipdg.hh (cutoff in
eta_R, survey 2.3).  Exact solution u = cos(pi/2 x) cos(pi/2 y) on [-1,1]^2
with unit diffusion; force f = pi^2/2 cos(pi/2 x) cos(pi/2 y).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .base import Function

__all__ = ["Testcase1Force", "Testcase1ExactSolution", "CutoffFunction"]


class Testcase1Force(Function):
    range_shape = ()

    def __init__(self, order: int = 3, name: str = "force"):
        self.order = order
        self.name = name

    def __call__(self, x):
        p = 0.5 * math.pi
        return (p * math.pi) * jnp.cos(p * x[..., 0]) * jnp.cos(p * x[..., 1])


class Testcase1ExactSolution(Function):
    range_shape = ()

    def __init__(self, order: int = 2, name: str = "exact_solution"):
        self.order = order
        self.name = name

    def __call__(self, x):
        p = 0.5 * math.pi
        return jnp.cos(p * x[..., 0]) * jnp.cos(p * x[..., 1])

    def gradient(self, x):
        p = 0.5 * math.pi
        gx = -p * jnp.sin(p * x[..., 0]) * jnp.cos(p * x[..., 1])
        gy = -p * jnp.cos(p * x[..., 0]) * jnp.sin(p * x[..., 1])
        return jnp.stack([gx, gy], axis=-1)


class CutoffFunction(Function):
    """Elementwise-constant cutoff for the ESV2007 residual estimator:
    cutoff|_T = h_T^2 / (pi^2 * min_T eig(lambda*kappa)) so that
    eta_R,T = sqrt(cutoff) * ||f - P0 f||_T is the Poincare-weighted residual
    (survey 2.3 eta_R_ESV2007; estimators/block-swipdg.hh:288-309 spells the
    same constant).  Evaluation happens per cell in the estimator kernels, so
    this class only stores the ingredients.
    """

    range_shape = ()

    def __init__(self, diffusion_factor: Function, diffusion_tensor: Function,
                 poincare_constant: float = 1.0 / (math.pi ** 2),
                 name: str = "cutoff"):
        self.diffusion_factor = diffusion_factor
        self.diffusion_tensor = diffusion_tensor
        self.poincare_constant = poincare_constant
        self.name = name

    def min_diffusion_eigenvalue(self, x):
        """min eigenvalue of lambda(x)*kappa(x) at points x [..., 2]."""
        lam = self.diffusion_factor(x)
        kap = self.diffusion_tensor(x)
        mat = lam[..., None, None] * kap
        # symmetric 2x2 closed-form smallest eigenvalue
        a, b, c, d = mat[..., 0, 0], mat[..., 0, 1], mat[..., 1, 0], mat[..., 1, 1]
        tr = a + d
        disc = jnp.sqrt(jnp.maximum((a - d) ** 2 + 4.0 * b * c, 0.0))
        return 0.5 * (tr - disc)
