"""Reduced-basis projection of affine stationary discretizations.

The offline/online split the reference exposes to pyMOR (every
discretization implements Pymor::StationaryDiscretizationInterface so its
affine operator/rhs/products can be Galerkin-projected; survey 3.5):

offline: per affine component q, the dense reduced matrices B A_q B^T and
vectors B b_q (B = reduced basis rows); online: freeze = theta-weighted sums
(tiny dense algebra, jitted) + dense solve.  Includes a residual-based
error estimator surrogate (Riesz-free, product-norm of the algebraic
residual) for greedy training.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..affine import AffineDecomposition
from ..parameters import Parameter

__all__ = ["ReducedModel", "RBReductor"]


class ReducedModel:
    """Dense affine reduced model: ops [Q, n, n] stacked, rhs [Qr, n]."""

    def __init__(self, op_mats: jnp.ndarray, op_coeffs, rhs_vecs: jnp.ndarray,
                 rhs_coeffs, basis: jnp.ndarray, products: Optional[Dict] = None):
        self.op_mats = op_mats
        self.op_coeffs = list(op_coeffs)
        self.rhs_vecs = rhs_vecs
        self.rhs_coeffs = list(rhs_coeffs)
        self.basis = basis
        self.products = products or {}

    @property
    def dim(self) -> int:
        return self.basis.shape[0]

    def thetas(self, coeffs, mu: Parameter) -> jnp.ndarray:
        return jnp.stack([jnp.asarray(c(mu)) for c in coeffs]) if coeffs else jnp.zeros((0,))

    def solve(self, mu: Parameter) -> jnp.ndarray:
        """Reduced coefficients [n]."""
        A = jnp.einsum("q,qij->ij", self.thetas(self.op_coeffs, mu), self.op_mats)
        b = jnp.einsum("q,qi->i", self.thetas(self.rhs_coeffs, mu), self.rhs_vecs)
        return jnp.linalg.solve(A, b)

    def reconstruct(self, coefficients: jnp.ndarray) -> jnp.ndarray:
        return coefficients @ self.basis


class RBReductor:
    """Galerkin projection of a StationaryDiscretization onto a basis."""

    def __init__(self, discretization, product: Optional[str] = None):
        self.d = discretization
        self.product_name = product
        self._product = (
            discretization.product_matrix(product) if product is not None else None
        )

    def reduce(self, basis: jnp.ndarray) -> ReducedModel:
        d = self.d
        op = d.get_operator().with_expanded_affine_part()
        rhs = d.get_rhs().with_expanded_affine_part()
        if basis.shape[0]:
            # [q, i, j] = b_i . (A_q b_j): one batched matmat per component
            # (row gather amortised over the basis columns), then dense matmul
            BT = basis.T  # [N, n]
            op_mats = jnp.stack([basis @ m.matmat(BT) for m in op.components])
        else:
            op_mats = jnp.zeros((op.num_components, 0, 0))
        rhs_vecs = jnp.stack([basis @ v for v in rhs.components]) if basis.shape[0] else jnp.zeros((rhs.num_components, 0))
        products = {}
        for name in self.d.available_products():
            if d.get_product(name).parametric():
                continue  # parametric products (e.g. "energy") stay detailed
            pm = d.product_matrix(name)
            if basis.shape[0]:
                products[name] = jnp.stack([basis @ pm.matvec(b) for b in basis])
            else:
                products[name] = jnp.zeros((0, 0))
        return ReducedModel(op_mats, op.coefficients, rhs_vecs, rhs.coefficients,
                            basis, products)

    # -- error measures ------------------------------------------------------
    def true_error(self, rm: ReducedModel, mu: Parameter, norm: str = "h1_semi",
                   solver_options=None) -> float:
        u = self.d.solve(mu, options=solver_options or {"type": "direct"})
        u_rb = rm.reconstruct(rm.solve(mu))
        e = u - u_rb
        pm = self.d.product_matrix(norm)
        return float(jnp.sqrt(jnp.maximum(e @ pm.matvec(e), 0.0)))

    def residual_norm(self, rm: ReducedModel, mu: Parameter) -> float:
        """Algebraic residual ||b(mu) - A(mu) B c|| (Euclidean) — a cheap
        greedy surrogate when no error estimator is requested."""
        u_rb = rm.reconstruct(rm.solve(mu))
        A = self.d.freeze_operator(mu)
        b = self.d.freeze_rhs(mu)
        r = b - A.matvec(u_rb)
        return float(jnp.linalg.norm(r))
