"""Offline/online reduced-basis residual error estimator.

The reference's RB workflows (examples/linearelliptic/thermalblock_main.py:
82-188 via pyMOR's reductors) drive the greedy with a *Riesz-representative*
residual estimator: with product P (SPD) and affine operator/rhs

    A(mu) = sum_q theta_q(mu) A_q,      f(mu) = sum_p sigma_p(mu) f_p,

the residual r(mu) = f(mu) - A(mu) u_rb(mu) has Riesz representative
rho = P^{-1} r and   ||rho||_P^2 = r^T P^{-1} r   expands into
mu-independent Gramians of the residual generators:

    G_ff[p,p']    = f_p^T P^{-1} f_p'
    G_fa[p,q,j]   = f_p^T P^{-1} (A_q b_j)
    G_aa[q,i,q,j] = (A_q b_i)^T P^{-1} (A_q' b_j)

(offline: one P-solve per generator, cached incrementally per basis row);
online the estimate is O(Q^2 n^2) dense algebra — no detailed operator
touches.  With a coercivity lower bound alpha_LB(mu) of A(mu) w.r.t. P the
*energy-norm* error bound applied by ``OnlineResidual.estimate`` is

    ||u - u_rb||_mu <= ||rho||_P / sqrt(alpha_LB(mu))

(standard RB a posteriori theory; pyMOR's ReduceStationaryCoerciveRB, which
the reference's thermalblock workflow instantiates, divides by alpha_LB for
the P-norm bound instead — divide the returned estimate by another
sqrt(alpha_LB) to recover that).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RieszResidualEstimator", "OnlineResidual", "min_theta_coercivity"]


def min_theta_coercivity(operator_decomposition, mu_bar) -> Callable:
    """alpha_LB(mu) = min_q theta_q(mu)/theta_q(mu_bar): valid lower bound of
    the coercivity w.r.t. the energy product at mu_bar when all theta_q > 0
    and the A_q are positive semidefinite (min-theta approach; the OS2014
    alpha factor of affine.coefficient_bounds is the same quantity)."""
    from ..affine import coefficient_bounds

    def alpha(mu):
        a, _ = coefficient_bounds(operator_decomposition, mu, mu_bar)
        return jnp.asarray(a)

    return alpha


class OnlineResidual:
    """Dense online part: mu -> ||P^{-1} r(mu)||_P (optionally / alpha_LB)."""

    def __init__(self, G_ff, G_fa, G_aa, op_coeffs, rhs_coeffs,
                 coercivity: Optional[Callable] = None):
        self.G_ff = G_ff
        self.G_fa = G_fa
        self.G_aa = G_aa
        self.op_coeffs = list(op_coeffs)
        self.rhs_coeffs = list(rhs_coeffs)
        self.coercivity = coercivity

    def _thetas(self, coeffs, mu):
        if not coeffs:
            return jnp.zeros((0,))
        return jnp.stack([jnp.asarray(c(mu)).reshape(()) for c in coeffs])

    def estimate(self, mu, coefficients: jnp.ndarray) -> float:
        """Error estimate for the reduced solution with the given reduced
        coefficients at mu."""
        tf = self._thetas(self.rhs_coeffs, mu)
        ta = self._thetas(self.op_coeffs, mu)
        c = coefficients
        w = (ta[:, None] * c[None, :]).reshape(-1)  # [Q*n]
        Qa, n = self.G_fa.shape[1], self.G_fa.shape[2]
        G_fa = self.G_fa.reshape(len(tf), Qa * n)
        G_aa = self.G_aa.reshape(Qa * n, Qa * n)
        eta2 = tf @ self.G_ff @ tf - 2.0 * (tf @ (G_fa @ w)) + w @ (G_aa @ w)
        eta = jnp.sqrt(jnp.maximum(eta2, 0.0))
        if self.coercivity is not None:
            eta = eta / jnp.sqrt(jnp.maximum(jnp.asarray(self.coercivity(mu)), 1e-300))
        return float(eta)


class RieszResidualEstimator:
    """Offline builder with incremental per-basis-row caching (appending a
    snapshot in a greedy step only triggers P-solves for the new rows)."""

    def __init__(self, discretization, product: str = "h1_semi",
                 coercivity: Optional[Callable] = None, mu_bar=None,
                 constrain_dirichlet: bool = True):
        d = discretization
        self.d = d
        pm = d.get_product(product)
        if pm.parametric():
            if mu_bar is None:
                raise ValueError(
                    f"product {product!r} is parametric; pass mu_bar to freeze it"
                )
            P = pm.freeze(d.problem.parse_parameter(mu_bar))
        else:
            P = d.product_matrix(product)
        # CG discretizations assemble their products UNCONSTRAINED
        # (cg.hh:291-330), so h1_semi carries the constants kernel: the
        # Riesz solve then amplifies the residual's kernel component by
        # the 1e-12 regularization below — 1e6x-scale absolute estimates.
        # Constraining the Dirichlet DoFs (unit diagonal) makes P SPD on
        # the active space, i.e. the proper constrained-H1 dual norm;
        # residuals of the constrained system vanish at Dirichlet rows,
        # so those rows are inert.  DG spaces (weak BCs) are untouched.
        if constrain_dirichlet and getattr(d.space, "continuous", True):
            binfo = getattr(d, "boundary_info", None)
            dirv = getattr(binfo, "dirichlet_vertices", None)
            if dirv is not None:
                dirv = np.asarray(dirv)
                if dirv.any() and dirv.shape[0] == P.pattern.shape[0]:
                    P = (P.with_constrained_rows(dirv, unit_diagonal=True)
                         .with_constrained_cols(dirv, keep_unit_diag=True))
        self._P = P
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        p = P.pattern
        A = sp.csc_matrix(
            (np.asarray(P.values, dtype=np.float64), (p.slot_rows, p.slot_cols)),
            shape=p.shape,
        )
        # the h1_semi product of a DG space has a constant-per-cell kernel;
        # regularize with a tiny l2 shift so the factorization exists (the
        # residual of a well-posed problem has no component in the kernel
        # up to discretization effects, so the estimate is unaffected at
        # the shift's scale)
        diag_scale = float(np.abs(A.diagonal()).max() or 1.0)
        A = A + sp.identity(p.shape[0], format="csc") * (1e-12 * diag_scale)
        self._solve_P = spla.splu(A).solve

        op = d.get_operator().with_expanded_affine_part()
        rhs = d.get_rhs().with_expanded_affine_part()
        self.op_components = list(op.components)
        self.op_coeffs = list(op.coefficients)
        self.rhs_components = list(rhs.components)
        self.rhs_coeffs = list(rhs.coefficients)
        self.coercivity = coercivity

        f = np.stack([np.asarray(v, dtype=np.float64) for v in self.rhs_components])
        rf = np.stack([self._solve_P(v) for v in f])  # [Qf, N]
        self._f = f
        self._G_ff = jnp.asarray(rf @ f.T)
        # content-addressed per-basis-row cache: LRBMS globalization REORDERS
        # rows when a subdomain basis grows (all of subdomain 0's rows first,
        # then 1's, ...), so a prefix-based cache would rebuild everything on
        # each extension; keying by row content survives reorders
        self._row_cache: Dict[bytes, tuple] = {}

    def _row_data(self, row: np.ndarray) -> tuple:
        key = row.tobytes()
        hit = self._row_cache.get(key)
        if hit is None:
            Ab = np.stack([np.asarray(m.matvec(jnp.asarray(row)), dtype=np.float64)
                           for m in self.op_components])
            rAb = np.stack([self._solve_P(v) for v in Ab])
            hit = (Ab, rAb)
            self._row_cache[key] = hit
        return hit

    def offline(self, basis: jnp.ndarray) -> OnlineResidual:
        rows = np.asarray(basis, dtype=np.float64)
        n = len(rows)
        Qa, Qf = len(self.op_components), len(self.rhs_components)
        if n == 0:
            G_fa = jnp.zeros((Qf, Qa, 0))
            G_aa = jnp.zeros((Qa, 0, Qa, 0))
        else:
            data = [self._row_data(r) for r in rows]
            Ab = np.stack([d[0] for d in data], axis=1)    # [Qa, n, N]
            rAb = np.stack([d[1] for d in data], axis=1)  # [Qa, n, N]
            G_fa = jnp.asarray(np.einsum("pN,qjN->pqj", self._f, rAb))
            G_aa = jnp.asarray(np.einsum("qiN,pjN->qipj", Ab, rAb))
            # symmetrize (P^{-1} is symmetric; splu round-off breaks it mildly)
            G_aa = 0.5 * (G_aa + jnp.transpose(G_aa, (2, 3, 0, 1)))
        return OnlineResidual(self._G_ff, G_fa, G_aa, self.op_coeffs,
                              self.rhs_coeffs, self.coercivity)
