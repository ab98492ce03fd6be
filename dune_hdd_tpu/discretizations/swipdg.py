"""SWIPDG discretization (reference: discretizations/swipdg.hh:109-520).

Discontinuous Lagrange space; the operator is, per affine diffusion
component, volume elliptic blocks + SWIPDG interior/Dirichlet face blocks;
the rhs carries force, Neumann, and Dirichlet-penalty functionals including
the (diffusion_p x dirichlet_q) cross components with product coefficients
(swipdg.hh:272-332).  Products (gated by only_these_products like
swipdg.hh:358-508): l2, h1_semi, elliptic, boundary_l2, penalty, energy
(= copy of the system matrix family).

Two parametric schemes are supported (``scheme``):

* "reference" (default) — exactly the reference's decomposition: one
  *self-weighted* SWIPDG operator per affine diffusion component
  (swipdg.hh:222-249; flux, weights, and penalty all from lambda_q kappa),
  and one full Dirichlet-penalty boundary functional per
  (diffusion_p x dirichlet_q) pair with product coefficient theta_p*theta_q
  (swipdg.hh:272-332).  This reproduces the published parametric expectation
  tables; the frozen penalty sum_q theta_q gamma_q is not the penalty of the
  frozen diffusion (gamma is nonlinear in lambda), matching the reference.
* "penalty_mu" — weights/penalty frozen at ``penalty_mu`` (default all-ones):
  parametric components carry flux terms only and the penalty appears exactly
  once in the affine part.  Guaranteed-positive penalty for every mu (used
  where coercivity of each component matters).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..affine import AffineDecomposition
from ..functions.base import ConstantFunction, constant_matrix, freeze_function
from ..grid.boundaryinfo import BoundaryInfo, make_boundary_info
from ..grid.structured import Grid
from ..la.sparse import SparseMatrix
from ..ops.assembly import (
    assemble_cell_matrix,
    boundary_face_functional,
    boundary_face_l2_matrices,
    diffusion_pairs,
    elliptic_cell_matrices,
    force_cell_vectors,
    l2_cell_matrices,
    scatter_cell_vectors,
    volume_pattern,
)
from ..ops.spaces import dg_space
from ..ops.swipdg import (
    assemble_swipdg_matrix,
    boundary_sigma,
    default_beta,
    inner_sigma,
    swipdg_dirichlet_rhs,
    swipdg_face_blocks,
    swipdg_pattern,
)
from ..parameters import ProductFunctional
from ..problems.interfaces import Problem
from .base import StationaryDiscretization
from .cg import _parts

__all__ = ["SWIPDGDiscretization"]

_ALL_PRODUCTS = ("l2", "h1_semi", "elliptic", "boundary_l2", "penalty", "energy")


def _guard_sign_indefinite_scheme(problem, grid, scheme: str) -> str:
    """The reference's per-component self-weighted scheme (swipdg.hh:222-249)
    assumes each part's diffusion is usable as a weighting: the affine
    part's face penalty gamma = d_m d_p/(d_m + d_p) turns NEGATIVE wherever
    the affine part does, destroying coercivity (measured on SPE10's
    parametric channel, whose affine part 1 + channel dips to -0.11: the
    mu=1 study diverges, energy 15 -> 31, while the frozen problem gives
    3.44 -> 1.47).  Guard: if the diffusion-factor affine part is not
    strictly positive on the grid, fall back to the penalty_mu scheme
    (fixed positive weighting diffusion; guaranteed-positive penalty for
    every mu).  Decompositions with positive affine parts (e.g. the OS2014
    testcases, whose tables the reference scheme reproduces) are untouched.
    """
    affine = problem.diffusion_factor.affine_part
    if affine is None:
        return "penalty_mu"
    from ..ops.assembly import cell_quadrature

    qp, _ = cell_quadrature(grid, 2)
    vals = np.asarray(affine(qp))
    if vals.min() <= 0.0:
        return "penalty_mu"
    return scheme


class SWIPDGDiscretization(StationaryDiscretization):
    static_id = "hdd.linearelliptic.discretizations.swipdg"

    def __init__(
        self,
        grid: Grid,
        boundary_info,
        problem: Problem,
        order: int = 1,
        only_these_products: Optional[Sequence[str]] = ("l2", "h1_semi", "energy"),
        penalty_mu=None,
        scheme: Optional[str] = None,
    ):
        explicit_scheme = scheme is not None
        if scheme is None:
            scheme = "penalty_mu" if penalty_mu is not None else "reference"
        if scheme not in ("reference", "penalty_mu"):
            raise ValueError(f"unknown scheme {scheme!r}")
        self.scheme_substituted = False
        if scheme == "reference" and problem.parametric():
            guarded = _guard_sign_indefinite_scheme(problem, grid, scheme)
            if guarded != scheme:
                # observable substitution: a sign-indefinite affine part makes
                # the self-weighted scheme lose coercivity (negative face
                # penalties), so we fall back — recorded on the
                # discretization, and warned about when the user explicitly
                # requested reference-scheme semantics
                self.scheme_substituted = True
                if explicit_scheme:
                    import warnings

                    warnings.warn(
                        "SWIPDG scheme='reference' requires a strictly "
                        "positive diffusion-factor affine part; falling back "
                        "to scheme='penalty_mu' (sign-indefinite "
                        "decomposition)", RuntimeWarning, stacklevel=2,
                    )
            scheme = guarded
        self.scheme = scheme
        if not isinstance(boundary_info, BoundaryInfo):
            boundary_info = make_boundary_info(grid, boundary_info)
        space = dg_space(grid, order)
        products_wanted = tuple(only_these_products) if only_these_products is not None else _ALL_PRODUCTS
        self.beta = default_beta(2)
        self.sigma_inner = inner_sigma(order)
        self.sigma_boundary = boundary_sigma(order)

        interior = np.nonzero(grid.interior_faces)[0]
        dirichlet = np.nonzero(boundary_info.dirichlet_faces)[0]
        neumann = np.nonzero(boundary_info.neumann_faces)[0]
        all_boundary = np.nonzero(grid.boundary_faces)[0]
        self._interior_faces = interior
        self._dirichlet_faces = dirichlet

        # weighting diffusion (fixed; = the diffusion itself if nonparametric)
        if problem.parametric():
            if penalty_mu is None:
                penalty_mu = {
                    name: jnp.ones(size) for name, size in problem.parameter_type.items()
                }
            wproblem = problem.with_mu(penalty_mu)
        else:
            wproblem = problem
        wlam = freeze_function(wproblem.diffusion_factor)
        wkap = freeze_function(wproblem.diffusion_tensor)
        self._weight_diffusion = (wlam, wkap)

        pattern = swipdg_pattern(space, interior, dirichlet)

        # -- operator: per diffusion pair, volume + face blocks ------------
        # (phase timings mirror the reference's "assembling... done (took Xs)"
        # lines, discreteproblem.hh:117-126 / cg.hh:180-334)
        from ..utils.logging import timed

        # scheme="reference": one self-weighted full SWIPDG form per affine
        # component (swipdg.hh:222-249).  scheme="penalty_mu": the
        # penalty/weighting diffusion is the FIXED wlam/wkap, so penalty
        # terms must appear exactly once in the frozen operator: parametric
        # components carry flux terms only; the penalty goes into the affine
        # part (created if the decomposition has none).
        operator = AffineDecomposition()
        pairs = diffusion_pairs(problem)
        # kernel configs per operator component, recorded in registration
        # order with the affine part LAST (= with_expanded_affine_part order)
        # so the sharded per-device assembly (parallel/sharded_assembly.py)
        # can re-run exactly the same kernels
        comp_kernels = []
        affine_kernel = None
        with timed("swipdg.assemble_operator"):
            for (lam_fn, kap_fn), coef in _parts(pairs):
                vol = elliptic_cell_matrices(space, lam_fn, kap_fn)
                if scheme == "reference":
                    face_kw = dict(
                        sigma_i=self.sigma_inner, sigma_b=self.sigma_boundary,
                        beta=self.beta,
                    )
                else:
                    face_kw = dict(
                        weight_lam_fn=wlam, weight_kap_fn=wkap,
                        sigma_i=self.sigma_inner, sigma_b=self.sigma_boundary,
                        beta=self.beta, flux_only=(coef is not None),
                    )
                ib, bb = swipdg_face_blocks(
                    space, lam_fn, kap_fn, interior, dirichlet, **face_kw)
                mat = assemble_swipdg_matrix(space, vol, ib, bb, pattern)
                kernel = dict(lam_fn=lam_fn, kap_fn=kap_fn, face_kw=face_kw,
                              volume=True)
                if coef is None:
                    operator.register_affine_part(mat)
                    affine_kernel = kernel
                else:
                    operator.register_component(mat, coef)
                    comp_kernels.append(kernel)
            if scheme == "penalty_mu" and operator.affine_part is None:
                # penalty-only affine part (zero volume terms)
                nd_ = space.shape_count
                face_kw = dict(
                    sigma_i=self.sigma_inner, sigma_b=self.sigma_boundary,
                    beta=self.beta, penalty_only=True,
                )
                ibp, bbp = swipdg_face_blocks(
                    space, wlam, wkap, interior, dirichlet, **face_kw)
                operator.register_affine_part(
                    assemble_swipdg_matrix(
                        space, jnp.zeros((grid.num_cells, nd_, nd_)), ibp, bbp, pattern
                    )
                )
                affine_kernel = dict(lam_fn=wlam, kap_fn=wkap, face_kw=face_kw,
                                     volume=False)
        self._operator_kernels = comp_kernels + (
            [affine_kernel] if affine_kernel is not None else [])

        # -- rhs ------------------------------------------------------------
        rhs = AffineDecomposition()

        def add_rhs(vec, coef):
            if coef is None:
                if rhs.affine_part is None:
                    rhs.register_affine_part(vec)
                else:
                    rhs.affine_part = rhs.affine_part + vec
            else:
                rhs.register_component(vec, coef)

        for f_fn, coef in _parts(problem.force):
            local = force_cell_vectors(space, f_fn)
            add_rhs(scatter_cell_vectors(local, space.cell_dofs, space.num_dofs), coef)
        if len(neumann):
            for g_fn, coef in _parts(problem.neumann):
                add_rhs(boundary_face_functional(space, g_fn, neumann), coef)
        if len(dirichlet):
            for g_fn, gcoef in _parts(problem.dirichlet):
                if scheme == "reference":
                    # one full (flux + penalty) self-weighted boundary
                    # functional per (diffusion_p x dirichlet_q) pair with
                    # product coefficient theta_p * theta_q (swipdg.hh:272-332)
                    for (lam_fn, kap_fn), mcoef in _parts(pairs):
                        vec = swipdg_dirichlet_rhs(
                            space, g_fn, dirichlet, lam_fn=lam_fn, kap_fn=kap_fn,
                            sigma_b=self.sigma_boundary, beta=self.beta, part="both",
                        )
                        if mcoef is None and gcoef is None:
                            add_rhs(vec, None)
                        elif mcoef is None:
                            add_rhs(vec, gcoef)
                        elif gcoef is None:
                            add_rhs(vec, mcoef)
                        else:
                            add_rhs(vec, ProductFunctional(mcoef, gcoef))
                    continue
                # penalty part: weighting diffusion only -> coefficient theta_q
                pen_vec = swipdg_dirichlet_rhs(
                    space, g_fn, dirichlet, weight_lam_fn=wlam, weight_kap_fn=wkap,
                    sigma_b=self.sigma_boundary, beta=self.beta, part="penalty",
                )
                add_rhs(pen_vec, gcoef)
                # flux part: linear in each diffusion component -> theta_p * theta_q
                for (lam_fn, kap_fn), mcoef in _parts(pairs):
                    flux_vec = swipdg_dirichlet_rhs(
                        space, g_fn, dirichlet, lam_fn=lam_fn, kap_fn=kap_fn,
                        weight_lam_fn=wlam, weight_kap_fn=wkap,
                        sigma_b=self.sigma_boundary, beta=self.beta, part="flux",
                    )
                    if mcoef is None and gcoef is None:
                        add_rhs(flux_vec, None)
                    elif mcoef is None:
                        add_rhs(flux_vec, gcoef)
                    elif gcoef is None:
                        add_rhs(flux_vec, mcoef)
                    else:
                        add_rhs(flux_vec, ProductFunctional(mcoef, gcoef))
        if rhs.affine_part is None:
            rhs.register_affine_part(jnp.zeros(space.num_dofs))

        # -- products --------------------------------------------------------
        vol_pat = volume_pattern(space)
        products: Dict[str, AffineDecomposition] = {}
        if "l2" in products_wanted:
            products["l2"] = AffineDecomposition(
                affine_part=assemble_cell_matrix(space, l2_cell_matrices(space), vol_pat)
            )
        if "h1_semi" in products_wanted:
            products["h1_semi"] = AffineDecomposition(
                affine_part=assemble_cell_matrix(
                    space,
                    elliptic_cell_matrices(space, ConstantFunction(1.0), constant_matrix(1.0)),
                    vol_pat,
                )
            )
        if "elliptic" in products_wanted:
            elliptic = AffineDecomposition()
            for (lam_fn, kap_fn), coef in _parts(pairs):
                m = assemble_cell_matrix(
                    space, elliptic_cell_matrices(space, lam_fn, kap_fn), vol_pat
                )
                if coef is None:
                    elliptic.register_affine_part(m)
                else:
                    elliptic.register_component(m, coef)
            products["elliptic"] = elliptic
        if "boundary_l2" in products_wanted:
            bl2 = boundary_face_l2_matrices(space, all_boundary)
            bpat = swipdg_pattern(space, np.zeros(0, dtype=int), all_boundary)
            nd = space.shape_count
            products["boundary_l2"] = AffineDecomposition(
                affine_part=assemble_swipdg_matrix(
                    space,
                    jnp.zeros((grid.num_cells, nd, nd)),
                    jnp.zeros((0, 2, 2, nd, nd)),
                    bl2,
                    bpat,
                )
            )
        if "penalty" in products_wanted:
            nd = space.shape_count
            if scheme == "reference":
                # per-component self-weighted penalty (SwipdgPenaltyAssemblable
                # per diffusion component, swipdg.hh:448-481)
                penalty = AffineDecomposition()
                for (lam_fn, kap_fn), coef in _parts(pairs):
                    ibp, bbp = swipdg_face_blocks(
                        space, lam_fn, kap_fn, interior, dirichlet,
                        sigma_i=self.sigma_inner, sigma_b=self.sigma_boundary,
                        beta=self.beta, penalty_only=True,
                    )
                    m = assemble_swipdg_matrix(
                        space, jnp.zeros((grid.num_cells, nd, nd)), ibp, bbp, pattern
                    )
                    if coef is None:
                        penalty.register_affine_part(m)
                    else:
                        penalty.register_component(m, coef)
                products["penalty"] = penalty
            else:
                ibp, bbp = swipdg_face_blocks(
                    space, wlam, wkap, interior, dirichlet,
                    sigma_i=self.sigma_inner, sigma_b=self.sigma_boundary, beta=self.beta,
                    penalty_only=True,
                )
                products["penalty"] = AffineDecomposition(
                    affine_part=assemble_swipdg_matrix(
                        space, jnp.zeros((grid.num_cells, nd, nd)), ibp, bbp, pattern
                    )
                )
        if "energy" in products_wanted:
            products["energy"] = AffineDecomposition(
                list(operator.components), list(operator.coefficients), operator.affine_part
            )

        super().__init__(
            space=space,
            boundary_info=boundary_info,
            problem=problem,
            operator=operator,
            rhs=rhs,
            products=products,
            vectors={},
            purely_neumann=len(dirichlet) == 0,
        )

    def init(self):
        return self

    def uncached_solve(self, mu, options=None):
        """Adds the "block_cg[.jacobi]" solver type: the jitted block-ELL
        path (symmetric diagonal scaling + block-Jacobi CG) — the fast
        online solver for DG systems.  On structured NVB grids the
        "stencil_cg" type routes through the SoA plane layout
        (la/stencil.py — the fastest TPU path; optional two-level
        deflation via options["macro"] = (mx, my))."""
        opts = dict(options or {})
        if str(opts.get("type", "")) == "stencil_cg":
            u = self._stencil_solve(mu, opts)
            if u is not None:
                return u
            opts["type"] = "block_cg.jacobi"  # unstructured grid: fall back
        if str(opts.get("type", "")).startswith("block_cg"):
            key = (float(opts.get("precision", 1e-10)), int(opts.get("max_iter", 10000)))
            cache = self.__dict__.setdefault("_block_solvers", {})
            if key not in cache:
                cache[key] = self.make_solve_fn(tol=key[0], maxiter=key[1])
            solve_fn, thetas = cache[key]
            u, _res = solve_fn(*thetas(mu))
            return u
        return super().uncached_solve(mu, options)

    def _stencil_solve(self, mu, opts):
        """SoA plane-layout solve (la/stencil.py) for structured grids;
        returns None when the grid has no structured cell order."""
        from ..grid.structured_order import structured_cell_order
        from ..la.block_ell import block_ell_from_sparse, symmetric_diagonal_scaling
        from ..la.stencil import (
            StencilBlockEll,
            soa_index_maps,
            stencil_deflation_preconditioner,
            stencil_pcg,
            jacobi_smoother,
        )

        grid = self.space.grid
        order = self.__dict__.get("_stencil_order", False)
        if order is False:
            order = structured_cell_order(grid)
            self.__dict__["_stencil_order"] = order
        if order is None:
            return None
        mu = self.problem.parse_parameter(mu) if mu is not None else {}
        frozen = self.freeze_operator(mu)
        rhs = self.freeze_rhs(mu)
        A = block_ell_from_sparse(self.space, frozen)
        A_s, b_s, s = symmetric_diagonal_scaling(A, rhs)
        S = StencilBlockEll.from_block_ell(A_s, order)
        maps = soa_index_maps(order, S.nd)
        KY, KX = order.lattice
        B = b_s[jnp.asarray(maps.to_soa)].reshape(S.nd, 8, KY, KX)
        M = None
        macro = opts.get("macro")
        if macro is not None:
            # weighted deflation space Z_w = diag(1/s) Z by default: the
            # scaled system's near-kernel is D^{1/2} 1, which constants
            # miss on high-contrast coefficients (measured kappa(M A)
            # 3884 -> 336 on SPE10 at 3M DoF; see la/stencil.py)
            weight = None
            if opts.get("weighted", True):
                w = (1.0 / s).astype(B.dtype)
                weight = w[jnp.asarray(maps.to_soa)].reshape(S.nd, 8, KY, KX)
            M = stencil_deflation_preconditioner(S, tuple(macro),
                                                 weight=weight)
        if M is None:
            M = jacobi_smoother(S)
        bn = jnp.linalg.norm(B)
        # clamp the relative tolerance to what the working dtype can resolve:
        # without jax_enable_x64 the f32 recurrence residual cannot reach
        # 1e-10 and the loop would spin to max_iter doing no-op iterations
        rtol = max(float(opts.get("precision", 1e-10)),
                   10.0 * float(jnp.finfo(B.dtype).eps))
        X, it = stencil_pcg(S, B / bn, M, rtol=rtol,
                            maxiter=int(opts.get("max_iter", 10000)))
        u_s = (X * bn).reshape(-1)[jnp.asarray(maps.from_soa)]
        return u_s * s

    def make_solve_fn(self, tol: float = 1e-8, maxiter: int = 2000,
                      dtype=None):
        """Jitted parametric online solver: theta vectors -> solution, via
        block-ELL (the TPU fast path) with symmetric diagonal scaling and
        block-Jacobi CG.  Use for many-query workflows (greedy training,
        parameter sweeps):

            solve_fn, thetas = disc.make_solve_fn()
            u = solve_fn(*thetas(mu))
        """
        import jax

        from ..la.block_ell import (
            block_cg,
            block_ell_from_sparse,
            symmetric_diagonal_scaling,
        )

        op = self.get_operator().with_expanded_affine_part()
        rhs = self.get_rhs().with_expanded_affine_part()
        blocks = jnp.stack(
            [block_ell_from_sparse(self.space, m).blocks for m in op.components]
        )
        neighbors = block_ell_from_sparse(self.space, op.components[0]).neighbors
        rhs_stack = jnp.stack(list(rhs.components))
        if dtype is not None:
            blocks = blocks.astype(dtype)
            rhs_stack = rhs_stack.astype(dtype)

        from ..la.block_ell import BlockEllMatrix

        @jax.jit
        def solve_fn(theta_op, theta_rhs):
            A = BlockEllMatrix(neighbors, jnp.einsum("q,qcbij->cbij", theta_op, blocks))
            b = jnp.einsum("q,qn->n", theta_rhs, rhs_stack)
            A_s, b_s, s = symmetric_diagonal_scaling(A, b)
            u_s, res = block_cg(A_s, b_s, tol=tol, maxiter=maxiter)
            return u_s * s, res

        def thetas(mu):
            mu = self.problem.parse_parameter(mu) if mu is not None else {}
            t_op = jnp.stack([jnp.asarray(c(mu)) for c in op.coefficients])
            t_rhs = jnp.stack([jnp.asarray(c(mu)) for c in rhs.coefficients])
            if dtype is not None:
                t_op, t_rhs = t_op.astype(dtype), t_rhs.astype(dtype)
            return t_op, t_rhs

        return solve_fn, thetas
