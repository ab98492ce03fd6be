"""pyMOR interoperability shim.

The reference's entire L6 layer exists to hand its affine operators,
products and the LRBMS surface to pyMOR (the bindings generators inject a
dune-pymor wrapper per discretization:
examples/linearelliptic/cg_bindings_generator.py:14-70,
thermalblock_bindings_generator.py:34-58; thermalblock_main.py:73-79 then
drives pyMOR's greedy on the wrapped model).

``as_pymor_model(discretization)`` plays that role here:

* If pyMOR is importable, it returns a genuine
  ``pymor.models.basic.StationaryModel`` whose operator/rhs are
  ``LincombOperator``s over scipy-sparse ``NumpyMatrixOperator``s — the
  affine structure (one matrix per component + ParameterFunctional
  coefficients) is preserved so pyMOR's coercive RB reductor works
  unchanged.
* Otherwise (pymor is not shipped in this image) it returns a
  ``StationaryModelShim`` with the pyMOR ``StationaryModel`` call surface
  (``solve``, ``operator``/``rhs``/``products`` attributes,
  ``parameters``), implemented on the native discretization — enough for
  code written against the pyMOR API to run.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["as_pymor_model", "StationaryModelShim",
           "StationaryMultiscaleModelShim"]


def _scipy_components(decomposition):
    """[(scipy_csr, coefficient_or_None)] for an expanded AffineDecomposition
    of SparseMatrix payloads."""
    import scipy.sparse as sp

    out = []
    exp = decomposition.with_expanded_affine_part()
    for q, m in enumerate(exp.components):
        p = m.pattern
        A = sp.csr_matrix(
            (np.asarray(m.values, dtype=np.float64), (p.slot_rows, p.slot_cols)),
            shape=p.shape,
        )
        out.append((A, exp.coefficients[q]))
    return out


class StationaryModelShim:
    """pyMOR ``StationaryModel``-shaped facade over a native
    StationaryDiscretization (used when pymor itself is unavailable)."""

    def __init__(self, discretization, name: Optional[str] = None):
        self._d = discretization
        self.name = name or f"{type(discretization).__name__}_pymor_shim"
        self.operator = discretization.get_operator().with_expanded_affine_part()
        self.rhs = discretization.get_rhs().with_expanded_affine_part()
        self.products = {
            nm: discretization.get_product(nm)
            for nm in discretization.available_products()
        }

    @property
    def parameters(self) -> Dict[str, int]:
        """pyMOR Parameters analog: component name -> dimension."""
        return {k: int(v) for k, v in self._d.parameter_type.items()}

    def parse_parameter(self, mu):
        return self._d.problem.parse_parameter(mu) if self._d.parametric() else {}

    def solve(self, mu=None, **kwargs):
        return self._d.solve(self.parse_parameter(mu or {}),
                             options=kwargs.get("solver_options"))

    def output(self, mu=None):  # pragma: no cover - no output functional in L6
        raise NotImplementedError("the reference workflows define no output functional")

    def visualize(self, u, filename: str = "pymor_shim"):
        return self._d.visualize(u, filename)

    def __repr__(self):
        return f"StationaryModelShim({self.name}, parameters={self.parameters})"


class StationaryMultiscaleModelShim(StationaryModelShim):
    """The multiscale (LRBMS) surface on top of the StationaryModel shape —
    the shim image of the reference's
    ``inject_StationaryMultiscaleDiscretizationImplementation``
    (thermalblock_bindings_generator.py:34-58): per-subdomain operators,
    rhs, products, neighbour couplings and localization, all as affine
    decompositions so a pyMOR-side LRBMS reductor sees the same structure
    the reference hands to dune-pymor."""

    def __init__(self, block_discretization, name: Optional[str] = None):
        super().__init__(block_discretization, name)
        self._bd = block_discretization

    def num_subdomains(self) -> int:
        return self._bd.num_subdomains()

    def neighbouring_subdomains(self, ss: int):
        return self._bd.neighbouring_subdomains(ss)

    def local_operator(self, ss: int):
        return self._bd.get_local_operator(ss).with_expanded_affine_part()

    def local_rhs(self, ss: int):
        return self._bd.get_local_rhs(ss).with_expanded_affine_part()

    def local_product(self, ss: int, product_id: str):
        return self._bd.get_local_product(ss, product_id)

    def coupling_operator(self, ss: int, nn: int):
        return self._bd.get_coupling_operator(ss, nn)

    def localize_vector(self, vector, ss: int):
        return self._bd.localize_vector(vector, ss)

    def globalize_vectors(self, local_vectors):
        return self._bd.globalize_vectors(local_vectors)

    def solve_for_local_correction(self, local_vectors, ss: int, mu=None):
        return self._bd.solve_for_local_correction(local_vectors, ss, mu)

    def __repr__(self):
        return (f"StationaryMultiscaleModelShim({self.name}, "
                f"subdomains={self.num_subdomains()}, "
                f"parameters={self.parameters})")


def as_pymor_model(discretization, name: Optional[str] = None):
    """Return a pyMOR StationaryModel for the discretization, or the
    API-compatible shim when pymor is not installed.  Block (multiscale)
    discretizations get the multiscale shim with the LRBMS surface.

    NOTE on real-pymor verification: pymor is not shipped in this image and
    cannot be fetched (zero egress; ``pip download pymor`` finds no
    distribution) — see docs/DESIGN.md "pyMOR bridge" for the record.  The
    real-pymor branch below is exercised only where pymor exists."""
    from ..discretizations.block_swipdg import BlockSWIPDGDiscretization

    try:
        from pymor.models.basic import StationaryModel
        from pymor.operators.constructions import LincombOperator, VectorOperator
        from pymor.operators.numpy import NumpyMatrixOperator
        from pymor.parameters.functionals import GenericParameterFunctional
        from pymor.vectorarrays.numpy import NumpyVectorSpace
    except ImportError:
        if isinstance(discretization, BlockSWIPDGDiscretization):
            return StationaryMultiscaleModelShim(discretization, name)
        return StationaryModelShim(discretization, name)

    d = discretization

    def wrap_coeff(c):
        if c is None:
            return 1.0
        params = {k: int(v) for k, v in d.parameter_type.items()}
        return GenericParameterFunctional(
            lambda mu, c=c: float(np.asarray(c({k: jnp.asarray(mu[k]) for k in params}))),
            params,
        )

    op_parts = _scipy_components(d.get_operator())
    ops = [NumpyMatrixOperator(A) for A, _ in op_parts]
    op = LincombOperator(ops, [wrap_coeff(c) for _, c in op_parts])

    rhs_exp = d.get_rhs().with_expanded_affine_part()
    space = NumpyVectorSpace(d.space.num_dofs)
    rhs_ops = [
        VectorOperator(space.from_numpy(np.asarray(v, dtype=np.float64)[None, :]))
        for v in rhs_exp.components
    ]
    rhs = LincombOperator(rhs_ops, [wrap_coeff(c) for c in rhs_exp.coefficients])

    products = {}
    for nm in d.available_products():
        prod = d.get_product(nm)
        if prod.parametric():
            continue
        parts = _scipy_components(prod)
        products[nm] = NumpyMatrixOperator(sum(A for A, _ in parts))

    return StationaryModel(op, rhs, products=products,
                           name=name or "dune_hdd_tpu_model")
