"""Affinely decomposed containers: Sum_q theta_q(mu) * X_q (+ affine part).

TPU-native re-design of Pymor::LA::AffinelyDecomposedContainer used by the
reference for operators/rhs (/root/reference/dune/hdd/linearelliptic/
discretizations/base.hh:218-220).  Components are stored as a *stacked leading
axis* over q wherever the payloads share structure, so freezing at mu is a
single einsum-style contraction that XLA fuses — a better fit for the MXU/VPU
than per-component container objects.

The payload can be any pytree (jnp arrays, ELL value arrays, ...); freezing
maps over leaves.
"""
from __future__ import annotations

from typing import Callable, Generic, List, Optional, Sequence, TypeVar

import jax
import jax.numpy as jnp

from .parameters import (
    ConstantFunctional,
    Parameter,
    ParameterFunctional,
    ParameterType,
)

T = TypeVar("T")

__all__ = ["AffineDecomposition", "affine_from_parts", "coefficient_bounds"]


class AffineDecomposition(Generic[T]):
    """components[q] (any pytree, all with identical treedef/shapes) with
    coefficients theta_q, plus an optional nonparametric affine part."""

    def __init__(
        self,
        components: Optional[Sequence[T]] = None,
        coefficients: Optional[Sequence[ParameterFunctional]] = None,
        affine_part: Optional[T] = None,
    ):
        self.components: List[T] = list(components) if components else []
        self.coefficients: List[ParameterFunctional] = list(coefficients) if coefficients else []
        if len(self.components) != len(self.coefficients):
            raise ValueError("components and coefficients must have equal length")
        self.affine_part: Optional[T] = affine_part

    # -- registration -------------------------------------------------------
    def register_component(self, component: T, coefficient: ParameterFunctional) -> int:
        self.components.append(component)
        self.coefficients.append(coefficient)
        return len(self.components) - 1

    def register_affine_part(self, part: T) -> None:
        if self.affine_part is not None:
            raise ValueError("affine part already registered")
        self.affine_part = part

    # -- queries ------------------------------------------------------------
    @property
    def num_components(self) -> int:
        return len(self.components)

    def parametric(self) -> bool:
        return bool(self.components)

    @property
    def parameter_type(self) -> ParameterType:
        pt = ParameterType()
        for c in self.coefficients:
            pt = pt | c.parameter_type
        return pt

    def coefficient(self, q: int) -> ParameterFunctional:
        return self.coefficients[q]

    def component(self, q: int) -> T:
        return self.components[q]

    def find_component(self, coefficient: ParameterFunctional) -> Optional[int]:
        """Locate a component by coefficient equality — mirrors the component
        matching in block-swipdg.hh:1381-1389."""
        for q, c in enumerate(self.coefficients):
            if c == coefficient:
                return q
        return None

    # -- algebra ------------------------------------------------------------
    def thetas(self, mu: Parameter) -> jnp.ndarray:
        """Vector of theta_q(mu), shape [Q]. jit-traceable."""
        if not self.components:
            return jnp.zeros((0,))
        return jnp.stack([jnp.asarray(c(mu), dtype=jnp.result_type(float)) for c in self.coefficients])

    def freeze(self, mu: Optional[Parameter] = None) -> T:
        """Sum_q theta_q(mu) X_q + affine_part.  Works on arbitrary pytrees."""
        mu = mu or {}
        if not self.components:
            if self.affine_part is None:
                raise ValueError("empty affine decomposition")
            return self.affine_part
        thetas = [self.coefficients[q](mu) for q in range(self.num_components)]

        def combine(*leaves):
            parts = leaves[: self.num_components]
            acc = parts[0] * thetas[0]
            for q in range(1, self.num_components):
                acc = acc + parts[q] * thetas[q]
            if self.affine_part is not None:
                acc = acc + leaves[self.num_components]
            return acc

        trees = list(self.components)
        if self.affine_part is not None:
            trees.append(self.affine_part)
        return jax.tree_util.tree_map(combine, *trees)

    def map(self, fn: Callable[[T], T]) -> "AffineDecomposition":
        """Apply fn to every component and the affine part."""
        return AffineDecomposition(
            [fn(c) for c in self.components],
            list(self.coefficients),
            fn(self.affine_part) if self.affine_part is not None else None,
        )

    def with_expanded_affine_part(self) -> "AffineDecomposition":
        """Fold the affine part into the component list with coefficient 1 —
        convenient for uniform q-loops (the reference iterates affine part +
        components separately everywhere, e.g. cg.hh:223-247)."""
        if self.affine_part is None:
            return self
        return AffineDecomposition(
            list(self.components) + [self.affine_part],
            list(self.coefficients) + [ConstantFunctional(1.0)],
        )

    def __repr__(self):
        return (
            f"AffineDecomposition(Q={self.num_components}, "
            f"affine_part={'yes' if self.affine_part is not None else 'no'}, "
            f"type={self.parameter_type!r})"
        )


def affine_from_parts(affine_part: T) -> AffineDecomposition:
    """Wrap a nonparametric payload (Pymor::Functions::NonparametricDefault)."""
    return AffineDecomposition(affine_part=affine_part)


def coefficient_bounds(
    decomposition: AffineDecomposition,
    mu: Parameter,
    mu_ref: Parameter,
) -> tuple:
    """(alpha, gamma) = (min_q, max_q) theta_q(mu)/theta_q(mu_ref) over the
    *components only* — the affine part is excluded (dune-pymor semantics:
    for the OS2014 problem, alpha(mu=1, mu_hat=0.1) = 10 > 1, which only the
    components-only ratio reproduces; verified against the published
    eta_OS2014/eta_OS2014_* tables,
    test/linearelliptic-block-swipdg-expectations_os2014_2daluconform.cxx:
    155-190).

    These are dune-pymor's `alpha`/`gamma` parameter factors the OS2014
    estimator scales its terms with (estimators/block-swipdg.hh:777-786).
    """
    if not decomposition.components:
        one = jnp.asarray(1.0)
        return one, one
    t = decomposition.thetas(mu)
    t_ref = decomposition.thetas(mu_ref)
    ratios = t / t_ref
    return jnp.min(ratios), jnp.max(ratios)
