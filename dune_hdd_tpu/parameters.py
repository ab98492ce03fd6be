"""Parameter substrate: ParameterType, Parameter, ParameterFunctional.

TPU-native re-design of the dune-pymor parameter layer the reference builds on
(used throughout, e.g. /root/reference/dune/hdd/linearelliptic/problems/interfaces.hh:56-61,
discretizations/base.hh:218-220).  Parameters are ordered dicts of named float
vectors; parameter *functionals* are scalar expressions theta_q(mu) evaluated
with jax.numpy so they can be traced inside jit (freeze(mu) stays jittable).
"""
from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, Mapping, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

__all__ = [
    "ParameterType",
    "Parameter",
    "ParameterFunctional",
    "ProductFunctional",
    "ConstantFunctional",
    "parse_parameter",
]


class ParameterType:
    """An ordered mapping component-name -> size (number of scalar entries).

    Mirrors Pymor::ParameterType semantics: two types are mergeable ("+") and a
    Parameter must provide exactly the named components with matching sizes.
    """

    def __init__(self, entries: Optional[Mapping[str, int]] = None, **kw: int):
        items: Dict[str, int] = {}
        if entries:
            for k, v in entries.items():
                items[str(k)] = int(v)
        for k, v in kw.items():
            items[k] = int(v)
        self._items: Dict[str, int] = dict(sorted(items.items()))

    def empty(self) -> bool:
        return not self._items

    def keys(self):
        return self._items.keys()

    def items(self):
        return self._items.items()

    def __contains__(self, key: str) -> bool:
        return key in self._items

    def __getitem__(self, key: str) -> int:
        return self._items[key]

    def __iter__(self):
        return iter(self._items)

    def __len__(self):
        return len(self._items)

    def __eq__(self, other) -> bool:
        return isinstance(other, ParameterType) and self._items == other._items

    def __hash__(self):
        return hash(tuple(self._items.items()))

    def __or__(self, other: "ParameterType") -> "ParameterType":
        """Merge two parameter types; sizes of shared names must agree."""
        merged = dict(self._items)
        for k, v in other.items():
            if k in merged and merged[k] != v:
                raise ValueError(
                    f"incompatible parameter types: component {k!r} has sizes "
                    f"{merged[k]} and {v}"
                )
            merged[k] = v
        return ParameterType(merged)

    def __repr__(self):
        inner = ", ".join(f"{k!r}: {v}" for k, v in self._items.items())
        return f"ParameterType({{{inner}}})"


#: A Parameter is a plain dict name -> 1-d array (jnp or np).  Kept as a dict so
#: it is a pytree and can be passed through jit boundaries.
Parameter = Dict[str, jnp.ndarray]


def parse_parameter(
    mu: Union[None, float, Sequence[float], Mapping[str, object]],
    parameter_type: Optional[ParameterType] = None,
) -> Parameter:
    """Coerce user input into a canonical Parameter dict.

    Accepts a dict, a scalar (for single-component single-entry types), or a
    flat sequence (split across the type's components in order).
    """
    if mu is None:
        return {}
    if isinstance(mu, Mapping):
        return {str(k): jnp.atleast_1d(jnp.asarray(v, dtype=jnp.result_type(float))) for k, v in mu.items()}
    if parameter_type is None or parameter_type.empty():
        raise ValueError("cannot coerce non-dict parameter without a parameter type")
    flat = np.atleast_1d(np.asarray(mu, dtype=float))
    total = sum(parameter_type[k] for k in parameter_type)
    if flat.size != total:
        raise ValueError(f"parameter has {flat.size} entries, type requires {total}")
    out: Parameter = {}
    off = 0
    for k in parameter_type:
        n = parameter_type[k]
        out[k] = jnp.asarray(flat[off : off + n])
        off += n
    return out


def parameter_key(mu: Parameter) -> Tuple:
    """Hashable key for solution caching (reference: base.hh:151-178 cache map)."""
    return tuple((k, tuple(np.asarray(v).ravel().tolist())) for k, v in sorted(mu.items()))


_EXPR_NAMESPACE = {
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "exp": jnp.exp,
    "log": jnp.log,
    "sqrt": jnp.sqrt,
    "abs": jnp.abs,
    "min": jnp.minimum,
    "max": jnp.maximum,
    "pi": math.pi,
    "pow": jnp.power,
}

_ALLOWED_EXPR = re.compile(r"^[\w\s\+\-\*/\(\)\.,\[\]]+$")


def _compile_expression(expression: str, names: Iterable[str]) -> Callable:
    """Compile a scalar expression over parameter components.

    Component entries are addressable as ``name[i]``; a bare ``name`` means
    ``name[0]`` (matching dune-pymor's convention, e.g. the functional "mu" for
    a ("mu", 1) type in problems/OS2014.hh:75 and "-1.0*mu" in spe10.hh:172).
    """
    if not _ALLOWED_EXPR.match(expression):
        raise ValueError(f"disallowed characters in expression {expression!r}")
    code = compile(expression, f"<theta:{expression}>", "eval")
    for nm in code.co_names:
        if nm not in _EXPR_NAMESPACE and nm not in set(names):
            raise ValueError(f"unknown name {nm!r} in expression {expression!r}")
    name_set = set(names)

    def evaluate(mu: Parameter):
        env = dict(_EXPR_NAMESPACE)
        for nm in name_set:
            if nm not in mu:
                raise KeyError(f"expression {expression!r} needs parameter component {nm!r}")
            vec = jnp.atleast_1d(jnp.asarray(mu[nm]))
            env[nm] = _ScalarOrVector(vec)
        return jnp.asarray(eval(code, {"__builtins__": {}}, env))  # noqa: S307 - vetted charset

    return evaluate


class _ScalarOrVector:
    """Wrapper so `mu` acts as mu[0] in arithmetic but supports mu[i] indexing."""

    def __init__(self, vec):
        self._vec = vec

    def __getitem__(self, i):
        return self._vec[i]

    def _s(self):
        return self._vec[0]

    # delegate arithmetic to the first entry
    def __add__(self, o):
        return self._s() + _unwrap(o)

    def __radd__(self, o):
        return _unwrap(o) + self._s()

    def __sub__(self, o):
        return self._s() - _unwrap(o)

    def __rsub__(self, o):
        return _unwrap(o) - self._s()

    def __mul__(self, o):
        return self._s() * _unwrap(o)

    def __rmul__(self, o):
        return _unwrap(o) * self._s()

    def __truediv__(self, o):
        return self._s() / _unwrap(o)

    def __rtruediv__(self, o):
        return _unwrap(o) / self._s()

    def __pow__(self, o):
        return self._s() ** _unwrap(o)

    def __rpow__(self, o):
        return _unwrap(o) ** self._s()

    def __neg__(self):
        return -self._s()

    def __pos__(self):
        return self._s()

    def __float__(self):
        return float(self._s())

    def __jax_array__(self):
        return jnp.asarray(self._s())


def _unwrap(o):
    return o._s() if isinstance(o, _ScalarOrVector) else o


class ParameterFunctional:
    """A scalar coefficient theta(mu) given as an expression string.

    Re-design of Pymor::ParameterFunctional (used e.g. in
    /root/reference/dune/hdd/linearelliptic/problems/OS2014.hh:75,
    problems/spe10.hh:171-172).  Evaluation is jnp-traced, so freezing an
    affine decomposition at a traced mu stays inside jit.
    """

    def __init__(self, parameter_type: Union[ParameterType, Mapping[str, int], Tuple[str, int]],
                 expression: str):
        if isinstance(parameter_type, tuple):
            parameter_type = ParameterType({parameter_type[0]: parameter_type[1]})
        elif not isinstance(parameter_type, ParameterType):
            parameter_type = ParameterType(parameter_type)
        self.parameter_type = parameter_type
        self.expression = str(expression)
        self._fn = _compile_expression(self.expression, parameter_type.keys())

    def __call__(self, mu: Parameter):
        return self._fn(mu)

    def evaluate(self, mu: Parameter):
        return self._fn(mu)

    def __eq__(self, other):
        return (
            isinstance(other, ParameterFunctional)
            and self.expression == other.expression
            and self.parameter_type == other.parameter_type
        )

    def __hash__(self):
        return hash((self.expression, self.parameter_type))

    def __repr__(self):
        return f"ParameterFunctional({self.parameter_type!r}, {self.expression!r})"


def ProductFunctional(a: ParameterFunctional, b: ParameterFunctional) -> ParameterFunctional:
    """theta_a * theta_b — the coefficient-product bookkeeping the reference
    needs for Dirichlet-shift rhs components (cg.hh:359-374, swipdg.hh:312-330)."""
    return ParameterFunctional(
        a.parameter_type | b.parameter_type,
        f"({a.expression})*({b.expression})",
    )


def ConstantFunctional(value: float) -> ParameterFunctional:
    return ParameterFunctional(ParameterType(), repr(float(value)))
