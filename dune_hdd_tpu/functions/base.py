"""Function library: jax-traceable data functions over 2D space.

TPU-native replacement for dune-stuff's LocalizableFunction zoo (Constant,
Expression, Checkerboard, Indicator, FlatTop — used throughout the reference's
problem definitions, e.g. problems/default.hh:197-233, thermalblock.hh:106,
spe10.hh:140-160).  Functions are pure callables ``f(x)`` with ``x`` of shape
``[..., 2]`` returning shape ``[...] + range_shape``; they vmap/jit cleanly so
assembly kernels can evaluate them at batched quadrature points.  Gradients
come from jax autodiff instead of hand-written ``jacobian`` methods.
"""
from __future__ import annotations

import math
import re
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..affine import AffineDecomposition
from ..parameters import Parameter, ParameterFunctional, ParameterType

__all__ = [
    "Function",
    "ConstantFunction",
    "ExpressionFunction",
    "LambdaFunction",
    "CheckerboardFunction",
    "IndicatorFunction",
    "FlatTopFunction",
    "SumFunction",
    "ProductFunction",
    "ScaledFunction",
    "FrozenAffineFunction",
    "ParametricFunction",
    "make_checkerboard_decomposition",
    "constant_matrix",
]


class Function:
    """Base: scalar (range_shape=()), vector ((2,)) or matrix ((2,2)) valued."""

    range_shape: Tuple[int, ...] = ()
    order: int = 0  # polynomial order hint for quadrature selection
    name: str = "function"

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # pragma: no cover - interface
        raise NotImplementedError

    def gradient(self, x: jnp.ndarray) -> jnp.ndarray:
        """[..., 2] -> [..., *range_shape, 2] via autodiff (forward mode)."""
        single = lambda p: jnp.asarray(self(p))
        grad = jax.jacfwd(single)
        flat = x.reshape(-1, x.shape[-1])
        out = jax.vmap(grad)(flat)
        return out.reshape(x.shape[:-1] + self.range_shape + (x.shape[-1],))

    def __add__(self, other: "Function") -> "Function":
        return SumFunction([self, other])

    def __mul__(self, other: "Function") -> "Function":
        return ProductFunction([self, other])

    def __repr__(self):
        return f"{type(self).__name__}({self.name!r})"


class ConstantFunction(Function):
    def __init__(self, value, name: str = "constant"):
        arr = jnp.asarray(value, dtype=jnp.result_type(float))
        self.value = arr
        self.range_shape = arr.shape
        self.order = 0
        self.name = name

    def __call__(self, x):
        return jnp.broadcast_to(self.value, x.shape[:-1] + self.range_shape)

    def gradient(self, x):
        return jnp.zeros(x.shape[:-1] + self.range_shape + (x.shape[-1],))


def constant_matrix(diag=1.0, name: str = "diffusion_tensor",
                    dim: int = 2) -> ConstantFunction:
    """Unit (or scaled-identity) dim x dim tensor, the reference's default
    diffusion_tensor (problems/ESV2007.hh unit_matrix; d = 1/3 for the
    SGrid<1,1>/SGrid<3,3> instantiations of cg.cc:19-21)."""
    return ConstantFunction(jnp.eye(dim) * diag, name=name)


_X_EXPR_NAMESPACE = {
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "exp": jnp.exp,
    "log": jnp.log,
    "sqrt": jnp.sqrt,
    "abs": jnp.abs,
    "pi": math.pi,
    "pow": jnp.power,
}
_ALLOWED_X_EXPR = re.compile(r"^[\w\s\+\-\*/\(\)\.,\[\]]+$")


class ExpressionFunction(Function):
    """Scalar function from an expression string in x[0], x[1].

    Mirrors Stuff::Functions::Expression: e.g. the OS2014 diffusion component
    "1+0.75*(sin(4*pi*(x[0]+0.5*x[1])))" (problems/OS2014.hh:63-76) or
    MixedBoundaries' dirichlet "0.25*x[0]*x[1]" (mixed-boundaries.hh:70-75).
    """

    def __init__(self, expression: str, order: int = 2, name: str = "expression"):
        if not _ALLOWED_X_EXPR.match(expression):
            raise ValueError(f"disallowed characters in expression {expression!r}")
        self.expression = str(expression)
        code = compile(self.expression, f"<fn:{expression}>", "eval")
        for nm in code.co_names:
            if nm not in _X_EXPR_NAMESPACE and nm != "x":
                raise ValueError(f"unknown name {nm!r} in expression {expression!r}")
        self._code = code
        self.order = int(order)
        self.name = name
        self.range_shape = ()

    def __call__(self, x):
        env = dict(_X_EXPR_NAMESPACE)
        env["x"] = jnp.moveaxis(x, -1, 0)  # x[0], x[1] broadcast over batch
        out = eval(self._code, {"__builtins__": {}}, env)  # noqa: S307 - vetted charset
        return jnp.broadcast_to(jnp.asarray(out, dtype=x.dtype), x.shape[:-1])


class LambdaFunction(Function):
    """Wrap an arbitrary jax-traceable callable."""

    def __init__(self, fn: Callable, range_shape=(), order: int = 2, name: str = "lambda"):
        self._fn = fn
        self.range_shape = tuple(range_shape)
        self.order = int(order)
        self.name = name

    def __call__(self, x):
        return self._fn(x)


class IndicatorFunction(Function):
    """Sum of value_k * 1_{[lower_k, upper_k)}(x) — Stuff::Functions::Indicator
    (SPE10 forces, spe10.hh:141; LocalThermalblock regions, thermalblock.hh:203-219).
    Boxes are HALF-OPEN so adjacent boxes sharing an edge (the SPE10 channel
    segments) never double-count at quadrature points on the shared line."""

    def __init__(self, subdomains: Sequence[Tuple[Sequence[float], Sequence[float], float]],
                 name: str = "indicator"):
        self.lowers = jnp.asarray([s[0] for s in subdomains], dtype=jnp.result_type(float))
        self.uppers = jnp.asarray([s[1] for s in subdomains], dtype=jnp.result_type(float))
        self.values = jnp.asarray([s[2] for s in subdomains], dtype=jnp.result_type(float))
        self.order = 0
        self.name = name
        self.range_shape = ()

    def __call__(self, x):
        # Box axis LEADING, point axes minor: the naive [..., K, 2] layout
        # puts sizes 105/2 in the (sub)lane dims — 60x lane waste on TPU.
        # Here every compare array is [K, ...points] (points dense in lanes)
        # and the weighted count is one [K] x [K, N] contraction.
        # ``x`` may also be a (x0, x1) coordinate-plane tuple: a trailing
        # size-2 axis pads to 128 lanes on TPU (a [.., 2] coordinate
        # constant at 3M DoF inflated 98 MB -> 6.3 GB of HBM), so hot
        # callers pass the planes separately.
        if isinstance(x, tuple):
            x0, x1 = x
        else:
            x0, x1 = x[..., 0], x[..., 1]
        sh = (-1,) + (1,) * x0.ndim
        lo0 = self.lowers[:, 0].reshape(sh)
        lo1 = self.lowers[:, 1].reshape(sh)
        up0 = self.uppers[:, 0].reshape(sh)
        up1 = self.uppers[:, 1].reshape(sh)
        inside = ((x0[None] >= lo0) & (x0[None] < up0)
                  & (x1[None] >= lo1) & (x1[None] < up1))
        vals = self.values.astype(jnp.result_type(x0.dtype, self.values.dtype))
        return jnp.tensordot(vals, inside.astype(vals.dtype), axes=([0], [0]))


class FlatTopFunction(Function):
    """Smoothed indicator with boundary layer delta per dim: value on the
    inner box, 0 outside, polynomial ramp within the layer.

    Stuff::Functions::FlatTop analog (used for the SPE10 channel,
    spe10.hh:215-224).  The ramp is the standard C^1 smoothstep
    3t^2 - 2t^3; exact layer shape only affects SPE10 values, which cannot be
    bit-reproduced here anyway (the SPE10 data file ships outside the repo).
    """

    def __init__(self, lower, upper, boundary_layer, value: float = 1.0,
                 name: str = "flattop"):
        self.lower = jnp.asarray(lower, dtype=jnp.result_type(float))
        self.upper = jnp.asarray(upper, dtype=jnp.result_type(float))
        self.delta = jnp.asarray(boundary_layer, dtype=jnp.result_type(float))
        self.value = float(value)
        self.order = 3
        self.name = name
        self.range_shape = ()

    def __call__(self, x):
        d = self.delta
        t_lo = jnp.clip((x - (self.lower - d)) / jnp.maximum(d, 1e-300), 0.0, 1.0)
        t_hi = jnp.clip(((self.upper + d) - x) / jnp.maximum(d, 1e-300), 0.0, 1.0)
        ramp = lambda t: 3.0 * t**2 - 2.0 * t**3
        per_dim = ramp(t_lo) * ramp(t_hi)
        return self.value * jnp.prod(per_dim, axis=-1)


class CheckerboardFunction(Function):
    """Piecewise-constant on a tensor partition of [lower, upper] in d = 1,
    2, 3 — Pymor::Functions::Checkerboard's nonparametric core
    (thermalblock diffusion, problems/thermalblock.hh:106; the reference is
    dimension-templated and instantiated up to SGrid<3,3>)."""

    def __init__(self, lower, upper, num_elements, values, name: str = "checkerboard"):
        self.lower = jnp.asarray(lower, dtype=jnp.result_type(float))
        self.upper = jnp.asarray(upper, dtype=jnp.result_type(float))
        self.num_elements = tuple(int(n) for n in num_elements)
        vals = jnp.asarray(values, dtype=jnp.result_type(float)).reshape(-1)
        expected = int(np.prod(self.num_elements))
        if vals.shape[0] != expected:
            raise ValueError(f"expected {expected} values, got {vals.shape[0]}")
        self.values = vals
        self.order = 0
        self.name = name
        self.range_shape = ()

    def _block_index(self, x):
        ne = jnp.asarray(self.num_elements, dtype=x.dtype)
        rel = (x[..., : len(self.num_elements)] - self.lower) / (
            self.upper - self.lower)
        ij = jnp.clip(jnp.floor(rel * ne), 0, ne - 1).astype(jnp.int32)
        # block ordering: x fastest — ix + nx*(iy + ny*iz), the dune-stuff
        # Checkerboard subdomain numbering (stuff/functions/checkerboard.hh)
        idx = ij[..., 0]
        stride = 1
        for a in range(1, len(self.num_elements)):
            stride *= self.num_elements[a - 1]
            idx = idx + stride * ij[..., a]
        return idx

    def __call__(self, x):
        return self.values[self._block_index(x)]


class SumFunction(Function):
    def __init__(self, functions: Sequence[Function], name: str = "sum"):
        self.functions = list(functions)
        self.range_shape = self.functions[0].range_shape
        self.order = max(f.order for f in self.functions)
        self.name = name

    def __call__(self, x):
        out = self.functions[0](x)
        for f in self.functions[1:]:
            out = out + f(x)
        return out


class ProductFunction(Function):
    def __init__(self, functions: Sequence[Function], name: str = "product"):
        self.functions = list(functions)
        self.range_shape = max((f.range_shape for f in self.functions), key=len)
        self.order = sum(f.order for f in self.functions)
        self.name = name

    def __call__(self, x):
        out = self.functions[0](x)
        for f in self.functions[1:]:
            out = out * f(x)
        return out


class ScaledFunction(Function):
    def __init__(self, function: Function, scale: float, name: Optional[str] = None):
        self.function = function
        self.scale = scale
        self.range_shape = function.range_shape
        self.order = function.order
        self.name = name or f"{scale}*{function.name}"

    def __call__(self, x):
        return self.scale * self.function(x)


class FrozenAffineFunction(Function):
    """Sum_q theta_q(mu) f_q(x) + affine_part(x) at a *fixed* mu.

    The function-space analog of freezing an affine operator; what
    ``problem.with_mu(mu)`` produces (problems/interfaces.hh:132-144).
    """

    def __init__(self, decomposition: "ParametricFunction", mu: Parameter,
                 name: str = "frozen"):
        self.decomposition = decomposition
        self.mu = mu
        parts = decomposition.components + (
            [decomposition.affine_part] if decomposition.affine_part is not None else []
        )
        self.range_shape = parts[0].range_shape
        self.order = max(p.order for p in parts)
        self.name = name

    def __call__(self, x):
        dec = self.decomposition
        out = None
        for q in range(dec.num_components):
            term = dec.coefficients[q](self.mu) * dec.components[q](x)
            out = term if out is None else out + term
        if dec.affine_part is not None:
            part = dec.affine_part(x)
            out = part if out is None else out + part
        return out


#: An affinely decomposable function is just an AffineDecomposition whose
#: payloads are Functions (Pymor::Functions::AffinelyDecomposableDefault).
ParametricFunction = AffineDecomposition


def nonparametric(f: Function) -> ParametricFunction:
    """Pymor::Functions::NonparametricDefault analog."""
    return AffineDecomposition(affine_part=f)


def freeze_function(pf: ParametricFunction, mu: Optional[Parameter] = None) -> Function:
    if not pf.parametric():
        return pf.affine_part
    return FrozenAffineFunction(pf, mu or {})


def make_checkerboard_decomposition(
    lower, upper, num_elements, parameter_name: str = "diffusion_factor",
    name: str = "checkerboard",
) -> ParametricFunction:
    """Parametric checkerboard: one indicator component + one parameter entry
    per block (Pymor::Functions::Checkerboard with parameter_name, the
    thermalblock diffusion factor, thermalblock.hh:106-112).  Dimension-
    generic (d = 1, 2, 3) like the reference's template; block numbering is
    x fastest (ix + nx*(iy + ny*iz))."""
    ne = tuple(int(n) for n in num_elements)
    nblocks = int(np.prod(ne))
    lower = np.asarray(lower, dtype=float)[: len(ne)]
    upper = np.asarray(upper, dtype=float)[: len(ne)]
    pt = ParameterType({parameter_name: nblocks})
    dec = AffineDecomposition()
    for block in range(nblocks):
        values = np.zeros(nblocks)
        values[block] = 1.0
        comp = CheckerboardFunction(lower, upper, ne, values,
                                    name=f"{name}_{block}")
        dec.register_component(
            comp, ParameterFunctional(pt, f"{parameter_name}[{block}]")
        )
    return dec
