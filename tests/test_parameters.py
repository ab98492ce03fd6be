import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.parameters import (
    ConstantFunctional,
    ParameterFunctional,
    ParameterType,
    ProductFunctional,
    parse_parameter,
)
from dune_hdd_tpu.affine import AffineDecomposition, coefficient_bounds


def test_parameter_type_merge():
    a = ParameterType({"mu": 1})
    b = ParameterType({"nu": 2})
    assert (a | b)["nu"] == 2
    with pytest.raises(ValueError):
        _ = a | ParameterType({"mu": 3})


def test_parse_parameter():
    pt = ParameterType({"mu": 2})
    mu = parse_parameter([0.1, 0.2], pt)
    np.testing.assert_allclose(mu["mu"], [0.1, 0.2])
    mu2 = parse_parameter({"mu": 0.5})
    assert mu2["mu"].shape == (1,)


def test_parameter_functional_scalar_and_indexed():
    f = ParameterFunctional(("mu", 1), "mu")
    assert float(f({"mu": jnp.array([0.3])})) == pytest.approx(0.3)
    g = ParameterFunctional(("mu", 3), "mu[0] + 2*mu[2]")
    assert float(g({"mu": jnp.array([1.0, 5.0, 3.0])})) == pytest.approx(7.0)
    h = ParameterFunctional(("mu", 1), "-0.75*(sin(4*pi*(0.5)))*mu")
    assert float(h({"mu": jnp.array([2.0])})) == pytest.approx(
        -1.5 * np.sin(2 * np.pi), abs=1e-12
    )


def test_product_functional():
    a = ParameterFunctional(("mu", 1), "mu")
    b = ParameterFunctional(("nu", 1), "1-nu")
    p = ProductFunctional(a, b)
    val = p({"mu": jnp.array([3.0]), "nu": jnp.array([0.25])})
    assert float(val) == pytest.approx(2.25)


def test_functional_traces_under_jit():
    f = ParameterFunctional(("mu", 1), "1 + 0.5*mu*mu")

    @jax.jit
    def run(mu):
        return f({"mu": mu})

    assert float(run(jnp.array([2.0]))) == pytest.approx(3.0)


def test_affine_decomposition_freeze():
    dec = AffineDecomposition(
        components=[jnp.eye(2), 2.0 * jnp.eye(2)],
        coefficients=[
            ParameterFunctional(("mu", 1), "mu"),
            ConstantFunctional(1.0),
        ],
        affine_part=jnp.ones((2, 2)),
    )
    out = dec.freeze({"mu": jnp.array([3.0])})
    np.testing.assert_allclose(out, 3.0 * np.eye(2) + 2.0 * np.eye(2) + 1.0)
    assert dec.parameter_type == ParameterType({"mu": 1})


def test_affine_freeze_pytree():
    dec = AffineDecomposition(
        components=[{"a": jnp.ones(3)}, {"a": jnp.arange(3.0)}],
        coefficients=[ConstantFunctional(2.0), ConstantFunctional(1.0)],
    )
    out = dec.freeze({})
    np.testing.assert_allclose(out["a"], 2.0 + np.arange(3.0))


def test_coefficient_bounds():
    dec = AffineDecomposition(
        components=[jnp.ones(1)],
        coefficients=[ParameterFunctional(("mu", 1), "mu")],
        affine_part=jnp.ones(1),
    )
    # dune-pymor semantics: min/max of theta ratios over the COMPONENTS only
    # (the affine part is excluded — pinned from the published eta_OS2014_*
    # tables, see affine.coefficient_bounds)
    alpha, gamma = coefficient_bounds(dec, {"mu": jnp.array([0.5])}, {"mu": jnp.array([1.0])})
    assert float(alpha) == pytest.approx(0.5)
    assert float(gamma) == pytest.approx(0.5)
    alpha, gamma = coefficient_bounds(dec, {"mu": jnp.array([1.0])}, {"mu": jnp.array([0.1])})
    assert float(alpha) == pytest.approx(10.0)
    assert float(gamma) == pytest.approx(10.0)
