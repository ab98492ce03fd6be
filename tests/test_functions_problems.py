import math

import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.functions import (
    CheckerboardFunction,
    ConstantFunction,
    ExpressionFunction,
    FlatTopFunction,
    IndicatorFunction,
    Spe10Model1Function,
    Testcase1ExactSolution,
    Testcase1Force,
    make_checkerboard_decomposition,
)
from dune_hdd_tpu.problems import (
    ESV2007Problem,
    LocalThermalblockProblem,
    MixedBoundariesProblem,
    ParametricESV2007Problem,
    ProblemsProvider,
    Spe10Model1Problem,
    ThermalblockProblem,
    ZeroBoundaryProblem,
)


def test_expression_function_and_gradient():
    f = ExpressionFunction("1+0.75*(sin(4*pi*(x[0]+0.5*x[1])))", 3)
    x = jnp.array([[0.1, 0.2], [0.3, -0.4]])
    expected = 1 + 0.75 * np.sin(4 * np.pi * (x[:, 0] + 0.5 * x[:, 1]))
    np.testing.assert_allclose(f(x), expected, rtol=1e-12)
    g = f.gradient(x)
    expected_gx = 0.75 * 4 * np.pi * np.cos(4 * np.pi * (x[:, 0] + 0.5 * x[:, 1]))
    np.testing.assert_allclose(g[:, 0], expected_gx, rtol=1e-10)
    np.testing.assert_allclose(g[:, 1], 0.5 * expected_gx, rtol=1e-10)


def test_esv2007_functions_consistent():
    # -div(grad u) == f for the ESV2007 pair
    u = Testcase1ExactSolution()
    f = Testcase1Force()
    x = jnp.array([[0.3, -0.2]])
    p = 0.5 * math.pi
    lap = -2 * p**2 * np.cos(p * 0.3) * np.cos(p * (-0.2))
    np.testing.assert_allclose(-lap, float(f(x)[0]), rtol=1e-12)
    g = u.gradient(x)
    assert g.shape == (1, 2)


def test_checkerboard():
    cb = CheckerboardFunction((0, 0), (1, 1), (2, 2), [1.0, 2.0, 3.0, 4.0])
    x = jnp.array([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
    np.testing.assert_allclose(cb(x), [1.0, 2.0, 3.0, 4.0])


def test_checkerboard_decomposition_partition_of_unity():
    dec = make_checkerboard_decomposition((0, 0), (1, 1), (2, 2))
    assert dec.num_components == 4
    mu = {"diffusion_factor": jnp.array([1.0, 1.0, 1.0, 1.0])}
    from dune_hdd_tpu.functions import FrozenAffineFunction

    frozen = FrozenAffineFunction(dec, mu)
    x = jnp.array([[0.1, 0.9], [0.6, 0.2], [0.5, 0.5]])
    np.testing.assert_allclose(frozen(x), 1.0)


def test_indicator_and_flattop():
    ind = IndicatorFunction([((0, 0), (0.5, 0.5), 2.0)])
    np.testing.assert_allclose(ind(jnp.array([[0.25, 0.25], [0.75, 0.75]])), [2.0, 0.0])
    ft = FlatTopFunction((0.2, 0.2), (0.8, 0.8), (0.1, 0.1), 3.0)
    vals = ft(jnp.array([[0.5, 0.5], [0.05, 0.5], [0.15, 0.5]]))
    assert float(vals[0]) == pytest.approx(3.0)
    assert float(vals[1]) == pytest.approx(0.0)
    assert 0.0 < float(vals[2]) < 3.0  # inside the ramp


def test_spe10_function_synthetic():
    f = Spe10Model1Function()
    assert f.synthetic
    x = jnp.array([[2.5, 0.5], [0.01, 0.01]])
    out = f(x)
    assert out.shape == (2, 2, 2)
    assert float(out[0, 0, 0]) >= 0.001
    assert float(out[0, 0, 1]) == 0.0
    lam = f.permeability(x)
    assert np.all(np.asarray(lam) >= 0.001) and np.all(np.asarray(lam) <= 998.915)


def test_spe10_function_file_reader():
    """Real-format file path: perm_case1.dat-layout fixture (x fastest, then
    z) exercised through the dune-stuff reader semantics — linear rescale
    from the published [0.001, 998.915] range, no clamp (spe10.hh:152-156)."""
    import os

    fixture = os.path.join(os.path.dirname(__file__), "data",
                           "perm_case1_fixture.dat")
    raw = np.array(open(fixture).read().split(), dtype=float)
    assert raw.size == 100 * 20
    f = Spe10Model1Function(filename=fixture)
    assert not f.synthetic
    # default range: identity transform — field == file values, x fastest
    field = np.asarray(f.field)  # [NX, NZ]
    np.testing.assert_allclose(field, raw.reshape(20, 100).T, rtol=1e-12)
    # cell binning: x in [0,5), z in [0,1) map to (ix, iz) cells of 100x20
    x = jnp.array([[0.025, 0.025], [4.975, 0.975], [2.525, 0.525]])
    lam = np.asarray(f.permeability(x))
    np.testing.assert_allclose(
        lam, [field[0, 0], field[99, 19], field[50, 10]], rtol=1e-12)
    # non-default range: scale/shift parity with Stuff::Functions::Spe10
    lo, hi = 1.0, 2.0
    f2 = Spe10Model1Function(filename=fixture, min_value=lo, max_value=hi)
    scale = (hi - lo) / (998.915 - 0.001)
    shift = lo - scale * 0.001
    np.testing.assert_allclose(
        np.asarray(f2.field), scale * field + shift, rtol=1e-10)
    # the fixture pins the published extrema, so the rescaled range is exact
    assert float(np.asarray(f2.field).min()) == pytest.approx(lo)
    assert float(np.asarray(f2.field).max()) == pytest.approx(hi)
    # the problem facade plumbs the filename through (problems/spe10.hh:131)
    p = Spe10Model1Problem(filename=fixture)
    tens = p.diffusion_tensor.affine_part
    out = np.asarray(tens(jnp.array([[0.025, 0.025]])))
    np.testing.assert_allclose(out[0], field[0, 0] * np.eye(2), rtol=1e-12)


def test_esv2007_problem():
    p = ESV2007Problem()
    assert not p.parametric()
    assert "ESV2007" in p.type()
    r = p.report()
    assert "diffusion_factor" in r


def test_parametric_esv2007_problem():
    p = ParametricESV2007Problem()
    assert p.parametric()
    assert p.parameter_type["mu"] == 1
    # with_mu(1) => unit diffusion
    frozen = p.with_mu({"mu": 1.0})
    assert not frozen.parametric()
    lam = frozen.diffusion_factor.affine_part
    x = jnp.array([[0.37, -0.11], [0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(lam(x)), 1.0, atol=1e-12)


def test_thermalblock_problems():
    p = ThermalblockProblem((2, 2))
    assert p.parameter_type["diffusion_factor"] == 4
    lp = LocalThermalblockProblem()
    assert lp.parameter_type["diffusion_factor"] == 3
    mu = {"diffusion_factor": jnp.array([1.0, 2.0, 3.0])}
    frozen = lp.with_mu(mu)
    lam = frozen.diffusion_factor.affine_part
    # right block has value mu[1]=2
    assert float(lam(jnp.array([[0.75, 0.5]]))[0]) == pytest.approx(2.0)
    # small block: mu[2]=3
    assert float(lam(jnp.array([[0.25, 0.25]]))[0]) == pytest.approx(3.0)


def test_spe10_problem_parametric():
    p = Spe10Model1Problem(
        channel_values=[((1.0, 0.4), (2.0, 0.5), 1.0)],
        parametric_channel=True,
    )
    assert p.parametric()
    frozen = p.with_mu({"mu": 1.0})
    lam = frozen.diffusion_factor.affine_part
    # at mu=1: diffusion = 1 + channel - channel = 1 inside the channel
    np.testing.assert_allclose(float(lam(jnp.array([[1.5, 0.45]]))[0]), 1.0, atol=1e-12)


def test_zero_boundary():
    p = ZeroBoundaryProblem(MixedBoundariesProblem())
    x = jnp.array([[0.5, 0.5]])
    assert float(p.dirichlet.affine_part(x)[0]) == 0.0
    assert float(p.neumann.affine_part(x)[0]) == 0.0
    assert float(p.force.affine_part(x)[0]) == 1.0


def test_problems_provider():
    names = ProblemsProvider.available()
    assert any("ESV2007" in n for n in names)
    p = ProblemsProvider.create("ESV2007")
    assert isinstance(p, ESV2007Problem)
    tb = ProblemsProvider.create("thermalblock", {"diffusion_factor": {"num_elements": [2, 2]}})
    assert tb.parameter_type["diffusion_factor"] == 4


def test_problem_visualization(tmp_path):
    import os

    from dune_hdd_tpu.grid import rectangle_grid

    p = ParametricESV2007Problem()
    g = rectangle_grid((-1, -1), (1, 1), (4, 4), "triangle")
    paths = p.visualize(g, str(tmp_path / "problem"), mu={"mu": 0.5})
    assert len(paths) == 5  # one file per data entry
    for path in paths:
        assert os.path.isfile(path)
    # the diffusion_factor file contains the affine part, component and frozen field
    text = open(paths[0]).read()
    assert "diffusion_factor_affine_part" in text
    assert "diffusion_factor_component_0" in text


def test_h_with_h_partitioning():
    from dune_hdd_tpu.testcases import OS2014MultiscaleTestCase

    tc = OS2014MultiscaleTestCase(
        {"mu": 0.1, "mu_bar": 0.1, "mu_hat": 0.1, "mu_minimizing": 0.1},
        num_partitions=(2, 2), num_refinements=1, H_with_h=True,
    )
    assert tc.partitioning() == "[2 2 1]_H_with_h"
    assert tc.ms_grid(0).num_partitions == (2, 2)
    assert tc.ms_grid(1).num_partitions == (4, 4)
