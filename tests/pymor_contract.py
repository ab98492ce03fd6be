"""Shared contract suite for the pyMOR bridge (mor/pymor_shim.py).

Both branches of ``as_pymor_model`` — the native ``StationaryModelShim``
(this image: pymor not installable, zero egress) and the REAL pyMOR
``StationaryModel`` (any machine with pymor >= 2023.x) — must satisfy the
same contract: the model solves to the native solution, preserves the affine
operator structure, and exposes the products.  ``tests/test_pymor_shim.py``
runs it on the shim; ``tests/test_pymor_real.py`` importorskips pymor and
runs it on the real branch (thermalblock_main.py:73-79 wrap_module role).
"""
import jax.numpy as jnp
import numpy as np


def make_thermalblock_discretization(blocks=(2, 2), refinements=2):
    from dune_hdd_tpu.discretizations import SWIPDGDiscretization
    from dune_hdd_tpu.grid import alu_cube_grid
    from dune_hdd_tpu.problems import ThermalblockProblem

    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=refinements)
    return SWIPDGDiscretization(
        grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"},
        ThermalblockProblem(blocks))


MU = (0.3, 1.0, 0.7, 0.2)


def native_solution(d, mu_vals=MU):
    mu = {"diffusion_factor": jnp.asarray(mu_vals)}
    return d.solve(d.problem.parse_parameter(mu), options={"type": "direct"})


def check_solve_matches_native(m, d, mu_vals=MU, rtol=1e-6, atol=1e-8):
    """model.solve(mu) == native direct solve."""
    u_native = np.asarray(native_solution(d, mu_vals))
    from dune_hdd_tpu.mor.pymor_shim import StationaryModelShim

    if isinstance(m, StationaryModelShim):
        u = np.asarray(m.solve({"diffusion_factor": jnp.asarray(mu_vals)},
                               solver_options={"type": "direct"}))
    else:
        U = m.solve({"diffusion_factor": np.asarray(mu_vals)})
        u = np.asarray(U.to_numpy()).reshape(-1)
    np.testing.assert_allclose(u, u_native, rtol=rtol, atol=atol)
    return u


def check_affine_structure(m, d, mu_vals=MU):
    """The model's operator is a genuine affine decomposition: assembling
    sum theta_q(mu) A_q from the model's own components reproduces the
    native frozen operator on a random vector."""
    mu = d.problem.parse_parameter({"diffusion_factor": jnp.asarray(mu_vals)})
    A_native = d.freeze_operator(mu)
    rng = np.random.default_rng(42)
    x = rng.standard_normal(d.space.num_dofs)
    y_native = np.asarray(A_native.matvec(jnp.asarray(x)))

    from dune_hdd_tpu.mor.pymor_shim import StationaryModelShim

    if isinstance(m, StationaryModelShim):
        op = m.operator
        y = np.zeros_like(y_native)
        for q, comp in enumerate(op.components):
            c = op.coefficients[q]
            theta = 1.0 if c is None else float(np.asarray(c(mu)))
            y += theta * np.asarray(comp.matvec(jnp.asarray(x)))
        n_comp = op.num_components
    else:
        # real pymor: LincombOperator over NumpyMatrixOperators
        mu_p = m.parameters.parse({"diffusion_factor": np.asarray(mu_vals)})
        y = np.zeros_like(y_native)
        for comp, c in zip(m.operator.operators, m.operator.coefficients):
            theta = (float(c) if isinstance(c, (int, float))
                     else float(c.evaluate(mu_p)))
            y += theta * (comp.matrix @ x)
        n_comp = len(m.operator.operators)
    assert n_comp >= 4  # one per thermalblock theta (+ penalty part)
    # f32 payloads: the theta-contraction and the manual component sum
    # associate differently, so only ~1e-5 relative agreement is exact here
    np.testing.assert_allclose(y, y_native, rtol=2e-4, atol=1e-6)


def check_products(m, d):
    """l2 / h1_semi product operators act like the native product matrices."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(d.space.num_dofs)
    from dune_hdd_tpu.mor.pymor_shim import StationaryModelShim

    for name in ("l2", "h1_semi"):
        P_native = d.product_matrix(name)
        y_native = np.asarray(P_native.matvec(jnp.asarray(x)))
        if isinstance(m, StationaryModelShim):
            y = np.asarray(m.products[name].freeze({}).matvec(jnp.asarray(x)))
        else:
            y = m.products[name].matrix @ x
        np.testing.assert_allclose(y, y_native, rtol=1e-6, atol=1e-10)


def run_full_contract(m, d):
    check_solve_matches_native(m, d)
    check_affine_structure(m, d)
    check_products(m, d)
