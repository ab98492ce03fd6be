"""Dimension-generic Q1 CG (grid/tensor.py + discretizations/tensor_cg.py):
the 1D and 3D instantiation breadth of the reference's cg.cc:19-21, with
EOC {2, 1} on manufactured solutions in every dimension."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.discretizations.tensor_cg import TensorCGDiscretization
from dune_hdd_tpu.grid.tensor import tensor_grid


def _case(d):
    """u = prod sin(pi x_a) on [0,1]^d, f = d pi^2 u, zero Dirichlet."""

    def exact(x):
        return jnp.prod(jnp.sin(jnp.pi * x), axis=-1)

    def exact_grad(x):
        out = []
        for a in range(d):
            g = jnp.pi * jnp.cos(jnp.pi * x[..., a])
            for b in range(d):
                if b != a:
                    g = g * jnp.sin(jnp.pi * x[..., b])
            out.append(g)
        return jnp.stack(out, axis=-1)

    def force(x):
        return d * jnp.pi**2 * exact(x)

    return exact, exact_grad, force


@pytest.mark.parametrize("d,n0,levels", [(1, 8, 3), (2, 4, 3), (3, 4, 2)])
def test_tensor_cg_eoc(d, n0, levels):
    exact, exact_grad, force = _case(d)
    grid = tensor_grid([0.0] * d, [1.0] * d, [n0] * d)
    l2, h1 = [], []
    for _ in range(levels):
        disc = TensorCGDiscretization(grid, force=force)
        u = disc.solve(tol=1e-12)
        e = disc.error_norms(u, exact, exact_grad)
        l2.append(e["L2"])
        h1.append(e["H1_semi"])
        grid = grid.refine()
    eoc_l2 = [np.log2(l2[i] / l2[i + 1]) for i in range(len(l2) - 1)]
    eoc_h1 = [np.log2(h1[i] / h1[i + 1]) for i in range(len(h1) - 1)]
    assert all(r > 1.85 for r in eoc_l2), (l2, eoc_l2)
    assert all(r > 0.9 for r in eoc_h1), (h1, eoc_h1)


def test_tensor_grid_structure():
    g = tensor_grid([0, 0, 0], [1, 1, 1], [2, 2, 2])
    assert g.num_cells == 8 and g.num_vertices == 27
    assert g.cells.shape == (8, 8)
    # corner order: bit a of corner index = offset along axis a (MSB = axis 0)
    cv = g.cell_vertices[0]
    np.testing.assert_allclose(cv[0], [0, 0, 0])
    np.testing.assert_allclose(cv[1], [0, 0, 0.5])   # axis 2 = LSB
    np.testing.assert_allclose(cv[4], [0.5, 0, 0])   # axis 0 = MSB
    assert g.boundary_vertices.sum() == 27 - 1  # only the center is interior
    g2 = g.refine()
    assert g2.num_cells == 64


def test_variable_diffusion_3d():
    """Nonconstant lam: manufactured with lam = 1 + x0, u = sin(pi x0)
    sin(pi x1) sin(pi x2):  f = -div(lam grad u)."""
    d = 3

    def exact(x):
        return jnp.prod(jnp.sin(jnp.pi * x), axis=-1)

    def lam(x):
        return 1.0 + x[..., 0]

    def force(x):
        s = exact(x)
        # -d/dx0 ((1+x0) pi cos(pi x0)) sin sin - (1+x0)(uyy + uzz)
        x0 = x[..., 0]
        t = (jnp.pi**2 * (1 + x0) * s
             - jnp.pi * jnp.cos(jnp.pi * x0) * jnp.sin(jnp.pi * x[..., 1])
             * jnp.sin(jnp.pi * x[..., 2]))
        return t + 2 * jnp.pi**2 * (1 + x0) * s

    grid = tensor_grid([0.0] * d, [1.0] * d, [6] * d)
    l2 = []
    for _ in range(2):
        disc = TensorCGDiscretization(grid, diffusion=lam, force=force)
        u = disc.solve(tol=1e-12)
        l2.append(disc.error_norms(u, exact)["L2"])
        grid = grid.refine()
    assert np.log2(l2[0] / l2[1]) > 1.8, l2
