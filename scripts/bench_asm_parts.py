"""Sub-profile the SPE10 assembly + preconditioner build on the chip."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_jax_cache")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, "/root/repo")

from dune_hdd_tpu.bench_harness import _FORCES, _field_tensor_function
from dune_hdd_tpu.functions.base import (
    ConstantFunction, IndicatorFunction, ScaledFunction, SumFunction)
from dune_hdd_tpu.functions.spe10 import (MODEL1_NX, MODEL1_NZ,
                                          _synthetic_model1_field)
from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
from dune_hdd_tpu.grid.structured import alu_cube_grid
from dune_hdd_tpu.grid.structured_order import structured_cell_order
from dune_hdd_tpu.la.block_ell import build_block_ell, symmetric_diagonal_scaling
from dune_hdd_tpu.la.stencil import StencilBlockEll, _aggregation, _coarse_E, _coarse_inverse
from dune_hdd_tpu.ops.assembly import (cell_quadrature, elliptic_cell_matrices,
                                       force_cell_vectors)
from dune_hdd_tpu.ops.spaces import dg_space
from dune_hdd_tpu.ops.swipdg import swipdg_face_blocks
from dune_hdd_tpu.testcases._spe10_channel import CHANNEL


def timed(tag, f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{tag:32s} {np.median(ts)*1e3:8.2f} ms", flush=True)
    return out


def main():
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=4)
    binfo = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    space = dg_space(grid)
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(binfo.dirichlet_faces)[0]
    dfac = SumFunction([ConstantFunction(1.0),
                        ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    field = jnp.asarray(_synthetic_model1_field(), dtype=jnp.float32)
    tensor = _field_tensor_function(field)
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))

    with jax.enable_x64(False), jax.default_matmul_precision("highest"):
        qp, qw = cell_quadrature(grid, 2)

        timed("lam eval (channel, vol qp)", jax.jit(lambda: dfac(qp)))
        timed("kap eval (field, vol qp)", jax.jit(lambda f: _field_tensor_function(f)(qp)), field)
        vol = timed("elliptic_cell_matrices", jax.jit(
            lambda f: elliptic_cell_matrices(space, dfac, _field_tensor_function(f))), field)
        ibbb = timed("swipdg_face_blocks", jax.jit(
            lambda f: swipdg_face_blocks(space, dfac, _field_tensor_function(f),
                                         interior, dirichlet)), field)
        ib, bb = ibbb
        A = timed("build_block_ell", jax.jit(
            lambda vol, ib, bb: build_block_ell(space, vol, ib, bb, interior, dirichlet)),
            vol, ib, bb)
        b = timed("force vectors", jax.jit(
            lambda: force_cell_vectors(space, IndicatorFunction(_FORCES)).reshape(-1)))
        Ab = timed("diag scaling", jax.jit(
            lambda A, b: symmetric_diagonal_scaling(A, b)), A, b)
        A_s, b_s, s = Ab

        S = timed("permute to planes", jax.jit(
            lambda A: StencilBlockEll.from_block_ell(A, order)), A_s)

        agg = _aggregation(S, (MODEL1_NX, MODEL1_NZ))
        E = timed("coarse E (scatter)", jax.jit(lambda S: _coarse_E(S, agg)), S)
        timed("coarse inv (LU+3NS)", jax.jit(
            lambda E: _coarse_inverse(E, 3)(jnp.ones(E.shape[0], E.dtype))), E)
        timed("coarse inv (LU only)", jax.jit(
            lambda E: _coarse_inverse(E, 0)(jnp.ones(E.shape[0], E.dtype))), E)

        from dune_hdd_tpu.la.stencil import jacobi_smoother
        timed("jacobi build+apply", jax.jit(
            lambda S: jacobi_smoother(S)(jnp.zeros((3, 8, 40, 200), jnp.float32))), S)


if __name__ == "__main__":
    main()
