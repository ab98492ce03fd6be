"""Phase breakdown of the stencil bench at 192k DoF on the real chip:
assembly | layout permute | preconditioner build | inner PCG | f64 refine.
Each phase timed as its own jitted function (median of 5)."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_jax_cache")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from dune_hdd_tpu.bench_harness import (_FORCES, _field_tensor_function)
from dune_hdd_tpu.functions.base import (
    ConstantFunction, IndicatorFunction, ScaledFunction, SumFunction)
from dune_hdd_tpu.functions.spe10 import (MODEL1_NX, MODEL1_NZ,
                                          _synthetic_model1_field)
from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
from dune_hdd_tpu.grid.structured import alu_cube_grid
from dune_hdd_tpu.grid.structured_order import structured_cell_order
from dune_hdd_tpu.la.block_ell import build_block_ell, symmetric_diagonal_scaling
from dune_hdd_tpu.la.stencil import (
    StencilBlockEll, jacobi_smoother, soa_index_maps,
    stencil_deflation_preconditioner, stencil_refined_solve, stencil_pcg)
from dune_hdd_tpu.ops.assembly import elliptic_cell_matrices, force_cell_vectors
from dune_hdd_tpu.ops.spaces import dg_space
from dune_hdd_tpu.ops.swipdg import swipdg_face_blocks
from dune_hdd_tpu.testcases._spe10_channel import CHANNEL


def timed(f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3, out


def main():
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=4)
    binfo = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    space = dg_space(grid)
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(binfo.dirichlet_faces)[0]
    dfac = SumFunction([ConstantFunction(1.0),
                        ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    field = jnp.asarray(_synthetic_model1_field(), dtype=jnp.float32)
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    maps = soa_index_maps(order, 3)
    KY, KX = order.lattice
    macro = (MODEL1_NX, MODEL1_NZ)

    @jax.jit
    def asm(field):
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            tensor = _field_tensor_function(field)
            vol = elliptic_cell_matrices(space, dfac, tensor)
            ib, bb = swipdg_face_blocks(space, dfac, tensor, interior, dirichlet)
            A = build_block_ell(space, vol, ib, bb, interior, dirichlet)
            b = force_cell_vectors(space, IndicatorFunction(_FORCES)).reshape(-1)
            return symmetric_diagonal_scaling(A, b)

    @jax.jit
    def asm_pieces(field):
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            tensor = _field_tensor_function(field)
            vol = elliptic_cell_matrices(space, dfac, tensor)
            ib, bb = swipdg_face_blocks(space, dfac, tensor, interior, dirichlet)
            return vol, ib, bb

    @jax.jit
    def permute(A, b):
        S = StencilBlockEll.from_block_ell(A, order)
        B = b[jnp.asarray(maps.to_soa)].reshape(3, 8, KY, KX)
        return S, B

    @jax.jit
    def build_M_and_sweep1(S, B):
        M = stencil_deflation_preconditioner(S, macro, newton_schulz=3)
        X, it = stencil_pcg(S, B / jnp.linalg.norm(B).astype(B.dtype), M,
                            rtol=1e-5, maxiter=150, unroll=4)
        return X, it

    @jax.jit
    def build_M_only(S):
        M = stencil_deflation_preconditioner(S, macro, newton_schulz=3)
        # touch the closure products so the build isn't DCE'd: apply to zeros
        KY_, KX_ = S.lattice
        return M(jnp.zeros((S.nd, 8, KY_, KX_), dtype=S.planes.dtype))

    @jax.jit
    def full_solve(S, B):
        M = stencil_deflation_preconditioner(S, macro, newton_schulz=3)
        return stencil_refined_solve(S, B, M, tol=1e-6, inner_iters=150,
                                     unroll=4)

    t_asm, (A, b, s) = timed(asm, field)
    t_asm_pieces, _ = timed(asm_pieces, field)
    t_perm, (S, B) = timed(permute, A, b)
    t_m, _ = timed(build_M_only, S)
    t_sweep1, (X1, it1) = timed(build_M_and_sweep1, S, B)
    t_solve, (X, res, iters) = timed(full_solve, S, B)
    print(f"assembly (w/ scatter+scale): {t_asm:8.2f} ms", flush=True)
    print(f"  kernels only (vol+faces):  {t_asm_pieces:8.2f} ms", flush=True)
    print(f"permute to planes:           {t_perm:8.2f} ms", flush=True)
    print(f"precond build (+1 apply):    {t_m:8.2f} ms", flush=True)
    print(f"precond build + sweep1:      {t_sweep1:8.2f} ms  ({int(it1)} iters)",
          flush=True)
    print(f"full refined solve:          {t_solve:8.2f} ms  ({int(iters)} iters, "
          f"res {float(res):.2e})", flush=True)
    total = t_asm + t_perm + t_solve
    print(f"TOTAL asm+permute+solve:     {total:8.2f} ms  "
          f"({192000/total/1e3:.2f} MDoF/s)", flush=True)


if __name__ == "__main__":
    main()
