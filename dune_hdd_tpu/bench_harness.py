"""Benchmark harness: jitted end-to-end SPE10 SWIPDG assemble + solve.

The BASELINE.json north star is ">= 5 MDoF/s assemble + CG solve wall-time on
SPE10 block-SWIPDG".  This harness builds one jitted function
``f(perm_field) -> (u, residual_norm)`` in which the permeability field is the
runtime input, so the whole pipeline — coefficient evaluation at quadrature
points, batched volume/face kernels, segment-sum global assembly, and the
Jacobi-preconditioned CG on the ELL operator — executes on-device each call
(nothing constant-folds away).
"""
from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


from .functions.base import (
    ConstantFunction,
    IndicatorFunction,
    LambdaFunction,
    ScaledFunction,
    SumFunction,
)
from .functions.spe10 import MODEL1_NX, MODEL1_NZ, _synthetic_model1_field
from .grid.structured import alu_cube_grid

from .testcases._spe10_channel import CHANNEL

__all__ = ["build_spe10_bench", "run_spe10_bench", "block_provenance_check",
           "stencil2_roofline"]

_FORCES = [
    ((0.95, 0.30), (1.10, 0.45), 2000.0),
    ((3.00, 0.75), (3.15, 0.90), -1000.0),
    ((4.25, 0.25), (4.40, 0.40), -1000.0),
]


def _field_tensor_function(field: jnp.ndarray) -> LambdaFunction:
    lower = jnp.asarray([0.0, 0.0])
    upper = jnp.asarray([5.0, 1.0])
    nxz = jnp.asarray([MODEL1_NX, MODEL1_NZ], dtype=field.dtype)

    def evaluate(x):
        rel = (x - lower) / (upper - lower)
        ij = jnp.clip(jnp.floor(rel * nxz), 0, nxz - 1).astype(jnp.int32)
        lam = field[ij[..., 0], ij[..., 1]]
        return lam[..., None, None] * jnp.eye(2, dtype=x.dtype)

    return LambdaFunction(evaluate, range_shape=(2, 2), order=0, name="spe10_field")


def _select_mid_level(KY: int, KX: int, macro) -> Tuple[Optional[tuple], int]:
    """(mid_shape, mid_cheb) for the stencil deflation preconditioner.

    BENCH_MID: "none" -> two-level; "mx,my" -> explicit middle lattice;
    "mx1,my1;mx2,my2;..." -> explicit multi-level chain; "auto" (default)
    -> insert middle levels when the fine-to-macro aggregation factor
    reaches 8 (the two-level coarse space degrades at H/h >= 8 — measured
    1.56 MDoF/s at 3M DoF round 3): a factor-2 chain starting at fine/2
    (measured-optimal at 3M: 580 ms / 5.30 MDoF/s vs 625 / 4.92 at factor
    4, vs 826 / 3.72 two-level; 2026-08-18 sweep), halving until the gap
    to the exact ``macro`` level is <= 4 (at 12.3M DoF a single mid leaves
    a factor-8 gap and the 6-sweep refinement stalls at 2e-3 residual).
    BENCH_MID_CHEB: Chebyshev degree of the middle-level solves (<2 -> one
    balanced two-level application; degree 3 measured worse, 3.83)."""
    raw = os.environ.get("BENCH_MID", "auto")
    cheb = int(os.environ.get("BENCH_MID_CHEB", "2"))
    if raw == "none":
        return None, cheb
    if raw != "auto":
        mids = []
        for part in raw.split(";"):
            mid = tuple(int(x) for x in part.split(","))
            if len(mid) != 2 or mid[0] <= 0 or mid[1] <= 0:
                raise ValueError(
                    f"BENCH_MID must be 'mx,my[;mx2,my2...]', 'auto' or "
                    f"'none', got {raw!r}")
            mids.append(mid)
        return (mids[0] if len(mids) == 1 else mids), cheb
    if macro is None or KX % macro[0] or KY % macro[1]:
        return None, cheb
    fx, fy = KX // macro[0], KY // macro[1]
    if min(fx, fy) < 8:
        return None, cheb
    # mid chain anchored at 4x the macro lattice, growing by factor-4 steps
    # toward the fine lattice until the fine-to-mid gap is <= 4.  Measured
    # (12M sweep, scripts/bench_sweep12m.py 2026-08-19): the SINGLE
    # (4*macro) mid beats the factor-2-from-fine chain on WALL time at both
    # 3M (fine/2 == 4*macro there) and 12M (2.62 s vs 5.26 s chain at
    # irtol 1e-1+: the chain's deeper level stack costs ~9.4 ms per
    # latency-bound M apply vs ~2.4 ms, which buys more than its iteration
    # savings: 568 vs 428 iters).
    mids = []
    mx, my = 4 * macro[0], 4 * macro[1]
    while mx < KX and my < KY and KX % mx == 0 and KY % my == 0:
        mids.append((mx, my))
        if KX // mx <= 4:
            break
        mx, my = 4 * mx, 4 * my
    if not mids:
        return None, cheb
    mids.reverse()  # finest mid first (the deflation space's aggregation)
    return (mids[0] if len(mids) == 1 else mids), cheb


def build_spe10_bench(bisections: int = 4, maxiter: int = 300,
                      tol: float = 1e-5, dtype=jnp.float32,
                      preconditioner: str = "block_jacobi",
                      inner_iters: int = 150):
    """Returns (jitted_fn, example_field, num_dofs).  preconditioner:

    * "deflation" — the contrast-robust production path: float32 assembly +
      two-level deflation (aggregates aligned with the 100x20 macro
      permeability grid, la/deflation.py) inside float64 iterative
      refinement; converges to a TRUE 1e-6 relative residual.  Requires
      jax_enable_x64 (the outer residual runs in emulated f64 on TPU; the
      per-iteration work stays f32).
    * "block_jacobi" — plain block-Jacobi CG (fixed-iteration throughput
      measurements; does not converge on the 1e6-contrast field in f32).
    * "mg" — geometric multigrid V-cycle over the bisection hierarchy
      (validated on CPU; compiles pathologically slowly through the axon
      TPU tunnel).
    """
    if "BENCH_INNER" in os.environ:
        inner_iters = int(os.environ["BENCH_INNER"])
    elif bisections >= 8:
        # size-scaled restart cadence: at 3M+ DoF the f32 inner recurrence
        # needs longer sweeps (measured at 3M: inner=150 -> 2100 iters,
        # 300 -> 1500, 500 -> worse wall; each restart discards the Krylov
        # space and f32 re-loses the same low-energy modes)
        inner_iters = 300
    # SHORT refinement sweeps at large sizes: per-sweep true progress is
    # capped by f32 arithmetic (~0.65 orders at 12M, 2.3 at 3M — ROADMAP
    # round-5 scoreboard), so sweeping the recurrence far below the cap
    # wastes iterations; iterative refinement re-scales the residual each
    # sweep.  Measured at 12.3M (scripts/bench_sweep12m.py, 2026-08-19):
    # inner_rtol 1e-5 x 6 sweeps STALLS at 1.2e-4; the wall keeps
    # improving as sweeps shorten — 2e-1 2.62 s, 5e-1 1.48 s, 7e-1
    # 1.28 s (212 iters), 8e-1 1.38, 9e-1 1.56 — the optimum is ~7e-1,
    # where each sweep barely out-runs the per-sweep cap and the f64
    # outer recompute re-anchors the residual every few iterations.
    # Size-scaled sweep-exit tolerance, measured-optimal per size
    # (scripts/bench_sweep12m.py at bisections 4/6/8/10, 2026-08-19):
    #   192k: 1e-5 -> 35.2 ms/180 it; 1e-1 -> 34.3/84 (latency-bound)
    #   768k: 1e-5 -> 103.3 ms/456 it; 1e-1 -> 59.3/172
    #   3M:   1e-5 -> 515.9 ms/408 it; 3e-1 -> 172.8/112
    #   12M:  2e-1 -> 2.62 s/568 it;   7e-1 -> 1.28 s/212
    # Short sweeps win MORE with size because the f32 per-sweep true-
    # progress cap shrinks (~3 orders at 768k, 0.65 at 12M): iterating
    # the recurrence past the cap is wasted, and the f64 outer residual
    # recompute re-anchors each sweep.
    if "BENCH_IRTOL" in os.environ:
        inner_rtol = float(os.environ["BENCH_IRTOL"])
    elif bisections >= 10:
        inner_rtol = 7e-1
    elif bisections >= 8:
        inner_rtol = 3e-1
    else:
        inner_rtol = 1e-1
    if inner_rtol >= 3e-1:
        outer_default = "500"  # short sweeps: ~2-6 iters each
    elif inner_rtol >= 1e-2:
        outer_default = "120"
    else:
        outer_default = "6"
    # unroll 2: measured equal-or-better at every size with short sweeps
    # (192k 33.2 vs 34.3 ms, 3M 172.8 vs 183.7, 12M 1.48 vs 1.68 s) —
    # sweeps exit every few iterations, so deep unrolls overshoot the
    # exit test
    unroll_default = "2"
    # MG levels at every 2nd bisection (one halving per level)
    grids = [
        alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=b)
        for b in range(bisections, -1, -2)
    ]
    grid = grids[0]
    bi = {"type": "stuff.grid.boundaryinfo.alldirichlet"}
    channel = IndicatorFunction(CHANNEL, name="channel")
    diffusion_factor = SumFunction(
        [ConstantFunction(1.0), ScaledFunction(channel, -0.9)], name="diffusion_factor"
    )
    force = IndicatorFunction(_FORCES, name="force")
    num_dofs = grid.num_cells * 3

    from .grid.boundaryinfo import make_boundary_info
    from .la.block_ell import block_cg, build_block_ell, symmetric_diagonal_scaling
    from .la.multigrid import MultigridHierarchy, mg_preconditioner
    from .ops.assembly import elliptic_cell_matrices, force_cell_vectors
    from .ops.spaces import dg_space
    from .ops.swipdg import swipdg_face_blocks

    binfo = make_boundary_info(grid, bi)
    space = dg_space(grid)
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(binfo.dirichlet_faces)[0]

    if preconditioner in ("deflation", "stencil", "stencil2"):
        from .grid.structured_order import structured_cell_order
        from .la.deflation import (
            aggregate_map_from_points,
            refined_deflated_solve,
            structured_deflation_preconditioner,
        )

        cell_agg = aggregate_map_from_points(
            grid.cell_centroids, (0.0, 0.0), (5.0, 1.0), (MODEL1_NX, MODEL1_NZ)
        )
        n_agg = MODEL1_NX * MODEL1_NZ
        order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))

    def assemble(field):
        tensor = _field_tensor_function(field)
        vol = elliptic_cell_matrices(space, diffusion_factor, tensor)
        ib, bb = swipdg_face_blocks(
            space, diffusion_factor, tensor, interior, dirichlet
        )
        A = build_block_ell(space, vol, ib, bb, interior, dirichlet)
        b = force_cell_vectors(space, force).reshape(-1)
        # symmetric diagonal scaling: keeps the f32 Krylov iteration stable
        # on the 1e6-contrast field
        return symmetric_diagonal_scaling(A, b)

    asm_jit = jax.jit(assemble)

    macro = None
    if preconditioner in ("deflation", "stencil", "stencil2"):
        raw = os.environ.get("BENCH_MACRO", f"{MODEL1_NX},{MODEL1_NZ}")
        try:
            macro = tuple(int(x) for x in raw.split(","))
            if len(macro) != 2 or macro[0] <= 0 or macro[1] <= 0:
                raise ValueError
        except ValueError:
            raise ValueError(
                f"BENCH_MACRO must be two positive ints 'nx,nz', got {raw!r}"
            ) from None

    def solve_deflation(A32, b32):
        # bandwidth-ordered path: permute into structured numbering so the
        # SpMV is 24 static slices and the macro-cell aggregation is a
        # reshape-sum (grid/structured_order.py) — the TPU gather/scatter
        # path runs ~20x below stream bandwidth.  The preconditioner
        # (coarse operator + dense inverse) is built INSIDE the trace: the
        # coarse inverse is then computed on-device per call (cheap MXU
        # work) instead of being baked into the program as a multi-hundred-
        # MB constant, which overflows the compile pipeline for fine coarse
        # grids.
        M = None
        if order is not None:
            from .la.block_ell import StructuredBlockEll

            A_st = StructuredBlockEll.from_block_ell(A32, order)
            perm = jnp.asarray(
                (np.asarray(order.perm)[:, None] * A32.nd
                 + np.arange(A32.nd)).reshape(-1)
            )
            inv_flat = jnp.asarray(
                (np.asarray(order.inv)[:, None] * A32.nd
                 + np.arange(A32.nd)).reshape(-1)
            )
            b_st = b32[inv_flat]
            M = structured_deflation_preconditioner(
                A_st, order, macro, coarse_dtype=jnp.float32,
            )
            if M is not None:
                u_st, res = refined_deflated_solve(
                    A_st, b_st, None, macro[0] * macro[1], tol=tol,
                    inner_iters=inner_iters, M=M, unroll=4,
                )
                return u_st[perm], res
        # observable fallback: the requested macro does not tile the
        # structured lattice — the gather path below uses the hardcoded
        # MODEL1 aggregation instead of BENCH_MACRO
        import logging

        logging.getLogger("dune_hdd_tpu.bench").warning(
            "structured deflation unavailable (macro %s does not tile the "
            "lattice); falling back to the gather path with the %dx%d "
            "MODEL1 aggregation", macro, MODEL1_NX, MODEL1_NZ,
        )
        return refined_deflated_solve(
            A32, b32, cell_agg, n_agg, tol=tol, inner_iters=inner_iters,
        )

    solve_jit = jax.jit(solve_deflation)

    if preconditioner == "stencil2":
        # fully structured path: the SWIPDG operator is assembled DIRECTLY
        # into StencilBlockEll planes (per-family constant tensors x scalar
        # lattice fields, la/stencil_assembly.py) — no block scatter, no
        # permute; rhs and diagonal scaling in the plane layout too.  The
        # runtime input stays the permeability field.
        from .la.stencil import (
            chebyshev_smoother,
            jacobi_smoother,
            soa_index_maps,
            stencil_deflation_preconditioner,
            stencil_refined_solve,
        )
        from .la.stencil_assembly import (
            assemble_structured_spe10,
            build_structured_assembly,
            precompute_coefficient,
            scale_planes,
            structured_rhs,
        )

        smoother_kind = os.environ.get("BENCH_SMOOTHER", "jacobi")
        newton_schulz = int(os.environ.get("BENCH_NS", "2"))
        KY, KX = order.lattice
        mid_shape, mid_cheb = _select_mid_level(KY, KX, macro)
        splan = build_structured_assembly(grid, order, binfo)
        # the channel geometry is static (only the permeability field is a
        # runtime input): evaluate the 105-box coefficient once on the host
        dfac_pre = precompute_coefficient(splan, diffusion_factor)
        from .la.stencil_assembly import geometric_soa_maps
        _to_soa_g, _from_soa_g = geometric_soa_maps(order, splan)
        # cell-constant permeability in SoA order.  A gather of 64k macro
        # ids takes ~36 ms on this chip (serialized TPU gather) — but the
        # macro grid tiles the lattice, so the lookup is a pure broadcast:
        # cf[k, iy, ix] = field[ix // fx, iy // fy].
        fy, fx = KY // MODEL1_NZ, KX // MODEL1_NX
        cent = grid.cell_centroids
        ij_cell = np.clip(
            (cent / np.array([5.0, 1.0]) * np.array([MODEL1_NX, MODEL1_NZ]))
            .astype(np.int64), 0, np.array([MODEL1_NX - 1, MODEL1_NZ - 1]))
        ij_soa = ij_cell[np.asarray(order.inv)].reshape(8, KY, KX, 2)
        # verify the broadcast layout against the centroid binning (host)
        iyg, ixg = np.meshgrid(np.arange(KY), np.arange(KX), indexing="ij")
        assert (ij_soa[..., 0] == (ixg // fx)[None]).all()
        assert (ij_soa[..., 1] == (iyg // fy)[None]).all()

        def _broadcast_field(f32field):
            ft = f32field.T  # [NZ(y), NX(x)]
            cf2d = jnp.broadcast_to(
                ft[:, None, :, None], (MODEL1_NZ, fy, MODEL1_NX, fx)
            ).reshape(KY, KX)
            return jnp.broadcast_to(cf2d[None], (8, KY, KX))

        # the O(N) setup arrays enter the jit as ARGUMENTS, not closed-over
        # constants: baked into the HLO as literals they total ~500 MB at
        # 12M DoF, which overflows the axon remote-compile request body
        # (HTTP 413).  Device-resident jnp arrays passed per call are
        # zero-copy.
        _big = {
            "pre": jax.tree.map(jnp.asarray, dfac_pre),
            "qp_x": jnp.asarray(splan.vol_qp[..., 0], dtype=jnp.float32),
            "qp_y": jnp.asarray(splan.vol_qp[..., 1], dtype=jnp.float32),
            "from_soa": jnp.asarray(_from_soa_g),
        }

        # TWO jits at >= 10 bisections, ONE below: compiling assembly and
        # solve as a single program costs ~0.4 s extra at 12.3M DoF
        # (1.757 s fused vs 1.277 solve + ~0.07 assembly split,
        # scripts/bench_sweep12m.py 2026-08-19 — an XLA layout/fusion
        # interaction between the assembly epilogue and the solve loop),
        # but each extra dispatch boundary pays a full ~25 ms tunnel RTT:
        # measured at 768k the split runs 92 vs 67 ms fused.  BENCH_SPLIT
        # ∈ {auto,0,1} overrides.
        _split_env = os.environ.get("BENCH_SPLIT", "auto")
        _split = (_split_env == "1"
                  or (_split_env == "auto" and bisections >= 10))

        @jax.jit
        def _asm_structured_impl(field, big):
            with jax.enable_x64(False), jax.default_matmul_precision("highest"):
                f32field = field.astype(jnp.float32)
                cf = _broadcast_field(f32field)
                S = assemble_structured_spe10(
                    splan, big["pre"], cf,
                    family_chunks=int(os.environ.get("BENCH_CHUNKS", "1")))
                B = structured_rhs(splan, force,
                                   qp_xy=(big["qp_x"], big["qp_y"]))
                return scale_planes(S, B)

        @jax.jit
        def _solve_structured_impl(S, B, s, from_soa):
            with jax.enable_x64(False), jax.default_matmul_precision("highest"):
                # weighted deflation space Z_w = diag(1/s) Z: the scaled
                # system S A S has near-kernel D^{1/2} 1, not constants —
                # w = 1/s restores it (measured at 3M DoF: kappa(M A)
                # 3884 -> 336, PCG iterations 437 -> 141; see
                # stencil_deflation_preconditioner docstring)
                weight = (1.0 / s if os.environ.get(
                    "BENCH_WEIGHTED", "1") != "0" else None)
                symmv = os.environ.get("BENCH_SYMMV", "auto")
                if symmv == "1" or (symmv == "auto"
                                    and KY * KX >= 128000):
                    # half-storage symmetric matvec (~1.5x less operator HBM
                    # traffic per PCG iteration; see StencilBlockEll).  Only
                    # pays once the planes dominate the iteration's traffic:
                    # measured 1293 vs 1459 ms solve at 3M DoF but 158 vs
                    # 148 ms at 768k (the extra roll ops are latency-bound
                    # at small sizes) -> auto-enable at lattice >= 128000
                    # cells-per-subclass (the 3M lattice is exactly
                    # 160 x 800 = 128000; 1 << 17 just missed it)
                    S = S.symmetrized()
                sm = None
                if smoother_kind.startswith("cheb"):
                    sm = chebyshev_smoother(S, degree=int(smoother_kind[4:] or 2))
                if os.environ.get("BENCH_PC2", "deflation") == "mg":
                    # plane-layout aggregation V-cycle (la/stencil_multigrid):
                    # fewer PCG iterations than two-level deflation at 192k
                    # (360 vs 400 measured), heavier per application
                    from .la.stencil_multigrid import stencil_multigrid_preconditioner

                    M = stencil_multigrid_preconditioner(
                        S, newton_schulz=newton_schulz, smoother=sm)
                else:
                    M = stencil_deflation_preconditioner(
                        S, macro, smoother=sm, newton_schulz=newton_schulz,
                        mid_shape=mid_shape, mid_cheb=mid_cheb,
                        weight=weight)
                if M is None:
                    import logging

                    logging.getLogger("dune_hdd_tpu.bench").warning(
                        "stencil deflation unavailable (macro %s / mid %s "
                        "does not tile the lattice); falling back to "
                        "block-Jacobi", macro, mid_shape)
                    M = sm or jacobi_smoother(S)
            X, res, iters = stencil_refined_solve(
                S, B, M, tol=tol, inner_iters=inner_iters,
                inner_rtol=inner_rtol,
                outer_max=int(os.environ.get("BENCH_OUTER", outer_default)),
                unroll=int(os.environ.get("BENCH_UNROLL", unroll_default)),
                dot_dtype=(jnp.float64 if os.environ.get(
                    "BENCH_DOTS", "f32") == "f64" else None),
                vec_dtype=(jnp.float64 if os.environ.get(
                    "BENCH_VEC", "f32") == "f64" else None))
            u = (X * s.astype(X.dtype)).reshape(-1)[from_soa]
            return u, res

        @jax.jit
        def _fused_structured_impl(field, big):
            S, B, s = _asm_structured_impl(field, big)
            return _solve_structured_impl(S, B, s, big["from_soa"])

        def fused_structured(field):
            if _split:
                S, B, s = _asm_structured_impl(field, _big)
                return _solve_structured_impl(S, B, s, _big["from_soa"])
            return _fused_structured_impl(field, _big)

    if preconditioner == "stencil":
        from .la.stencil import (
            StencilBlockEll,
            chebyshev_smoother,
            jacobi_smoother,
            soa_index_maps,
            stencil_deflation_preconditioner,
            stencil_refined_solve,
        )

        smoother_kind = os.environ.get("BENCH_SMOOTHER", "jacobi")
        newton_schulz = int(os.environ.get("BENCH_NS", "2"))
        maps = soa_index_maps(order, 3)
        KY, KX = order.lattice
        mid_shape, mid_cheb = _select_mid_level(KY, KX, macro)

        def solve_stencil(A32, b32, s32=None):
            # one static gather permutes blocks+rhs into the plane layout;
            # everything after is rolls/reshape-sums/elementwise
            S = StencilBlockEll.from_block_ell(A32, order)
            B = b32[jnp.asarray(maps.to_soa)].reshape(3, 8, KY, KX)
            sm = None
            if smoother_kind.startswith("cheb"):
                sm = chebyshev_smoother(S, degree=int(smoother_kind[4:] or 2))
            weight = None
            if s32 is not None and os.environ.get("BENCH_WEIGHTED", "1") != "0":
                # w = 1/s restores the scaled system's near-kernel (see the
                # stencil2 path / stencil_deflation_preconditioner docstring)
                w = 1.0 / s32.astype(jnp.float32)
                weight = w[jnp.asarray(maps.to_soa)].reshape(3, 8, KY, KX)
            M = stencil_deflation_preconditioner(
                S, macro, smoother=sm, newton_schulz=newton_schulz,
                mid_shape=mid_shape, mid_cheb=mid_cheb, weight=weight)
            if M is None:
                import logging

                logging.getLogger("dune_hdd_tpu.bench").warning(
                    "stencil deflation unavailable (macro %s does not tile "
                    "the lattice); falling back to block-Jacobi", macro)
                M = sm or jacobi_smoother(S)
            X, res, iters = stencil_refined_solve(
                S, B, M, tol=tol, inner_iters=inner_iters,
                inner_rtol=inner_rtol,
                outer_max=int(os.environ.get("BENCH_OUTER", outer_default)),
                unroll=int(os.environ.get("BENCH_UNROLL", unroll_default)),
                dot_dtype=(jnp.float64 if os.environ.get(
                    "BENCH_DOTS", "f32") == "f64" else None),
                vec_dtype=(jnp.float64 if os.environ.get(
                    "BENCH_VEC", "f32") == "f64" else None))
            return X.reshape(-1)[jnp.asarray(maps.from_soa)], res

        @jax.jit
        def fused_stencil(field):
            # ONE dispatch for assemble + permute + precondition + solve:
            # each host->device call through the axon tunnel costs ~30 ms
            # RTT, so the end-to-end bench must be a single program
            with jax.enable_x64(False), jax.default_matmul_precision("highest"):
                A_s, b_s, s = assemble(field)
            u_s, res = solve_stencil(A_s, b_s, s)
            return u_s * s.astype(u_s.dtype), res

    def assemble_and_solve(field):
        if preconditioner == "stencil2":
            return fused_structured(field)
        if preconditioner == "stencil":
            return fused_stencil(field)
        if preconditioner == "deflation":
            # assembly is pure f32 work (emulated f64 on TPU would cost ~10x
            # the whole solve); only the refinement loop's outer residual
            # runs in f64 — trace/call the assembly under a non-x64 scope.
            # HIGHEST matmul precision: the default bf16 einsum passes would
            # assemble an asymmetric matrix (1e-3 relative), which breaks CG
            with jax.enable_x64(False), jax.default_matmul_precision("highest"):
                A_s, b_s, s = asm_jit(field)
            u_s, res = solve_jit(A_s, b_s)
            return u_s * s.astype(u_s.dtype), res
        return _solve_other_jit(field)

    @jax.jit
    def _solve_other_jit(field):
        # jitted end-to-end for the non-deflation preconditioners too: the
        # MG hierarchy build / block_cg setup trace ONCE at compile time
        # instead of rebuilding eagerly on every timed call
        A_s, b_s, s = assemble(field)
        M = None
        if preconditioner == "mg":
            hierarchy = MultigridHierarchy(grids, A_s, pre=3, post=3)
            M = mg_preconditioner(hierarchy)
        u_s, res = block_cg(A_s, b_s, tol=tol, maxiter=maxiter, M=M)
        return u_s * s, res

    fn = assemble_and_solve
    field = jnp.asarray(_synthetic_model1_field(), dtype=dtype)
    return fn, field, num_dofs


def block_provenance_check(bisections: int = 2, partitioning=(20, 4),
                           nvec: int = 3, seed: int = 0) -> dict:
    """Close the bench <-> north-star provenance (BASELINE.json names "SPE10
    **block**-SWIPDG"; reference block-swipdg.hh:262-551): assert that the
    operator/rhs the bench assembles are EXACTLY the BlockSWIPDG global
    system, i.e. equal to the sum of per-subdomain local operators plus
    pairwise coupling operators of ``BlockSWIPDGDiscretization`` on the
    north-star [20 4 1] partitioning (testcases/spe10.hh).

    The comparison is matvec-based (random vectors) so it runs at bench
    sizes without densifying.  Returns a dict recorded in the bench JSON.

    Runs under HIGHEST matmul precision: on TPU the default einsum pass is
    bf16, which assembles the block side to only ~2e-3 relative (measured),
    tripping the 1e-4 equality threshold; the bench's own assembly path
    already forces highest precision.

    Pinned to the host CPU backend: the block side builds 80 local + ~150
    coupling operators through eager jnp indexing (thousands of small
    dispatches — each would cost the ~30 ms axon-tunnel RTT on TPU), and
    the identity it asserts (bench stencil2 operator == BlockSWIPDG global
    system, both rebuilt by the same deterministic builders) is
    platform-independent.  This is what lets the check run at the full
    bench size (768k: ~3 min; bisections > 8 still capped by default).
    """
    with jax.default_matmul_precision("highest"), \
            jax.default_device(jax.devices("cpu")[0]):
        return _block_provenance_check_impl(bisections, partitioning, nvec,
                                            seed)


def _block_provenance_check_impl(bisections, partitioning, nvec, seed) -> dict:
    from .discretizations.block_swipdg import BlockSWIPDGDiscretization
    from .functions.base import constant_matrix, nonparametric
    from .grid.boundaryinfo import make_boundary_info
    from .grid.structured_order import structured_cell_order
    from .la.stencil_assembly import (
        assemble_structured_spe10,
        build_structured_assembly,
        geometric_soa_maps,
        precompute_coefficient,
        structured_rhs,
    )
    from .problems.default import DefaultProblem

    bisections -= bisections % 2  # the structured order needs even bisections
    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20),
                         refinements=bisections)
    bi_cfg = {"type": "stuff.grid.boundaryinfo.alldirichlet"}
    field = jnp.asarray(_synthetic_model1_field(), dtype=jnp.float32)
    channel = IndicatorFunction(CHANNEL, name="channel")
    diffusion_factor = SumFunction(
        [ConstantFunction(1.0), ScaledFunction(channel, -0.9)],
        name="diffusion_factor")
    tensor = _field_tensor_function(field)
    force = IndicatorFunction(_FORCES, name="force")

    # the benched operator: the SAME builders the stencil2 bench path jits
    # (direct-to-planes assembly + plane rhs), frozen at the example field
    binfo = make_boundary_info(grid, bi_cfg)
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    splan = build_structured_assembly(grid, order, binfo)
    dfac_pre = precompute_coefficient(splan, diffusion_factor)
    to_soa, from_soa = geometric_soa_maps(order, splan)
    KY, KX = order.lattice
    fy, fx = KY // MODEL1_NZ, KX // MODEL1_NX
    cf2d = jnp.broadcast_to(
        field.T[:, None, :, None], (MODEL1_NZ, fy, MODEL1_NX, fx)
    ).reshape(KY, KX)
    S = assemble_structured_spe10(
        splan, dfac_pre, jnp.broadcast_to(cf2d[None], (8, KY, KX)))
    b_bench = np.asarray(structured_rhs(splan, force).reshape(-1))[
        np.asarray(from_soa)]

    def bench_matvec(x):
        X = jnp.asarray(x, dtype=S.planes.dtype)[jnp.asarray(to_soa)]
        y = S.matvec(X.reshape(3, 8, KY, KX))
        return np.asarray(y.reshape(-1))[np.asarray(from_soa)]

    # the block artifact: per-subdomain locals + pairwise couplings
    problem = DefaultProblem(
        diffusion_factor=nonparametric(diffusion_factor),
        diffusion_tensor=nonparametric(tensor),
        force=nonparametric(force),
    )
    bdisc = BlockSWIPDGDiscretization(
        grid, bi_cfg, problem, num_partitions=tuple(partitioning),
        only_these_products=())
    n = bdisc.space.num_dofs
    locals_ = [bdisc.get_local_operator(ss).freeze({})
               for ss in range(bdisc.num_subdomains())]
    dof_maps = [np.asarray(bdisc._local_dof_map(ss))
                for ss in range(bdisc.num_subdomains())]
    couplings = []
    for ss in range(bdisc.num_subdomains()):
        for nn in bdisc.neighbouring_subdomains(ss):
            if nn <= ss:
                continue
            couplings.append((ss, int(nn),
                              bdisc.get_coupling_operator(ss, int(nn)).freeze({})))

    def block_matvec(x):
        y = np.zeros(n)
        for ss, (A_loc, dofs) in enumerate(zip(locals_, dof_maps)):
            y[dofs] += np.asarray(A_loc.matvec(jnp.asarray(x[dofs])))
        for ss, nn, cop in couplings:
            ds, dn = dof_maps[ss], dof_maps[nn]
            xs, xn = jnp.asarray(x[ds]), jnp.asarray(x[dn])
            y[ds] += np.asarray(cop.in_in.matvec(xs))
            y[ds] += np.asarray(cop.in_out.matvec(xn))
            y[dn] += np.asarray(cop.out_in.matvec(xs))
            y[dn] += np.asarray(cop.out_out.matvec(xn))
        return y

    rng = np.random.default_rng(seed)
    rel_op = 0.0
    for _ in range(nvec):
        x = rng.standard_normal(n)
        yb = block_matvec(x)
        ys = bench_matvec(x)
        rel_op = max(rel_op, float(np.linalg.norm(ys - yb)
                                   / max(np.linalg.norm(yb), 1e-30)))
    b_block = np.zeros(n)
    for ss, dofs in enumerate(dof_maps):
        b_block[dofs] += np.asarray(bdisc.get_local_rhs(ss).freeze({}))
    rel_rhs = float(np.linalg.norm(b_bench - b_block)
                    / max(np.linalg.norm(b_block), 1e-30))
    if rel_op > 1e-4 or rel_rhs > 1e-4:
        raise AssertionError(
            f"bench operator != BlockSWIPDG global system: "
            f"rel_op={rel_op:.3e} rel_rhs={rel_rhs:.3e}")
    return {
        "artifact": "block-swipdg",
        "partitioning": [int(partitioning[0]), int(partitioning[1]), 1],
        "num_subdomains": int(bdisc.num_subdomains()),
        "checked_dofs": int(n),
        "bisections": int(bisections),
        "rel_op": rel_op,
        "rel_rhs": rel_rhs,
    }


def run_spe10_bench(bisections: int = 4, repeats: int = 3, **kw) -> dict:
    fn, field, num_dofs = build_spe10_bench(bisections=bisections, **kw)
    # warmup / compile
    u, res = fn(field)
    float(res)
    times = []
    for i in range(repeats):
        f = field * (1.0 + 1e-6 * (i + 1))  # defeat any caching of identical inputs
        np.asarray(f)  # materialize the input OUTSIDE the timed region
        t0 = time.perf_counter()
        u, res = fn(f)
        # sync by FETCHING the scalar residual of this very execution:
        # block_until_ready through the axon tunnel can return without
        # waiting (measured: 800 chained matvecs "complete" in 0.03 ms
        # until a data fetch forces the round trip) — an 8-byte fetch of an
        # output scalar is the only reliable completion barrier, and it
        # keeps the (0.77 MB) solution on device
        float(res)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    mdofs = num_dofs / dt / 1e6
    return {
        "num_dofs": num_dofs,
        "seconds": dt,
        "mdof_per_s": mdofs,
        "residual": float(res),
        "all_times": times,
    }


def stencil2_roofline(bisections: int = 6, repeats: int = 7,
                      pcg_iters: int = 100) -> dict:
    """Achieved-HBM-bandwidth metrics for the stencil2 hot phases (VERDICT
    r4 item 3: make perf regressions visible in the bench JSON).

    Measures, with chained dispatch-free timing (scalar-fetch sync):

    * ``copy_gbps`` — the on-device roofline: ``y = x + 1`` over an
      N-float32 array streams 8N bytes (read + write);
    * ``matvec_gbps`` — ``pcg_iters`` chained symmetric-storage SpMVs;
      bytes model per matvec: the read plane set (symmetric storage reads
      the 12 forward-edge plane pairs + upper-triangle self blocks ≈ half
      of the 48N-byte full plane array) + input/output vectors (8N);
    * ``assembly_gbps`` — the direct-to-planes structured assembly; bytes
      model: the 48N-byte plane array written once (inputs are O(N/24)
      scalar lattice fields, counted too).

    The models count algorithmically-required traffic, so the printed GB/s
    is a LOWER bound on achieved bandwidth (XLA may move more).
    """
    from .grid.boundaryinfo import make_boundary_info
    from .grid.structured_order import structured_cell_order
    from .la.stencil import StencilBlockEll
    from .la.stencil_assembly import (
        assemble_structured_spe10,
        build_structured_assembly,
        precompute_coefficient,
        scale_planes,
        structured_rhs,
    )

    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20),
                         refinements=bisections)
    binfo = make_boundary_info(
        grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    dfac = SumFunction(
        [ConstantFunction(1.0),
         ScaledFunction(IndicatorFunction(CHANNEL), -0.9)])
    splan = build_structured_assembly(grid, order, binfo)
    dfac_pre = precompute_coefficient(splan, dfac)
    KY, KX = order.lattice
    fy, fx = KY // MODEL1_NZ, KX // MODEL1_NX
    field = jnp.asarray(_synthetic_model1_field(), dtype=jnp.float32)
    n = grid.num_cells * 3

    def _time(fn, *args):
        out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0])  # compile + sync
        ts = []
        for k in range(repeats):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jnp.asarray(out).reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    with jax.enable_x64(False), jax.default_matmul_precision("highest"):
        cf2d = jnp.broadcast_to(
            field.T[:, None, :, None], (MODEL1_NZ, fy, MODEL1_NX, fx)
        ).reshape(KY, KX)
        cf = jnp.broadcast_to(cf2d[None], (8, KY, KX))

        # chain asm_reps assemblies behind a scalar data dependency so the
        # per-assembly time excludes the ~25 ms tunnel dispatch RTT (a
        # single-dispatch measurement at 768k reads 28 ms of which ~25 is
        # RTT); the carry-scaled cf defeats loop-invariant hoisting
        asm_reps = 4

        @jax.jit
        def asm(cf):
            def body(_, acc):
                cfk = cf + acc[0] * 0.0
                S = assemble_structured_spe10(splan, dfac_pre, cfk)
                B = structured_rhs(splan, IndicatorFunction(_FORCES))
                S, B, s = scale_planes(S, B)
                return S.planes.reshape(-1)[:1] + B.reshape(-1)[:1]

            return jax.lax.fori_loop(
                0, asm_reps, body, jnp.zeros((1,), jnp.float32))

        t_asm = _time(asm, cf) / asm_reps

        S0 = assemble_structured_spe10(splan, dfac_pre, cf)
        B0 = structured_rhs(splan, IndicatorFunction(_FORCES))
        S, B, s = scale_planes(S0, B0)
        Ssym = S.symmetrized()

        @jax.jit
        def mv_loop(planes, X):
            A = StencilBlockEll(planes, Ssym.plan, sym=True)

            def body(_, Y):
                return A.matvec(Y)

            Y = jax.lax.fori_loop(0, pcg_iters, body, X)
            return Y.reshape(-1)[:1]

        t_mv = _time(mv_loop, Ssym.planes, B) / pcg_iters

        x = jnp.arange(n, dtype=jnp.float32)
        copy_reps = 100

        @jax.jit
        def copy(x):
            def body(_, y):
                return y + 1.0

            return jax.lax.fori_loop(0, copy_reps, body, x).reshape(-1)[:1]

        t_copy = _time(copy, x) / copy_reps

    plane_bytes = float(np.prod(S.planes.shape)) * 4.0
    sym_read_bytes = plane_bytes * 0.5  # forward edges + upper-tri self
    vec_bytes = 4.0 * n
    return {
        "num_dofs": int(n),
        "copy_gbps": round(8.0 * n / t_copy / 1e9, 2),
        "matvec_ms": round(t_mv * 1e3, 4),
        "matvec_gbps": round((sym_read_bytes + 2 * vec_bytes) / t_mv / 1e9,
                             2),
        "assembly_ms": round(t_asm * 1e3, 2),
        "assembly_gbps": round((plane_bytes + 2 * vec_bytes) / t_asm / 1e9,
                               2),
    }
