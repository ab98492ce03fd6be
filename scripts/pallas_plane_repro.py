"""Bounded Pallas retry (round 4): plane-layout SpMV, grid over slots.

ROADMAP round 3 section 3 left ~2x single-chip SpMV headroom on the table if
a Pallas kernel fusing the 24 rolls with the 36-plane FMA core compiles;
scripts/pallas_minimal_repro.py recorded that even a minimal [64,128]
elementwise pallas_call hangs the axon remote Mosaic compile (>500 s).

This script is the guarded round-4 experiment (VERDICT r3 next item 6):

1. kernel definition: the StencilBlockEll matvec in the SoA plane layout
   [nd, 8, KY, KX] — grid over the 8 geometric slots, the source-slot
   permutation realized through BlockSpec index maps (three x views, one per
   shift family), the (dy, dx) lattice shifts as static in-kernel rolls.
2. `--mode interpret`: numerical validation against StencilBlockEll.matvec
   (runs everywhere, no Mosaic).
3. `--mode compile`: the real TPU compile+run, meant to be executed INSIDE
   a subprocess with a timeout (`--mode guarded` does that for you) so a
   Mosaic hang cannot take the session down.  Reports GB/s on success.

OUTCOME (round 4, 2026-08-17, this tunnel):

- The first guarded compile failed fast (rc=1) at CLIENT-side Mosaic
  lowering: the kernel's `acc.at[i].add(...)` lowers to scatter-add, which
  Pallas TPU does not implement.  That was a genuine kernel bug, fixed by
  accumulating per-row in Python lists and `jnp.stack`ing (this file);
  interpret mode re-validates at rel err 6.4e-8.
- With the kernel fixed, the bounded REMOTE compile question was re-tested
  via scripts/pallas_minimal_repro.py (a single [64,128] elementwise
  pallas_call): still hangs >200 s (rc=124, 2026-08-17 13:06).  Remote
  Mosaic compilation through this tunnel remains unavailable regardless of
  kernel shape, so the item stays closed with the XLA plane path as the
  production SpMV (la/stencil.py, ~29 GB/s of the ~62 GB/s roofline).
  The fixed kernel here is compile-ready for hardware with a live Mosaic
  path.

OUTCOME (round 5, 2026-08-19, this tunnel): third bounded retry
(`--mode guarded`, 120 s): the remote Mosaic compile still hangs
(subprocess killed at timeout; the main session and TPU worker survive).
Remote Mosaic compilation remains unavailable through this tunnel; the
XLA plane path stays the production SpMV — now measured at ~87 GB/s at
768k / ~194 GB/s at 3M effective matvec bandwidth vs a ~93 GB/s chained
copy roofline at 3M (bench.py `roofline` field), i.e. the XLA path now
SATURATES the measured roofline and the original 2x Pallas motivation
(29 vs 62 GB/s, round 3) no longer applies.
"""
import argparse
import subprocess
import sys
import time

import numpy as np


def build_system(refs: int = 2):
    import jax
    import jax.numpy as jnp

    from dune_hdd_tpu.functions.base import ConstantFunction, constant_matrix
    from dune_hdd_tpu.grid.boundaryinfo import make_boundary_info
    from dune_hdd_tpu.grid.structured import alu_cube_grid
    from dune_hdd_tpu.grid.structured_order import structured_cell_order
    from dune_hdd_tpu.la.block_ell import build_block_ell
    from dune_hdd_tpu.la.stencil import StencilBlockEll
    from dune_hdd_tpu.ops.assembly import elliptic_cell_matrices
    from dune_hdd_tpu.ops.spaces import dg_space
    from dune_hdd_tpu.ops.swipdg import swipdg_face_blocks

    grid = alu_cube_grid((0.0, 0.0), (5.0, 1.0), (100, 20), refinements=refs)
    bi = make_boundary_info(grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"})
    space = dg_space(grid)
    interior = np.nonzero(grid.interior_faces)[0]
    dirichlet = np.nonzero(bi.dirichlet_faces)[0]
    one = ConstantFunction(1.0)
    kap = constant_matrix(1.0)
    vol = elliptic_cell_matrices(space, one, kap)
    ib, bb = swipdg_face_blocks(space, one, kap, interior, dirichlet)
    A = build_block_ell(space, vol, ib, bb, interior, dirichlet)
    A32 = A.with_blocks(A.blocks.astype(jnp.float32))
    order = structured_cell_order(grid, (0.0, 0.0), (5.0, 1.0))
    return StencilBlockEll.from_block_ell(A32, order)


def build_pallas_matvec(S, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    nd = S.nd
    KY, KX = S.lattice
    # per target slot k and family s: source slot + lattice shift
    ksrc = np.asarray([[S.plan[k][s][0] for s in range(3)] for k in range(8)])
    dy = np.asarray([[S.plan[k][s][1] for s in range(3)] for k in range(8)])
    dx = np.asarray([[S.plan[k][s][2] for s in range(3)] for k in range(8)])

    def kernel(x0_ref, x1_ref, x2_ref, xs_ref, w_ref, o_ref, *, k):
        # per-row Python accumulators (no .at[].add — Mosaic has no scatter)
        w = w_ref[...]                       # [4, nd, nd, 1, KY, KX]
        xs = xs_ref[...]                     # self slot [nd, 1, KY, KX]
        rows = [jnp.zeros((KY, KX), jnp.float32) for _ in range(nd)]
        for i in range(nd):
            for j in range(nd):
                rows[i] = rows[i] + w[0, i, j, 0] * xs[j, 0]
        for s, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
            xv = x_ref[...]                  # [nd, 1, KY, KX] source slot
            sh = jnp.roll(xv[:, 0], shift=(-int(dy[k][s]), -int(dx[k][s])),
                          axis=(1, 2))
            for i in range(nd):
                for j in range(nd):
                    rows[i] = rows[i] + w[s + 1, i, j, 0] * sh[j]
        o_ref[...] = jnp.stack(rows)[:, None]

    # one pallas_call per slot k: the source-slot selection is static per
    # call (Mosaic-friendly), the 8 calls fuse into one XLA computation
    def matvec(planes, X):
        outs = []
        for k in range(8):
            f = pl.pallas_call(
                lambda *refs, k=k: kernel(*refs, k=k),
                out_shape=jax.ShapeDtypeStruct((nd, 1, KY, KX), jnp.float32),
                interpret=interpret,
            )
            outs.append(f(
                X[:, ksrc[k][0]][:, None], X[:, ksrc[k][1]][:, None],
                X[:, ksrc[k][2]][:, None], X[:, k][:, None],
                planes[:, :, :, k][:, :, :, None],
            ))
        return jnp.concatenate(outs, axis=1)

    return matvec


def run(mode: str, refs: int):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_jax_cache")
    if mode == "interpret":
        jax.config.update("jax_platforms", "cpu")
    S = build_system(refs)
    nd = S.nd
    KY, KX = S.lattice
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((nd, 8, KY, KX)), jnp.float32)
    mv = build_pallas_matvec(S, interpret=(mode == "interpret"))
    t0 = time.perf_counter()
    Y = mv(S.planes, X)
    y0 = float(jnp.asarray(Y).ravel()[0])  # force the round trip
    t_first = time.perf_counter() - t0
    Y_ref = S.matvec(X)
    rel = float(jnp.linalg.norm(Y - Y_ref) / jnp.linalg.norm(Y_ref))
    print(f"mode={mode} first_call={t_first:.1f}s rel_err={rel:.2e} y0={y0:.3e}",
          flush=True)
    assert rel < 1e-5, rel
    if mode == "compile":
        f = jax.jit(lambda p, x: mv(p, x))
        float(jnp.sum(f(S.planes, X)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(f(S.planes, X)))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        gb = (S.planes.size + 2 * X.size) * 4 / dt / 1e9
        print(f"compiled: {dt*1e3:.2f} ms/matvec ~ {gb:.1f} GB/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["interpret", "compile", "guarded"],
                    default="guarded")
    ap.add_argument("--refs", type=int, default=2)
    ap.add_argument("--timeout", type=float, default=120.0)
    args = ap.parse_args()
    if args.mode != "guarded":
        run(args.mode, args.refs)
        return
    # guarded: compile attempt in a subprocess so a Mosaic hang is bounded
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--mode", "compile",
             "--refs", str(args.refs)],
            timeout=args.timeout, capture_output=True, text=True,
        )
        print(proc.stdout)
        print(f"guarded compile finished rc={proc.returncode} "
              f"in {time.perf_counter()-t0:.1f}s")
        if proc.returncode:
            print(proc.stderr[-2000:])
    except subprocess.TimeoutExpired:
        print(f"guarded compile TIMED OUT after {args.timeout:.0f}s "
              "(remote Mosaic hang, matching scripts/pallas_minimal_repro.py)")


if __name__ == "__main__":
    main()
