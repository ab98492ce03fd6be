"""Measure steady-state pipeline throughput (items/s) vs the sequential
baseline on the virtual 8-device CPU mesh (VERDICT r4 item 4).

The GPipe schedule costs (B + S - 1) x slowest-stage instead of
B x stage-sum; with A = S - 2 assembly stages each holding a 1/A shard of
the affine stacks, the assemble work per stage also shrinks.  On the
single-host CPU mesh the devices are threads, so the wall-clock ratio is a
real (if emulated) concurrency measurement.

Run: python scripts/diag_pipeline_throughput.py
"""
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dune_hdd_tpu.discretizations import SWIPDGDiscretization  # noqa: E402
from dune_hdd_tpu.grid import alu_cube_grid  # noqa: E402
from dune_hdd_tpu.parallel.pipeline import (  # noqa: E402
    make_stage_mesh, pipeline_parameter_stages, sequential_parameter_stages)
from dune_hdd_tpu.problems import ThermalblockProblem  # noqa: E402

BI = {"type": "stuff.grid.boundaryinfo.alldirichlet"}


def main():
    rng = np.random.default_rng(0)
    grid = alu_cube_grid((0, 0), (1, 1), (8, 8), refinements=2)
    d = SWIPDGDiscretization(grid, BI, ThermalblockProblem((2, 2)))
    op, rhs = d.get_operator(), d.get_rhs()
    expanded = op.with_expanded_affine_part()
    rhs_exp = rhs.with_expanded_affine_part()
    B = 32
    mus = rng.uniform(0.1, 1.0, size=(B, 4))
    th_op = jnp.stack([
        jnp.stack([jnp.asarray(c({"diffusion_factor": jnp.array(v)}))
                   for c in expanded.coefficients]) for v in mus])
    th_rhs = jnp.stack([
        jnp.stack([jnp.asarray(c({"diffusion_factor": jnp.array(v)}))
                   for c in rhs_exp.coefficients]) for v in mus])
    n = rhs_exp.components[0].shape[0]
    print(f"B={B} items, N={n} DoF, Q={th_op.shape[1]} op components")

    for S in (3, 4):
        mesh = make_stage_mesh(num_stages=S)
        # warm up (compile)
        u, _ = pipeline_parameter_stages(op, rhs, th_op, th_rhs, mesh=mesh,
                                         cg_iters=400)
        u.block_until_ready()
        t0 = time.perf_counter()
        u, e = pipeline_parameter_stages(op, rhs, th_op, th_rhs, mesh=mesh,
                                         cg_iters=400)
        u.block_until_ready()
        t_pp = time.perf_counter() - t0
        print(f"S={S} pipeline: {t_pp*1e3:8.1f} ms  "
              f"{B / t_pp:7.1f} items/s  (steady-state: "
              f"{(B + S - 1) / t_pp:7.1f} steps/s)")

    # sequential baseline: same stage functions, one device, B solves
    u_seq, _ = sequential_parameter_stages(op, rhs, th_op[:2], th_rhs[:2],
                                           cg_iters=400)  # warm up
    t0 = time.perf_counter()
    u_seq, e_seq = sequential_parameter_stages(op, rhs, th_op, th_rhs,
                                               cg_iters=400)
    u_seq.block_until_ready()
    t_seq = time.perf_counter() - t0
    print(f"sequential:   {t_seq*1e3:8.1f} ms  {B / t_seq:7.1f} items/s")
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_seq),
                               rtol=0, atol=1e-5)
    print("pipeline == sequential: ok")


if __name__ == "__main__":
    main()
