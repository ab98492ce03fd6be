#!/usr/bin/env python
"""Driver benchmark: SPE10 SWIPDG assemble + Jacobi-CG solve throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; baseline is
the BASELINE.json north star of 5 MDoF/s (assemble + solve).
"""
import json
import os
import sys


def main():
    import jax

    bisections = int(os.environ.get("BENCH_BISECTIONS", "4"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    mode = os.environ.get("BENCH_MODE", "throughput")
    from dune_hdd_tpu.bench_harness import run_spe10_bench

    if mode == "converged":
        # f64 solve-to-tolerance (measured 9.7e-7 at 48k DoF in 6.6s on the
        # v5e chip); smaller default size to keep the run bounded
        import jax.numpy as jnp

        jax.config.update("jax_enable_x64", True)
        result = run_spe10_bench(
            bisections=min(bisections, 2), repeats=repeats, maxiter=4000,
            tol=1e-6, dtype=jnp.float64,
        )
    else:
        result = run_spe10_bench(bisections=bisections, repeats=repeats)
    out = {
        # round-1 metric: full pipeline throughput — f32 assembly + 300
        # block-Jacobi CG iterations on the scaled system.  The 1e6-contrast
        # SPE10 matrix is numerically indefinite in f32, so solve-to-tolerance
        # needs contrast-robust MG or fast f64 (round-2 work); the achieved
        # relative residual is reported alongside.
        "metric": ("spe10_swipdg_assemble_solve_f64" if mode == "converged"
                   else "spe10_swipdg_assemble_plus_300cg"),
        "value": round(result["mdof_per_s"], 3),
        "unit": "MDoF/s",
        "vs_baseline": round(result["mdof_per_s"] / 5.0, 3),
        "num_dofs": result["num_dofs"],
        "seconds": round(result["seconds"], 4),
        "residual": result["residual"],
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
