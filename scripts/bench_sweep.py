"""Sweep bench configurations on the real chip in ONE process (serialized,
compile-cache-friendly).  Prints one line per config: median seconds, MDoF/s,
residual."""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_jax_cache")
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, "/root/repo")


def run(tag, preconditioner, repeats=5, **env):
    for k, v in env.items():
        os.environ[k] = str(v)
    try:
        from dune_hdd_tpu.bench_harness import run_spe10_bench

        t0 = time.perf_counter()
        r = run_spe10_bench(bisections=4, repeats=repeats, tol=1e-6,
                            preconditioner=preconditioner)
        wall = time.perf_counter() - t0
        print(f"{tag:24s} {r['seconds']*1e3:9.1f} ms  {r['mdof_per_s']:7.3f} MDoF/s  "
              f"res={r['residual']:.2e}  (times: "
              f"{[round(t*1e3) for t in r['all_times']]}, total {wall:.0f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag:24s} FAILED: {type(e).__name__}: {e}", flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)


if __name__ == "__main__":
    configs = sys.argv[1:] or ["base", "stencil-jac", "stencil-cheb2", "stencil-cheb3"]
    for c in configs:
        if c == "base":
            run("deflation(gather r2)", "deflation")
        elif c == "stencil-jac":
            run("stencil+jacobi", "stencil", BENCH_SMOOTHER="jacobi")
        elif c == "stencil-cheb2":
            run("stencil+cheb2", "stencil", BENCH_SMOOTHER="cheb2")
        elif c == "stencil2":
            run("stencil2(direct-asm)", "stencil2", BENCH_SMOOTHER="jacobi")
        elif c == "stencil2-ns2":
            run("stencil2 NS=2", "stencil2", BENCH_SMOOTHER="jacobi", BENCH_NS=2)
        elif c == "stencil2-cheb2":
            run("stencil2 cheb2", "stencil2", BENCH_SMOOTHER="cheb2")
        elif c == "stencil2-unroll8":
            run("stencil2 unroll8", "stencil2", BENCH_SMOOTHER="jacobi", BENCH_UNROLL=8)
        elif c == "stencil2-best":
            run("stencil2 NS2+u8", "stencil2", BENCH_SMOOTHER="jacobi",
                BENCH_NS=2, BENCH_UNROLL=8)
        elif c == "stencil2-ns1":
            run("stencil2 NS1+u8", "stencil2", BENCH_SMOOTHER="jacobi",
                BENCH_NS=1, BENCH_UNROLL=8)
        elif c == "stencil2-u12":
            run("stencil2 NS2+u12", "stencil2", BENCH_SMOOTHER="jacobi",
                BENCH_NS=2, BENCH_UNROLL=12)
        elif c == "stencil2-cheb2best":
            run("stencil2 cheb2+NS2+u8", "stencil2", BENCH_SMOOTHER="cheb2",
                BENCH_NS=2, BENCH_UNROLL=8)
        elif c == "stencil2-m50":
            run("stencil2 macro 50x10", "stencil2", BENCH_SMOOTHER="jacobi",
                BENCH_NS=2, BENCH_UNROLL=8, BENCH_MACRO="50,10")
        elif c == "stencil2-m25":
            run("stencil2 macro 25x5", "stencil2", BENCH_SMOOTHER="jacobi",
                BENCH_NS=2, BENCH_UNROLL=8, BENCH_MACRO="25,5")
        elif c == "stencil2-inner250":
            run("stencil2 inner250", "stencil2", BENCH_SMOOTHER="jacobi", BENCH_INNER=250)
        elif c == "stencil-cheb3":
            run("stencil+cheb3", "stencil", BENCH_SMOOTHER="cheb3")
        elif c.startswith("stencil-inner"):
            n = int(c.rsplit("-", 1)[1])
            run(f"stencil+jac inner={n}", "stencil", BENCH_SMOOTHER="jacobi",
                BENCH_INNER=n)
        else:
            print(f"unknown config {c}")
