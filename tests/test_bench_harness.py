"""End-to-end bench-harness paths (the driver contract): the stencil2
(direct-to-planes) pipeline must converge to a true 1e-6 and agree with the
permute-based stencil path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_hdd_tpu.bench_harness import build_spe10_bench, run_spe10_bench


def test_split_jit_path_matches_fused(monkeypatch):
    """BENCH_SPLIT=1 (assembly and solve as two XLA programs, the >=10
    bisections default since the fused program pays ~0.4 s at 12.3M DoF)
    must produce the same solution and residual as the fused program."""
    fnf, field, _ = build_spe10_bench(bisections=2, tol=1e-6,
                                      preconditioner="stencil2")
    uf, resf = fnf(field)
    monkeypatch.setenv("BENCH_SPLIT", "1")
    fns, _, _ = build_spe10_bench(bisections=2, tol=1e-6,
                                  preconditioner="stencil2")
    us, ress = fns(field)
    assert float(ress) <= 1e-6
    d = np.abs(np.asarray(uf) - np.asarray(us)).max()
    assert d / np.abs(np.asarray(uf)).max() < 1e-6, d


@pytest.mark.slow
def test_stencil2_bench_converges_and_matches():
    r = run_spe10_bench(bisections=2, repeats=1, tol=1e-6,
                        preconditioner="stencil2")
    assert r["residual"] <= 1e-6
    fn1, field, _ = build_spe10_bench(bisections=2, tol=1e-6,
                                      preconditioner="stencil")
    fn2, _, _ = build_spe10_bench(bisections=2, tol=1e-6,
                                  preconditioner="stencil2")
    u1, _ = fn1(field)
    u2, _ = fn2(field)
    d = np.abs(np.asarray(u1) - np.asarray(u2)).max() / np.abs(np.asarray(u1)).max()
    assert d < 1e-4, d
