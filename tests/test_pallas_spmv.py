"""Pallas structured-SpMV kernel: semantics validated in interpret mode
(the axon TPU tunnel's remote Mosaic compiler hangs on this kernel — see
ROADMAP item 3 — so compiled-mode coverage waits for a direct-attached
host; the kernel itself is correct)."""
import jax.numpy as jnp
import numpy as np

from dune_hdd_tpu.la.pallas_spmv import build_structured_pallas_matvec


class _FakeStructured:
    """Minimal StructuredBlockEll stand-in: random blocks + offsets."""

    def __init__(self, nc, nd, seed=0):
        rng = np.random.default_rng(seed)
        self.num_cells, self.nd = nc, nd
        self.offsets = tuple(
            tuple(int(o) for o in row)
            for row in rng.integers(-nc // 2, nc // 2, size=(8, 3))
        )
        self.blocks = jnp.asarray(
            rng.normal(size=(nc, 4, nd, nd)).astype(np.float32)
        )


def test_pallas_spmv_matches_emulation_interpret():
    nc, nd = 4096, 3
    A = _FakeStructured(nc, nd)
    mv, planes = build_structured_pallas_matvec(A, interpret=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=nc * nd).astype(np.float32))
    y = np.asarray(mv(planes, x)).reshape(nc, nd)

    L = nc // 8
    ncp = ((nc + 1023) // 1024) * 1024
    xp = np.zeros((nd, ncp), np.float32)
    xp[:, :nc] = np.asarray(x).reshape(nc, nd).T
    bl = np.asarray(A.blocks)
    yref = np.einsum("cij,cj->ci", bl[:, 0], np.asarray(x).reshape(nc, nd))
    for s in range(3):
        for k in range(8):
            o = A.offsets[k][s] % nc
            cells = np.arange(k * L, (k + 1) * L)
            src = (cells + o) % ncp
            yref[cells] += np.einsum("cij,cj->ci", bl[cells, s + 1], xp[:, src].T)
    err = np.max(np.abs(y - yref)) / np.max(np.abs(yref))
    assert err < 1e-5, err
