import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_jax_cache")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(x_ref, y_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0 + y_ref[...]

f = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))
x = jnp.ones((64, 128), jnp.float32)
t0 = time.perf_counter()
out = f(x, x)
jax.block_until_ready(out)
print("trivial pallas ok in %.1fs, val=%f" % (time.perf_counter() - t0, float(out[0,0])))

# OUTCOME (round 3, 2026-08-17, chip idle): this MINIMAL kernel — a single
# [64,128] f32 elementwise pallas_call, no grid, no rolls, no gathers —
# hangs the axon remote Mosaic compile (127.0.0.1:8103) for > 500 s.
# Round 2's structured-SpMV kernel hang (la/pallas_spmv.py) was therefore
# NOT a property of the kernel: Mosaic compilation through this tunnel is
# unavailable, full stop.  The production SpMV is the XLA SoA plane path
# (la/stencil.py), measured ~20-30 us per 192k-DoF matvec in-loop; Pallas
# kernels remain validated in interpret mode (tests/test_pallas_spmv.py).
