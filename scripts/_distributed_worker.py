"""Worker for the multi-process jax.distributed smoke test.

Launched N times (tests/test_distributed.py) with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set; each process owns
--xla_force_host_platform_device_count CPU devices and the global mesh spans
all of them.  Verifies, end-to-end across OS processes (gloo collectives):

  * initialize_distributed() picks the env vars up and succeeds,
  * jax.devices() spans all processes' devices,
  * a shard_map psum over the GLOBAL mesh matches the host reduction,
  * the package's halo ppermute ring crosses the process boundary correctly
    (ring shift of per-device constants == numpy roll).

This is the multi-host path of SURVEY 5.8 (the reference only ever
initialises MPI, discreteproblem.hh:91-95 — it never communicates; this
exercises strictly more).
"""
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dune_hdd_tpu.parallel.distributed import (  # noqa: E402
    initialize_distributed, is_distributed, process_info)


def main():
    assert initialize_distributed(), "env-described init must engage"
    info = process_info()
    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    local = int(os.environ.get("LOCAL_DEVICES", "2"))
    assert info["process_count"] == nproc, info
    assert info["global_devices"] == nproc * local, info
    assert is_distributed() == (nproc > 1)

    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    ndev = info["global_devices"]
    mesh = Mesh(np.array(jax.devices()), ("x",))

    # global array: every process contributes its addressable shards
    shape = (ndev * 4, 3)
    full = np.arange(np.prod(shape), dtype=np.float32).reshape(shape)
    sharding = NamedSharding(mesh, P("x"))
    arr = jax.make_array_from_callback(shape, sharding,
                                       lambda idx: full[idx])

    @jax.jit
    def global_sum(a):
        f = shard_map(lambda s: jax.lax.psum(s.sum(), "x"),
                      mesh=mesh, in_specs=P("x"), out_specs=P())
        return f(a)

    got = float(np.asarray(jax.device_get(global_sum(arr))))
    want = float(full.sum())
    assert abs(got - want) <= 1e-3 * abs(want), (got, want)

    # ring ppermute across the process boundary (the halo.py pattern)
    @jax.jit
    def ring_shift(a):
        def f(s):
            idx = jax.lax.axis_index("x")
            val = jnp.full((1,), idx, jnp.float32) + 0.0 * s.sum()
            perm = [(i, (i + 1) % ndev) for i in range(ndev)]
            return jax.lax.ppermute(val, "x", perm)
        return shard_map(f, mesh=mesh, in_specs=P("x"), out_specs=P("x"))(a)

    ring = ring_shift(arr)  # globally sharded: check the LOCAL shards only
    want_ring = np.roll(np.arange(ndev, dtype=np.float32), 1)
    for shard in ring.addressable_shards:
        d = shard.index[0].start or 0
        np.testing.assert_array_equal(np.asarray(shard.data).ravel(),
                                      want_ring[d:d + 1])

    print(f"proc {info['process_index']}/{nproc} OK "
          f"(devices {info['global_devices']}, psum {got:.0f})", flush=True)


if __name__ == "__main__":
    main()
