"""Large-size HBM bandwidth probe for the tunnel TPU (round 5).

Question it answers: is the ~100 GB/s the 3M-DoF SpMV achieves the CHIP's
practical ceiling, or a kernel-structure problem (unfused rolls, small
plane ops)?  v5e peak HBM is ~819 GB/s; the round-3 "62 GB/s copy roofline"
was measured at 768k DoF (3 MB arrays) where kernel-launch latency
dominates, so it says nothing about large sizes.

Measures, with chained fori_loop timing (one dispatch, scalar-fetch sync):

* copy      y = x + 1           (8 bytes/elem)
* triad     y = a*x + y         (12 bytes/elem)
* roll-fma  y = x + roll(x)     (8 bytes/elem if the roll fuses; 16 if not)
* roll24    y = sum of 24 rolls of x[k] lattice fields (the SpMV's shift
            pattern without the planes: 4 bytes/elem read if fused)
* pcg-veps  the PCG vector-op bundle (2 axpy + 1 xpby + 2 dots) on 4
            vectors (36 bytes/elem algorithmic)

Usage: python scripts/diag_bandwidth.py [n_floats ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_jax_cache")

REPS = 30


def timed_loop(make_body, x0, n_bytes_per_rep, tag):
    @jax.jit
    def run(x):
        body = make_body()
        y = jax.lax.fori_loop(0, REPS, body, x)
        return jax.tree_util.tree_leaves(y)[0].ravel()[0]

    float(run(x0))  # compile + sync
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / REPS
    gbps = n_bytes_per_rep / dt / 1e9
    print(f"  {tag:12s} {dt*1e3:8.3f} ms/rep  {gbps:7.1f} GB/s", flush=True)
    return gbps


def probe(n):
    print(f"n = {n/1e6:.1f}M floats ({n*4/1e6:.0f} MB/array)", flush=True)
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9

    timed_loop(lambda: (lambda i, v: v + 1.0), x, 8 * n, "copy")
    timed_loop(lambda: (lambda i, v: 0.999 * v + x), x, 12 * n, "triad")

    # lattice-shaped rolls (the SpMV shift pattern): [8, KY, KX]
    ky = 256
    kx = n // (8 * ky)
    X8 = x[: 8 * ky * kx].reshape(8, ky, kx)

    def roll_body():
        def body(i, v):
            return v + jnp.roll(v, 1, axis=-1)

        return body

    timed_loop(roll_body, X8, 8 * X8.size, "roll-fma")

    def roll24_body():
        shifts = [(k, dy, dx) for k in range(8) for (dy, dx) in
                  [(0, 1), (1, 0), (1, 1)]]

        def body(i, v):
            acc = v
            for k, dy, dx in shifts:
                acc = acc.at[k].add(
                    jnp.roll(v[(k + 1) % 8], (dy, dx), axis=(0, 1)))
            return acc * 0.5

        return body

    timed_loop(roll24_body, X8, 8 * X8.size, "roll24")

    # PCG vector bundle: X += a P; R -= a AP; P = Z + b P; 2 dots
    vs = (x, x * 1.1, x * 0.9, x * 1.05)

    def pcg_body():
        def body(i, v):
            X, R, P, Z = v
            a = jnp.vdot(R, Z) / jnp.vdot(P, P)
            X = X + a * P
            R = R - a * P
            P = Z + 0.5 * P
            return X, R, P, Z

        return body

    timed_loop(pcg_body, vs, 36 * n, "pcg-vecops")


def main():
    sizes = [int(float(a)) for a in sys.argv[1:]] or [3_000_000, 12_582_912,
                                                      50_331_648, 100_663_296]
    for n in sizes:
        probe(n)


if __name__ == "__main__":
    main()
