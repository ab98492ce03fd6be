"""Probe per-loop-iteration overhead vs true stream bandwidth (bodies are
index-dependent so XLA cannot strength-reduce the loop)."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_jax_cache")


def chain_time(step, x0, n):
    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, n, step, x)

    y = chain(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = chain(x0)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n


def mul_i(i, x):
    return x * (1.0 + 1e-6 * i)


def main():
    print(jax.devices(), flush=True)
    t = chain_time(mul_i, jnp.ones((8, 128), jnp.float32), 2000)
    print(f"tiny [8,128]          {t*1e6:9.1f} us/iter", flush=True)
    x = jnp.ones((4, 3, 3, 8, 40, 200), jnp.float32)
    t = chain_time(mul_i, x, 500)
    print(f"W-shaped (9.2MB)      {t*1e6:9.1f} us/iter "
          f"({2*x.size*4/t/1e9:.1f} GB/s)", flush=True)
    x = jnp.ones((2304000,), jnp.float32)
    t = chain_time(mul_i, x, 500)
    print(f"flat (9.2MB)          {t*1e6:9.1f} us/iter "
          f"({2*x.size*4/t/1e9:.1f} GB/s)", flush=True)
    x = jnp.ones((64 * 1024 * 1024,), jnp.float32)
    t = chain_time(mul_i, x, 50)
    print(f"big (256MB)           {t*1e6:9.1f} us/iter "
          f"({2*x.size*4/t/1e9:.1f} GB/s)", flush=True)
    x = jnp.ones((3, 8, 40, 200), jnp.float32)  # solution-vector shape
    t = chain_time(mul_i, x, 2000)
    print(f"X-shaped (0.77MB)     {t*1e6:9.1f} us/iter "
          f"({2*x.size*4/t/1e9:.1f} GB/s)", flush=True)

    # ten dependent passes over W per iteration: per-op overhead inside body
    def body10(i, x):
        for k in range(10):
            x = x * (1.0 + 1e-6 * (i + k))
        return x

    x = jnp.ones((4, 3, 3, 8, 40, 200), jnp.float32)
    t = chain_time(body10, x, 200)
    print(f"W-shaped 10 passes    {t*1e6:9.1f} us/iter", flush=True)


if __name__ == "__main__":
    main()
