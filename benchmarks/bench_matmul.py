"""Raw matmul/exp throughput probe on the current backend."""

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt * 1e3:.3f} ms", flush=True)
    return dt


def main():
    n = 1024
    rng = np.random.default_rng(0)
    a64 = jnp.asarray(rng.normal(size=(n, n)))
    a32 = a64.astype(jnp.float32)
    print("backend:", jax.default_backend(), flush=True)
    mm = jax.jit(lambda a, b: a @ b)
    dt64 = timeit("f64 matmul 1024^3", mm, a64, a64)
    dt32 = timeit("f32 matmul 1024^3", mm, a32, a32)
    flops = 2 * n**3
    print(f"f64: {flops / dt64 / 1e12:.2f} TF/s ; f32: {flops / dt32 / 1e12:.2f} TF/s")
    ex = jax.jit(lambda a: jnp.exp(a))
    dte64 = timeit("f64 exp 1M", ex, a64)
    dte32 = timeit("f32 exp 1M", ex, a32)
    print(f"exp rate f64 {n * n / dte64 / 1e9:.2f} G/s ; f32 {n * n / dte32 / 1e9:.2f} G/s")


if __name__ == "__main__":
    main()
