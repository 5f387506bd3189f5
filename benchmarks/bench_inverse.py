"""Micro-timings of the inversion primitives on the current backend."""

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from gple_tpu.ops.linalg import (
    _chol_matmul_inverse,
    _newton_schulz_inverse,
    triangular_inverse_lower,
)


def timeit(label, fn, arg, reps=10):
    # vary the input every repetition: the axon backend appears to cache
    # executions with bit-identical inputs
    args = [arg + (i + 1) * 1e-9 for i in range(reps)]
    out = fn(args[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for a in args:
        out = fn(a)
    jax.block_until_ready(out)
    print(f"{label}: {(time.perf_counter() - t0) / reps * 1e3:.3f} ms", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 2))
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    k = jnp.asarray(np.exp(-0.5 * d2) + 1e-4 * np.eye(n))
    kb = jnp.stack([k, k + 1e-3 * jnp.eye(n)])
    print("backend:", jax.default_backend(), flush=True)
    timeit("cholesky", jax.jit(jnp.linalg.cholesky), k)
    timeit("cholesky batched(2)", jax.jit(jnp.linalg.cholesky), kb)
    low = jnp.linalg.cholesky(k)
    timeit("triangular_inverse", jax.jit(triangular_inverse_lower), low)
    timeit("chol_matmul_inverse", jax.jit(_chol_matmul_inverse), k)
    timeit("chol_matmul_inverse batched(2)", jax.jit(_chol_matmul_inverse), kb)
    timeit("newton_schulz_inverse", jax.jit(_newton_schulz_inverse), k)


if __name__ == "__main__":
    main()
