"""Real-TPU benchmark: Pallas fused gram/predict vs stock XLA (f32).

Decides whether ops/pallas_gram.py earns its production call sites
(VERDICT round-1, weak #3).  Run on the chip:  python benchmarks/bench_pallas.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from gple_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from gple_tpu.ops import kernels as RK  # noqa: E402
from gple_tpu.ops.pallas_gram import gram_pallas, predict_mean_pallas  # noqa: E402


def timeit(label, fn, arg_sets, reps=20):
    """axon serves bit-identical re-executions from a device-side cache, so
    every rep must see fresh inputs: cycle through pre-generated argument
    sets (each compiled once -- same shapes)."""
    for args in arg_sets:
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for r in range(reps):
        out = jax.block_until_ready(fn(*arg_sets[r % len(arg_sets)]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:9.3f} ms", flush=True)
    return out, dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    for n, m in [(1024, 10240), (4096, 40960)]:
        kx, kt = jax.random.split(jax.random.fold_in(key, n))
        x = jax.random.normal(kx, (n, 2), dtype=jnp.float32)
        xt = jax.random.normal(kt, (m, 2), dtype=jnp.float32)
        lengths = jnp.asarray([0.7, 1.3], dtype=jnp.float32)
        alpha = jax.random.normal(kx, (n,), dtype=jnp.float32)
        mag = jnp.asarray(1.3, dtype=jnp.float32)

        gx = jax.jit(lambda l, a, b: RK.gram(l, a, b).astype(jnp.float32))
        gp = jax.jit(gram_pallas)
        print(f"-- N={n} --", flush=True)
        xs = [x + 1e-3 * i for i in range(8)]
        xts = [xt + 1e-3 * i for i in range(8)]
        o1, t_xla = timeit("gram xla f32   ", gx, [(lengths, xi, xi) for xi in xs])
        o2, t_pal = timeit("gram pallas    ", gp, [(lengths, xi, xi) for xi in xs])
        err = float(jnp.max(jnp.abs(o1 - o2)))
        print(f"gram max|diff| = {err:.2e}  speedup x{t_xla/t_pal:.2f}", flush=True)

        def mean_xla(l, m_, xt_, x_, a_):
            ks = m_**2 * RK.gram(l, xt_, x_)
            return ks @ a_

        mx = jax.jit(mean_xla)
        mp = jax.jit(predict_mean_pallas)
        o1, t_xla = timeit(f"mean xla  M={m}", mx,
                           [(lengths, mag, xts[i], xs[i], alpha) for i in range(8)])
        o2, t_pal = timeit(f"mean palls M={m}", mp,
                           [(lengths, mag, xts[i], xs[i], alpha) for i in range(8)])
        err = float(jnp.max(jnp.abs(o1 - o2)) / jnp.max(jnp.abs(o1)))
        print(f"mean rel|diff| = {err:.2e}  speedup x{t_xla/t_pal:.2f}", flush=True)


if __name__ == "__main__":
    main()
