"""TPU-friendly positive-definite linear algebra.

XLA:TPU lowers ``cho_solve`` / ``triangular_solve`` to blocked sequential
loops whose compile time grows super-linearly with N on the axon toolchain
(empirically: the full fit+evolve step compiles in minutes at N = 256 but
hangs for >25 min at N >= 512, while plain matmuls compile in seconds).  The
hot path therefore has NO triangular solves: SPD matrices are inverted with a
Newton-Schulz iteration

    X_{k+1} = X_k (2 I - K X_k),    X_0 = K^T / (||K||_1 ||K||_inf)

run in MIXED precision: the O(N^3) iteration bulk in float32 (MXU-native,
~100x the f64 rate), followed by a couple of float64 polish iterations.
Quadratic convergence: with the GP kernel's pinned noise (cond <= ~1e4 N) the
f32 stage plateaus at ~cond * 1e-7 and each f64 polish squares the residual,
so 3 polish steps reach ~cond * eps.

Solves that need full f64 accuracy (alpha = K^-1 y) add iterative refinement:
x += X (y - K x) with f64 O(N^2) residuals -- each step multiplies the error
by ||I - KX|| << 1.

The backward pass of ``psd_inverse`` uses the exact identity
d(K^-1) = -K^-1 dK K^-1 instead of differentiating the iteration.

On CPU backends the direct Cholesky inverse is used (faster there, and
matching the reference's LDLT solve, kernel.cpp:281-283); both paths agree to
solver accuracy, so the CPU test suite validates the physics of the TPU path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: f32 Newton-Schulz iterations (reaches the f32 floor ~cond * 1e-7)
NS_F32_ITERS = 60
#: f64 polish iterations (each squares the residual); the remaining ~1e-2
#: inverse residual is absorbed by iterative refinement of the solves
NS_F64_ITERS = 1


def _ns_scan(k, x, iters: int):
    eye2 = 2.0 * jnp.eye(k.shape[0], dtype=k.dtype)

    def body(x, _):
        return x @ (eye2 - k @ x), None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x


def _newton_schulz_inverse(k, f32_iters: int = NS_F32_ITERS,
                           f64_iters: int = NS_F64_ITERS):
    norm1 = jnp.max(jnp.sum(jnp.abs(k), axis=0))
    norminf = jnp.max(jnp.sum(jnp.abs(k), axis=1))
    x0 = (k.T / (norm1 * norminf)).astype(jnp.float32)
    x = _ns_scan(k.astype(jnp.float32), x0, f32_iters).astype(k.dtype)
    x = _ns_scan(k, x, f64_iters)
    return 0.5 * (x + x.T)


def _direct_inverse(k):
    chol = jnp.linalg.cholesky(k)
    kinv = jax.scipy.linalg.cho_solve((chol, True), jnp.eye(k.shape[0], dtype=k.dtype))
    return 0.5 * (kinv + kinv.T)


@jax.custom_jvp
def psd_inverse(k):
    """Inverse of a symmetric positive-definite matrix, backend-adaptive."""
    if jax.default_backend() == "tpu":
        return _newton_schulz_inverse(k)
    return _direct_inverse(k)


@psd_inverse.defjvp
def _psd_inverse_jvp(primals, tangents):
    (k,), (dk,) = primals, tangents
    kinv = psd_inverse(k)
    return kinv, -kinv @ dk @ kinv


def refine_solve(kinv, k, y, iters: int = 5):
    """Iterative refinement of x = K^-1 y given an approximate inverse:
    x += X (y - K x).  f64 O(N^2) per step; error shrinks by ||I - K X||."""
    x = kinv @ y
    for _ in range(iters):
        x = x + kinv @ (y - k @ x)
    return x
