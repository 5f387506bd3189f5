"""TPU-friendly positive-definite linear algebra.

XLA:TPU lowers ``cho_solve`` / ``triangular_solve`` to blocked sequential
loops whose compile time grows super-linearly with N on the axon toolchain
(empirically: the full fit+evolve step compiles in minutes at N = 256 but
effectively hangs at N >= 512, while plain ``cholesky`` compiles fast).  The
hot path therefore inverts SPD matrices with a fixed-iteration Newton-Schulz
scheme -- nothing but matmuls, which the MXU executes natively and the
compiler handles in seconds:

    X_{k+1} = X_k (2 I - K X_k),    X_0 = K^T / (||K||_1 ||K||_inf)

Quadratic convergence once ||I - K X|| < 1; with the GP kernel's pinned noise
(K = sigma^2 (G + 1e-4 I), cond <= ~1e4 N) a fixed 64 iterations reaches
f64 round-off.  The backward pass uses the exact identity
d(K^-1) = -K^-1 dK K^-1 instead of differentiating the iteration.

On CPU backends the direct Cholesky inverse is used (faster, exactly matching
the reference's LDLT solve, kernel.cpp:281-283); both paths agree to 1e-10
(tested), so tests on CPU validate the physics of the TPU path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: fixed Newton-Schulz iteration count: ceil(log2(cond ~ 1e7)) + safety
NS_ITERS = 64


def _newton_schulz_inverse(k, iters: int = NS_ITERS):
    norm1 = jnp.max(jnp.sum(jnp.abs(k), axis=0))
    norminf = jnp.max(jnp.sum(jnp.abs(k), axis=1))
    x = k.T / (norm1 * norminf)
    eye2 = 2.0 * jnp.eye(k.shape[0], dtype=k.dtype)

    def body(x, _):
        return x @ (eye2 - k @ x), None

    x, _ = jax.lax.scan(body, x, None, length=iters)
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
