"""TPU linear algebra: exact matmul-only inversion and refined solves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gple_tpu.ops.linalg import (
    _chol_matmul_inverse,
    _direct_inverse,
    _newton_schulz_inverse,
    refine_solve,
    triangular_inverse_lower,
)


def gram_like(n, length=0.5, noise=1e-2, seed=0):
    """A GP kernel matrix as produced by the framework (pinned noise 1e-2)."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 2))
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return jnp.asarray(np.exp(-0.5 * d2 / length**2) + noise**2 * np.eye(n))


def test_triangular_inverse_exact():
    rng = np.random.default_rng(1)
    for n in (32, 200, 513):
        low = np.tril(rng.normal(size=(n, n)) * 0.3) + np.diag(1.0 + rng.uniform(size=n))
        linv = np.asarray(triangular_inverse_lower(jnp.asarray(low)))
        np.testing.assert_allclose(linv @ low, np.eye(n), atol=1e-8)


@pytest.mark.parametrize("n,length", [(64, 0.5), (256, 0.3), (256, 2.0), (512, 4.0)])
def test_chol_matmul_inverse_matches_direct(n, length):
    """The TPU production inverse agrees with the direct Cholesky inverse
    across the full conditioning range of framework kernels (up to ~1e7)."""
    k = gram_like(n, length)
    cond = float(np.linalg.cond(np.asarray(k)))
    x = np.asarray(_chol_matmul_inverse(k))
    res = np.abs(np.asarray(k) @ x - np.eye(n)).max()
    assert res < max(cond * 1e-12, 2e-8), (cond, res)
    # symmetric
    np.testing.assert_allclose(x, x.T, atol=1e-12 * np.abs(x).max())


def test_chol_matmul_inverse_batched():
    kb = jnp.stack([gram_like(128, 0.5, seed=1), gram_like(128, 1.0, seed=2)])
    xb = np.asarray(_chol_matmul_inverse(kb))
    for i in range(2):
        res = np.abs(np.asarray(kb[i]) @ xb[i] - np.eye(128)).max()
        assert res < 1e-6


def test_refined_solve_accuracy():
    """alpha via the production inverse + refinement matches the direct solve."""
    k = gram_like(256, 2.0, seed=1)  # cond ~2e6
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.normal(size=256))
    a = np.asarray(refine_solve(_chol_matmul_inverse(k), k, y, iters=3))
    a_direct = np.asarray(_direct_inverse(k) @ y)
    denom = np.abs(a_direct).max()
    assert np.abs(a - a_direct).max() / denom < 1e-9


def test_newton_schulz_fallback_moderate_cond():
    """The NS reference path still works at moderate conditioning."""
    k = gram_like(128, 0.4)  # cond ~1e4-1e5
    x = np.asarray(_newton_schulz_inverse(k))
    res = np.abs(np.asarray(k) @ x - np.eye(128)).max()
    assert res < 1e-5


def test_custom_jvp_exact():
    """d(K^-1) = -K^-1 dK K^-1 through the custom rule."""
    from gple_tpu.ops.linalg import psd_inverse

    k = gram_like(32, 0.7)
    dk = jnp.asarray(np.random.default_rng(3).normal(size=(32, 32)))
    dk = 0.5 * (dk + dk.T) * 1e-3
    _, jvp = jax.jvp(psd_inverse, (k,), (dk,))
    kinv = np.asarray(psd_inverse(k))
    expect = -kinv @ np.asarray(dk) @ kinv
    np.testing.assert_allclose(np.asarray(jvp), expect, atol=1e-10)
