"""Newton-Schulz PSD inverse: accuracy on representative GP Gram matrices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gple_tpu.ops.linalg import _direct_inverse, _newton_schulz_inverse


def gram_like(n, length=0.5, noise=1e-2, seed=0):
    """A GP kernel matrix as produced by the framework (pinned noise 1e-2)."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 2))
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return jnp.asarray(np.exp(-0.5 * d2 / length**2) + noise**2 * np.eye(n))


@pytest.mark.parametrize("n,length", [(64, 0.5), (256, 0.3), (256, 2.0)])
def test_newton_schulz_matches_direct(n, length):
    k = gram_like(n, length)
    cond = float(np.linalg.cond(np.asarray(k)))
    ns = np.asarray(_newton_schulz_inverse(k, 60, 3))
    direct = np.asarray(_direct_inverse(k))
    # residual ||K X - I|| is the meaningful metric; NS plateaus at ~cond*eps
    res_ns = np.abs(np.asarray(k) @ ns - np.eye(n)).max()
    res_direct = np.abs(np.asarray(k) @ direct - np.eye(n)).max()
    assert res_ns < cond * 1e-12, (cond, res_ns, res_direct)


def test_newton_schulz_solve_accuracy():
    """alpha = K^-1 y via NS matches the direct solve to fit-relevant accuracy."""
    k = gram_like(256, 0.3, seed=1)
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.normal(size=256))
    from gple_tpu.ops.linalg import refine_solve

    kinv_ns = _newton_schulz_inverse(k)  # default config (1 f64 polish)
    a_ns = np.asarray(refine_solve(kinv_ns, k, y))
    a_direct = np.asarray(_direct_inverse(k) @ y)
    denom = np.abs(a_direct).max()
    assert np.abs(a_ns - a_direct).max() / denom < 1e-8


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
