"""Pallas kernel correctness in interpreter mode (CPU) vs the jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gple_tpu.ops import kernels as RK
from gple_tpu.ops.pallas_gram import gram_pallas, predict_mean_pallas


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x_train = jnp.asarray(rng.normal(size=(200, 2)))
    x_test = jnp.asarray(rng.normal(size=(300, 2)))
    lengths = jnp.asarray([0.8, 1.7])
    alpha = jnp.asarray(rng.normal(size=200))
    return x_train, x_test, lengths, alpha


def test_gram_pallas_matches_jnp(data):
    x_train, x_test, lengths, _ = data
    ref = np.asarray(RK.gram(lengths, x_test, x_train))
    out = np.asarray(gram_pallas(lengths, x_test, x_train, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-6)


def test_gram_pallas_unpadded_shape(data):
    x_train, _, lengths, _ = data
    out = gram_pallas(lengths, x_train, x_train, interpret=True)
    assert out.shape == (200, 200)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(out)), 1.0, atol=1e-6)


def test_predict_mean_pallas_matches_jnp(data):
    x_train, x_test, lengths, alpha = data
    mag = jnp.asarray(1.3)
    params = RK.KernelParams(magnitude=mag, lengths=lengths, noise=jnp.asarray(0.01))
    ref = np.asarray(RK.kernel_matrix(params, x_test, x_train, same=False) @ alpha)
    out = np.asarray(
        predict_mean_pallas(lengths, mag, x_test, x_train, alpha, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max())
