"""Tests for the real GP kernel (reference kernel.cpp parity).

Analytic integrals are validated against numerical quadrature; the LOOCV
formula against brute-force leave-one-out refits; autodiff replaces the
reference's hand-derived gradients and is checked against finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gple_tpu.ops import kernels as K


def make_dataset(n=48, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 2)) * np.array([1.0, 2.0])
    y = np.exp(-0.5 * (x[:, 0] ** 2 + (x[:, 1] / 2.0) ** 2)) * 0.3
    return jnp.asarray(x), jnp.asarray(y)


def default_params(mag=1.0, lx=1.0, lp=2.0, noise=0.01):
    return K.KernelParams(
        magnitude=jnp.asarray(mag), lengths=jnp.asarray([lx, lp]), noise=jnp.asarray(noise)
    )


def test_gram_matches_naive():
    x, _ = make_dataset(16)
    lengths = jnp.asarray([0.7, 1.3])
    g = np.asarray(K.gram(lengths, x, x))
    xn = np.asarray(x)
    for i in range(16):
        for j in range(16):
            d = (xn[i] - xn[j]) / np.asarray(lengths)
            assert g[i, j] == pytest.approx(np.exp(-0.5 * np.dot(d, d)), rel=1e-12)
    np.testing.assert_allclose(np.diag(g), 1.0)


def test_fit_and_interpolation():
    x, y = make_dataset()
    st = K.fit_real(default_params(), x, y)
    # rescale maps max |label| to 10
    assert float(jnp.max(jnp.abs(st.labels))) == pytest.approx(10.0, rel=1e-12)
    mean, var, cut = K.predict_real(st, x)
    # with small noise the GP nearly interpolates the training labels
    np.testing.assert_allclose(np.asarray(mean), np.asarray(y), atol=2e-3 * float(jnp.max(y)))
    assert np.all(np.asarray(var) >= -1e-10)


def test_loocv_against_bruteforce():
    x, y = make_dataset(24)
    p = default_params()
    st = K.fit_real(p, x, y)
    err = float(K.loocv_error(st))
    # brute force: refit without point i, predict at x_i (classic LOOCV identity)
    total = 0.0
    y_scaled = np.asarray(st.labels)
    for i in range(24):
        keep = np.arange(24) != i
        ki = K.kernel_matrix(p, x[keep], x[keep], same=True)
        kstar = K.kernel_matrix(p, x[i : i + 1], x[keep], same=False)
        pred = np.asarray(kstar @ jnp.linalg.solve(ki, st.labels[keep]))[0]
        total += (pred - y_scaled[i]) ** 2
    assert err == pytest.approx(total, rel=1e-8)


def quad_grid(lim=8.0, n=401):
    xs = np.linspace(-lim, lim, n)
    ps = np.linspace(-2 * lim, 2 * lim, 2 * n - 1)
    gx, gp = np.meshgrid(xs, ps, indexing="ij")
    pts = jnp.asarray(np.stack([gx.ravel(), gp.ravel()], axis=-1))
    da = (xs[1] - xs[0]) * (ps[1] - ps[0])
    return pts, da


def test_analytic_population_and_r_average_vs_quadrature():
    x, y = make_dataset(32)
    st = K.fit_real(default_params(), x, y)
    pts, da = quad_grid()
    mean, _, _ = K.predict_real(st, pts, with_variance=False)
    f = np.asarray(mean)
    pop_quad = f.sum() * da
    assert float(K.population(st)) == pytest.approx(pop_quad, rel=1e-6)
    r_quad = (np.asarray(pts) * f[:, None]).sum(axis=0) * da
    np.testing.assert_allclose(np.asarray(K.r_average(st)), r_quad, rtol=1e-5)


def test_analytic_purity_vs_quadrature():
    x, y = make_dataset(32)
    st = K.fit_real(default_params(), x, y)
    pts, da = quad_grid()
    mean, _, _ = K.predict_real(st, pts, with_variance=False)
    f = np.asarray(mean)
    purity_quad = (2 * np.pi) * (f ** 2).sum() * da  # (2 pi hbar)^Dim, Dim=1
    assert float(K.purity(st)) == pytest.approx(purity_quad, rel=1e-6)


def test_cutoff_factor_shape():
    pred = jnp.asarray([10.0, 0.5, 1.5, -10.0, 0.0])
    var = jnp.ones(5)
    c = np.asarray(K.cutoff_factor(pred, var))
    assert c[0] == 1.0 and c[3] == 1.0        # |pred| >= 2 sigma
    assert c[1] == 0.0 and c[4] == 0.0        # |pred| <= sigma
    assert 0.0 < c[2] < 1.0                   # smooth in between
    # continuity at the knots
    eps = 1e-9
    assert float(K.cutoff_factor(jnp.asarray([1.0 + eps]), jnp.asarray([1.0]))[0]) < 1e-6
    assert float(K.cutoff_factor(jnp.asarray([2.0 - eps]), jnp.asarray([1.0]))[0]) > 1 - 1e-6


def test_loss_gradients_match_finite_differences():
    x, y = make_dataset(24)

    def loss(flat):
        st = K.fit_real(K.KernelParams.from_flat(flat), x, y)
        return K.loocv_error(st)

    flat0 = default_params().to_flat()
    g = np.asarray(jax.grad(loss)(flat0))
    for i in range(flat0.shape[0]):
        h = 1e-6
        e = np.zeros_like(flat0).at[i].set(h) if hasattr(np, "at") else None
        dv = np.zeros(flat0.shape[0]); dv[i] = h
        num = (float(loss(flat0 + dv)) - float(loss(flat0 - dv))) / (2 * h)
        assert g[i] == pytest.approx(num, rel=2e-4, abs=1e-8)


def test_optimal_magnitude_improves_likelihood_scale():
    x, y = make_dataset(32)
    st = K.fit_real(default_params(mag=1.0), x, y)
    m = float(K.optimal_magnitude(st))
    assert m > 0
    # refit with the optimal magnitude: population should be invariant to
    # magnitude scaling of BOTH kernel and alpha only if consistent; here we
    # just check it produces a sane positive value
    st2 = K.fit_real(default_params(mag=m), x, y)
    assert float(K.population(st2)) == pytest.approx(float(K.population(st)), rel=0.5)


def test_extra_set_error_zero_on_training_points():
    x, y = make_dataset(24)
    st = K.fit_real(default_params(noise=1e-6), x, y)
    err = float(K.extra_set_error(st, x, y))
    assert err < 1e-10 * float(jnp.sum(st.labels ** 2))


def test_vmap_over_elements():
    """The fit/predict path must vmap over stacked density-matrix elements."""
    x0, y0 = make_dataset(20, seed=1)
    x1, y1 = make_dataset(20, seed=2)
    xs = jnp.stack([x0, x1])
    ys = jnp.stack([y0, y1])
    params = jax.tree.map(
        lambda *a: jnp.stack(a), default_params(), default_params(lx=0.8)
    )
    states = jax.vmap(K.fit_real)(params, xs, ys)
    pops = jax.vmap(K.population)(states)
    assert pops.shape == (2,)
    s0 = K.fit_real(default_params(), x0, y0)
    assert float(pops[0]) == pytest.approx(float(K.population(s0)), rel=1e-12)
