"""Tests for the Metropolis sampler (reference mc.cpp parity)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gple_tpu.sampler import mc
from gple_tpu.utils import ri


R0 = jnp.asarray([-10.0, 30.0])
SIGMA = jnp.asarray([1.0 / 3.0, 1.5])


def gauss_dist(params, pts):
    r0, sig = params
    return mc.initial_distribution(r0, sig, pts, 0, 0, (1.0, 0.0), (0.0, 0.0))


def test_initial_distribution_values():
    pts = R0[None, :]
    v = np.asarray(gauss_dist((R0, SIGMA), pts))[0]  # RI (2,)
    expect = 1.0 / (2 * math.pi * float(SIGMA[0]) * float(SIGMA[1]))
    assert v[0] == pytest.approx(expect, rel=1e-12)
    assert v[1] == 0.0
    # off-diagonal of a pure ground state is zero
    z = mc.initial_distribution(R0, SIGMA, pts, 1, 0, (1.0, 0.0), (0.0, 0.0))
    assert np.all(np.asarray(z)[0] == 0.0)
    # phase factors produce a complex phase
    z2 = mc.initial_distribution(R0, SIGMA, pts, 1, 0, (1.0, 1.0), (0.5, 0.0))
    assert abs(np.asarray(z2)[0, 1]) > 0


def test_markov_chain_samples_target_moments():
    """After tuning + a long walk, the walker cloud matches the Gaussian."""
    key = jax.random.PRNGKey(0)
    n = 512
    pts = jnp.tile(R0[None, :], (n, 1))
    params = mc.MCParameters()
    final, rho, params = mc.element_monte_carlo(
        key, gauss_dist, (R0, SIGMA), pts, params, tune=True
    )
    assert params.displacement in mc.POSSIBLE_DISPLACEMENTS
    assert params.num_steps >= 1
    # walk longer for clean statistics
    final, _, _ = mc.markov_chain(
        jax.random.PRNGKey(1), gauss_dist, (R0, SIGMA), 2048, final, False,
        params.displacement,
    )
    f = np.asarray(final)
    # |N(0,sigma)| samples: mean ~ r0, std ~ sigma (Metropolis on |rho|)
    norm_err = np.abs(f.mean(axis=0) - np.asarray(R0)) / np.asarray(SIGMA)
    assert np.all(norm_err < 0.15), norm_err
    np.testing.assert_allclose(f.std(axis=0), np.asarray(SIGMA), rtol=0.15)


def test_markov_chain_acceptance_window_after_tuning():
    key = jax.random.PRNGKey(2)
    n = 256
    pts = jnp.tile(R0[None, :], (n, 1))
    d = mc.tune_displacement(key, gauss_dist, (R0, SIGMA), pts)
    _, accepts, _ = mc.markov_chain(
        jax.random.PRNGKey(3), gauss_dist, (R0, SIGMA), 1000, pts, False, d
    )
    acc = float(jnp.mean(accepts))
    assert mc.MIN_ACCEPT_RATIO < acc < mc.MAX_ACCEPT_RATIO


def test_extra_points_jitter():
    key = jax.random.PRNGKey(4)
    n = 64
    pts = R0[None, :] + jax.random.normal(key, (n, 2)) * SIGMA[None, :]
    new_pts, new_rho = mc.generate_extra_points_element(
        jax.random.PRNGKey(5), pts, 5 * n, gauss_dist, (R0, SIGMA)
    )
    assert new_pts.shape == (5 * n, 2)
    assert new_rho.shape == (5 * n, 2)
    # jittered cloud stays centered on r0 but is wider
    norm_err = np.abs(np.asarray(new_pts).mean(axis=0) - np.asarray(R0)) / np.asarray(SIGMA)
    assert np.all(norm_err < 1.0), norm_err
    assert np.all(np.asarray(new_pts).std(axis=0) > np.asarray(pts).std(axis=0))


def test_seed_new_element_picks_high_density():
    key = jax.random.PRNGKey(6)
    # candidates: half near r0 (high density), half far away (zero density)
    near = R0[None, :] + jax.random.normal(key, (64, 2)) * SIGMA[None, :]
    far = R0[None, :] + 100.0 + jnp.zeros((64, 2))
    cands = jnp.concatenate([near, far])
    pts, rho, _ = mc.seed_new_element(
        jax.random.PRNGKey(7), cands, 32, gauss_dist, (R0, SIGMA), mc.MCParameters()
    )
    assert pts.shape == (32, 2)
    # all selected points carry non-negligible density
    assert np.all(np.asarray(ri.absval(rho)) > 0)
    assert np.all(np.abs(np.asarray(pts)[:, 0] - float(R0[0])) < 5)


def test_round_up_pow2():
    assert mc._round_up_pow2(1) == 1
    assert mc._round_up_pow2(2) == 2
    assert mc._round_up_pow2(3) == 4
    assert mc._round_up_pow2(1000) == 1024


def test_auto_retune_probe():
    """tune="auto" skips the full sweeps when the stored displacement is
    still in-window and re-tunes when it is badly off."""
    key = jax.random.PRNGKey(3)
    pts = R0[None, :] + jax.random.normal(key, (64, 2)) * SIGMA[None, :]
    # first: tune fully to get a valid displacement
    p0 = mc.MCParameters()
    _, _, tuned = mc.element_monte_carlo(
        jax.random.PRNGKey(4), gauss_dist, (R0, SIGMA), pts, p0, tune=True
    )
    good_disp = tuned.displacement
    # auto with the good displacement: no retune (displacement unchanged)
    _, _, p_auto = mc.element_monte_carlo(
        jax.random.PRNGKey(5), gauss_dist, (R0, SIGMA), pts, tuned, tune="auto"
    )
    assert p_auto.displacement == good_disp
    # auto with an absurd displacement (acceptance ~ 0): full retune fires
    bad = mc.MCParameters(num_steps=tuned.num_steps, displacement=1e4)
    _, _, p_fixed = mc.element_monte_carlo(
        jax.random.PRNGKey(6), gauss_dist, (R0, SIGMA), pts, bad, tune="auto"
    )
    assert p_fixed.displacement != 1e4
