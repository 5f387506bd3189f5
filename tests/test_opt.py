"""Tests for the constrained hyperparameter optimizer (reference opt.cpp).

Scenario mirrors the reference's initial optimization: Metropolis-sample the
initial Gaussian, optimize kernel hyperparameters under the conservation
constraints, and verify the analytic GP integrals reproduce population = 1,
the initial energy, and purity = 1 within the 5% tolerance (the reference's
``check_averages`` acceptance rule).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gple_tpu.gp.opt import AVERAGE_TOLERANCE, Optimizer
from gple_tpu.models import tully
from gple_tpu.observables import total_energy_each_surface
from gple_tpu.ops import kernels as RK
from gple_tpu.sampler import mc
from gple_tpu.storage import Density, fit_gp_states

MODEL = "DAC"
MASS = 2000.0
R0 = np.array([-10.0, 30.0])
SIGMA = np.array([1.0 / 3.0, 1.5])  # sigma_x = hbar/(2 sigma_p) with sigma_p = 1.5


def sampled_density(n=64, seed=0):
    def dist(params, pts):
        return mc.initial_distribution(params[0], params[1], pts, 0, 0, (1.0, 0.0), (0.0, 0.0))

    key = jax.random.PRNGKey(seed)
    pts0 = jnp.asarray(R0)[None, :] + jax.random.normal(key, (n, 2)) * jnp.asarray(SIGMA)
    pts, rho, _ = mc.element_monte_carlo(
        jax.random.PRNGKey(seed + 1), dist, (jnp.asarray(R0), jnp.asarray(SIGMA)),
        pts0, mc.MCParameters(), tune=True,
    )
    points = jnp.stack([pts, pts, pts])
    rho_all = jnp.stack([rho, jnp.zeros_like(rho), jnp.zeros_like(rho)])  # RI
    density = Density(points=points, rho=rho_all,
                      active=jnp.asarray([True, False, False]))
    ek, _ = jax.random.split(key)
    epts, erho = mc.generate_extra_points_element(
        ek, pts, 5 * n, dist, (jnp.asarray(R0), jnp.asarray(SIGMA))
    )
    extra = Density(
        points=jnp.stack([epts] * 3),
        rho=jnp.stack([erho, jnp.zeros_like(erho), jnp.zeros_like(erho)]),
        active=density.active,
    )
    return density, extra


@pytest.fixture(scope="module")
def opt_run():
    density, extra = sampled_density()
    energies = total_energy_each_surface(MODEL, density, MASS)
    total_energy = float(energies[0])
    optimizer = Optimizer(
        model=MODEL, mass=MASS, total_energy=total_energy, purity=1.0,
        sigma_r0=SIGMA, lbfgs_steps=40, opt_mode="ladder",
    )
    result = optimizer.optimize(density, extra, energies)
    return optimizer, result, density, energies, total_energy


def test_constraints_satisfied(opt_run):
    optimizer, result, density, energies, e0 = opt_run
    diag_params, off_params = optimizer.fitted_params()
    states = fit_gp_states(diag_params, off_params, density)
    pop = float(states.population())
    energy = float(states.total_energy(jnp.asarray(energies)))
    purity = float(states.purity())
    assert pop == pytest.approx(1.0, rel=AVERAGE_TOLERANCE)
    assert energy == pytest.approx(e0, rel=AVERAGE_TOLERANCE)
    assert purity == pytest.approx(1.0, rel=3 * AVERAGE_TOLERANCE)


def test_bounds_respected(opt_run):
    optimizer, result, density, _, _ = opt_run
    lb, ub = Optimizer.length_bounds(np.asarray(density.points[0]))
    assert np.all(optimizer.diag_lengths[0] >= lb - 1e-9)
    assert np.all(optimizer.diag_lengths[0] <= ub + 1e-9)


def test_fit_quality(opt_run):
    """The optimized GP must reproduce the sampled Gaussian accurately."""
    optimizer, result, density, _, _ = opt_run
    diag_params, off_params = optimizer.fitted_params()
    states = fit_gp_states(diag_params, off_params, density)
    state0 = jax.tree.map(lambda a: a[0], states.diag)
    mean, _, _ = RK.predict_real(state0, density.points[0])
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(density.rho[0][:, 0]),
        atol=2e-3 * float(jnp.max(density.rho[0][:, 0])),
    )


def test_magnitudes_analytic(opt_run):
    optimizer, _, _, _, _ = opt_run
    assert optimizer.diag_magnitudes[0] > 0
    # inactive element keeps magnitude 1
    assert optimizer.diag_magnitudes[1] == 1.0
    assert optimizer.off_magnitude == 1.0


def test_result_metadata(opt_run):
    _, result, _, _, _ = opt_run
    assert result.opt_type in ("local_previous", "local_initial", "global")
    assert np.isfinite(result.error)


# -- moment-based mode (opt_mode="moment", the measured-accuracy default) ----------


@pytest.fixture(scope="module")
def moment_run():
    density, extra = sampled_density()
    energies = total_energy_each_surface(MODEL, density, MASS)
    optimizer = Optimizer(
        model=MODEL, mass=MASS, total_energy=float(energies[0]), purity=1.0,
        sigma_r0=SIGMA, opt_mode="moment",
    )
    result = optimizer.optimize(density, extra, energies)
    return optimizer, result, density


def test_moment_fit_quality(moment_run):
    """Moment-based params must fit the sampled Gaussian on its points."""
    optimizer, result, density = moment_run
    diag_params, off_params = optimizer.fitted_params()
    states = fit_gp_states(diag_params, off_params, density)
    state0 = jax.tree.map(lambda a: a[0], states.diag)
    mean, _, _ = RK.predict_real(state0, density.points[0])
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(density.rho[0][:, 0]),
        atol=2e-3 * float(jnp.max(density.rho[0][:, 0])),
    )


def test_moment_lengths_track_cloud(moment_run):
    """Lengths = |label|-weighted cloud std / 2 on the active element."""
    optimizer, _, density = moment_run
    lens = Optimizer._weighted_std(
        np.asarray(density.points[0]), np.asarray(density.rho[0][:, 0])
    ) / 2.0
    np.testing.assert_allclose(optimizer.diag_lengths[0], lens, rtol=1e-12)
    # inactive diagonal element keeps its previous (initial) lengths
    np.testing.assert_allclose(optimizer.diag_lengths[1], SIGMA, rtol=1e-12)


def test_moment_metadata(moment_run):
    optimizer, result, _ = moment_run
    assert result.opt_type == "moment"
    assert np.isfinite(result.error)
    # corr = 0: Re/Im treated independently
    assert optimizer.off_params[-1] == 0.0
    assert optimizer.diag_magnitudes[0] > 0
    assert optimizer.diag_magnitudes[1] == 1.0


def test_moment_kernel_params_jittable(moment_run):
    """The per-tick tracking path (driver._tick_fused track_moments=True)
    recomputes the same moment lengths as the host-side optimizer, under
    jit, and inactive elements keep the previous parameters."""
    from gple_tpu.gp.opt import moment_kernel_params

    optimizer, _, density = moment_run
    prev_diag, prev_off = optimizer.fitted_params()
    diag, off = jax.jit(moment_kernel_params)(density, prev_diag, prev_off)
    np.testing.assert_allclose(
        np.asarray(diag.lengths[0]), optimizer.diag_lengths[0], rtol=1e-12
    )
    # inactive diagonal + off-diagonal elements carry the previous params
    np.testing.assert_allclose(np.asarray(diag.lengths[1]), SIGMA, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(off.real_lengths), np.asarray(prev_off.real_lengths)
    )
    np.testing.assert_allclose(np.asarray(diag.magnitude),
                               optimizer.diag_magnitudes)


def test_halton_global_sweep():
    """The global stage is a deterministic low-discrepancy sweep (reference
    DIRECT_L role, opt.cpp:1349-1383): points stratify the box, the winner is
    reproducible, and on a real fit problem it beats both bounds endpoints."""
    from gple_tpu.gp.opt import _diag_loss, _global_candidates, _halton

    h = _halton(64, 4)
    assert h.shape == (64, 4)
    assert (h > 0).all() and (h < 1).all()
    for j in range(4):  # every axis hits both halves early
        assert (h[:16, j] < 0.5).any() and (h[:16, j] >= 0.5).any()

    density, extra = sampled_density()
    energies = total_energy_each_surface(MODEL, density, MASS)
    optimizer = Optimizer(model=MODEL, mass=MASS, total_energy=float(energies[0]),
                          purity=1.0, sigma_r0=SIGMA)
    data, _ = optimizer._pack_data(density, extra, energies)
    best = _global_candidates(data)
    l_best = float(_diag_loss(jnp.asarray(best), data))
    assert l_best <= float(_diag_loss(data["dlb"], data))
    assert l_best <= float(_diag_loss(data["dub"], data))
    np.testing.assert_array_equal(np.asarray(best),
                                  np.asarray(_global_candidates(data)))


def test_halton_global_sweep_off_diagonal():
    """The global stage searches the complex kernel's OWN parameter box
    (reference opt.cpp:372-384 searches every element's bounds), not a
    heuristic seeded from the diagonal winner."""
    from gple_tpu.gp.opt import _global_candidates_off, _off_loss

    density, extra = sampled_density()
    # activate the off-diagonal element with a quadrature coherence
    rho = np.array(density.rho)
    x = np.asarray(density.points[1])
    g = np.exp(-np.sum((x - R0) ** 2 / (2 * SIGMA**2), axis=1))
    rho[1] = 0.5 * np.stack([g * np.cos(x[:, 0]), g * np.sin(x[:, 0])], axis=-1)
    density = Density(points=density.points, rho=jnp.asarray(rho),
                      active=jnp.asarray([True, True, True]))
    extra = Density(points=extra.points, rho=extra.rho, active=density.active)
    energies = total_energy_each_surface(MODEL, density, MASS)
    optimizer = Optimizer(model=MODEL, mass=MASS, total_energy=float(energies[0]),
                          purity=1.0, sigma_r0=SIGMA)
    data, off_active = optimizer._pack_data(density, extra, energies)
    assert off_active
    best = np.asarray(_global_candidates_off(data))
    olb, oub = np.asarray(data["olb"]), np.asarray(data["oub"])
    assert best.shape == olb.shape
    assert (best >= olb - 1e-12).all() and (best <= oub + 1e-12).all()
    l_best = float(_off_loss(jnp.asarray(best), data))
    mid = np.sqrt(np.maximum(olb, 1e-30) * np.maximum(oub, 1e-30))
    mid[-1] = 0.5 * (olb[-1] + oub[-1])
    assert l_best <= float(_off_loss(jnp.asarray(mid), data))
    np.testing.assert_array_equal(best, np.asarray(_global_candidates_off(data)))
