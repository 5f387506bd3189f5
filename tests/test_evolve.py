"""Tests for the backward-branching evolver (reference evolve.cpp parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gple_tpu.dynamics import evolve as EV
from gple_tpu.models import tully
from gple_tpu.sampler import mc
from gple_tpu.storage import Density
from gple_tpu.utils import ri

MASS = 2000.0
R0 = jnp.asarray([-10.0, 30.0])
SIGMA = jnp.asarray([0.5, 1.0])


def ground_state_dist(params, pts):
    """(3, M, 2) -> (3, M, 2) RI: pure ground-state Gaussian (rho00 only)."""
    r0, sig = params
    rho00 = mc.initial_distribution(r0, sig, pts[0], 0, 0, (1.0, 0.0), (0.0, 0.0))
    zeros = jnp.zeros_like(rho00)
    return jnp.stack([rho00, zeros, zeros])


def make_density(key, n=64):
    pts0 = R0[None, :] + jax.random.normal(key, (n, 2)) * SIGMA[None, :]
    pts = jnp.stack([pts0, pts0, pts0])
    rho = ground_state_dist((R0, SIGMA), pts)
    return Density(points=pts, rho=rho, active=jnp.asarray([True, False, False]))


def test_leapfrog_roundtrip_and_energy():
    x = jnp.linspace(-12.0, -8.0, 32)
    p = jnp.full_like(x, 30.0)
    dt = 1.0
    xf, pf = EV.adiabatic_leapfrog("SAC", x, p, MASS, dt, +1, 0, 0)
    xb, pb = EV.adiabatic_leapfrog("SAC", xf, pf, MASS, dt, -1, 0, 0)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(p), atol=1e-12)
    # energy drift of the symplectic step is tiny over one step
    def energy(x, p, s):
        return p**2 / (2 * MASS) + tully.adiabatic_potential("SAC", x)[..., s]
    e0 = np.asarray(energy(x, p, 0))
    e1 = np.asarray(energy(xf, pf, 0))
    np.testing.assert_allclose(e1, e0, rtol=1e-6)


def test_is_coupling_always_true_with_zero_criterion():
    x = jnp.linspace(-20.0, 20.0, 64)
    p = jnp.full_like(x, 10.0)
    c = EV.is_coupling("SAC", x, p, MASS, 1.0, 0.0)
    assert bool(jnp.all(c))


def test_rotation_preserves_trace_and_purity():
    key = jax.random.PRNGKey(0)
    m = 32
    x = jnp.zeros(m)  # strong coupling region
    p = jnp.full(m, 25.0)
    r00 = ri.ri(jax.random.uniform(key, (m,)))
    r10 = 0.1 * jnp.stack(
        [jax.random.normal(key, (m,)), jax.random.normal(jax.random.PRNGKey(1), (m,))],
        axis=-1,
    )
    r11 = ri.ri(1.0) - r00
    rho3 = jnp.stack([r00, r10, r11])
    out = EV._offdiagonal_rotation("SAC", rho3, x, p, MASS, 0.5, 0.0)
    # trace is invariant under the rotation
    np.testing.assert_allclose(
        np.asarray(out[0] + out[2]), np.asarray(rho3[0] + rho3[2]), atol=1e-12
    )
    # zero-angle limit: rotation at p = 0 is identity on the real part
    out0 = EV._offdiagonal_rotation("SAC", rho3, x, jnp.zeros(m), MASS, 0.5, 0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(rho3), atol=1e-12)


def test_omega0_antisymmetric_and_zero_diagonal():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    assert np.all(np.asarray(EV.omega0("DAC", x, x, 0, 0)) == 0)
    w01 = np.asarray(EV.omega0("DAC", x, x, 0, 1))
    w10 = np.asarray(EV.omega0("DAC", x, x, 1, 0))
    np.testing.assert_allclose(w01, -w10, atol=1e-14)
    # omega0(x, x, 0, 1) = (E0 - E1) / hbar < 0
    assert np.all(w01 < 0)


def test_evolve_step_far_from_coupling_transports_density():
    """Far from the crossing the branching scheme must reduce to classical
    transport: rho_new(r_new) = rho_old(trajectory back), i.e. the Gaussian
    evaluated at (approximately) the original coordinate."""
    key = jax.random.PRNGKey(2)
    density = make_density(key)
    dt = 1.0
    new = EV.evolve_step("SAC", MASS, dt, density, ground_state_dist, (R0, SIGMA))
    # each point moved forward by ~ its own (p/m) dt
    shift = np.asarray(new.points[0][:, 0] - density.points[0][:, 0])
    expect_shift = np.asarray(density.points[0][:, 1]) / MASS * dt
    np.testing.assert_allclose(shift, expect_shift, rtol=1e-2)
    # transported density equals the distribution at the back-evolved point
    expect = np.asarray(
        ground_state_dist((R0, SIGMA), density.points)[0]
    )
    got = np.asarray(new.rho[0])
    np.testing.assert_allclose(got[..., 0], expect[..., 0], rtol=1e-4)
    # off-diagonal / upper elements remain ~0
    assert np.abs(np.asarray(new.rho[1])).max() < 1e-10
    assert np.abs(np.asarray(new.rho[2])).max() < 1e-10


def test_evolve_step_conserves_total_density_in_coupling_region():
    """In the coupling region the scheme exchanges population between the
    triangular components but rho00 + rho11 at a common phase-space point is
    conserved by the rotations (trace preservation of the recombination)."""
    key = jax.random.PRNGKey(3)
    n = 64
    pts0 = jnp.stack([
        jax.random.normal(key, (n,)) * 0.5,            # x near 0: strong NAC
        25.0 + jax.random.normal(key, (n,)) * 1.0,
    ], axis=-1)
    pts = jnp.stack([pts0, pts0, pts0])

    def dist(params, q):
        # smooth test distribution: equal diagonal, zero coherence
        g = jnp.exp(-0.5 * jnp.sum(((q - params[0]) / params[1]) ** 2, axis=-1))
        return jnp.stack([ri.ri(g[0]), jnp.zeros(g[1].shape + (2,)), ri.ri(g[2])])

    center = jnp.asarray([0.0, 25.0])
    width = jnp.asarray([2.0, 3.0])
    rho = dist((center, width), pts)
    density = Density(points=pts, rho=rho, active=jnp.asarray([True, True, True]))
    new = EV.evolve_step("SAC", MASS, 1.0, density, dist, (center, width))
    assert np.all(np.isfinite(np.asarray(new.rho)))
    # diagonal components remain real to machine precision for real input
    assert np.abs(np.asarray(new.rho[0][..., 1])).max() < 1e-12
    assert np.abs(np.asarray(new.rho[2][..., 1])).max() < 1e-12


def test_predict_new_points_and_is_very_small():
    key = jax.random.PRNGKey(4)
    density = make_density(key)
    pred = EV.predict_new_points(
        "SAC", MASS, 1.0, density.points[1], 1, ground_state_dist, (R0, SIGMA)
    )
    # far from coupling, a fresh off-diagonal element stays negligible
    assert np.asarray(ri.absval(pred)).max() < 1e-6
    small = EV.is_very_small("SAC", MASS, 1.0, density, ground_state_dist, (R0, SIGMA))
    s = np.asarray(small)
    assert not s[0]           # active element never small
    assert s[1] and s[2]      # inactive elements with no density stay small


def test_fused_evolve_matches_per_source_composition():
    """evolve_step's fused all-source computation must equal composing the
    public per-source pieces (leapfrogs + backward_predict) element by
    element."""
    key = jax.random.PRNGKey(7)
    n = 24
    pts0 = jnp.stack([
        jax.random.normal(key, (n,)) * 0.8,
        22.0 + jax.random.normal(jax.random.PRNGKey(8), (n,)) * 2.0,
    ], axis=-1)
    pts = jnp.stack([pts0, pts0 + 0.1, pts0 - 0.1])

    def dist(params, q):
        g = jnp.exp(-0.5 * jnp.sum(((q - params[0]) / params[1]) ** 2, axis=-1))
        off = 0.1 * jnp.stack([g[1], 0.5 * g[1]], axis=-1)
        return jnp.stack([ri.ri(g[0]), off, ri.ri(0.5 * g[2])])

    center = jnp.asarray([0.0, 22.0])
    width = jnp.asarray([2.0, 3.0])
    rho = dist((center, width), pts)
    density = Density(points=pts, rho=rho, active=jnp.asarray([True, True, True]))
    dt = 1.0
    fused = EV.evolve_step("SAC", 2000.0, dt, density, dist, (center, width))

    for k, (i, j) in enumerate(EV.ELEMENTS):
        x0, p0 = pts[k][:, 0], pts[k][:, 1]
        xa, pa = EV.adiabatic_leapfrog("SAC", x0, p0, 2000.0, dt / 2.0, +1, i, j)
        xb, pb = EV.adiabatic_leapfrog("SAC", xa, pa, 2000.0, dt / 2.0, +1, i, j)
        r_na = jnp.stack([xb, pb], axis=-1)
        rho_na = EV.backward_predict(
            "SAC", 2000.0, dt, r_na, density.rho[k], k, dist, (center, width)
        )
        # criterion 0: every point is coupled, so the fused result must match
        np.testing.assert_allclose(
            np.asarray(fused.points[k]), np.asarray(r_na), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(fused.rho[k]), np.asarray(rho_na), atol=1e-12,
            err_msg=f"element {k}",
        )
