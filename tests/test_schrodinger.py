"""Tests for the DVR Schroedinger oracle (reference schrodinger_equation/)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from gple_tpu.oracles.schrodinger import (
    DVRConfig,
    DVRSolver,
    fd_derivative_matrix,
    hamiltonian,
    initial_wavefunction,
    kinetic_matrix,
    wigner_transform,
)
from gple_tpu.utils.constants import HBAR


def small_cfg(**kw):
    base = dict(
        model="SAC",
        boundary="reflective",
        mass=2000.0,
        x0=-3.0,
        p0=25.0,
        sigma_p=1.0,
        xmin=-5.0,
        xmax=5.0,
        dx_input=1.0,  # capped by de Broglie criterion anyway
        output_time=20.0,
        dt_input=0.5,
    )
    base.update(kw)
    return DVRConfig(**base)


def test_kinetic_matrix_second_derivative():
    """T psi ~ -hbar^2/(2m) psi'' for a smooth function away from edges."""
    n, dx, mass = 256, 0.05, 2000.0
    x = (np.arange(n) - n / 2) * dx
    t = kinetic_matrix(n, dx, mass, "reflective")
    psi = np.exp(-(x ** 2) / 2.0)
    exact = -HBAR ** 2 / (2 * mass) * (x ** 2 - 1.0) * psi  # (d2/dx2) gaussian
    approx = np.asarray(t @ psi)
    inner = slice(n // 4, 3 * n // 4)
    np.testing.assert_allclose(approx[inner], exact[inner], atol=1e-10)


def test_hamiltonian_hermitian_without_abc():
    cfg = small_cfg()
    h = np.asarray(hamiltonian(cfg))
    np.testing.assert_allclose(h, h.conj().T, atol=1e-12)


def test_initial_wavefunction_normalized_and_centered():
    cfg = small_cfg()
    psi = np.asarray(initial_wavefunction(cfg))
    n = cfg.n_grids
    assert np.sum(np.abs(psi) ** 2) * cfg.dx == pytest.approx(1.0, rel=1e-12)
    x = cfg.x_grid
    mean_x = np.sum(x * np.abs(psi[:n]) ** 2) * cfg.dx
    assert mean_x == pytest.approx(cfg.x0, abs=1e-3)  # grid-truncation limited
    # upper surface empty
    assert np.all(psi[n:] == 0)


def test_norm_and_energy_conservation_spectral():
    cfg = small_cfg()
    solver = DVRSolver(cfg)
    res = solver.run(store_wigner=False, max_outputs=4)
    # norm: total population = 1 at all times
    total = res.populations.sum(axis=1)
    np.testing.assert_allclose(total, 1.0, atol=1e-8)
    # energy conserved
    np.testing.assert_allclose(res.averages[:, 0], res.averages[0, 0], rtol=1e-8)
    # wavepacket moves right with roughly p0/m velocity initially
    dt_out = res.times[1] - res.times[0]
    vel = (res.averages[1, 1] - res.averages[0, 1]) / dt_out
    assert vel == pytest.approx(cfg.p0 / cfg.mass, rel=0.05)


def test_absorbing_rk4_damps_norm():
    cfg = small_cfg(boundary="absorbing", x0=-2.0, xmin=-3.0, xmax=3.0, output_time=40.0)
    solver = DVRSolver(cfg)
    # H is non-hermitian with -iA on the diagonal
    h = np.asarray(solver.h)
    assert np.abs(h - h.conj().T).max() > 0
    res = solver.run(store_wigner=False, max_outputs=8)
    total = res.populations.sum(axis=1)
    # norm non-increasing once the packet reaches the absorber; never > 1+eps
    assert np.all(total <= 1.0 + 1e-6)
    assert total[-1] < total[0] + 1e-6


def test_wigner_transform_marginals():
    """Integrating W_ii over p recovers |psi_i(x)|^2; over x and p, population."""
    cfg = small_cfg()
    psi = initial_wavefunction(cfg)
    w = np.asarray(
        wigner_transform(psi, cfg.x_grid, cfg.p_grid, cfg.dx, cfg.boundary)
    )
    n = cfg.n_grids
    dp = cfg.p_grid[1] - cfg.p_grid[0]
    marg_x = w[0, 0].real.sum(axis=1) * dp
    dens = np.abs(np.asarray(psi[:n])) ** 2
    np.testing.assert_allclose(marg_x, dens, atol=2e-4 * dens.max())
    # total population on surface 0 is ~1, surface 1 is 0
    assert w[0, 0].real.sum() * cfg.dx * dp == pytest.approx(1.0, abs=2e-3)
    assert abs(w[1, 1].real.sum() * cfg.dx * dp) < 1e-12
    # W is "hermitian": W_ij = conj(W_ji)
    np.testing.assert_allclose(w[0, 1], np.conj(w[1, 0]), atol=1e-12)
    # mean momentum of W_00 ~ p0
    mean_p = (w[0, 0].real.sum(axis=0) * cfg.p_grid).sum() / w[0, 0].real.sum()
    assert mean_p == pytest.approx(cfg.p0, rel=1e-3)


def test_fd_derivative_antisymmetric():
    d = np.asarray(fd_derivative_matrix(64, 0.1))
    np.testing.assert_allclose(d, -d.T, atol=1e-14)


def test_sac_scattering_populations_sensible():
    """Short SAC run: some population transfers to the upper surface and the
    populations stay a partition of unity."""
    cfg = small_cfg(p0=20.0, x0=-4.0)
    res = DVRSolver(cfg).run(store_wigner=False)
    assert res.populations.shape[1] == 2
    np.testing.assert_allclose(res.populations.sum(axis=1), 1.0, atol=1e-6)
    # after crossing, upper-state population should be nonzero for p0=20 SAC
    assert res.populations[-1, 1] > 0.01


def test_save_txt(tmp_path):
    cfg = small_cfg()
    res = DVRSolver(cfg).run(store_wigner=True, max_outputs=2)
    res.save_txt(str(tmp_path))
    x = np.loadtxt(tmp_path / "x.txt")
    assert x.shape[0] == cfg.n_grids
    avg = np.loadtxt(tmp_path / "averages.txt")
    assert avg.shape[1] == 6  # t, E, x, p, ppl0, ppl1
