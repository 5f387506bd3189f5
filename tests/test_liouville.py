"""Tests for the grid-MQCLE oracle (reference liouville_equation/)."""

import numpy as np
import pytest

from gple_tpu.oracles.liouville import LiouvilleConfig, LiouvilleSolver


def small_cfg(**kw):
    base = dict(
        model="SAC",
        mass=2000.0,
        x0=-3.0,
        p0=25.0,
        sigma_p=1.0,
        xmin=-5.0,
        xmax=5.0,
        dx_input=1.0,
        output_time=20.0,
        dt_input=0.5,
    )
    base.update(kw)
    return LiouvilleConfig(**base)


def test_initial_density_normalized():
    s = LiouvilleSolver(small_cfg())
    rho = np.asarray(s.initial_density())
    cfg = s.cfg
    assert rho[:, :, 0, 0].real.sum() * cfg.dx * cfg.dp == pytest.approx(1.0, rel=1e-12)
    assert np.all(rho[:, :, 1, 1] == 0)
    ppl = np.asarray(s.populations(s.initial_density()))
    np.testing.assert_allclose(ppl, [1.0, 0.0], atol=1e-12)


def test_basis_transform_roundtrip():
    s = LiouvilleSolver(small_cfg())
    rho = s.initial_density()
    back = s.to_adiabatic(s.to_diabatic(rho))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rho), atol=1e-12)


def test_trotter_conserves_norm_and_hermiticity():
    s = LiouvilleSolver(small_cfg())
    rho_dia = s.to_diabatic(s.initial_density())
    rho_dia = s._step(rho_dia, 10)
    rho = np.asarray(rho_dia)
    # hermitian at each grid point
    np.testing.assert_allclose(rho, np.conj(np.swapaxes(rho, -1, -2)), atol=1e-12)
    # trace conserved (norm): basis-independent
    total = rho[:, :, 0, 0].real.sum() + rho[:, :, 1, 1].real.sum()
    total *= s.cfg.dx * s.cfg.dp
    assert total == pytest.approx(1.0, abs=1e-8)


def test_wavepacket_moves_classically():
    s = LiouvilleSolver(small_cfg())
    res = s.run(store_rho=False, max_outputs=3)
    cfg = s.cfg
    dt_out = res.times[1] - res.times[0]
    vel = (res.averages[1, 1] - res.averages[0, 1]) / dt_out
    assert vel == pytest.approx(cfg.p0 / cfg.mass, rel=0.05)
    # energy approximately conserved
    np.testing.assert_allclose(res.averages[:, 0], res.averages[0, 0], rtol=1e-3)
    # populations partition unity
    np.testing.assert_allclose(res.populations.sum(axis=1), 1.0, atol=1e-6)


def test_liouville_vs_schrodinger_populations():
    """Cross-oracle check (SURVEY.md section 4 level 3): on a short SAC run the
    MQCLE populations should track the exact Schroedinger populations."""
    from gple_tpu.oracles.schrodinger import DVRConfig, DVRSolver

    common = dict(
        model="SAC", mass=2000.0, x0=-3.0, p0=25.0, sigma_p=1.0,
        xmin=-5.0, xmax=5.0, output_time=100.0,
    )
    se = DVRSolver(DVRConfig(boundary="reflective", dx_input=1.0, dt_input=0.5, **common))
    se_res = se.run(store_wigner=False, max_outputs=3)
    le = LiouvilleSolver(LiouvilleConfig(dx_input=1.0, dt_input=0.5, **common))
    le_res = le.run(store_rho=False, max_outputs=3)
    n = min(len(se_res.times), len(le_res.times))
    np.testing.assert_allclose(se_res.times[:n], le_res.times[:n])
    # MQCLE is exact for 1D quadratic + this comparison is approximate:
    # populations should agree to a few percent over a short window
    np.testing.assert_allclose(
        se_res.populations[:n], le_res.populations[:n], atol=0.05
    )
