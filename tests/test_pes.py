"""Unit tests for the Tully PES layer (reference */pes.cpp parity).

Strategy per SURVEY.md section 4: analytic derivatives checked against jax.grad,
closed-form adiabatic transform checked against generic eigh, plus hand values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gple_tpu.models import tully

MODELS = ["SAC", "DAC", "ECR"]
XS = np.array([-8.0, -2.5, -0.3, 0.0, 0.7, 3.1, 9.0])


@pytest.mark.parametrize("model", MODELS)
def test_force_is_minus_grad_potential(model):
    for x in XS:
        if x == 0.0 and model != "DAC":
            continue  # SAC/ECR diagonal has a |x|-type kink at 0
        g = jax.jacfwd(lambda y: tully.diabatic_potential(model, y))(x)
        f = tully.diabatic_force(model, x)
        np.testing.assert_allclose(np.asarray(f), -np.asarray(g), atol=1e-12)


@pytest.mark.parametrize("model", MODELS)
def test_hesse_is_minus_grad_force(model):
    for x in XS:
        if x == 0.0 and model != "DAC":
            continue
        g = jax.jacfwd(lambda y: tully.diabatic_force(model, y))(x)
        h = tully.diabatic_hesse(model, x)
        np.testing.assert_allclose(np.asarray(h), -np.asarray(g), atol=1e-12)


@pytest.mark.parametrize("model", MODELS)
def test_adiabatic_transform_diagonalizes(model):
    v = tully.diabatic_potential(model, XS)
    c = tully.adiabatic_transform(model, XS)
    e = tully.adiabatic_potential(model, XS)
    # orthogonality
    eye = jnp.swapaxes(c, -1, -2) @ c
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(2), eye.shape), atol=1e-12)
    # diagonalization with ascending eigenvalues
    d = jnp.swapaxes(c, -1, -2) @ v @ c
    np.testing.assert_allclose(np.asarray(d[..., 0, 0]), np.asarray(e[..., 0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d[..., 1, 1]), np.asarray(e[..., 1]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d[..., 0, 1]), 0.0, atol=1e-12)
    assert np.all(np.asarray(e[..., 0]) <= np.asarray(e[..., 1]))
    # against generic eigh
    w = np.linalg.eigvalsh(np.asarray(v))
    np.testing.assert_allclose(np.asarray(e), w, atol=1e-12)


@pytest.mark.parametrize("model", MODELS)
def test_adiabatic_force_symmetric_and_nac_antisymmetric(model):
    f = tully.adiabatic_force(model, XS)
    np.testing.assert_allclose(np.asarray(f), np.asarray(jnp.swapaxes(f, -1, -2)), atol=1e-12)
    d = tully.adiabatic_coupling(model, XS)
    np.testing.assert_allclose(np.asarray(d), -np.asarray(jnp.swapaxes(d, -1, -2)), atol=1e-12)
    # NAC definition d_10 = F_10 / (E1 - E0)
    e = tully.adiabatic_potential(model, XS)
    np.testing.assert_allclose(
        np.asarray(d[..., 1, 0]),
        np.asarray(f[..., 1, 0] / (e[..., 1] - e[..., 0])),
        atol=1e-12,
    )


def test_sac_hand_values():
    v = np.asarray(tully.diabatic_potential("SAC", 1.0))
    assert v[0, 0] == pytest.approx(0.01 * (1 - np.exp(-1.6)))
    assert v[1, 1] == pytest.approx(-v[0, 0])
    assert v[0, 1] == pytest.approx(0.005 * np.exp(-1.0))
    # x = 0 continuity
    v0 = np.asarray(tully.diabatic_potential("SAC", 0.0))
    assert v0[0, 0] == 0.0 and v0[1, 1] == 0.0


def test_dac_hand_values():
    v = np.asarray(tully.diabatic_potential("DAC", 0.0))
    assert v[0, 0] == 0.0
    assert v[1, 1] == pytest.approx(0.05 - 0.10)
    assert v[0, 1] == pytest.approx(0.015)


def test_ecr_limits():
    # x -> -inf: V01 -> 0 ; x -> +inf: V01 -> 2B
    assert np.asarray(tully.diabatic_potential("ECR", -30.0))[0, 1] == pytest.approx(0.0, abs=1e-12)
    assert np.asarray(tully.diabatic_potential("ECR", 30.0))[0, 1] == pytest.approx(0.2, abs=1e-12)


def test_absorbing_potential():
    m, xmin, xmax, L = 2000.0, -10.0, 10.0, 4.0
    # zero in the interior
    assert float(tully.absorbing_potential(m, xmin, xmax, L, 0.0)) == 0.0
    assert float(tully.absorbing_potential(m, xmin, xmax, L, 9.99)) == 0.0
    # positive and increasing in the skirt
    va = float(tully.absorbing_potential(m, xmin, xmax, L, 10.5))
    vb = float(tully.absorbing_potential(m, xmin, xmax, L, 12.0))
    assert 0.0 < va < vb
    # symmetric skirts
    vleft = float(tully.absorbing_potential(m, xmin, xmax, L, -10.5))
    assert vleft == pytest.approx(va, rel=1e-12)
    # Manolopoulos constant c = sqrt(2) K(1/sqrt(2))
    assert tully.MANOLOPOULOS_C == pytest.approx(2.622057554292119, rel=1e-12)


def test_sym2x2_eigh_matches_numpy():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(64, 2, 2))
    a = (a + np.swapaxes(a, -1, -2)) / 2
    # include a diagonal (b=0) case
    a[0] = np.diag([2.0, -1.0])
    w, v = tully.sym2x2_eigh(jnp.asarray(a))
    w_np = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.asarray(w), w_np, atol=1e-12)
    # columns are orthonormal eigenvectors
    recon = np.asarray(v) @ (np.asarray(w)[..., :, None] * np.swapaxes(np.asarray(v), -1, -2))
    np.testing.assert_allclose(recon, a, atol=1e-12)


def test_config_derivations():
    from gple_tpu.config import GPLEConfig

    cfg = GPLEConfig(mass=2000.0, x0=-10.0, p0=30.0, sigma_p0=1.5, dt=0.1)
    assert cfg.sigma_x0 == pytest.approx(1.0 / 3.0)
    assert cfg.xmin == -20.0 and cfg.xmax == 20.0
    assert cfg.num_grids_per_dim >= 200
    assert cfg.total_ticks == int(2 * abs(2 * -10.0 * 2000.0 / 30.0) / 0.1)
    grids = cfg.phase_grids()
    assert grids.shape == (cfg.num_grids_per_dim ** 2, 2)
    assert grids[:, 0].min() == pytest.approx(cfg.xmin)


@pytest.mark.parametrize("model", MODELS)
def test_basis_transform_table(model):
    """Full 3x3 basis table (reference liouville_equation/pes.cpp:360-703):
    round trips are exact, diabatic->adiabatic diagonalizes V, trace and
    Hermiticity survive every hop, and complex broadcast fields work."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(XS)
    h = rng.normal(size=(len(XS), 2, 2)) + 1j * rng.normal(size=(len(XS), 2, 2))
    rho = jnp.asarray(h + np.conj(np.swapaxes(h, -1, -2)))  # Hermitian field
    for frm in tully.BASES:
        for to in tully.BASES:
            out = tully.basis_transform(model, x, rho, frm, to)
            back = tully.basis_transform(model, x, out, to, frm)
            np.testing.assert_allclose(np.asarray(back), np.asarray(rho),
                                       atol=1e-12)
            np.testing.assert_allclose(np.trace(np.asarray(out), axis1=-2, axis2=-1),
                                       np.trace(np.asarray(rho), axis1=-2, axis2=-1),
                                       atol=1e-12)
            np.testing.assert_allclose(np.asarray(out),
                                       np.conj(np.swapaxes(np.asarray(out), -1, -2)),
                                       atol=1e-12)
    # diabatic -> adiabatic diagonalizes the potential
    v_ad = tully.basis_transform(model, x, tully.diabatic_potential(model, x),
                                 "diabatic", "adiabatic")
    np.testing.assert_allclose(np.asarray(v_ad[..., 0, 1]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_ad[..., 0, 0]),
                               np.asarray(tully.adiabatic_potential(model, x)[..., 0]),
                               atol=1e-12)
    # force basis diagonalizes the diabatic force
    f_fb = tully.basis_transform(model, x, tully.diabatic_force(model, x),
                                 "diabatic", "force")
    np.testing.assert_allclose(np.asarray(f_fb[..., 0, 1]), 0.0, atol=1e-12)
    # broadcast: an (Nx, Np, 2, 2) phase-space field with x[:, None]
    field = jnp.broadcast_to(rho[:, None], (len(XS), 3, 2, 2))
    out2 = tully.basis_transform(model, x[:, None], field, "diabatic", "force")
    np.testing.assert_allclose(
        np.asarray(out2[:, 1]),
        np.asarray(tully.basis_transform(model, x, rho, "diabatic", "force")),
        atol=1e-12)
