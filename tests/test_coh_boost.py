"""Asymmetric coherence point budget (GPLEConfig.coh_fit_extra).

The carried-label decomposition (docs/DESIGN.md) measured the coherence FIT
as the accuracy bottleneck while diagonal fits are essentially exact at any
N; the boost routes extra resolution (the evolved off-diagonal EXTRA points)
into the coherence fit only.  Reference scope: the reference fits every
element at the same N (main.cpp:35, mc.cpp:59-120) -- this is a capability
extension, not a parity item.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gple_tpu.config import GPLEConfig
from gple_tpu.driver import GPLEDriver


def _cfg(**kw):
    base = dict(
        model="DAC", mass=2000.0, x0=-10.0, p0=30.0, sigma_p0=1.5,
        output_time=1.0, reopt_time=2.0, dt=0.5, num_points=24,
    )
    base.update(kw)
    return GPLEConfig(**base)


def test_boosted_fit_includes_extras():
    cfg = _cfg(coh_fit_extra=48, coh_len_div=4.0)
    drv = GPLEDriver(cfg)
    drv.initialize()
    # off fit carries N + K training rows; diagonals stay at N
    assert drv.gps.offdiag.features.shape[0] == 24 + 48
    assert drv.gps.diag.features.shape == (2, 24, 2)
    for t in range(1, 4):
        drv.step(t)
    assert drv.gps.offdiag.features.shape[0] == 24 + 48
    assert np.all(np.isfinite(np.asarray(drv.density.rho)))


def test_boost_capped_at_extras():
    cfg = _cfg(coh_fit_extra=10_000)
    drv = GPLEDriver(cfg)
    assert drv._coh_k == cfg.num_extra_points


def test_boost_off_matches_round2_shapes():
    cfg = _cfg()
    drv = GPLEDriver(cfg)
    drv.initialize()
    assert drv.gps.offdiag.features.shape[0] == 24


def test_boosted_checkpoint_roundtrip(tmp_path):
    from gple_tpu.io import checkpoint as ckpt

    cfg = _cfg(coh_fit_extra=48, coh_len_div=4.0)
    drv = GPLEDriver(cfg)
    drv.initialize()
    for t in range(1, 3):
        drv.step(t)
    path = str(tmp_path / "b.npz")
    ckpt.save_checkpoint(path, drv, 2)
    drv2 = GPLEDriver(cfg)
    tick = ckpt.load_checkpoint(path, drv2)
    assert tick == 2
    assert drv2.gps.offdiag.features.shape[0] == 24 + 48
    assert drv2.optimizer.off_len_div == 4.0
    drv2.step(3)
    assert np.all(np.isfinite(np.asarray(drv2.density.rho)))
