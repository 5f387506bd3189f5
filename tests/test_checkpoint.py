"""Checkpoint/resume round-trip (new capability; the reference cannot resume)."""

import os

import numpy as np
import pytest

from gple_tpu.config import GPLEConfig
from gple_tpu.driver import GPLEDriver
from gple_tpu.io import checkpoint as ckpt


def test_checkpoint_roundtrip(tmp_path):
    cfg = GPLEConfig(
        model="DAC", mass=2000.0, x0=-10.0, p0=30.0, sigma_p0=1.5,
        output_time=1.0, reopt_time=2.0, dt=0.5, num_points=24,
    )
    drv = GPLEDriver(cfg)
    drv.initialize()
    for tick in range(1, 3):
        drv.step(tick)
    path = str(tmp_path / "state.npz")
    ckpt.save_checkpoint(path, drv, 2)

    drv2 = GPLEDriver(cfg)
    tick = ckpt.load_checkpoint(path, drv2)
    assert tick == 2
    np.testing.assert_allclose(
        np.asarray(drv2.density.points), np.asarray(drv.density.points), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(drv2.density.rho), np.asarray(drv.density.rho), atol=0
    )
    assert drv2.total_energy == drv.total_energy
    np.testing.assert_allclose(drv2.optimizer.diag_lengths, drv.optimizer.diag_lengths)
    assert drv2.mc_params[0].num_steps == drv.mc_params[0].num_steps

    # both drivers advance identically from the restored state
    drv.key = drv2.key  # align RNG
    t1 = drv.step(3)
    t2 = drv2.step(3)
    np.testing.assert_allclose(
        np.asarray(drv2.density.rho), np.asarray(drv.density.rho), atol=1e-12
    )


def test_resume_equivalence(tmp_path):
    """2k ticks straight vs k + checkpoint/reload + k: populations must match.

    Guards the full restored-state contract (density, GP hyperparameters,
    AL multipliers, MC tuning, RNG key) -- a silently cold-started field
    shows up as a population drift here."""
    cfg = GPLEConfig(
        model="DAC", mass=2000.0, x0=-10.0, p0=30.0, sigma_p0=1.5,
        output_time=1.0, reopt_time=2.0, dt=0.5, num_points=24,
    )
    k = 2
    straight = GPLEDriver(cfg)
    straight.initialize()
    for tick in range(1, 2 * k + 1):
        straight.step(tick)

    first = GPLEDriver(cfg)
    first.initialize()
    for tick in range(1, k + 1):
        first.step(tick)
    path = str(tmp_path / "mid.npz")
    ckpt.save_checkpoint(path, first, k)
    resumed = GPLEDriver(cfg)
    tick = ckpt.load_checkpoint(path, resumed)
    for t in range(tick + 1, 2 * k + 1):
        resumed.step(t)

    from gple_tpu import observables as OBS

    pop_straight = np.asarray(OBS.population_each_surface(straight.density))
    pop_resumed = np.asarray(OBS.population_each_surface(resumed.density))
    np.testing.assert_allclose(pop_resumed, pop_straight, rtol=0, atol=5e-3)
    # optimizer error/type survive the round trip rather than resetting to 0
    assert resumed.opt_result.opt_type != ""


def test_run_with_checkpointing(tmp_path):
    cfg = GPLEConfig(
        model="DAC", mass=2000.0, x0=-10.0, p0=30.0, sigma_p0=1.5,
        output_time=1.0, reopt_time=2.0, dt=0.5, num_points=24,
    )
    path = str(tmp_path / "ck.npz")
    drv = GPLEDriver(cfg)
    drv.run(max_ticks=4, checkpoint_path=path, checkpoint_every=2)
    import os

    assert os.path.exists(path)
    drv2 = GPLEDriver(cfg)
    hist = drv2.run(max_ticks=6, resume_from=path)
    assert len(hist) >= 1


def test_init_cache_equivalence(tmp_path, monkeypatch):
    """A run that restores its cached initialization state must be bitwise
    identical to the cold run that wrote it (GPLEConfig.init_cache): the
    cache stores the post-init RNG key, seed cloud, tuned MC parameters, and
    first fit, so the downstream trajectory consumes the same stream."""
    import numpy as np

    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    cfg = GPLEConfig(
        model="SAC", mass=2000.0, x0=-2.0, p0=20.0, sigma_p0=1.0,
        output_time=2.0, reopt_time=2.0, dt=1.0, num_points=16,
        init_cache=True,
    )
    drv_cold = GPLEDriver(cfg)
    hist_cold = drv_cold.run(max_ticks=8)
    assert os.path.exists(drv_cold._init_cache_path())
    drv_warm = GPLEDriver(cfg)
    hist_warm = drv_warm.run(max_ticks=8)
    assert len(hist_cold) == len(hist_warm)
    for a, b in zip(hist_cold, hist_warm):
        assert a.time == b.time
        np.testing.assert_array_equal(a.population_mci, b.population_mci)
        assert a.purity_mci == b.purity_mci
    np.testing.assert_array_equal(np.asarray(drv_cold.density.points),
                                  np.asarray(drv_warm.density.points))


def test_init_cache_key_tracks_config(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    cfg_a = GPLEConfig(model="SAC", num_points=16, init_cache=True)
    cfg_b = GPLEConfig(model="SAC", num_points=16, seed=1, init_cache=True)
    assert (GPLEDriver(cfg_a)._init_cache_path()
            != GPLEDriver(cfg_b)._init_cache_path())


def test_event_hints_recorded(tmp_path, monkeypatch):
    """With init_cache on, observed event ticks (element activations, drift
    reopts) persist to the hints sidecar; a repeat run pre-blocks fusion
    around them instead of paying full-segment aborts."""
    import json

    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    cfg = GPLEConfig(
        model="SAC", mass=2000.0, x0=-2.0, p0=20.0, sigma_p0=1.0,
        output_time=5.0, reopt_time=5.0, dt=1.0, num_points=16,
        init_cache=True,
    )
    drv = GPLEDriver(cfg)
    drv.run(max_ticks=60)  # crosses the coupling edge: activations fire
    assert drv.stats["element_activations"] > 0
    hints = drv._event_hints_path()
    assert os.path.exists(hints)
    ticks = json.load(open(hints))
    assert ticks and all(isinstance(t, int) for t in ticks)
    # the repeat run must reproduce the same trajectory with hints active
    drv2 = GPLEDriver(cfg)
    hist2 = drv2.run(max_ticks=60)
    assert len(hist2) == len(drv.history)
    np.testing.assert_array_equal(
        np.asarray(drv.density.points), np.asarray(drv2.density.points)
    )
