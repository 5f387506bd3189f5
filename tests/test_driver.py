"""End-to-end smoke tests of the GPR-MQCLE driver (reference main.cpp flow)."""

import os

import numpy as np
import pytest

from gple_tpu.config import GPLEConfig
from gple_tpu.driver import GPLEDriver


@pytest.fixture(scope="module")
def short_run(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("gple_out"))
    cfg = GPLEConfig(
        model="DAC", mass=2000.0, x0=-10.0, p0=30.0, sigma_p0=1.5,
        output_time=1.0, reopt_time=1.0, dt=0.5, num_points=32,
    )
    drv = GPLEDriver(cfg, outdir=outdir)
    hist = drv.run(max_ticks=6)
    return cfg, drv, hist, outdir


def test_history_conservation(short_run):
    cfg, drv, hist, _ = short_run
    assert len(hist) >= 3
    # The MC point-sum estimators are the accurate observables under the
    # default moment-mode fit; the analytic GP integrals (prm) carry a
    # small-N bias (mean dips between sample points at N=32) but must stay
    # STABLE -- drift beyond the working tolerance forces a reoptimization.
    pop0, pur0 = hist[0].population_prm, hist[0].purity_prm
    for rec in hist:
        assert sum(rec.population_mci) == pytest.approx(1.0, abs=0.05)
        assert rec.population_prm == pytest.approx(pop0, rel=0.10)
        assert rec.purity_prm == pytest.approx(pur0, rel=0.12)
        assert rec.energy_prm / rec.population_prm == pytest.approx(
            drv.total_energy, rel=0.08
        )
    # wavepacket moving right
    assert hist[-1].x_average > hist[0].x_average


def test_history_conservation_ladder(tmp_path_factory):
    """Reference-style constrained ladder pins the GP integrals themselves
    (main.cpp:174-189, opt.cpp:1200-1270)."""
    outdir = str(tmp_path_factory.mktemp("gple_out_ladder"))
    cfg = GPLEConfig(
        model="DAC", mass=2000.0, x0=-10.0, p0=30.0, sigma_p0=1.5,
        output_time=1.0, reopt_time=1.0, dt=0.5, num_points=32,
        opt_mode="ladder",
    )
    drv = GPLEDriver(cfg, outdir=outdir)
    hist = drv.run(max_ticks=4)
    for rec in hist:
        assert rec.population_prm == pytest.approx(1.0, abs=0.08)
        assert rec.purity_prm == pytest.approx(1.0, abs=0.10)
        assert rec.energy_prm == pytest.approx(drv.total_energy, rel=0.08)


def test_population_stays_on_ground_state(short_run):
    cfg, drv, hist, _ = short_run
    # far from the DAC crossing, all population stays on surface 0
    assert hist[-1].population_mci[0] == pytest.approx(1.0, abs=1e-3)


def test_output_files(short_run):
    cfg, drv, hist, outdir = short_run
    for fname in ("ave.txt", "param.txt", "coord.txt", "value.txt",
                  "phase.txt", "var.txt", "run.log"):
        path = os.path.join(outdir, fname)
        assert os.path.exists(path), fname
        assert os.path.getsize(path) > 0, fname
    ave = np.loadtxt(os.path.join(outdir, "ave.txt"))
    assert ave.ndim == 2 and ave.shape[0] == len(hist)
    # coord lines: 3 elements per frame (+ blank separators)
    with open(os.path.join(outdir, "coord.txt")) as f:
        blocks = f.read().strip().split("\n\n")
    assert len(blocks) == len(hist)
    assert len(blocks[0].splitlines()) == 3
    # phase grid lines have 2 * n_grid entries (re/im interleaved)
    with open(os.path.join(outdir, "phase.txt")) as f:
        first = f.readline().split()
    assert len(first) == 2 * cfg.num_grids_per_dim ** 2


def test_mc_params_tuned(short_run):
    from gple_tpu.sampler.mc import POSSIBLE_DISPLACEMENTS

    _, drv, _, _ = short_run
    assert drv.mc_params[0].displacement in POSSIBLE_DISPLACEMENTS
    assert drv.mc_params[0].num_steps >= 1


def test_reference_parity_preset():
    """reference_parity forces the three behavior divergences back to the
    reference's: evolution-loop cutoff on, purity pinned to t=0, corr = 1."""
    from gple_tpu.config import GPLEConfig
    from gple_tpu.gp.opt import _bounds_to_sigmoid, _sigmoid_to_bounds

    cfg = GPLEConfig(reference_parity=True)
    assert cfg.evolve_cutoff is True
    assert cfg.purity_target == "initial"
    # the zero-width corr box maps any optimizer iterate back to exactly 1.0
    import jax.numpy as jnp

    one = jnp.asarray(1.0)
    z = _bounds_to_sigmoid(one, one, one)
    assert float(_sigmoid_to_bounds(z, one, one)) == 1.0
