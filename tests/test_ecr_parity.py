"""ECR parity regression: the one achieved BASELINE accuracy target.

The model-generality runs (benchmarks/generality_r02.jsonl) measured Tully
model C (ECR, extended coupling with reflection) BELOW the 1e-3 RMSE
north-star.  This test pins that standard on a short protocol so it cannot
silently regress: x0 = -2, p0 = 20, N = 64, moment defaults, full driver vs
the exact DVR oracle (reference main.cpp:19-212 vs
schrodinger_equation/general.cpp:204-277).  Measured 2026-08-18: RMSE
5.2e-5, packet leaves the interaction region at t ~ 310.
"""

import numpy as np
import pytest

from gple_tpu.config import GPLEConfig
from gple_tpu.driver import GPLEDriver
from gple_tpu.oracles.schrodinger import DVRConfig, DVRSolver


@pytest.fixture(scope="module")
def ecr_run():
    cfg = GPLEConfig(
        model="ECR", mass=2000.0, x0=-2.0, p0=20.0, sigma_p0=1.0,
        output_time=10.0, reopt_time=10.0, dt=1.0, num_points=64,
    )
    se_cfg = DVRConfig(
        model="ECR", boundary="reflective", mass=cfg.mass, x0=cfg.x0,
        p0=cfg.p0, sigma_p=cfg.sigma_p0, xmin=cfg.xmin, xmax=cfg.xmax,
        dx_input=1.0, output_time=cfg.output_time, dt_input=cfg.dt,
    )
    se = DVRSolver(se_cfg).run(store_wigner=False)
    drv = GPLEDriver(cfg)
    hist = drv.run(max_ticks=400)
    return drv, hist, se


def test_ecr_below_baseline_target(ecr_run):
    """Population RMSE vs DVR stays below the 1e-3 BASELINE target (declared
    headline estimator: the MC sum, mci)."""
    _, hist, se = ecr_run
    gt = np.array([r.time for r in hist])
    gp0 = np.array([r.population_mci[0] for r in hist])
    sp0 = np.interp(gt, se.times, se.populations[:, 0])
    n_cmp = min(len(gt), int(np.searchsorted(gt, se.times[-1]) + 1))
    rmse = float(np.sqrt(np.mean((gp0[:n_cmp] - sp0[:n_cmp]) ** 2)))
    assert rmse < 1e-3, f"ECR parity regressed past the BASELINE target: {rmse:.2e}"


def test_ecr_conservation(ecr_run):
    _, hist, _ = ecr_run
    pop = np.array([r.population_mci.sum() for r in hist])
    assert np.all(np.abs(pop - 1.0) < 0.02), float(np.max(np.abs(pop - 1.0)))
