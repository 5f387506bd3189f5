"""Smoke tests for the plotting suite over real driver/oracle outputs."""

import os

import numpy as np
import pytest

from gple_tpu import plotting as P
from gple_tpu.config import GPLEConfig
from gple_tpu.driver import GPLEDriver
from gple_tpu.oracles.schrodinger import DVRConfig, DVRSolver


@pytest.fixture(scope="module")
def run_outputs(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("plot_run"))
    cfg = GPLEConfig(
        model="DAC", mass=2000.0, x0=-10.0, p0=30.0, sigma_p0=1.5,
        output_time=1.0, reopt_time=2.0, dt=0.5, num_points=24,
    )
    GPLEDriver(cfg, outdir=outdir).run(max_ticks=4)
    return cfg, outdir


def test_gple_plots(run_outputs, tmp_path):
    cfg, outdir = run_outputs
    p1 = P.plot_averages(os.path.join(outdir, "ave.txt"), str(tmp_path / "ave.png"))
    p2 = P.plot_gple_log(os.path.join(outdir, "run.log"), str(tmp_path / "log.png"))
    p3 = P.plot_parameters(os.path.join(outdir, "param.txt"), str(tmp_path / "par.png"))
    p4 = P.plot_point_cloud(
        os.path.join(outdir, "coord.txt"), os.path.join(outdir, "value.txt"),
        str(tmp_path / "cloud.png"),
    )
    frames = P.plot_phase_space_frames(
        os.path.join(outdir, "phase.txt"), cfg.num_grids_per_dim,
        str(tmp_path / "frames"), max_frames=1,
    )
    for f in [p1, p2, p3, p4] + frames:
        assert os.path.getsize(f) > 1000


def test_animations(run_outputs, tmp_path):
    """gif animations over driver outputs (reference plot.py:423-566)."""
    cfg, outdir = run_outputs
    g1 = P.animate_point_cloud(
        os.path.join(outdir, "coord.txt"), os.path.join(outdir, "value.txt"),
        str(tmp_path / "cloud.gif"), max_frames=2,
    )
    g2 = P.animate_phase_space(
        os.path.join(outdir, "phase.txt"), cfg.num_grids_per_dim,
        str(tmp_path / "phase.gif"), max_frames=2,
    )
    g3 = P.animate_phase_space(
        os.path.join(outdir, "var.txt"), cfg.num_grids_per_dim,
        str(tmp_path / "var.gif"), log_scale=True, max_frames=2,
    )
    for f in (g1, g2, g3):
        assert os.path.getsize(f) > 1000


def test_psi_animation(tmp_path):
    """|psi|^2 animation from DVR outputs (reference plot_psi.py)."""
    cfg = DVRConfig(
        model="SAC", boundary="reflective", mass=2000.0, x0=-3.0, p0=25.0,
        sigma_p=1.0, xmin=-5.0, xmax=5.0, dx_input=1.0, output_time=50.0,
        dt_input=0.5,
    )
    res = DVRSolver(cfg).run(store_wigner=False, max_outputs=2)
    res.save_txt(str(tmp_path))
    gif = P.animate_psi(str(tmp_path), str(tmp_path / "psi.gif"), max_frames=2)
    assert os.path.getsize(gif) > 1000


def test_oracle_plot(tmp_path):
    cfg = DVRConfig(
        model="SAC", boundary="reflective", mass=2000.0, x0=-3.0, p0=25.0,
        sigma_p=1.0, xmin=-5.0, xmax=5.0, dx_input=1.0, output_time=50.0,
        dt_input=0.5,
    )
    res = DVRSolver(cfg).run(store_wigner=False, max_outputs=3)
    res.save_txt(str(tmp_path))
    png = P.plot_oracle_averages(str(tmp_path / "averages.txt"), str(tmp_path / "a.png"))
    assert os.path.getsize(png) > 1000
