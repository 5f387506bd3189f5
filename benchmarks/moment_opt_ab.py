"""A/B: the constrained hyperopt ladder vs moment-based hyperparameters.

The decomposition harness's ideal-fit runs use moment-based hyperparameters
(lengths = |label|-weighted cloud std / 2, corr = 0, analytic magnitude) and
at N = 64 they beat the production optimizer at N = 256 -- suggesting the
constrained ladder's choices, not just the feedback loop, cost accuracy.
This experiment runs the REAL driver with a drop-in "optimizer" that skips
the ladder entirely and sets moment-based parameters each reopt.

Usage: python benchmarks/moment_opt_ab.py [--ticks 240] [-n 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=64)
    ap.add_argument("--ticks", type=int, default=240)
    ap.add_argument("--x0", type=float, default=-2.0)
    opts = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from gple_tpu.gp.opt import INITIAL_NOISE, OptResult
    from gple_tpu.ops import complex_kernels as CK
    from gple_tpu.ops import kernels as RK
    from gple_tpu.storage import DIAG_INDICES, OFFDIAG_INDEX

    class MomentOptimizer:
        """Drop-in for gp.opt.Optimizer: moment-based parameters, no ladder."""

        corr_bounds = (-1.0, 1.0)  # class attr, read by GPLEDriver.initialize

        def __init__(self, model, mass, total_energy, purity, sigma_r0,
                     seed=0, lbfgs_steps=0, corr_bounds=None):
            self.model, self.mass = model, mass
            self.total_energy, self.purity = total_energy, purity
            self.sigma_r0 = np.asarray(sigma_r0)
            self.lbfgs_steps = lbfgs_steps
            self.diag_lengths = np.tile(self.sigma_r0, (2, 1))
            self.diag_magnitudes = np.ones(2)
            self.off = dict(lr=self.sigma_r0, li=self.sigma_r0,
                            mr=1.0, mi=1.0, mag=1.0)

        @staticmethod
        def _wstd(points, w):
            w = np.maximum(np.abs(np.asarray(w)), 1e-30)
            pts = np.asarray(points)
            mu = (pts * w[:, None]).sum(0) / w.sum()
            var = (((pts - mu) ** 2) * w[:, None]).sum(0) / w.sum()
            return np.sqrt(np.maximum(var, 1e-12))

        def optimize(self, density, extra, surface_energies):
            pts = np.asarray(density.points)
            rho = np.asarray(density.rho)
            for d, elem in enumerate(DIAG_INDICES):
                lens = self._wstd(pts[elem], rho[elem, :, 0]) / 2.0
                self.diag_lengths[d] = lens
                st = RK.fit_real(
                    RK.KernelParams(jnp.asarray(1.0), jnp.asarray(lens),
                                    jnp.asarray(INITIAL_NOISE)),
                    jnp.asarray(pts[elem]), jnp.asarray(rho[elem, :, 0]),
                )
                self.diag_magnitudes[d] = float(RK.optimal_magnitude(st))
            o = pts[OFFDIAG_INDEX]
            labels = jnp.asarray(rho[OFFDIAG_INDEX])
            self.off = dict(
                lr=self._wstd(o, rho[OFFDIAG_INDEX, :, 0]) / 2.0,
                li=self._wstd(o, rho[OFFDIAG_INDEX, :, 1]) / 2.0,
                mr=float(np.sqrt(np.mean(rho[OFFDIAG_INDEX, :, 0] ** 2)) + 1e-30),
                mi=float(np.sqrt(np.mean(rho[OFFDIAG_INDEX, :, 1] ** 2)) + 1e-30),
                mag=1.0,
            )
            st = CK.fit_complex(self._off_params(), jnp.asarray(o), labels)
            self.off["mag"] = float(CK.optimal_magnitude_complex(st))
            return OptResult(error=0.0, steps=[0], opt_type="moment")

        def _off_params(self):
            return CK.ComplexKernelParams(
                magnitude=jnp.asarray(self.off["mag"]),
                real_magnitude=jnp.asarray(self.off["mr"]),
                real_lengths=jnp.asarray(self.off["lr"]),
                imag_magnitude=jnp.asarray(self.off["mi"]),
                imag_lengths=jnp.asarray(self.off["li"]),
                noise=jnp.asarray(INITIAL_NOISE),
                corr=jnp.asarray(0.0),
            )

        def fitted_params(self):
            diag = RK.KernelParams(
                magnitude=jnp.asarray(self.diag_magnitudes),
                lengths=jnp.asarray(self.diag_lengths),
                noise=jnp.full(2, INITIAL_NOISE),
            )
            return diag, self._off_params()

    import gple_tpu.driver as drv_mod
    drv_mod.Optimizer = MomentOptimizer  # drop-in swap

    from gple_tpu.config import GPLEConfig
    from gple_tpu.oracles.schrodinger import DVRConfig, DVRSolver

    cfg = GPLEConfig(model="SAC", mass=2000.0, x0=opts.x0, p0=20.0, sigma_p0=1.0,
                     output_time=10.0, reopt_time=20.0, dt=1.0, num_points=opts.n)
    se_cfg = DVRConfig(model="SAC", boundary="reflective", mass=cfg.mass, x0=cfg.x0,
                       p0=cfg.p0, sigma_p=cfg.sigma_p0, xmin=cfg.xmin, xmax=cfg.xmax,
                       dx_input=1.0, output_time=cfg.output_time, dt_input=cfg.dt)
    se = DVRSolver(se_cfg).run(store_wigner=False)
    t0 = time.time()
    drv = drv_mod.GPLEDriver(cfg, verbose=False)
    hist = drv.run(max_ticks=opts.ticks)
    gt = np.array([r.time for r in hist])
    gp0 = np.array([r.population_mci[0] for r in hist])
    sp0 = np.interp(gt, se.times, se.populations[:, 0])
    rmse = float(np.sqrt(np.mean((gp0 - sp0) ** 2)))
    print(f"moment-opt: rmse {rmse:.6f} wall {time.time()-t0:.0f}s "
          f"final {gp0[-1]:.4f} vs {sp0[-1]:.4f} "
          f"reselections {drv.stats['cloud_reselections']}", flush=True)


if __name__ == "__main__":
    main()
