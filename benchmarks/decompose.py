"""Error decomposition: branching-scheme truncation vs GP surrogate error.

The round-2 accuracy question: the Tully-A population RMSE vs DVR sits at
~4e-2 against a 1e-3 target, and halving dt makes it WORSE -- so which part
of the pipeline owns the error?  This experiment substitutes the EXACT
phase-space distribution (the Wigner transform of the spectrally-propagated
DVR wavefunction, bilinearly interpolated) for the GP surrogate inside the
same `evolve_step`, isolating:

  * value error   -- cloud rho after a tick vs the exact Wigner at the cloud
                     points: pure scheme truncation (evolve.cpp:184-372's
                     backward-branching recombination, O(dt) family);
  * mci-pop error -- the normalized MC-sum population estimator
                     (predict.cpp:65-87) on exactly-weighted clouds vs the
                     DVR populations: scheme + sampling-estimator error.

If value error is ~1e-3 while the mci populations are ~1e-2 off, the GP and
the dynamics are NOT the accuracy ceiling -- the point-sampling population
estimator is.

Usage: python benchmarks/decompose.py [--ticks 240] [-n 64] [--dt 1.0]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SAC")
    ap.add_argument("--x0", type=float, default=-2.0)
    ap.add_argument("--p0", type=float, default=20.0)
    ap.add_argument("-n", type=int, default=64)
    ap.add_argument("--dt", type=float, default=1.0)
    ap.add_argument("--ticks", type=int, default=240)
    ap.add_argument("--platform", default="cpu")
    opts = ap.parse_args()

    import jax

    if opts.platform:
        jax.config.update("jax_platforms", opts.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from gple_tpu.config import GPLEConfig
    from gple_tpu.driver import INIT_DIST_ELEMS, init_dist_all
    from gple_tpu.dynamics import evolve as EV
    from gple_tpu.oracles.schrodinger import DVRConfig, DVRSolver, wigner_transform
    from gple_tpu.sampler import mc
    from gple_tpu.storage import NUM_ELEMENTS, Density

    cfg = GPLEConfig(
        model=opts.model, mass=2000.0, x0=opts.x0, p0=opts.p0, sigma_p0=1.0,
        output_time=10.0, reopt_time=20.0, dt=opts.dt, num_points=opts.n,
    )
    se_cfg = DVRConfig(
        model=opts.model, boundary="reflective", mass=cfg.mass, x0=cfg.x0,
        p0=cfg.p0, sigma_p=cfg.sigma_p0, xmin=cfg.xmin, xmax=cfg.xmax,
        dx_input=1.0, output_time=cfg.output_time, dt_input=cfg.dt,
    )
    solver = DVRSolver(se_cfg)
    x_grid = jnp.asarray(se_cfg.x_grid)
    p_grid = jnp.asarray(se_cfg.p_grid)
    dx = float(x_grid[1] - x_grid[0])
    dp = float(p_grid[1] - p_grid[0])
    x0g, p0g = float(x_grid[0]), float(p_grid[0])
    transform_h = solver.transform.conj().T

    @jax.jit
    def exact_wigner_ri(t):
        """Triangular RI Wigner grids (3, nx, np, 2) of the exact psi(t)."""
        psi_adia = transform_h @ solver._spectral_evolve(t)
        w = wigner_transform(psi_adia, x_grid, p_grid, dx, se_cfg.boundary)
        tri = jnp.stack([w[0, 0], w[1, 0], w[1, 1]])  # (3, nx, np) complex
        return jnp.stack([tri.real, tri.imag], axis=-1)

    from jax.scipy.ndimage import map_coordinates

    def wig_dist(w_ri, pts3):
        """dist_fn interface: (3, M, PhaseDim) -> (3, M, 2) RI by bilinear
        interpolation of the exact Wigner grids."""
        ix = (pts3[..., 0] - x0g) / dx
        ip = (pts3[..., 1] - p0g) / dp

        def one(k):
            re = map_coordinates(w_ri[k, :, :, 0], [ix[k], ip[k]], order=1, mode="constant")
            im = map_coordinates(w_ri[k, :, :, 1], [ix[k], ip[k]], order=1, mode="constant")
            return jnp.stack([re, im], axis=-1)

        return jnp.stack([one(k) for k in range(NUM_ELEMENTS)])

    # initial cloud: Metropolis sample of element (0,0); other elements start
    # at the same coordinates with their (vanishing) exact values
    key = jax.random.PRNGKey(cfg.seed)
    init_params = (
        jnp.asarray(cfg.r0), jnp.asarray(cfg.sigma_r0),
        jnp.asarray(cfg.initial_population), jnp.asarray(cfg.initial_phase_factor),
    )
    pts0 = jnp.tile(jnp.asarray(cfg.r0)[None, :], (cfg.num_points, 1))
    key, sub = jax.random.split(key)
    p00, _, _ = mc.element_monte_carlo(
        sub, INIT_DIST_ELEMS[0], init_params, pts0, mc.MCParameters(), tune=True
    )
    pts = jnp.tile(p00[None], (NUM_ELEMENTS, 1, 1))
    w0 = exact_wigner_ri(0.0)
    rho = wig_dist(w0, pts)
    density = Density(points=pts, rho=rho, active=jnp.ones(3, bool))

    evolve = jax.jit(
        lambda dens, w: EV.evolve_step(cfg.model, cfg.mass, cfg.dt, dens, wig_dist, w)
    )

    records = []
    t_start = time.time()
    for k in range(opts.ticks):
        w_k = exact_wigner_ri(k * cfg.dt)
        density = evolve(density, w_k)
        t_next = (k + 1) * cfg.dt
        w_next = exact_wigner_ri(t_next)
        exact_at_pts = wig_dist(w_next, density.points)
        # per-element value error, relative to the element's exact max
        err = np.asarray(jnp.sqrt(jnp.mean(jnp.sum((density.rho - exact_at_pts) ** 2, -1), 1)))
        scale = np.asarray(jnp.max(jnp.sqrt(jnp.sum(exact_at_pts**2, -1)), axis=1))
        # populations: mci estimator on the exactly-driven cloud vs DVR
        diag = np.asarray(density.rho[[0, 2], :, 0].sum(1))
        mci = diag / diag.sum()
        pop_exact = np.asarray(solver.populations(transform_h @ solver._spectral_evolve(t_next)))
        records.append(
            dict(t=t_next, value_err=(err / np.maximum(scale, 1e-30)).tolist(),
                 mci0=float(mci[0]), dvr0=float(pop_exact[0]))
        )
        if (k + 1) % 20 == 0:
            r = records[-1]
            print(
                f"t={r['t']:7.1f} value_err={np.array(r['value_err']).round(5)} "
                f"mci0={r['mci0']:.4f} dvr0={r['dvr0']:.4f}", flush=True,
            )

    mci = np.array([r["mci0"] for r in records])
    dvr = np.array([r["dvr0"] for r in records])
    verr = np.array([r["value_err"] for r in records])
    out = {
        "metric": "scheme-only population RMSE vs DVR (exact-distribution evolver)",
        "value": round(float(np.sqrt(np.mean((mci - dvr) ** 2))), 6),
        "final_mci0": round(float(mci[-1]), 6),
        "final_dvr0": round(float(dvr[-1]), 6),
        "value_err_final": [round(float(v), 6) for v in verr[-1]],
        "value_err_max": [round(float(v), 6) for v in verr.max(0)],
        "config": vars(opts),
        "wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
