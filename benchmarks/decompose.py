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
    ap.add_argument(
        "--gp", default="none", choices=["none", "diag", "off", "all"],
        help="elements whose queries go through an IDEAL-LABEL GP (fit each "
        "tick to the exact Wigner values at the cloud points, moment-based "
        "hyperparameters, no optimizer) instead of the exact grid -- isolates "
        "pure GP interpolation capacity per element family",
    )
    ap.add_argument(
        "--frame", default="static", choices=["static", "rotating", "chirp", "carried"],
        help="rotating: fit the coherence GP in the frame e^{+i dE(x) t / "
        "hbar} that unwinds the secular phase accumulation -- the coherence "
        "field's spatial fringe frequency grows ~ t d(dE)/dx, which a "
        "stationary RBF kernel cannot track; the envelope stays smooth. "
        "carried: each point carries its own phase integrated along its OWN "
        "trajectory (midpoint rule on dE(x)/hbar); the GP fits the "
        "demodulated amplitude, and the phi field itself is reconstructed at "
        "query points by a weighted-linear detrend + real GP on the residual",
    )
    ap.add_argument("--frame-sign", type=float, default=1.0)
    ap.add_argument("--len-div", type=float, default=2.0,
                    help="coherence GP lengths = weighted std / len_div")
    ap.add_argument("--rotate", action="store_true",
                    help="fit the coherence GP in the cloud's |label|-weighted "
                    "principal-axis frame (a shared rotation for Re/Im): a "
                    "restricted full-ARD kernel W = diag(1/l) R that can align "
                    "to tilted post-crossing fringes")
    ap.add_argument("--anchor", action="store_true",
                    help="anchor coherence reads at the nearest cloud point's "
                    "carried value + GP difference (cross-element control "
                    "variate): kills the GP's smoothing bias in the transfer "
                    "flux, the GP supplies only a local correction")
    ap.add_argument(
        "--labels", default="exact", choices=["exact", "carried"],
        help="exact: GP fit to the exact Wigner at the cloud (pure "
        "interpolation capacity); carried: GP fit to the cloud's own evolved "
        "rho values (the production feedback loop, minus the optimizer)",
    )
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

    from gple_tpu.ops import complex_kernels as CK
    from gple_tpu.ops import kernels as RK

    gp_diag = opts.gp in ("diag", "all")
    gp_off = opts.gp in ("off", "all")

    def _wstd(points, w):
        """|w|-weighted per-dim std of a cloud, floored."""
        w = jnp.maximum(jnp.abs(w), 1e-30)
        mu = (points.T @ w) / jnp.sum(w)
        var = (((points - mu) ** 2).T @ w) / jnp.sum(w)
        return jnp.sqrt(jnp.maximum(var, 1e-12))

    carried_labels = opts.labels == "carried"
    rotating = opts.frame == "rotating"
    carried_frame = opts.frame == "carried"
    frame_sign = opts.frame_sign

    from gple_tpu.models import tully
    from gple_tpu.utils.constants import HBAR

    def gap_rate(pts):
        """dE(x)/hbar = (E1 - E0)(x)/hbar at the query points, (M,)."""
        e = tully.adiabatic_potential(cfg.model, pts[..., 0])
        return (e[..., 1] - e[..., 0]) / HBAR

    def _phi_field_fit(cloud_pts, phi, weights):
        """Weighted linear detrend + real GP on the residual of the carried
        phase field.  Returns (plane_coef, gp_state): the phase ramp steepens
        ~ t d(dE)/dx, so the plane absorbs the secular gradient and the GP
        only carries the smooth curvature."""
        a = jnp.concatenate([jnp.ones((cloud_pts.shape[0], 1)), cloud_pts], axis=1)
        aw = a * weights[:, None]
        coef = jnp.linalg.solve(
            a.T @ aw + 1e-10 * jnp.eye(3), aw.T @ phi
        )
        resid = phi - a @ coef
        lens = _wstd(cloud_pts, weights) / opts.len_div
        st = RK.fit_real(
            RK.KernelParams(jnp.asarray(1.0), lens, jnp.asarray(0.01)),
            cloud_pts, resid,
        )
        return coef, st

    def _phi_field_read(coef, st, pts):
        a = jnp.concatenate([jnp.ones((pts.shape[0], 1)), pts], axis=1)
        resid, _, _ = RK.predict_real(st, pts, with_variance=False)
        return a @ coef + resid

    def mixed_dist(carry, pts3):
        """Exact Wigner for elements outside the --gp set; GP for those
        inside, fit to exact or carried labels at the cloud points."""
        w_ri, cloud, cloud_rho, t_now, phi = carry
        out = wig_dist(w_ri, pts3)
        exact_cloud = cloud_rho if carried_labels else wig_dist(w_ri, cloud)
        if gp_diag:
            rows = []
            for k, d in ((0, 0), (2, 1)):
                labels = exact_cloud[k, :, 0]
                lens = _wstd(cloud[k], labels) / 2.0
                st = RK.fit_real(
                    RK.KernelParams(jnp.asarray(1.0), lens, jnp.asarray(0.01)),
                    cloud[k], labels,
                )
                mean, _, _ = RK.predict_real(st, pts3[k], with_variance=False)
                rows.append((k, ri.ri(mean)))
            for k, v in rows:
                out = out.at[k].set(v)
        if gp_off:
            labels = exact_cloud[1]
            if rotating:
                # unwind e^{-i dE(x) t} accumulated by the carried evolution
                labels = ri.phase_mul(labels, frame_sign * gap_rate(cloud[1]) * t_now)
            o_cloud, o_query = cloud[1], pts3[1]
            if opts.rotate:
                # |label|-weighted covariance principal axes of the cloud
                wv = jnp.sqrt(jnp.sum(labels**2, -1)) + 1e-30
                mu = (o_cloud.T @ wv) / jnp.sum(wv)
                dc = o_cloud - mu
                cov = (dc.T * wv) @ dc / jnp.sum(wv)
                _, rot = jnp.linalg.eigh(cov)  # columns = principal axes
                o_cloud = (o_cloud - mu) @ rot
                o_query = (o_query - mu) @ rot
            phi_coef = phi_st = None
            if carried_frame:
                # demodulate by each point's OWN integrated phase
                labels = ri.phase_mul(labels, -phi)
                w_abs0 = jnp.sqrt(jnp.sum(exact_cloud[1] ** 2, -1)) + 1e-30
                phi_coef, phi_st = _phi_field_fit(cloud[1], phi, w_abs0)
            w_abs = jnp.sqrt(jnp.sum(labels**2, -1))
            lr = _wstd(o_cloud, labels[:, 0]) / opts.len_div
            li = _wstd(o_cloud, labels[:, 1]) / opts.len_div
            params = CK.ComplexKernelParams(
                magnitude=jnp.asarray(1.0),
                real_magnitude=jnp.sqrt(jnp.mean(labels[:, 0] ** 2) + 1e-30),
                real_lengths=lr,
                imag_magnitude=jnp.sqrt(jnp.mean(labels[:, 1] ** 2) + 1e-30),
                imag_lengths=li,
                noise=jnp.asarray(0.01),
                corr=jnp.asarray(0.0),
            )
            st = CK.fit_complex(params, o_cloud, labels, chirp=(opts.frame == "chirp"))
            mean, _, _ = CK.predict_complex(st, o_query, with_variance=False)
            if rotating:
                mean = ri.phase_mul(mean, -frame_sign * gap_rate(pts3[1]) * t_now)
            if carried_frame:
                mean = ri.phase_mul(mean, _phi_field_read(phi_coef, phi_st, pts3[1]))
            if opts.anchor:
                scale = jnp.std(cloud[1], axis=0) + 1e-30
                d2 = jnp.sum(
                    ((pts3[1][:, None, :] - cloud[1][None, :, :]) / scale) ** 2, -1
                )
                nn = jnp.argmin(d2, axis=1)
                mean_at_nn, _, _ = CK.predict_complex(st, cloud[1][nn], with_variance=False)
                mean = cloud_rho[1][nn] + mean - mean_at_nn
            out = out.at[1].set(mean)
        return out

    from gple_tpu.utils import ri

    if opts.gp == "none":
        evolve = jax.jit(
            lambda dens, w, t, phi: EV.evolve_step(cfg.model, cfg.mass, cfg.dt, dens, wig_dist, w)
        )
    else:
        evolve = jax.jit(
            lambda dens, w, t, phi: EV.evolve_step(
                cfg.model, cfg.mass, cfg.dt, dens, mixed_dist,
                (w, dens.points, dens.rho, t, phi),
            )
        )

    records = []
    t_start = time.time()
    phi = jnp.zeros(cfg.num_points)
    # importance weights: the cloud was Metropolis-sampled from rho00(., 0),
    # and each element's per-point flow is a leapfrog (symplectic, so
    # volume-preserving) -- the sampling density at point k stays q_k =
    # rho00(r_k(0), 0) along its whole trajectory.  pop_s(t) =
    # E_q[rho_ss / q] = mean_k rho_ss(r_k, t) / q_k is then unbiased, unlike
    # the normalized MC sum (predict.cpp:65-87 semantics) whose weights
    # assume the cloud still tracks |rho_ss(., t)|.
    q0 = jnp.maximum(rho[0, :, 0], 1e-12)
    for k in range(opts.ticks):
        w_k = exact_wigner_ri(k * cfg.dt)
        x_before = density.points[1, :, 0]
        density = evolve(density, w_k, jnp.asarray(k * cfg.dt), phi)
        # integrate each coherence point's own phase (midpoint rule): the
        # carried evolution multiplies rho10 by e^{-i dE(x)/hbar dt} per tick
        x_mid = 0.5 * (x_before + density.points[1, :, 0])
        e_mid = tully.adiabatic_potential(cfg.model, x_mid)
        phi = phi - (e_mid[:, 1] - e_mid[:, 0]) / HBAR * cfg.dt
        t_next = (k + 1) * cfg.dt
        w_next = exact_wigner_ri(t_next)
        exact_at_pts = wig_dist(w_next, density.points)
        # per-element value error, relative to the element's exact max
        err = np.asarray(jnp.sqrt(jnp.mean(jnp.sum((density.rho - exact_at_pts) ** 2, -1), 1)))
        scale = np.asarray(jnp.max(jnp.sqrt(jnp.sum(exact_at_pts**2, -1)), axis=1))
        # populations: mci estimator on the exactly-driven cloud vs DVR
        diag = np.asarray(density.rho[[0, 2], :, 0].sum(1))
        mci = diag / diag.sum()
        imp = np.asarray(jnp.mean(density.rho[jnp.asarray([0, 2]), :, 0] / q0, axis=1))
        pop_exact = np.asarray(solver.populations(transform_h @ solver._spectral_evolve(t_next)))
        records.append(
            dict(t=t_next, value_err=(err / np.maximum(scale, 1e-30)).tolist(),
                 mci0=float(mci[0]), dvr0=float(pop_exact[0]),
                 imp0=float(imp[0]), imp0n=float(imp[0] / max(imp.sum(), 1e-30)))
        )
        if (k + 1) % 20 == 0:
            r = records[-1]
            print(
                f"t={r['t']:7.1f} value_err={np.array(r['value_err']).round(5)} "
                f"mci0={r['mci0']:.4f} dvr0={r['dvr0']:.4f}", flush=True,
            )

    mci = np.array([r["mci0"] for r in records])
    dvr = np.array([r["dvr0"] for r in records])
    imp = np.array([r["imp0"] for r in records])
    impn = np.array([r["imp0n"] for r in records])
    verr = np.array([r["value_err"] for r in records])
    out = {
        "metric": f"decomposed population RMSE vs DVR (gp={opts.gp}, labels={opts.labels})",
        "value": round(float(np.sqrt(np.mean((mci - dvr) ** 2))), 6),
        "rmse_importance": round(float(np.sqrt(np.mean((imp - dvr) ** 2))), 6),
        "rmse_importance_norm": round(float(np.sqrt(np.mean((impn - dvr) ** 2))), 6),
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
