"""Triage of the TPU parameter-integral (prm) degradation (VERDICT r3 #4).

Round 3 measured the analytic-integral estimator 5x worse on TPU than CPU at
the same config (rmse_prm 0.148 vs 0.031) while the MC estimator only drifted
0.068 vs 0.059.  Two candidate mechanisms:

  (a) the FIT/INTEGRAL path: the TPU's Newton-Schulz inverse (mixed f32/f64)
      reaches a different alpha / v than the CPU's direct f64 Cholesky, and
      the analytic population/purity integrals amplify the difference;
  (b) the DYNAMICS path: the f32 predict matmuls inside the evolver walk the
      cloud to slightly different labels, the moment hyperparameters follow,
      and the prm integrals amplify the lengthscale sensitivity.

This script isolates (a): THE SAME cloud and THE SAME hyperparameters are fit
on the host CPU (ground truth, reference-equivalent LDLT per kernel.cpp:281)
and on the accelerator; the analytic population / <r> / purity integrals
(kernel.cpp:286-335) are compared directly, swept over the moment-mode
lengthscale divisor (conditioning grows as lengths shrink).  Writes JSONL
rows; agreement at <1e-3 relative across the sweep rules (a) OUT and pins the
degradation on the dynamics feedback (b).

Usage: python benchmarks/prm_triage.py [--n 256] [--out file.jsonl]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# probe the tunnel BEFORE jax binds the backend: the round-4 on-chip triage
# died with "TPU backend UNAVAILABLE" on a transient tunnel drop
# (benchmarks/r04/prm_triage_stdout.log); bench.py's retry loop absorbs those
from bench import _tunnel_alive_with_retry  # noqa: E402

if not _tunnel_alive_with_retry():
    print(json.dumps({"error": "accelerator tunnel unreachable after retries"}))
    sys.exit(1)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gple_tpu.ops import complex_kernels as CK  # noqa: E402
from gple_tpu.ops import kernels as RK  # noqa: E402
from gple_tpu.utils import ri  # noqa: E402


def make_cloud(n, seed=0):
    """A production-like coherence-bearing cloud at the SAC crossing scale:
    Gaussian positions, fringed off-diagonal labels (the div-6 surface)."""
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.normal(0.0, 0.4, n), rng.normal(20.0, 1.3, n)], axis=-1)
    env = np.exp(-0.5 * (((pts[:, 0]) / 0.4) ** 2 + ((pts[:, 1] - 20.0) / 1.3) ** 2))
    diag_label = 0.08 * env
    fr = 3.0 * pts[:, 1]
    off_label = 0.04 * env * np.exp(1.0j * fr)
    return (jnp.asarray(pts), jnp.asarray(diag_label),
            ri.from_complex(jnp.asarray(off_label)))


def wstd(pts, w):
    w = np.maximum(np.abs(np.asarray(w)), 1e-30)
    mu = (np.asarray(pts) * w[:, None]).sum(0) / w.sum()
    var = (((np.asarray(pts) - mu) ** 2) * w[:, None]).sum(0) / w.sum()
    return np.sqrt(var)


def fit_and_integrals(device, pts, y_diag, y_off, len_div, block_diag,
                      warm_from=None):
    """Fit the real + complex kernels on ``device``; return the analytic
    integrals and (TPU only) the NS residual max|I - K X|."""
    std_d = wstd(pts, y_diag)
    std_o = wstd(pts, y_off[:, 0])
    dp = RK.KernelParams(
        magnitude=jnp.asarray(1.0), lengths=jnp.asarray(std_d / 2.0),
        noise=jnp.asarray(1e-2),
    )
    op = CK.ComplexKernelParams(
        magnitude=jnp.asarray(1.0),
        real_magnitude=jnp.asarray(float(np.sqrt(np.mean(np.asarray(y_off)[:, 0] ** 2)))),
        real_lengths=jnp.asarray(std_o / len_div),
        imag_magnitude=jnp.asarray(float(np.sqrt(np.mean(np.asarray(y_off)[:, 1] ** 2)))),
        imag_lengths=jnp.asarray(std_o / len_div),
        noise=jnp.asarray(1e-2), corr=jnp.asarray(0.0),
    )
    with jax.default_device(device):
        # implicit placement via the default_device context: an EXPLICIT
        # jax.device_put to the axon device dies with "TPU backend
        # setup/compile error (Unavailable)" -- reproduced three times
        # (r04 + two r05 attempts) while every parity/bench run in the same
        # hours succeeded; commit-time arrays transfer fine
        pts_d = jnp.asarray(np.asarray(pts))
        yd = jnp.asarray(np.asarray(y_diag))
        yo = jnp.asarray(np.asarray(y_off))
        if warm_from is None:
            st = RK.fit_real(dp, pts_d, yd)
            kw = None
        else:
            st = RK.fit_real(dp, pts_d, yd, kinv_warm=warm_from[0])
            kw = warm_from[1]
        if kw is None:
            so = CK.fit_complex(op, pts_d, yo, block_diag=block_diag)
        else:
            so = CK.fit_complex(op, pts_d, yo, block_diag=block_diag, w_warm=kw)
        k = RK.kernel_matrix(dp, pts_d, pts_d, same=True)
        resid = float(jnp.max(jnp.abs(
            jnp.eye(k.shape[0], dtype=k.dtype) - k @ st.kinv)))
        out = dict(
            pop=float(RK.population(st)),
            ravg=[float(v) for v in np.asarray(RK.r_average(st))],
            pur_diag=float(RK.purity(st)),
            pur_off=float(CK.purity_complex(so)),
            ns_resid=resid,
        )
    return out, (st.kinv, so.diag_blocks() if block_diag else so.augmented_inverse())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--out", default="benchmarks/r05/prm_triage.jsonl")
    opts = ap.parse_args()

    cpu = jax.local_devices(backend="cpu")[0]
    accels = [d for d in jax.devices() if d.platform != "cpu"]
    if not accels:
        print(json.dumps({"error": "no accelerator visible"}))
        return 1
    acc = accels[0]

    pts, y_diag, y_off = make_cloud(opts.n)
    rows = []
    for len_div in (2.0, 4.0, 6.0):
        ref, _ = fit_and_integrals(cpu, pts, y_diag, y_off, len_div, False)
        row = {"n": opts.n, "len_div": len_div, "cpu": ref}
        tpu_cold, warm_state = fit_and_integrals(
            acc, pts, y_diag, y_off, len_div, True)
        row["tpu_cold_bd"] = tpu_cold
        tpu_full, _ = fit_and_integrals(acc, pts, y_diag, y_off, len_div, False)
        row["tpu_cold_full"] = tpu_full
        tpu_warm, _ = fit_and_integrals(
            acc, pts, y_diag, y_off, len_div, True, warm_from=warm_state)
        row["tpu_warm_bd"] = tpu_warm

        def rel(a, b):
            return abs(a - b) / max(abs(b), 1e-30)

        row["rel_err"] = {
            k: {
                "pop": rel(row[k]["pop"], ref["pop"]),
                "pur_diag": rel(row[k]["pur_diag"], ref["pur_diag"]),
                "pur_off": rel(row[k]["pur_off"], ref["pur_off"]),
            }
            for k in ("tpu_cold_bd", "tpu_cold_full", "tpu_warm_bd")
        }
        print(json.dumps(row), flush=True)
        rows.append(row)
    os.makedirs(os.path.dirname(opts.out), exist_ok=True)
    with open(opts.out, "a") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
