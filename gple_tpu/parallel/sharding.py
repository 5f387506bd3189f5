"""Multi-chip data parallelism over sampled phase-space points.

The reference is a single process with shared-memory loops (SURVEY.md section
2.5); its scaling dimension is the number of sampled points N per element.
Here that axis shards across a ``jax.sharding.Mesh``:

* the evolution step (trajectory moves + the 3x3-branch GP queries) is
  embarrassingly parallel over points -- each device evolves its shard against
  a REPLICATED GP state (the training set is small, N <= a few thousand);
* the GP refit gathers the (small) point set and factorizes replicated --
  a Cholesky at N = 1024 is far below the threshold where distributing it
  would pay for its collectives;
* observables are sharded reductions; GSPMD inserts the psums over ICI.

This module provides the mesh plumbing and a sharded fit+evolve step used by
``__graft_entry__.dryrun_multichip`` and by multi-chip benchmarks.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gple_tpu.dynamics.evolve import evolve_step
from gple_tpu.driver import gp_dist_all
from gple_tpu.storage import Density, GPStates, fit_gp_states

POINTS_AXIS = "points"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (POINTS_AXIS,))


def density_sharding(mesh: Mesh):
    """Shard the point axis of every Density leaf."""
    return Density(
        points=NamedSharding(mesh, P(None, POINTS_AXIS, None)),
        rho=NamedSharding(mesh, P(None, POINTS_AXIS, None)),
        active=NamedSharding(mesh, P()),
    )


def shard_density(density: Density, mesh: Mesh) -> Density:
    sh = density_sharding(mesh)
    return Density(
        points=jax.device_put(density.points, sh.points),
        rho=jax.device_put(density.rho, sh.rho),
        active=jax.device_put(density.active, sh.active),
    )


def make_step_fn(model: str, mass: float, dt: float):
    """The flagship fit+evolve step: evolve all points one tick with the
    current GP surrogate, then refactorize the GPs from the moved points
    (the per-tick work of reference main.cpp:135-202)."""

    def step(density: Density, gps: GPStates):
        new_density = evolve_step(model, mass, dt, density, gp_dist_all, gps)
        new_gps = fit_gp_states(gps.diag.params, gps.offdiag.params, new_density,
                                prev=gps)
        return new_density, new_gps

    return step


def sharded_step_fn(model: str, mass: float, dt: float, mesh: Mesh):
    """jit the full step with points sharded over the mesh and the GP state
    replicated; XLA/GSPMD inserts the all-gather for the refit and keeps the
    evolution shard-local."""
    step = make_step_fn(model, mass, dt)
    dsh = density_sharding(mesh)
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(dsh, rep),
        out_shardings=(dsh, rep),
    )
