"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from gple_tpu.parallel.sharding import (
    make_mesh,
    make_step_fn,
    shard_density,
    sharded_step_fn,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_matches_single_device():
    """The sharded step must produce bit-comparable results to the
    replicated single-device step."""
    import __graft_entry__ as g

    density, gps = g._example_state(64)
    step = make_step_fn("SAC", 2000.0, 1.0)
    ref_density, ref_gps = jax.jit(step)(density, gps)

    mesh = make_mesh(8)
    sdensity = shard_density(density, mesh)
    sstep = sharded_step_fn("SAC", 2000.0, 1.0, mesh)
    out_density, out_gps = sstep(sdensity, gps)
    np.testing.assert_allclose(
        np.asarray(out_density.points), np.asarray(ref_density.points), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_density.rho), np.asarray(ref_density.rho), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_gps.diag.alpha), np.asarray(ref_gps.diag.alpha), atol=1e-8
    )


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    new_density, new_gps = out
    assert np.all(np.isfinite(np.asarray(new_density.rho)))
