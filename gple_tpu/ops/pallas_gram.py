"""Pallas TPU kernels for the hot GP operations.

The reference's hottest loops are the O(N^2 PhaseDim) Gram construction
(``kernel.cpp:38-85``) and the O(M N) predictive products (``kernel.cpp:495``),
executed thousands of times per optimization and 9 times per point per
evolution step.  XLA already fuses the jnp formulation well; these Pallas
kernels go further for the prediction path by computing k(x*, X) tiles on the
fly in VMEM and accumulating the mean matvec without ever materializing the
(M, N) cross-kernel matrix in HBM -- the predict becomes compute-bound instead
of bandwidth-bound.

Kernels compute in float32 (the TPU-native width; Mosaic has no f64 path).

**Status: measured, not wired.**  On the real v5e (`benchmarks/bench_pallas.py`,
2026-08-17, varied inputs to defeat the device result cache) the Pallas gram
matches stock XLA and the fused mean runs 0.86-1.0x of it -- XLA already fuses
the cross-kernel + matvec, and the production step's hot phase is the f64 fit
factorization (235 ms standalone at N = 1024) rather than the predict
(22 ms including all gram/mean/variance work, `benchmarks/bench_phases.py`).
Production therefore keeps the XLA path; these kernels remain as correct,
real-TPU-validated building blocks with tests (interpreter mode on CPU,
`tests/test_pallas.py`) should a bandwidth-bound predict variant appear
(e.g. much larger query fans).

Note the ``jnp.int32(0)`` literals in every BlockSpec index map: under
``jax_enable_x64`` a bare Python ``0`` traces as i64 while ``program_id`` is
i32, and Mosaic refuses the mixed-width ``func.return`` ("failed to legalize
operation 'func.return'", reproduced on the v5e).  Constructing the constant
inside the trace at i32 keeps the index map single-width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # pltpu is importable on all platforms; kernels still need a TPU to run
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

TILE = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad_points(x, tile: int):
    """Pad points to a tile multiple with a far-away sentinel so padded rows
    contribute exp(-huge) = 0 to any Gram entry."""
    n = x.shape[0]
    n_pad = _round_up(n, tile)
    if n_pad == n:
        return x, n
    pad = jnp.full((n_pad - n, x.shape[1]), 1e12, dtype=x.dtype)
    return jnp.concatenate([x, pad]), n


def _gram_kernel(za_ref, zb_ref, out_ref):
    za = za_ref[:]  # (TILE, D)
    zb = zb_ref[:]  # (TILE, D)
    # squared distance via |a|^2 + |b|^2 - 2 a.b : the cross term uses the MXU
    aa = jnp.sum(za * za, axis=1, keepdims=True)           # (TILE, 1)
    bb = jnp.sum(zb * zb, axis=1, keepdims=True).T         # (1, TILE)
    ab = jnp.dot(za, zb.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(aa + bb - 2.0 * ab, 0.0)
    out_ref[:] = jnp.exp(-0.5 * d2)


def gram_pallas(lengths, xa, xb, interpret: bool = False):
    """Unit-magnitude RBF Gram exp(-1/2 sum((a-b)/l)^2) as a tiled Pallas
    kernel, f32.  Equivalent to :func:`gple_tpu.ops.kernels.gram`."""
    za = (xa / lengths).astype(jnp.float32)
    zb = (xb / lengths).astype(jnp.float32)
    za, na = _pad_points(za, TILE)
    zb, nb = _pad_points(zb, TILE)
    ma, mb = za.shape[0], zb.shape[0]
    d = za.shape[1]
    grid = (ma // TILE, mb // TILE)
    out = pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i, j: (i, jnp.int32(0))),
            pl.BlockSpec((TILE, d), lambda i, j: (j, jnp.int32(0))),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((ma, mb), jnp.float32),
        interpret=interpret,
    )(za, zb)
    return out[:na, :nb]


def _predict_kernel(zt_ref, ztr_ref, alpha_ref, out_ref, acc_ref):
    """Accumulate one (TILE_M test x TILE_N train) block of k(x*, X) alpha."""
    j = pl.program_id(1)
    zt = zt_ref[:]          # (TILE, D) test
    ztr = ztr_ref[:]        # (TILE, D) train
    alpha = alpha_ref[:]    # (TILE, 1)
    aa = jnp.sum(zt * zt, axis=1, keepdims=True)
    bb = jnp.sum(ztr * ztr, axis=1, keepdims=True).T
    ab = jnp.dot(zt, ztr.T, preferred_element_type=jnp.float32)
    k = jnp.exp(-0.5 * jnp.maximum(aa + bb - 2.0 * ab, 0.0))

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(k, alpha, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def predict_mean_pallas(lengths, magnitude, x_test, x_train, alpha,
                        interpret: bool = False):
    """Fused GP mean prediction sigma^2 k(x*, X) alpha without materializing
    the (M, N) cross-kernel in HBM.  Matches
    ``kernel_matrix(...) @ alpha`` of the jnp path (kernel.cpp:495)."""
    zt = (x_test / lengths).astype(jnp.float32)
    ztr = (x_train / lengths).astype(jnp.float32)
    zt, m = _pad_points(zt, TILE)
    ztr, n = _pad_points(ztr, TILE)
    alpha_p = jnp.zeros((ztr.shape[0], 1), dtype=jnp.float32)
    alpha_p = alpha_p.at[:n, 0].set(alpha.astype(jnp.float32))
    d = zt.shape[1]
    grid = (zt.shape[0] // TILE, ztr.shape[0] // TILE)
    out = pl.pallas_call(
        _predict_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i, j: (i, jnp.int32(0))),
            pl.BlockSpec((TILE, d), lambda i, j: (j, jnp.int32(0))),
            pl.BlockSpec((TILE, 1), lambda i, j: (j, jnp.int32(0))),
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda i, j: (i, jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((zt.shape[0], 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, 1), jnp.float32)] if _HAS_PLTPU else [],
        interpret=interpret,
    )(zt, ztr, alpha_p)
    return (magnitude.astype(jnp.float32) ** 2) * out[:m, 0]
