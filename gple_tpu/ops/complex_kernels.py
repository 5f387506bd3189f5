"""Complex Gaussian-process kernel for the off-diagonal density-matrix element.

TPU-first re-design of the reference CGPR stack
(``gaussian_process_liouville_equation/complex_kernel.{h,cpp}``):

The complex GP over f = f_R + i f_I uses a covariance and a pseudo-covariance
built from three real RBF kernels (real, imaginary, and their correlation):

    K        = sigma^2 (K_R + K_I + sigma_n^2 I)            -- complex_kernel.cpp:163
    K-tilde  = sigma^2 (K_R - K_I + 2 i K_C)                -- complex_kernel.cpp:164

with the correlation kernel's parameters derived from the real/imaginary ones
(geometric-mean magnitude, RMS lengths, ``complex_kernel.cpp:144-157``).  The
augmented 2N x 2N system [[K, Kt], [Kt*, K*]] is solved through its P/Q blocks
(``complex_kernel.cpp:264-268``):

    T = K^-1 Kt*                (Cholesky solve)
    P = (K - Kt T)^-1           (upper-left block, Hermitian)
    Q = -T P                    (lower-left block)
    v = P y + conj(Q y)         (upper half of the augmented solve)

prediction mean = K_* v + Kt_* conj(v); the LOOCV error, variance, optimal
magnitude, and the five-auxiliary-kernel purity integral follow the reference
formulas cited inline.  As with the real kernel, every hand-derived gradient
of the reference (complex_kernel.cpp:379-590) is replaced by ``jax.grad``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gple_tpu.ops.kernels import (
    CONNECTING_POINT,
    RESCALE_MAXIMUM,
    cutoff_factor,
    gram,
)
from gple_tpu.utils.constants import purity_factor


class ComplexKernelParams(NamedTuple):
    """Reference parameter order complex_kernel.cpp:230-255:
    (global magnitude, (m_R, l_R), (m_I, l_I), noise) -- 2 + 2*(1+PhaseDim) total."""

    magnitude: jnp.ndarray      # scalar global sigma
    real_magnitude: jnp.ndarray
    real_lengths: jnp.ndarray   # (PhaseDim,)
    imag_magnitude: jnp.ndarray
    imag_lengths: jnp.ndarray   # (PhaseDim,)
    noise: jnp.ndarray          # scalar

    def to_flat(self) -> jnp.ndarray:
        return jnp.concatenate(
            [
                jnp.atleast_1d(self.magnitude),
                jnp.atleast_1d(self.real_magnitude),
                self.real_lengths,
                jnp.atleast_1d(self.imag_magnitude),
                self.imag_lengths,
                jnp.atleast_1d(self.noise),
            ],
            axis=-1,
        )

    @classmethod
    def from_flat(cls, flat: jnp.ndarray) -> "ComplexKernelParams":
        d = (flat.shape[-1] - 4) // 2
        return cls(
            magnitude=flat[..., 0],
            real_magnitude=flat[..., 1],
            real_lengths=flat[..., 2 : 2 + d],
            imag_magnitude=flat[..., 2 + d],
            imag_lengths=flat[..., 3 + d : 3 + 2 * d],
            noise=flat[..., -1],
        )


def correlation_params(p: ComplexKernelParams):
    """Derived correlation-kernel (magnitude, lengths) (complex_kernel.cpp:144-157)."""
    lr2, li2 = p.real_lengths**2, p.imag_lengths**2
    sum_sq = lr2 + li2
    corr_mag = jnp.sqrt(
        p.real_magnitude
        * p.imag_magnitude
        * jnp.prod(2.0 * p.real_lengths * p.imag_lengths / sum_sq)
    )
    corr_len = jnp.sqrt(sum_sq / 2.0)
    return corr_mag, corr_len


def covariance_matrices(p: ComplexKernelParams, xa, xb, same: bool):
    """(K, Kt): the covariance (real) and pseudo-covariance (complex)."""
    kr = p.real_magnitude**2 * gram(p.real_lengths, xa, xb)
    ki = p.imag_magnitude**2 * gram(p.imag_lengths, xa, xb)
    cm, cl = correlation_params(p)
    kc = cm**2 * gram(cl, xa, xb)
    noise = p.noise**2 * jnp.eye(xa.shape[-2], dtype=kr.dtype) if same else 0.0
    k = p.magnitude**2 * (kr + ki + noise)
    kt = p.magnitude**2 * (kr - ki + 2.0j * kc)
    return k, kt


class ComplexTrainState(NamedTuple):
    params: ComplexKernelParams
    features: jnp.ndarray       # (N, PhaseDim)
    labels: jnp.ndarray         # (N,) complex, rescaled
    rescale: jnp.ndarray
    p_block: jnp.ndarray        # (N, N) complex: upper-left augmented inverse
    q_block: jnp.ndarray        # (N, N) complex: lower-left augmented inverse
    v: jnp.ndarray              # (N,) complex: upper augmented solve


def fit_complex(params: ComplexKernelParams, features, labels_raw) -> ComplexTrainState:
    """Factorize the augmented training system (TrainingComplexKernel ctor,
    complex_kernel.cpp:221-268)."""
    rescale = RESCALE_MAXIMUM / jnp.maximum(jnp.max(jnp.abs(labels_raw)), 1e-300)
    y = labels_raw * rescale
    k, kt = covariance_matrices(params, features, features, same=True)
    kc = k.astype(kt.dtype)
    chol = jax.scipy.linalg.cho_factor(kc)
    t = jax.scipy.linalg.cho_solve(chol, jnp.conj(kt))          # K^-1 Kt*
    schur = kc - kt @ t                                          # K - Kt K^-1 Kt*
    schur = 0.5 * (schur + schur.conj().T)
    p_block = jnp.linalg.inv(schur)
    p_block = 0.5 * (p_block + p_block.conj().T)
    q_block = -t @ p_block
    v = p_block @ y + jnp.conj(q_block @ y)
    return ComplexTrainState(
        params=params, features=features, labels=y, rescale=rescale,
        p_block=p_block, q_block=q_block, v=v,
    )


def loocv_error_complex(state: ComplexTrainState) -> jnp.ndarray:
    """Complex leave-one-out CV error (complex_kernel.cpp:270-286)."""
    p_diag = jnp.diagonal(state.p_block)
    q_diag = jnp.diagonal(state.q_block)
    denom = jnp.real(p_diag) ** 2 - jnp.abs(q_diag) ** 2
    diff = (p_diag * state.v - jnp.conj(q_diag * state.v)) / denom
    return jnp.sum(jnp.abs(diff) ** 2)


def optimal_magnitude_complex(state: ComplexTrainState) -> jnp.ndarray:
    """sqrt(Re(y^H v) / N) (complex_kernel.h:190-204)."""
    within = jnp.real(jnp.vdot(state.labels, state.v)) / state.labels.shape[0]
    return jnp.sqrt(jnp.abs(within))


def predict_complex(state: ComplexTrainState, test_features, with_variance: bool = True):
    """Mean, variance, cutoff prediction at test points (complex_kernel.cpp:594-643)."""
    p = state.params
    k_star, kt_star = covariance_matrices(p, test_features, state.features, same=False)
    k_star = k_star.astype(kt_star.dtype)
    mean = k_star @ state.v + kt_star @ jnp.conj(state.v)
    if not with_variance:
        return mean / state.rescale, None, mean / state.rescale
    # self-covariance k(x, x) = sigma^2 (m_R^2 + m_I^2 + noise^2)
    self_k = p.magnitude**2 * (p.real_magnitude**2 + p.imag_magnitude**2 + p.noise**2)
    pb, qb = state.p_block, state.q_block
    t1 = jnp.einsum("mi,ij,mj->m", k_star, pb, jnp.conj(k_star))
    t2 = jnp.einsum("mi,ij,mj->m", kt_star, jnp.conj(pb), jnp.conj(kt_star))
    t3 = jnp.einsum("mi,ij,mj->m", kt_star, qb, jnp.conj(k_star))
    t4 = jnp.einsum("mi,ij,mj->m", k_star, jnp.conj(qb), jnp.conj(kt_star))
    var = jnp.real(self_k - t1 - t2 - t3 - t4)
    cut = cutoff_factor(mean, var)
    return mean / state.rescale, var, mean * cut / state.rescale


def extra_set_error_complex(state, test_features, test_labels_raw) -> jnp.ndarray:
    """Squared prediction error on a held-out complex set (complex_kernel.cpp:645-646)."""
    p = state.params
    k_star, kt_star = covariance_matrices(p, test_features, state.features, same=False)
    mean = k_star.astype(kt_star.dtype) @ state.v + kt_star @ jnp.conj(state.v)
    y = test_labels_raw * state.rescale
    return jnp.sum(jnp.abs(mean - y) ** 2)


# -- purity via five auxiliary kernels (complex_kernel.cpp:287-377) -------------

def _aux_self(mag, lengths):
    """Auxiliary params of one kernel: (mag^2 sqrt(prod l), sqrt(2) l)."""
    return mag**2 * jnp.sqrt(jnp.prod(lengths)), jnp.sqrt(2.0) * lengths


def _aux_mixed(mag_a, len_a, mag_b, len_b):
    """Mixed auxiliary params (complex_kernel.cpp:206-219)."""
    mag = mag_a * mag_b / jnp.sqrt(
        jnp.sqrt(jnp.prod(0.5 * (1.0 / len_a**2 + 1.0 / len_b**2)))
    )
    lengths = jnp.sqrt(len_a**2 + len_b**2)
    return mag, lengths


def purity_complex(state: ComplexTrainState) -> jnp.ndarray:
    """(2 pi hbar)^Dim * 2 pi^Dim sigma^4 [Re(v^H K1 v) + Re(v^T K2 v)] / rescale^2
    with K1 = K_R' + K_I' + 2 K_C', K2 = K_R' - K_I' - 2i (K_RC + K_IC)."""
    p = state.params
    x = state.features
    d = x.shape[-1] // 2
    cm, cl = correlation_params(p)

    def aux_gram(mag, lengths):
        return mag**2 * gram(lengths, x, x)

    krp = aux_gram(*_aux_self(p.real_magnitude, p.real_lengths))
    kip = aux_gram(*_aux_self(p.imag_magnitude, p.imag_lengths))
    kcp = aux_gram(*_aux_self(cm, cl))
    krc = aux_gram(*_aux_mixed(p.real_magnitude, p.real_lengths, cm, cl))
    kic = aux_gram(*_aux_mixed(p.imag_magnitude, p.imag_lengths, cm, cl))
    k1 = krp + kip + 2.0 * kcp
    k2 = (krp - kip).astype(jnp.complex128) - 2.0j * (krc + kic)
    v = state.v
    quad = jnp.real(jnp.vdot(v, k1.astype(v.dtype) @ v)) + jnp.real(v @ (k2 @ v))
    factor = purity_factor(d) * 2.0 * jnp.pi**d * p.magnitude**4
    return factor * quad / state.rescale**2
