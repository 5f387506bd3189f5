"""MQCLE trajectory dynamics: the backward-branching evolver.

TPU-first re-design of the reference evolver (``evolve.cpp``):

* coupling-region test                       -- ``evolve.cpp:53-100``
* adiabatic leapfrog                         -- ``evolve.cpp:125-148``
* phase factor omega0                        -- ``evolve.cpp:157-172``
* 17-step backward-branching non-adiabatic
  density prediction                         -- ``evolve.cpp:184-372``
* forward evolve of all points               -- ``evolve.cpp:377-423``
* new-point prediction / IsSmall detection   -- ``evolve.cpp:425-478``

Design notes:

* The reference evolves each point on its own thread with 9 scalar GP queries;
  here ALL points of a source element advance together and their 3x3 branch
  queries collapse into ONE batched GP prediction per target element -- the
  whole time step is a single jitted program of batched matmuls.
* Both the adiabatic and the non-adiabatic paths are computed unconditionally
  and blended by the (vectorized) coupling mask -- branch-free control flow
  for XLA.  With the reference's CouplingCriterion = 0 the mask is always
  true, matching its behavior exactly.
* Complex density values are RI arrays (trailing axis 2 = Re/Im; complex128 is
  not a TPU type): phase factors become rotations, and the off-diagonal
  rotation / branch recombination expand into explicit Re/Im arithmetic.
* Distribution access follows the (dist_fn, dist_params) convention of the
  sampler: ``dist_fn(dist_params, pts (3, M, PhaseDim)) -> (3, M, 2)`` RI,
  one row per lower-triangular element in storage order (00), (10), (11).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gple_tpu.models import tully
from gple_tpu.storage import ELEMENTS, NUM_ELEMENTS, OFFDIAG_INDEX, Density
from gple_tpu.utils import ri
from gple_tpu.utils.constants import HBAR

#: off-diagonal-force branches (evolve.cpp:12-16)
BRANCHES = jnp.asarray([-1.0, 0.0, 1.0])
#: element considered absent when all test predictions have |rho|^2 below this
VERY_SMALL_EPSILON = 1e-10  # (1e-5)^2, evolve.cpp:452


def is_coupling(model: str, x, p, mass, dt, criterion: float = 0.0):
    """Vectorized coupling test (evolve.cpp:53-100): strong NAC motion or
    large off-diagonal force relative to the mean diagonal force.  With the
    reference's criterion 0 this is identically True."""
    f = tully.adiabatic_force(model, x)
    d = tully.adiabatic_coupling(model, x)
    f_diag_avg = 0.5 * (f[..., 0, 0] + f[..., 1, 1])
    nac_term = jnp.abs(d[..., 0, 1] * p / mass) * dt >= criterion
    force_term = jnp.abs(f[..., 0, 1] / f_diag_avg) >= criterion
    return nac_term | force_term


def _diag_force_sum(model: str, x, i: int, j: int):
    f = tully.adiabatic_force(model, x)
    return f[..., i, i] + f[..., j, j]


def adiabatic_leapfrog(model: str, x, p, mass, dt, drc: int, i: int, j: int):
    """Leapfrog x(dt/2) -> p(dt) -> x(dt/2) with force (F_ii + F_jj)/2
    (evolve.cpp:125-148).  ``drc`` is +1 forward, -1 backward."""
    s = float(drc)
    x = x + s * dt / 2.0 * p / mass
    p = p + s * dt / 2.0 * _diag_force_sum(model, x, i, j)
    x = x + s * dt / 2.0 * p / mass
    return x, p


def omega0(model: str, xa, xb, i: int, j: int):
    """(dV_ij(xa) + dV_ij(xb)) / (2 hbar) with forward sign (evolve.cpp:157-172)."""
    if i == j:
        return jnp.zeros_like(xa)
    ea = tully.adiabatic_potential(model, xa)
    eb = tully.adiabatic_potential(model, xb)
    return (ea[..., i] - ea[..., j] + eb[..., i] - eb[..., j]) / (2.0 * HBAR)


def _offdiagonal_rotation(model, rho3, x, p, mass, dt, criterion):
    """Rotate the triangular 3-vector (rho00, rho10, rho11) by the coupling
    angle phi = (p/m) d01(x) (evolve.cpp:214-228).  ``rho3`` is (3, M, 2) RI."""
    couple = is_coupling(model, x, p, mass, dt, criterion)
    d01 = tully.adiabatic_coupling(model, x)[..., 0, 1]
    phi = (p / mass) * d01 * couple
    c = jnp.cos(2.0 * phi * dt)
    s = jnp.sin(2.0 * phi * dt)
    r00, r10, r11 = rho3[0], rho3[1], rho3[2]
    re10 = r10[..., 0]
    half_p = (1.0 + c) / 2.0
    half_m = (1.0 - c) / 2.0
    new00 = jnp.stack(
        [
            half_p * r00[..., 0] - s * re10 + half_m * r11[..., 0],
            half_p * r00[..., 1] + half_m * r11[..., 1],
        ],
        axis=-1,
    )
    new10 = jnp.stack(
        [
            s / 2.0 * r00[..., 0] + c * re10 - s / 2.0 * r11[..., 0],
            s / 2.0 * r00[..., 1] + r10[..., 1] - s / 2.0 * r11[..., 1],
        ],
        axis=-1,
    )
    new11 = jnp.stack(
        [
            half_m * r00[..., 0] + s * re10 + half_p * r11[..., 0],
            half_m * r00[..., 1] + half_p * r11[..., 1],
        ],
        axis=-1,
    )
    return jnp.stack([new00, new10, new11])


def backward_predict(
    model: str,
    mass,
    dt,
    r_new,                  # (M, 2) phase coordinates AFTER the forward move
    rho_old,                # (M, 2) RI or None: exact density override
    source_elem: int,       # static triangular index of the evolving element
    dist_fn,
    dist_params,
    criterion: float = 0.0,
):
    """The 17-step backward-branching density prediction
    (``non_adiabatic_evolve_predict``, evolve.cpp:184-372), batched over M
    points of one source element."""
    i_src, j_src = ELEMENTS[source_elem]
    x0, p0 = r_new[:, 0], r_new[:, 1]
    couple0 = is_coupling(model, x0, p0, mass, dt, criterion)

    # backward half-step adiabatic: (x0, p0) -> (x2, p1)
    x2, p1 = adiabatic_leapfrog(model, x0, p0, mass, dt / 2.0, -1, i_src, j_src)
    # off-diagonal-force momentum branches: p2[n] = p1 - dt n f01(x2) couple
    f01 = tully.adiabatic_force(model, x2)[..., 0, 1] * couple0
    p2 = p1[:, None] - dt * BRANCHES[None, :] * f01[:, None]        # (M, 3)
    x3 = x2[:, None] - dt / 4.0 * p2 / mass                          # (M, 3)
    # diagonal-force split towards each target element: p3[e] (3, M, 3)
    f_adia_x3 = tully.adiabatic_force(model, x3)                     # (M, 3, 2, 2)
    p3 = jnp.stack(
        [
            p2 - dt / 4.0 * (f_adia_x3[..., a, a] + f_adia_x3[..., b, b])
            for (a, b) in ELEMENTS
        ]
    )                                                                # (3, M, 3)
    x4 = x3[None] - dt / 4.0 * p3 / mass                             # (3, M, 3)

    # one batched GP query per target element at (x4, p3)
    query = jnp.stack([x4, p3], axis=-1).reshape(NUM_ELEMENTS, -1, 2)  # (3, 3M, 2)
    rho_flat = dist_fn(dist_params, query)                            # (3, 3M, 2)
    rho_pred = rho_flat.reshape(NUM_ELEMENTS, -1, 3, 2)               # (3, M, 3br, 2)
    if rho_old is not None:
        # control variate: exact carried value + GP branch differences
        # (see evolve_step; reference pins only the static branch,
        # evolve.cpp:292-296)
        diff = rho_pred[source_elem] - rho_pred[source_elem, :, 1:2, :]
        rho_pred = rho_pred.at[source_elem].set(rho_old[:, None, :] + diff)

    # adiabatic phase on the off-diagonal component from (x4 -> x2)
    theta = omega0(model, x2[:, None], x4[OFFDIAG_INDEX], 0, 1) * dt / 2.0
    rho_pred = rho_pred.at[OFFDIAG_INDEX].set(
        ri.phase_mul(rho_pred[OFFDIAG_INDEX], theta)
    )

    # per-branch off-diagonal rotation at (x2, p2[n]) over dt/2
    def rotate_branch(n):
        return _offdiagonal_rotation(
            model, rho_pred[:, :, n], x2, p2[:, n], mass, dt / 2.0, criterion
        )

    rotated = jnp.stack([rotate_branch(n) for n in range(3)], axis=2)  # (3, M, 3br, 2)

    # branch recombination (evolve.cpp:320-348)
    r0m, r1m, r2m = rotated[0, :, 0], rotated[1, :, 0], rotated[2, :, 0]   # n = -1
    r0z, r1z, r2z = rotated[0, :, 1], rotated[1, :, 1], rotated[2, :, 1]   # n = 0
    r0p, r1p, r2p = rotated[0, :, 2], rotated[1, :, 2], rotated[2, :, 2]   # n = +1
    # v_minus = (r0 + 2 Re(r1) + r2) / 4 ; the 2 Re(r1) enters Re only
    v_minus = jnp.stack(
        [
            (r0m[..., 0] + 2.0 * r1m[..., 0] + r2m[..., 0]) / 4.0,
            (r0m[..., 1] + r2m[..., 1]) / 4.0,
        ],
        axis=-1,
    )
    v_zero = (r0z - r2z) / 2.0
    v_plus = jnp.stack(
        [
            (r0p[..., 0] - 2.0 * r1p[..., 0] + r2p[..., 0]) / 4.0,
            (r0p[..., 1] + r2p[..., 1]) / 4.0,
        ],
        axis=-1,
    )
    mid = v_minus - v_plus
    mid = mid.at[..., 1].add(r1z[..., 1])  # + i Im(r1z)
    combined = jnp.stack(
        [v_minus + v_zero + v_plus, mid, v_minus - v_zero + v_plus]
    )                                                                 # (3, M, 2)

    # second off-diagonal rotation at (x2, p1) over dt/2
    combined = _offdiagonal_rotation(model, combined, x2, p1, mass, dt / 2.0, criterion)

    result = combined[source_elem]
    if i_src != j_src:
        result = ri.phase_mul(result, omega0(model, x0, x2, 0, 1) * dt / 2.0)
    return result


#: per-element diagonal-force weights: F_ii + F_jj = sum_d W[e, d] F_dd
_FORCE_WEIGHTS = jnp.asarray([[2.0, 0.0], [1.0, 1.0], [0.0, 2.0]])
#: per-element energy-gap weights: E_i - E_j = sum_d G[e, d] E_d
_GAP_WEIGHTS = jnp.asarray([[0.0, 0.0], [-1.0, 1.0], [0.0, 0.0]])


def _diag_forces(model: str, x):
    f = tully.adiabatic_force(model, x)
    return jnp.stack([f[..., 0, 0], f[..., 1, 1]], axis=-1)


def _weighted_leapfrog(model: str, x, p, mass, dt, drc: int):
    """All-sources leapfrog: x, p are (3, ...) with per-source force weights."""
    s = float(drc)
    x = x + s * dt / 2.0 * p / mass
    fsum = jnp.einsum("sd,s...d->s...", _FORCE_WEIGHTS, _diag_forces(model, x))
    p = p + s * dt / 2.0 * fsum
    x = x + s * dt / 2.0 * p / mass
    return x, p


def _omega0_all(model: str, xa, xb):
    """Per-source omega0 (3, ...): nonzero only for the off-diagonal element."""
    ea = tully.adiabatic_potential(model, xa)
    eb = tully.adiabatic_potential(model, xb)
    return (
        jnp.einsum("sd,s...d->s...", _GAP_WEIGHTS, ea)
        + jnp.einsum("sd,s...d->s...", _GAP_WEIGHTS, eb)
    ) / (2.0 * HBAR)


@partial(jax.jit, static_argnums=(0, 4, 6))
def evolve_step(
    model: str,
    mass,
    dt,
    density: Density,
    dist_fn,
    dist_params,
    criterion: float = 0.0,
) -> Density:
    """One forward time step of every sampled point (evolve.cpp:377-423).

    Coupled points: two half-step leapfrogs then backward prediction.
    Uncoupled points: one full leapfrog, density = old distribution at the old
    coordinate times the adiabatic phase.  Both are computed and blended by
    the per-point coupling mask.

    All three source elements evolve in ONE vectorized computation (per-source
    force/gap index arithmetic via the weight tables above), and all their
    backward-branch queries plus the adiabatic old-coordinate queries collapse
    into a SINGLE batched GP prediction of 10N points per target element --
    one-third the XLA graph and triple the matmul batch of the per-source
    formulation.
    """
    n = density.num_points
    x0, p0 = density.points[..., 0], density.points[..., 1]          # (3, N)
    couple = is_coupling(model, x0, p0, mass, dt, criterion)          # (3, N)

    # forward: two half-step leapfrogs (coupled path) and one full (adiabatic)
    xa, pa = _weighted_leapfrog(model, x0, p0, mass, dt / 2.0, +1)
    xb, pb = _weighted_leapfrog(model, xa, pa, mass, dt / 2.0, +1)
    xc, pc = _weighted_leapfrog(model, x0, p0, mass, dt, +1)

    # backward half-step from the moved coordinates: (xb, pb) -> (x2, p1)
    couple0 = is_coupling(model, xb, pb, mass, dt, criterion)
    x2, p1 = _weighted_leapfrog(model, xb, pb, mass, dt / 2.0, -1)
    f01 = tully.adiabatic_force(model, x2)[..., 0, 1] * couple0       # (3, N)
    p2 = p1[..., None] - dt * BRANCHES * f01[..., None]               # (3, N, 3)
    x3 = x2[..., None] - dt / 4.0 * p2 / mass                         # (3, N, 3)
    fd3 = _diag_forces(model, x3)                                     # (3, N, 3, 2)
    # diagonal-force split towards each target element
    p3 = p2[:, None] - dt / 4.0 * jnp.einsum("td,snbd->stnb", _FORCE_WEIGHTS, fd3)
    x4 = x3[:, None] - dt / 4.0 * p3 / mass                           # (3s, 3t, N, 3b)

    # ONE GP query per target element: branch points of every source + the
    # old coordinates (for the adiabatic path of that element)
    x4_t = jnp.swapaxes(x4, 0, 1)                                     # (3t, 3s, N, 3b)
    p3_t = jnp.swapaxes(p3, 0, 1)
    branch_q = jnp.stack([x4_t, p3_t], axis=-1).reshape(NUM_ELEMENTS, -1, 2)
    query = jnp.concatenate([branch_q, density.points], axis=1)      # (3, 9N + N, 2)
    rho_all = dist_fn(dist_params, query)                             # (3, 10N, 2)
    rho_pred = rho_all[:, : 9 * n].reshape(NUM_ELEMENTS, NUM_ELEMENTS, n, 3, 2)
    rho_at_old = rho_all[:, 9 * n :]                                  # (3, N, 2)

    # Control variate on each source's own element: the reference only pins
    # the static (n = 0) branch to the exactly-known carried value
    # (evolve.cpp:292-296), so the +-1 branches -- which carry the ENTIRE
    # real part of the coherence through the recombination -- pass through
    # the GP every tick, and the fit's ~1%/tick contraction decays it until
    # generation balances leak (measured: Tully-A transfer saturates at half
    # the exact value).  Re-centering all three branches on the exact value
    # plus the GP branch DIFFERENCE keeps the carried value exact while the
    # GP supplies only the small finite-difference correction; for constant
    # fields this is identical to the reference.
    for s in range(NUM_ELEMENTS):
        diff = rho_pred[s, s] - rho_pred[s, s, :, 1:2, :]
        rho_pred = rho_pred.at[s, s].set(density.rho[s][:, None, :] + diff)

    # adiabatic phase on the off-diagonal target component from (x4 -> x2)
    theta = omega0(model, x2[:, :, None], x4[:, OFFDIAG_INDEX], 0, 1) * dt / 2.0
    rho_pred = rho_pred.at[OFFDIAG_INDEX].set(
        ri.phase_mul(rho_pred[OFFDIAG_INDEX], theta)
    )

    # per-branch off-diagonal rotation at (x2, p2[n]) over dt/2
    rotated = jnp.stack(
        [
            _offdiagonal_rotation(
                model, rho_pred[:, :, :, b], x2, p2[:, :, b], mass, dt / 2.0, criterion
            )
            for b in range(3)
        ],
        axis=3,
    )                                                                 # (3t, 3s, N, 3b, 2)

    # branch recombination (evolve.cpp:320-348)
    r0m, r1m, r2m = rotated[0, :, :, 0], rotated[1, :, :, 0], rotated[2, :, :, 0]
    r0z, r1z, r2z = rotated[0, :, :, 1], rotated[1, :, :, 1], rotated[2, :, :, 1]
    r0p, r1p, r2p = rotated[0, :, :, 2], rotated[1, :, :, 2], rotated[2, :, :, 2]
    v_minus = jnp.stack(
        [
            (r0m[..., 0] + 2.0 * r1m[..., 0] + r2m[..., 0]) / 4.0,
            (r0m[..., 1] + r2m[..., 1]) / 4.0,
        ],
        axis=-1,
    )
    v_zero = (r0z - r2z) / 2.0
    v_plus = jnp.stack(
        [
            (r0p[..., 0] - 2.0 * r1p[..., 0] + r2p[..., 0]) / 4.0,
            (r0p[..., 1] + r2p[..., 1]) / 4.0,
        ],
        axis=-1,
    )
    mid = v_minus - v_plus
    mid = mid.at[..., 1].add(r1z[..., 1])
    combined = jnp.stack([v_minus + v_zero + v_plus, mid, v_minus - v_zero + v_plus])

    # second off-diagonal rotation at (x2, p1) over dt/2
    combined = _offdiagonal_rotation(model, combined, x2, p1, mass, dt / 2.0, criterion)

    # each source takes its own target component; the off-diagonal source gets
    # the final phase omega0(x0, x2; i=0, j=1) = (E0 - E1) = -(gap weights)
    rho_na = jnp.stack([combined[s, s] for s in range(NUM_ELEMENTS)])
    final_theta = -_omega0_all(model, xb, x2) * dt / 2.0
    rho_na = ri.phase_mul(rho_na, final_theta)

    # adiabatic path: phase-rotated old density at the full-leapfrog coordinate
    theta_ad = (
        jnp.einsum("sd,snd->sn", _GAP_WEIGHTS, tully.adiabatic_potential(model, x0))
        + jnp.einsum("sd,snd->sn", _GAP_WEIGHTS, tully.adiabatic_potential(model, xc))
    ) / (2.0 * HBAR)
    rho_ad = ri.phase_mul(rho_at_old, -theta_ad * dt)

    r_na = jnp.stack([xb, pb], axis=-1)
    r_ad = jnp.stack([xc, pc], axis=-1)
    mask = couple[..., None]
    return Density(
        points=jnp.where(mask, r_na, r_ad),
        rho=jnp.where(mask, rho_na, rho_ad),
        active=density.active,
    )


@partial(jax.jit, static_argnums=(0, 4, 5, 7))
def predict_new_points(
    model: str, mass, dt, pts, elem: int, dist_fn, dist_params,
    criterion: float = 0.0,
):
    """Density prediction for points with no known value (evolve.cpp:425-443):
    backward prediction where coupled, zero elsewhere.  Returns (M, 2) RI."""
    rho = backward_predict(model, mass, dt, pts, None, elem, dist_fn, dist_params, criterion)
    x, p = pts[:, 0], pts[:, 1]
    couple = is_coupling(model, x, p, mass, dt, criterion)
    return jnp.where(couple[:, None], rho, 0.0)


def is_very_small(model, mass, dt, density: Density, dist_fn, dist_params,
                  criterion: float = 0.0):
    """Per-element smallness flags (evolve.cpp:445-478): an inactive element
    stays small only if every test-point prediction is below epsilon; active
    elements are never small.  Returns (3,) bool 'small' flags.

    Probes on the UNION of every element's cloud: the reference tests each
    element on representative points of its own set (evolve.cpp:445-478),
    and a single element's cloud can drift out of the region where another
    element would reappear -- probing all clouds keeps reactivation
    detectable wherever any sampled density currently lives."""
    test_pts = density.points.reshape(-1, density.points.shape[-1])
    small = []
    for k in range(NUM_ELEMENTS):
        pred = predict_new_points(
            model, mass, dt, test_pts, k, dist_fn, dist_params, criterion
        )
        all_small = jnp.all(ri.abs2(pred) < VERY_SMALL_EPSILON)
        small.append(jnp.where(density.active[k], False, all_small))
    return jnp.stack(small)
