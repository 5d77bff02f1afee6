"""Matrix-free block Gauss-Newton solves for the alternating refinement.

Replaces the reference's Eigen sparse-triplet assembly + ConjugateGradient
(PsOptimizer.cpp:85-234) with TPU-friendly dense batched linear algebra:

  * light / pose blocks: the normal equations are exactly block-diagonal
    (each residual touches one frame), so the "CG solve on the full sparse
    system" of the reference reduces to per-frame BxB / 6x6 Cholesky solves
    — mathematically identical, massively faster;
  * albedo / distance blocks: matrix-free CG where H.x is computed by a
    forward J.x (gathers over the 4-voxel stencil) followed by J^T.(W.J.x)
    (scatter-adds at the same indices) — no sparse matrix is ever built,
    and the reference's O(N) std::find per nonzero disappears;
  * damping is the reference's multiplicative diag scaling
    H.diag += damping * H.diag (PsOptimizer.cpp:103-105).

Update rules mirror OptimizerAux.cpp:108-205: clamped albedo updates,
distance-step rejection at sqrt(3)*h, split translation/rotation pose
update t -= xi_t, R <- R exp(-xi_w).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from psgradientsdf_tpu.refine import geometry
from psgradientsdf_tpu.refine.jacobians import DistJacobian
from psgradientsdf_tpu.refine.problem import RefineProblem
from psgradientsdf_tpu.refine.render import ResidualData
from psgradientsdf_tpu.utils import se3


# ------------------------------------------------------------------ fixed PCG

def pcg_fixed(matvec, b: jax.Array, M_inv, iters: int, tol: float) -> jax.Array:
    """Jacobi-preconditioned CG with a STATIC trip count and masked early
    exit (residual-norm test on-device, updates frozen once converged).

    Mathematically the same preconditioned CG as
    jax.scipy.sparse.linalg.cg / Eigen's ConjugateGradient, but the loop is
    a lax.scan — required inside shard_map/collective contexts, which must
    execute the same static program on every device.  For single-device
    solves the while_loop CG is FASTER (its early exit skips real matvecs,
    ~48 of 100 on the bench problem, and while trips inside a large jit do
    not host-sync; only top-level loop trips do — BASELINE.md), so it stays
    the default (`static=False`)."""
    bnorm_sq = jnp.vdot(b, b)
    tol_sq = (tol * tol) * bnorm_sq

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M_inv(r0)
    rz0 = jnp.vdot(r0, z0)

    def step(carry, _):
        x, r, p, rz = carry
        active = jnp.vdot(r, r) > tol_sq
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
        x_n = x + alpha * p
        r_n = r - alpha * Ap
        z_n = M_inv(r_n)
        rz_n = jnp.vdot(r_n, z_n)
        beta = rz_n / jnp.maximum(rz, 1e-30)
        p_n = z_n + beta * p
        new = (
            jnp.where(active, x_n, x),
            jnp.where(active, r_n, r),
            jnp.where(active, p_n, p),
            jnp.where(active, rz_n, rz),
        )
        return new, None

    (x, _, _, _), _ = jax.lax.scan(step, (x0, r0, z0, rz0), None, length=iters)
    return x


# ---------------------------------------------------------------- stencil ops

def stencil_apply(x: jax.Array, J0: jax.Array, Ji: jax.Array,
                  nbr_idx: jax.Array) -> jax.Array:
    """Forward J.x for a 4-point stencil operator.

    x [N] variables; J0 [N,...] self coefficients; Ji [N,3,...] neighbor
    coefficients; nbr_idx [N,3] compact neighbor indices (-1 = frozen, no
    column).  Returns [N,...]."""
    safe = jnp.maximum(nbr_idx, 0)
    x_nbr = jnp.where(nbr_idx >= 0, x[safe], 0.0)     # [N,3]
    extra = (1,) * (J0.ndim - 1)
    out = J0 * x.reshape(x.shape + extra)
    for ax in range(3):
        out = out + Ji[:, ax] * x_nbr[:, ax].reshape(x.shape + extra)
    return out


def stencil_apply_T(y: jax.Array, J0: jax.Array, Ji: jax.Array,
                    nbr_idx: jax.Array) -> jax.Array:
    """Transpose J^T.y: reduce over residual dims, scatter-add at neighbors."""
    red_axes = tuple(range(1, y.ndim))
    self_term = jnp.sum(J0 * y, axis=red_axes)
    out = self_term
    for ax in range(3):
        contrib = jnp.sum(Ji[:, ax] * y, axis=red_axes)
        contrib = jnp.where(nbr_idx[:, ax] >= 0, contrib, 0.0)
        out = out.at[jnp.maximum(nbr_idx[:, ax], 0)].add(contrib)
    return out


def stencil_diag(w: jax.Array, J0: jax.Array, Ji: jax.Array,
                 nbr_idx: jax.Array) -> jax.Array:
    """diag(J^T W J) for the stencil operator (needed for damping)."""
    red_axes = tuple(range(1, J0.ndim))
    diag = jnp.sum(w * J0 * J0, axis=red_axes)
    for ax in range(3):
        contrib = jnp.sum(w * Ji[:, ax] * Ji[:, ax], axis=red_axes)
        contrib = jnp.where(nbr_idx[:, ax] >= 0, contrib, 0.0)
        diag = diag.at[jnp.maximum(nbr_idx[:, ax], 0)].add(contrib)
    return diag


# -------------------------------------------------------------- regularizers

class RegOperator(NamedTuple):
    """Linearized regularizer: residual r plus stencil Jacobian (J0, Ji)."""
    r: jax.Array      # [N]
    J0: jax.Array     # [N]
    Ji: jax.Array     # [N,3]
    nbr_idx: jax.Array


def eikonal_operator(prob: RefineProblem, dist: jax.Array, voxel_size: float) -> RegOperator:
    """(||grad d|| - 1) residual + Jacobian (Optimizer.cpp:196-218,477-537)."""
    grad = geometry.fd_grad(prob, dist, voxel_size)           # [N,3]
    gnorm = jnp.linalg.norm(grad, axis=-1)
    r = jnp.where(prob.valid, gnorm - 1.0, 0.0)
    inv_h = 1.0 / voxel_size
    n_d0 = -inv_h * prob.nbr_dir                              # [N,3]
    J0 = jnp.sum(grad * n_d0, axis=-1)
    Ji = grad * prob.nbr_dir * inv_h                          # [N,3]
    scale = jnp.where(gnorm > 0.0, 1.0 / jnp.maximum(gnorm, 1e-12), 1.0)
    J0 = jnp.where(prob.valid, J0 * scale, 0.0)
    Ji = jnp.where(prob.valid[:, None], Ji * scale[:, None], 0.0)
    return RegOperator(r=r, J0=J0, Ji=Ji, nbr_idx=prob.nbr_idx)


class LapOperator(NamedTuple):
    r: jax.Array      # [N]
    lap_idx: jax.Array
    diag_coef: float
    nbr_coef: float


def laplacian_operator(prob: RefineProblem, dist: jax.Array, voxel_size: float,
                       diag_only: bool = False) -> LapOperator:
    """Laplacian residual + Jacobian (Optimizer.cpp:540-590).

    diag_only=True reproduces the reference verbatim: its neighbor triplets
    are constructed but never pushed (Optimizer.cpp:569,578), leaving only
    the -6/h^2 diagonal.  Default False uses the correct stencil."""
    inv_h2 = 1.0 / (voxel_size * voxel_size)
    lap = geometry.fd_laplacian(prob, dist, voxel_size)
    r = jnp.where(prob.valid, lap, 0.0)
    return LapOperator(
        r=r,
        lap_idx=prob.lap_idx,
        diag_coef=-6.0 * inv_h2,
        nbr_coef=0.0 if diag_only else inv_h2,
    )


def lap_apply(x: jax.Array, op: LapOperator, valid: jax.Array) -> jax.Array:
    out = op.diag_coef * x
    if op.nbr_coef != 0.0:
        safe = jnp.maximum(op.lap_idx, 0)
        x_nbr = jnp.where(op.lap_idx >= 0, x[safe], 0.0)      # [N,6]
        out = out + op.nbr_coef * jnp.sum(x_nbr, axis=-1)
    return jnp.where(valid, out, 0.0)


def lap_apply_T(y: jax.Array, op: LapOperator, valid: jax.Array) -> jax.Array:
    y = jnp.where(valid, y, 0.0)
    out = op.diag_coef * y
    if op.nbr_coef != 0.0:
        for k in range(6):
            contrib = jnp.where(op.lap_idx[:, k] >= 0, op.nbr_coef * y, 0.0)
            out = out.at[jnp.maximum(op.lap_idx[:, k], 0)].add(contrib)
    return out


def lap_diag(op: LapOperator, valid: jax.Array) -> jax.Array:
    diag = jnp.where(valid, op.diag_coef ** 2, 0.0) * jnp.ones_like(op.r)
    if op.nbr_coef != 0.0:
        for k in range(6):
            contrib = jnp.where(
                (op.lap_idx[:, k] >= 0) & valid, op.nbr_coef ** 2, 0.0
            )
            diag = diag.at[jnp.maximum(op.lap_idx[:, k], 0)].add(contrib)
    return diag


# ------------------------------------------------------------ distance solve

def _distance_system(
    prob: RefineProblem,
    rd: ResidualData,
    DJ: DistJacobian,
    dist: jax.Array,
    voxel_size: float,
    *,
    reg_weight_n: float,
    reg_weight_l: float,
    damping: float,
    laplacian_diag_only: bool,
):
    """Assemble the distance-block normal equations as (b, diag, H_dd·x).

    b = J^T W r (+ regularizer terms); H_dd·x includes the photometric
    stencil operator, the Eikonal/Laplacian regularizers, and the
    reference's multiplicative damping.  Shared by the alternating
    distance solve and the joint Schur solve."""
    w = rd.w                                           # [N,F,3]
    b = stencil_apply_T(w * rd.r, DJ.J0, DJ.Ji, prob.nbr_idx)
    diag = stencil_diag(w, DJ.J0, DJ.Ji, prob.nbr_idx)

    use_eik = reg_weight_n != 0.0
    use_lap = reg_weight_l != 0.0
    eik = eikonal_operator(prob, dist, voxel_size) if use_eik else None
    lap = (
        laplacian_operator(prob, dist, voxel_size, laplacian_diag_only)
        if use_lap
        else None
    )
    if use_eik:
        b = b + reg_weight_n * stencil_apply_T(eik.r, eik.J0, eik.Ji, eik.nbr_idx)
        diag = diag + reg_weight_n * stencil_diag(
            jnp.ones_like(eik.J0), eik.J0, eik.Ji, eik.nbr_idx
        )
    if use_lap:
        b = b + reg_weight_l * lap_apply_T(lap.r, lap, prob.valid)
        diag = diag + reg_weight_l * lap_diag(lap, prob.valid)

    def hdd_mv(x):
        out = stencil_apply_T(
            w * stencil_apply(x, DJ.J0, DJ.Ji, prob.nbr_idx),
            DJ.J0, DJ.Ji, prob.nbr_idx,
        )
        if use_eik:
            out = out + reg_weight_n * stencil_apply_T(
                stencil_apply(x, eik.J0, eik.Ji, eik.nbr_idx),
                eik.J0, eik.Ji, eik.nbr_idx,
            )
        if use_lap:
            out = out + reg_weight_l * lap_apply_T(
                lap_apply(x, lap, prob.valid), lap, prob.valid
            )
        return out + damping * diag * x

    return b, diag, hdd_mv


def solve_distance(
    prob: RefineProblem,
    rd: ResidualData,
    DJ: DistJacobian,
    dist: jax.Array,
    voxel_size: float,
    *,
    reg_weight_n: float,
    reg_weight_l: float,
    damping: float,
    laplacian_diag_only: bool = False,
    cg_iters: int = 100,
    cg_tol: float = 1e-6,
    cg_static: bool = False,
) -> jax.Array:
    """CG on (J^T W J + reg + damping diag) dd = J^T W r + reg terms
    (PsOptimizer.cpp:124-172). Returns the GN step delta_d [N]."""
    b, diag, hdd_mv = _distance_system(
        prob, rd, DJ, dist, voxel_size,
        reg_weight_n=reg_weight_n, reg_weight_l=reg_weight_l, damping=damping,
        laplacian_diag_only=laplacian_diag_only,
    )

    def matvec(x):
        # keep padded rows inert (identity) so CG is well-posed
        return jnp.where(prob.valid, hdd_mv(x), x)

    # Jacobi preconditioner — Eigen's ConjugateGradient default
    # (DiagonalPreconditioner), which the reference therefore uses
    d_total = (1.0 + damping) * diag
    d_safe = jnp.where(prob.valid & (d_total > 0.0), d_total, 1.0)

    b = jnp.where(prob.valid, b, 0.0)
    if cg_static:
        delta = pcg_fixed(matvec, b, lambda x: x / d_safe, cg_iters, cg_tol)
    else:
        delta, _ = jax.scipy.sparse.linalg.cg(
            matvec, b, maxiter=cg_iters, tol=cg_tol, M=lambda x: x / d_safe
        )
    return jnp.where(prob.valid, delta, 0.0)


def update_distance(
    prob: RefineProblem, dist: jax.Array, delta: jax.Array, voxel_size: float
) -> Tuple[jax.Array, jax.Array]:
    """d -= delta where |delta| < sqrt(3) h (OptimizerAux.cpp:162-188), then
    refresh the stored gradient (updateGrad: grad := FD grad).
    Returns (new_dist, new_grad_stored)."""
    ok = (jnp.abs(delta) < jnp.sqrt(3.0) * voxel_size) & prob.valid
    new_dist = jnp.where(ok, dist - delta, dist)
    new_grad = geometry.fd_grad(prob, new_dist, voxel_size)
    return new_dist, new_grad


# --------------------------------------------- joint distance+pose (Schur)

def solve_joint_dist_pose(
    prob: RefineProblem,
    rd: ResidualData,
    DJ: DistJacobian,
    J_c: jax.Array,        # [N,F,3,6] pose Jacobian
    dist: jax.Array,
    voxel_size: float,
    *,
    reg_weight_n: float,
    reg_weight_l: float,
    damping: float,
    laplacian_diag_only: bool = False,
    cg_iters: int = 100,
    cg_tol: float = 1e-6,
    cg_static: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """ONE Gauss-Newton step over (distance, poses) jointly, with
    Schur-complement elimination of the block-diagonal pose blocks.

    The joint normal equations are

        [ H_dd  H_dp ] [dd]   [g_d]
        [ H_pd  H_pp ] [xi] = [g_p]

    where H_pp is block-diagonal 6x6 per keyframe (each residual touches
    exactly one pose).  Eliminating the pose blocks gives the reduced SPD
    system (H_dd - H_dp H_pp^-1 H_pd) dd = g_d - H_dp H_pp^-1 g_p, solved
    matrix-free by CG; poses back-substitute as
    xi = H_pp^-1 (g_p - H_pd dd).

    This is a TPU-build extension beyond the reference's alternating block
    scheme (PsOptimizer.cpp:239-428) — one step captures the pose/geometry
    cross-coupling the alternation ignores.  Under Z-sharded surface voxels
    the H_pd/H_pp reductions are psums over the voxel axis and everything
    pose-sized stays replicated — the BASELINE.json north-star "distributed
    GN with Schur-complement reduction of pose blocks over collectives"
    (collectives inserted by GSPMD from the array shardings).

    Returns (delta_d [N], delta_xi [F,6]); both blocks use the reference's
    subtract-delta update convention.

    Memory note: this solve holds the full [N,F,3,6] pose Jacobian across
    the CG loop; at post-upsample problem sizes (N > ~300k with many
    megapixel keyframes) XLA's trailing-small-dim tile padding can make
    its copies exceed HBM — use the alternating blocks there (the pose
    block chunks over N; chunking the Schur cross-terms is future work).
    """
    w = rd.w                                             # [N,F,3]
    wm = jnp.where(prob.valid[:, None, None], w, 0.0)

    # pose blocks (replicated-small): H_pp [F,6,6], g_p [F,6]
    H_pp = jnp.einsum("nfc,nfcb,nfcd->fbd", wm, J_c, J_c)
    dpp = jnp.diagonal(H_pp, axis1=-2, axis2=-1)
    idx6 = jnp.arange(6)
    H_pp = H_pp.at[..., idx6, idx6].add(damping * dpp)
    H_pp = H_pp + 1e-8 * jnp.eye(6, dtype=H_pp.dtype)
    g_p = jnp.einsum("nfc,nfcb,nfc->fb", wm, J_c, rd.r)

    # factor the constant SPD pose blocks ONCE (hpp_solve runs inside every
    # CG matvec); cho_factor/cho_solve batch over the frame axis
    chol_pp = jax.scipy.linalg.cho_factor(H_pp)

    def hpp_solve(y):                                    # [F,6] -> [F,6]
        return jax.scipy.linalg.cho_solve(chol_pp, y[..., None])[..., 0]

    def hpd_mv(x):                                       # [N] -> [F,6]
        Jdx = stencil_apply(x, DJ.J0, DJ.Ji, prob.nbr_idx)   # [N,F,3]
        return jnp.einsum("nfc,nfcb->fb", wm * Jdx, J_c)

    def hdp_mv(y):                                       # [F,6] -> [N]
        Jcy = jnp.einsum("nfcb,fb->nfc", J_c, y)
        return stencil_apply_T(wm * Jcy, DJ.J0, DJ.Ji, prob.nbr_idx)

    b_d, diag, hdd_mv = _distance_system(
        prob, rd, DJ, dist, voxel_size,
        reg_weight_n=reg_weight_n, reg_weight_l=reg_weight_l, damping=damping,
        laplacian_diag_only=laplacian_diag_only,
    )
    b_red = b_d - hdp_mv(hpp_solve(g_p))
    b_red = jnp.where(prob.valid, b_red, 0.0)

    def matvec(x):
        out = hdd_mv(x) - hdp_mv(hpp_solve(hpd_mv(x)))
        return jnp.where(prob.valid, out, x)

    # Jacobi preconditioner from the (dominant) H_dd diagonal
    d_total = (1.0 + damping) * diag
    d_safe = jnp.where(prob.valid & (d_total > 0.0), d_total, 1.0)
    M_inv = lambda x: x / d_safe

    if cg_static:
        delta_d = pcg_fixed(matvec, b_red, M_inv, cg_iters, cg_tol)
    else:
        delta_d, _ = jax.scipy.sparse.linalg.cg(
            matvec, b_red, maxiter=cg_iters, tol=cg_tol, M=M_inv
        )
    delta_d = jnp.where(prob.valid, delta_d, 0.0)
    delta_xi = hpp_solve(g_p - hpd_mv(delta_d))
    return delta_d, delta_xi


# -------------------------------------------------------------- albedo solve

def solve_albedo(
    prob: RefineProblem,
    rd: ResidualData,
    J_rho,                 # [N,F] (SH, channel-shared) or [N,F,3] (LED)
    albedo: jax.Array,
    voxel_size: float,
    *,
    reg_weight_rho: float,
    damping: float,
    cg_iters: int = 100,
    cg_tol: float = 1e-6,
    cg_static: bool = False,
) -> jax.Array:
    """Albedo GN step (PsOptimizer.cpp:85-121). Variables [N,3]."""
    if J_rho.ndim == 2:
        J = J_rho[..., None] * jnp.ones((1, 1, 3), dtype=J_rho.dtype)
    else:
        J = J_rho
    w = rd.w
    b = jnp.einsum("nfc,nfc->nc", J, w * rd.r)
    diag = jnp.einsum("nfc,nfc->nc", J * J, w)

    use_reg = reg_weight_rho != 0.0
    if use_reg:
        ag = geometry.fd_albedo_grad(prob, albedo, voxel_size)   # [N,3ax,3ch]
        norms = jnp.linalg.norm(ag, axis=1)                      # [N,3ch]
        r_reg = jnp.where(prob.valid[:, None], norms, 0.0)
        inv_h = 1.0 / voxel_size
        scale = jnp.where(norms != 0.0, 1.0 / jnp.maximum(norms, 1e-12), 1.0)
        # J0[c] = (sum_ax ag[ax,c] * -dir_ax/h) / norm_c ; Ji[ax,c] = ag[ax,c]*dir_ax/h / norm_c
        J0r = jnp.einsum("nac,na->nc", ag, -inv_h * prob.nbr_dir) * scale
        Jir = ag * (prob.nbr_dir * inv_h)[..., None] * scale[:, None, :]
        J0r = jnp.where(prob.valid[:, None], J0r, 0.0)
        Jir = jnp.where(prob.valid[:, None, None], Jir, 0.0)

        def reg_apply(x):      # x [N,3] -> [N,3]
            safe = jnp.maximum(prob.nbr_idx, 0)
            x_nbr = jnp.where((prob.nbr_idx >= 0)[..., None], x[safe], 0.0)  # [N,3ax,3ch]
            return J0r * x + jnp.sum(Jir * x_nbr, axis=1)

        def reg_apply_T(y):    # y [N,3] -> [N,3]
            out = J0r * y
            for ax in range(3):
                contrib = jnp.where(
                    (prob.nbr_idx[:, ax] >= 0)[:, None], Jir[:, ax] * y, 0.0
                )
                out = out.at[jnp.maximum(prob.nbr_idx[:, ax], 0)].add(contrib)
            return out

        b = b + reg_weight_rho * reg_apply_T(r_reg)
        dreg = J0r * J0r
        for ax in range(3):
            contrib = jnp.where(
                (prob.nbr_idx[:, ax] >= 0)[:, None], Jir[:, ax] ** 2, 0.0
            )
            dreg = dreg.at[jnp.maximum(prob.nbr_idx[:, ax], 0)].add(contrib)
        diag = diag + reg_weight_rho * dreg

    def matvec(x):
        out = jnp.einsum("nfc,nfc->nc", J, w * (J * x[:, None, :]))
        if use_reg:
            out = out + reg_weight_rho * reg_apply_T(reg_apply(x))
        out = out + damping * diag * x
        return jnp.where(prob.valid[:, None], out, x)

    d_total = (1.0 + damping) * diag                  # Jacobi preconditioner
    d_safe = jnp.where(prob.valid[:, None] & (d_total > 0.0), d_total, 1.0)

    b = jnp.where(prob.valid[:, None], b, 0.0)
    if cg_static:
        delta = pcg_fixed(matvec, b, lambda x: x / d_safe, cg_iters, cg_tol)
    else:
        delta, _ = jax.scipy.sparse.linalg.cg(
            matvec, b, maxiter=cg_iters, tol=cg_tol, M=lambda x: x / d_safe
        )
    return jnp.where(prob.valid[:, None], delta, 0.0)


def update_albedo(prob: RefineProblem, albedo: jax.Array, delta: jax.Array) -> jax.Array:
    """rho -= delta per channel, accepted only if the result lies strictly in
    (0,1) (OptimizerAux.cpp:120-150)."""
    cand = albedo - delta
    ok = (cand > 0.0) & (cand < 1.0) & prob.valid[:, None]
    return jnp.where(ok, cand, albedo)


# --------------------------------------------------------------- light solve

def solve_light_sh(
    rd: ResidualData, J_l: jax.Array
) -> jax.Array:
    """Per-frame BxB normal equations (lightJacobian + CG,
    PsOptimizer.cpp:175-203; block-diagonal -> exact per-frame solves).
    J_l [N,3,B] frame-independent; returns delta_l [F,B]. No damping
    (faithful to the reference).

    Rank-safe: on near-constant-normal frames the order-2 basis Gram is
    rank-deficient (the quadratic columns are collinear) and a jittered
    dense solve explodes along the null space (measured: +-inf in the
    nx^2-ny^2 / nx^2-nz^2 coefficients on a tiny flat-ish scene).  The
    reference's Eigen CG never injects null-space components — from x0=0
    it converges to the MIN-NORM solution — so the dense equivalent is a
    clipped eigen-solve: directions with eigenvalue <= 1e-6 * lambda_max
    contribute zero."""
    w = rd.w                                              # [N,F,3]
    H = jnp.einsum("nfc,ncb,ncd->fbd", w, J_l, J_l)
    g = jnp.einsum("nfc,ncb,nfc->fb", w, J_l, rd.r)
    vals, vecs = jnp.linalg.eigh(H)                       # [F,B], [F,B,B]
    vmax = jnp.max(vals, axis=-1, keepdims=True)
    inv = jnp.where(vals > jnp.maximum(vmax, 0.0) * 1e-6, 1.0 / vals, 0.0)
    gv = jnp.einsum("fdb,fd->fb", vecs, g)                # V^T g
    return jnp.einsum("fbd,fd->fb", vecs, inv * gv)       # V inv V^T g


def solve_light_led(rd: ResidualData, J_l: jax.Array, damping: float) -> jax.Array:
    """Global RGB LED intensity: 3 independent scalars
    (LedOptimizer.cpp:134-160, with damping). J_l [N,F,3]."""
    H = jnp.einsum("nfc,nfc->c", rd.w * J_l, J_l)
    g = jnp.einsum("nfc,nfc->c", rd.w * J_l, rd.r)
    H = H * (1.0 + damping)
    return g / jnp.maximum(H, 1e-12)


# ---------------------------------------------------------------- pose solve

def solve_pose_from_normal_eqs(H: jax.Array, g: jax.Array, damping: float) -> jax.Array:
    """Per-frame 6x6 solves given assembled normal equations H [F,6,6],
    g [F,6] (poseJacobian + CG, PsOptimizer.cpp:207-234; block-diagonal ->
    exact). Returns delta_xi [F,6]."""
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    # multiplicative damping on the diagonal (PsOptimizer.cpp:103-105)
    H = H.at[..., jnp.arange(6), jnp.arange(6)].add(damping * diag)
    jitter = 1e-8 * jnp.eye(6, dtype=H.dtype)
    return jnp.linalg.solve(H + jitter, g[..., None])[..., 0]



def update_poses(poses: jax.Array, delta_xi: jax.Array) -> jax.Array:
    """t -= xi_t;  R <- R exp(-xi_w)  (OptimizerAux.cpp:190-205)."""
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    new_t = t - delta_xi[:, :3]
    new_R = jnp.einsum("fij,fjk->fik", R, se3.so3_exp(-delta_xi[:, 3:]))
    out = poses.at[:, :3, :3].set(new_R)
    return out.at[:, :3, 3].set(new_t)
