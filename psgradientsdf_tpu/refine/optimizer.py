"""Alternating photometric refinement: the host-side outer loop.

TPU-native counterpart of PsOptimizer::alternatingOptimize
(PsOptimizer.cpp:239-428) and LedOptimizer::alternatingOptimize
(LedOptimizer.cpp:279-478).  The data-dependent control flow (convergence /
divergence aborts, reg-weight auto-normalization, the iteration-5 upsample,
periodic artifact dumps) stays in Python exactly as in the reference; each
block solve (albedo / light / distance / pose) is a single jitted device
computation over the compacted surface set.

Reference behaviors carried over:
  * SH light init: l = SH(R (0,0,-1)), l[0]=0.02 (PsOptimizer.cpp:25-42)
  * LED light init: intensity-ratio matching (LedOptimizer.cpp:76-112)
  * albedo init: mean observed intensity (Optimizer.cpp:50-81)
  * reg-weight normalization by E/E_reg before the loop (PsOptimizer.cpp:274-288)
  * convergence: rel dE < conv_threshold; divergence: dE > 0 -> abort with
    artifact save (PsOptimizer.cpp:368-384)
  * upsample at iter 5 with temporary Laplacian smoothing, disabled after
    iter 15 (PsOptimizer.cpp:386-413)
  * artifact dumps every 3 iterations (PsOptimizer.cpp:419-423)
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from psgradientsdf_tpu.config import OptimizerConfig, LED
from psgradientsdf_tpu.core.grid import GridGeometry
from psgradientsdf_tpu.core.volume import GradSdfVolume
from psgradientsdf_tpu.io import ply, sdf_io, trajectory
from psgradientsdf_tpu.ops.marching_cubes import extract_mesh_from_volume
from psgradientsdf_tpu.refine import geometry, jacobians, render, solvers
from psgradientsdf_tpu.refine.problem import RefineProblem, extract_problem, writeback
from psgradientsdf_tpu.refine.upsample import upsample_volume
from psgradientsdf_tpu.utils import sh as sh_mod
from psgradientsdf_tpu.utils.metrics import MetricsLogger
from psgradientsdf_tpu.utils.timer import Timer


# --------------------------------------------------------------- jitted blocks

@functools.partial(
    jax.jit,
    static_argnames=("geom", "model", "order", "loss", "lam", "voxel_size"),
)
def _residuals(prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
               *, model, order, loss, lam, voxel_size):
    return render.compute_residuals(
        prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
        model=model, order=order, loss=loss, lam=lam, voxel_size=voxel_size,
    )


@functools.partial(jax.jit, static_argnames=("loss", "lam", "voxel_size"))
def _energy_from_rd(prob, rd, dist, albedo, *, loss, lam, voxel_size):
    """(E_ps, E_normal, E_laplacian, E_rho) from an existing residual pass.

    The round-2 build compiled a standalone _energies program that re-ran
    the full residual pass; the alternating loop now evaluates energies
    from the SAME ResidualData it hands the next block as its
    linearization point — halving the residual passes per iteration and
    removing one ~35 s compile from the census (round-2 VERDICT #3)."""
    return (
        render.ps_energy(prob, rd, loss=loss, lam=lam),
        render.normal_energy(prob, dist, voxel_size),
        render.laplacian_energy(prob, dist, voxel_size),
        render.albedo_reg_energy(prob, albedo, voxel_size),
    )


def _albedo_core(prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
                 *, model, order, loss, lam, voxel_size, reg_weight_rho,
                 damping):
    """Albedo GN update from an existing residual pass (its linearization
    point must be the current state)."""
    if model == LED:
        J = jacobians.albedo_jacobian_led(prob, geom, dist, grad_stored, poses, lights)
    else:
        J = jacobians.albedo_jacobian_sh(prob, grad_stored, lights, order)
    delta = solvers.solve_albedo(
        prob, rd, J, albedo, voxel_size,
        reg_weight_rho=reg_weight_rho, damping=damping,
    )
    return solvers.update_albedo(prob, albedo, delta)


def _light_core(prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
                *, model, order, loss, lam, voxel_size, damping):
    if model == LED:
        J = jacobians.light_jacobian_led(prob, geom, dist, grad_stored, albedo, poses)
        delta = solvers.solve_light_led(rd, J, damping)
    else:
        J = jacobians.light_jacobian_sh(prob, albedo, grad_stored, order)
        delta = solvers.solve_light_sh(rd, J)
    return lights - delta


def _dist_core(prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
               *, model, order, loss, lam, voxel_size, reg_weight_n,
               reg_weight_l, damping, laplacian_diag_only):
    G = jacobians.image_pi_grad(None, rd, K)
    if model == LED:
        DJ = jacobians.dist_jacobian_led(
            prob, geom, dist, albedo, grad_stored, lights, G, poses, voxel_size
        )
    else:
        DJ = jacobians.dist_jacobian_sh(
            prob, geom, dist, albedo, grad_stored, lights, G, poses, voxel_size, order
        )
    delta = solvers.solve_distance(
        prob, rd, DJ, dist, voxel_size,
        reg_weight_n=reg_weight_n, reg_weight_l=reg_weight_l, damping=damping,
        laplacian_diag_only=laplacian_diag_only,
    )
    return solvers.update_distance(prob, dist, delta, voxel_size)


# jitted rd-consuming epilogues — the alternating loop's per-block programs
# (small: no residual pass inside; see _energy_from_rd's census note)
_albedo_update = functools.partial(
    jax.jit, static_argnames=(
        "geom", "model", "order", "loss", "lam", "voxel_size",
        "reg_weight_rho", "damping"))(_albedo_core)
_light_update = functools.partial(
    jax.jit, static_argnames=(
        "geom", "model", "order", "loss", "lam", "voxel_size",
        "damping"))(_light_core)
_dist_update = functools.partial(
    jax.jit, static_argnames=(
        "geom", "model", "order", "loss", "lam", "voxel_size",
        "reg_weight_n", "reg_weight_l", "damping",
        "laplacian_diag_only"))(_dist_core)


# full-block wrappers (residual pass + core) — the standalone public form
# used by the unit/parity/ablation tests and external callers

@functools.partial(
    jax.jit,
    static_argnames=(
        "geom", "model", "order", "loss", "lam", "voxel_size",
        "reg_weight_rho", "damping",
    ),
)
def _albedo_block(prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
                  *, model, order, loss, lam, voxel_size, reg_weight_rho, damping):
    rd = _residuals.__wrapped__(
        prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
        model=model, order=order, loss=loss, lam=lam, voxel_size=voxel_size,
    )
    return _albedo_core(
        prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
        model=model, order=order, loss=loss, lam=lam, voxel_size=voxel_size,
        reg_weight_rho=reg_weight_rho, damping=damping)


@functools.partial(
    jax.jit,
    static_argnames=("geom", "model", "order", "loss", "lam", "voxel_size", "damping"),
)
def _light_block(prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
                 *, model, order, loss, lam, voxel_size, damping):
    rd = _residuals.__wrapped__(
        prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
        model=model, order=order, loss=loss, lam=lam, voxel_size=voxel_size,
    )
    return _light_core(
        prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
        model=model, order=order, loss=loss, lam=lam, voxel_size=voxel_size,
        damping=damping)


@functools.partial(
    jax.jit,
    static_argnames=(
        "geom", "model", "order", "loss", "lam", "voxel_size",
        "reg_weight_n", "reg_weight_l", "damping", "laplacian_diag_only",
    ),
)
def _dist_block(prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
                *, model, order, loss, lam, voxel_size, reg_weight_n,
                reg_weight_l, damping, laplacian_diag_only):
    rd = _residuals.__wrapped__(
        prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
        model=model, order=order, loss=loss, lam=lam, voxel_size=voxel_size,
    )
    return _dist_core(
        prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
        model=model, order=order, loss=loss, lam=lam, voxel_size=voxel_size,
        reg_weight_n=reg_weight_n, reg_weight_l=reg_weight_l, damping=damping,
        laplacian_diag_only=laplacian_diag_only)


# above this many surface voxels the pose normal equations accumulate over
# N-chunks: the pose Jacobian's [N,F,3,3]/[N,F,3,6] intermediates carry
# trailing small dims that XLA pads to (8,128) tiles in inserted copies
# (21-43x) — at the upsampled sokrates scale (N=524k, F=34) a single such
# copy is 18-37 GB. Chunking bounds every intermediate to the chunk size.
_POSE_CHUNK = 32768


def _pose_normal_eqs(rd_chunk, K, poses, albedo_c, grad_c, lights, model):
    """(H [F,6,6], g [F,6]) partial sums for one N-chunk."""
    G = jacobians.image_pi_grad(None, rd_chunk, K)
    if model == LED:
        J_c = jacobians.pose_jacobian_led(G, rd_chunk, poses, albedo_c,
                                          grad_c, lights)
    else:
        J_c = jacobians.pose_jacobian_sh(G, rd_chunk, poses)
    w = rd_chunk.w
    H = jnp.einsum("nfc,nfcb,nfcd->fbd", w, J_c, J_c)
    g = jnp.einsum("nfc,nfcb,nfc->fb", w, J_c, rd_chunk.r)
    return H, g


def _pose_core(prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
               *, model, order, loss, lam, voxel_size, damping):
    N = rd.r.shape[0]
    # largest power-of-two chunk <= _POSE_CHUNK dividing N (capacities are
    # 2^k or 3*2^(k-1), so a pow2 divisor >= N/3 always exists)
    chunk = _POSE_CHUNK
    while chunk > 1 and N % chunk != 0:
        chunk //= 2
    if N > _POSE_CHUNK and chunk > 1:
        C = N // chunk

        def resh(a):
            return a.reshape((C, chunk) + a.shape[1:])

        rd_chunks = jax.tree_util.tree_map(resh, rd)
        alb_chunks = resh(albedo)
        grad_chunks = resh(grad_stored)

        def body(args):
            rdc, albc, gradc = args
            return _pose_normal_eqs(rdc, K, poses, albc, gradc, lights, model)

        H_parts, g_parts = jax.lax.map(
            body, (rd_chunks, alb_chunks, grad_chunks))
        H = jnp.sum(H_parts, axis=0)
        g = jnp.sum(g_parts, axis=0)
    else:
        H, g = _pose_normal_eqs(rd, K, poses, albedo, grad_stored, lights, model)
    delta = solvers.solve_pose_from_normal_eqs(H, g, damping)
    return solvers.update_poses(poses, delta)


_pose_update = functools.partial(
    jax.jit, static_argnames=(
        "geom", "model", "order", "loss", "lam", "voxel_size",
        "damping"))(_pose_core)


@functools.partial(
    jax.jit,
    static_argnames=("geom", "model", "order", "loss", "lam", "voxel_size", "damping"),
)
def _pose_block(prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
                *, model, order, loss, lam, voxel_size, damping):
    rd = _residuals.__wrapped__(
        prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
        model=model, order=order, loss=loss, lam=lam, voxel_size=voxel_size,
    )
    return _pose_core(
        prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
        model=model, order=order, loss=loss, lam=lam, voxel_size=voxel_size,
        damping=damping)


def _joint_dp_core(prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
                   *, model, order, loss, lam, voxel_size, reg_weight_n,
                   reg_weight_l, damping, laplacian_diag_only):
    """Joint distance+pose GN update with Schur-complement pose elimination
    (solvers.solve_joint_dist_pose) — a TPU-build extension over the
    reference's alternating distance-then-pose blocks."""
    G = jacobians.image_pi_grad(None, rd, K)
    if model == LED:
        DJ = jacobians.dist_jacobian_led(
            prob, geom, dist, albedo, grad_stored, lights, G, poses, voxel_size)
        J_c = jacobians.pose_jacobian_led(G, rd, poses, albedo, grad_stored, lights)
    else:
        DJ = jacobians.dist_jacobian_sh(
            prob, geom, dist, albedo, grad_stored, lights, G, poses, voxel_size, order)
        J_c = jacobians.pose_jacobian_sh(G, rd, poses)
    delta_d, delta_xi = solvers.solve_joint_dist_pose(
        prob, rd, DJ, J_c, dist, voxel_size,
        reg_weight_n=reg_weight_n, reg_weight_l=reg_weight_l, damping=damping,
        laplacian_diag_only=laplacian_diag_only,
    )
    new_dist, new_grad = solvers.update_distance(prob, dist, delta_d, voxel_size)
    new_poses = solvers.update_poses(poses, delta_xi)
    return new_dist, new_grad, new_poses


_joint_dp_update = functools.partial(
    jax.jit, static_argnames=(
        "geom", "model", "order", "loss", "lam", "voxel_size",
        "reg_weight_n", "reg_weight_l", "damping",
        "laplacian_diag_only"))(_joint_dp_core)


@functools.partial(
    jax.jit,
    static_argnames=(
        "geom", "model", "order", "loss", "lam", "voxel_size",
        "reg_weight_n", "reg_weight_l", "damping", "laplacian_diag_only",
    ),
)
def _joint_dp_step(prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
                   *, model, order, loss, lam, voxel_size, reg_weight_n,
                   reg_weight_l, damping, laplacian_diag_only):
    """_joint_dp_core + its own residual pass + post-update energies (the
    standalone fused form kept for tests/external callers; the alternating
    loop uses _joint_dp_update + the shared residual program instead)."""
    kw = dict(model=model, order=order, loss=loss, lam=lam, voxel_size=voxel_size)
    rd = _residuals.__wrapped__(
        prob, geom, dist, albedo, grad_stored, poses, images, K, lights, **kw)
    new_dist, new_grad, new_poses = _joint_dp_core(
        prob, geom, rd, dist, albedo, grad_stored, poses, K, lights, **kw,
        reg_weight_n=reg_weight_n, reg_weight_l=reg_weight_l, damping=damping,
        laplacian_diag_only=laplacian_diag_only)
    rd2 = _residuals.__wrapped__(
        prob, geom, new_dist, albedo, new_grad, new_poses, images, K, lights, **kw)
    e = _energy_from_rd.__wrapped__(
        prob, rd2, new_dist, albedo, loss=loss, lam=lam, voxel_size=voxel_size)
    return new_dist, new_grad, new_poses, e


def _iteration_core(prob, geom, dist, albedo, grad_stored, poses, images, K,
                    lights, *, model, order, loss, lam, voxel_size,
                    reg_weight_n, reg_weight_l, reg_weight_rho, damping,
                    laplacian_diag_only, do_light, do_albedo, do_distance,
                    do_pose, joint_dp):
    """ONE full alternating iteration — every enabled block plus its
    residual refresh and post-block energies — as a single program.

    The shared-residual loop (round 3) optimized the COMPILE census (one
    residual program + small epilogues); on the tunneled runtime its
    ~12-16 host-synced dispatches per iteration cost ~0.3-0.4 s of pure
    RPC latency, which dominates the loop at bench problem sizes
    (N≈23k, F=20: ~1.0 s/iteration measured, vs ~0.4 s for the C++ full
    loop — round-5 refine_full_bench).  This fused form trades one extra
    leading residual pass per iteration for a single dispatch; block and
    energy semantics are IDENTICAL (same cores, same refresh points —
    PsOptimizer.cpp:303-366 order), pinned by
    test_refine_optimizer.py::test_fused_iteration_matches_blocks.

    Returns (dist, albedo, grad_stored, poses, lights, energies) with
    `energies` a tuple of (E, E_n, E_l, E_r) after each enabled block, in
    block order.
    """
    kw = dict(model=model, order=order, loss=loss, lam=lam,
              voxel_size=voxel_size)
    ekw = dict(loss=loss, lam=lam, voxel_size=voxel_size)

    def refresh():
        rd = _residuals.__wrapped__(
            prob, geom, dist, albedo, grad_stored, poses, images, K, lights,
            **kw)
        return rd, _energy_from_rd.__wrapped__(prob, rd, dist, albedo, **ekw)

    rd, _ = refresh()
    energies = []
    if do_albedo:
        albedo = _albedo_core(
            prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
            **kw, reg_weight_rho=reg_weight_rho, damping=damping)
        rd, e = refresh()
        energies.append(e)
    if do_light:
        lights = _light_core(
            prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
            **kw, damping=damping)
        rd, e = refresh()
        energies.append(e)
    if do_distance and do_pose and joint_dp:
        dist, grad_stored, poses = _joint_dp_core(
            prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
            **kw, reg_weight_n=reg_weight_n, reg_weight_l=reg_weight_l,
            damping=damping, laplacian_diag_only=laplacian_diag_only)
        rd, e = refresh()
        energies.append(e)
    else:
        if do_distance:
            dist, grad_stored = _dist_core(
                prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
                **kw, reg_weight_n=reg_weight_n, reg_weight_l=reg_weight_l,
                damping=damping, laplacian_diag_only=laplacian_diag_only)
            rd, e = refresh()
            energies.append(e)
        if do_pose:
            poses = _pose_core(
                prob, geom, rd, dist, albedo, grad_stored, poses, K, lights,
                **kw, damping=damping)
            rd, e = refresh()
            energies.append(e)
    return dist, albedo, grad_stored, poses, lights, tuple(energies)


_iteration_update = functools.partial(
    jax.jit, static_argnames=(
        "geom", "model", "order", "loss", "lam", "voxel_size",
        "reg_weight_n", "reg_weight_l", "reg_weight_rho", "damping",
        "laplacian_diag_only", "do_light", "do_albedo", "do_distance",
        "do_pose", "joint_dp"))(_iteration_core)


@functools.partial(jax.jit, static_argnames=("geom", "voxel_size"))
def _init_albedo(prob, geom, dist, grad_stored, poses, images, K, voxel_size):
    """Mean observed intensity over visible keyframes (Optimizer.cpp:50-81)."""
    F, H, W = images.shape[0], images.shape[1], images.shape[2]
    pts_w = render.surface_points_world(prob, geom, dist, grad_stored)
    _, uv, in_img = render.project_to_frames(pts_w, poses, K, (H, W))
    I = render.sample_intensity(images, uv)
    m = (prob.vis & in_img & prob.valid[:, None]).astype(I.dtype)
    s = jnp.einsum("nfc,nf->nc", I, m)
    cnt = jnp.sum(m, axis=1)
    mean = s / jnp.maximum(cnt[:, None], 1.0)
    return jnp.where((cnt > 0)[:, None], mean, 0.0)


# ------------------------------------------------------------------ refiner

class PhotometricRefiner:
    """Joint light/albedo/distance/pose refinement over keyframes.

    Owns the dense volume + the compacted problem; writeback() syncs the
    refined values into the volume for export.
    """

    def __init__(
        self,
        vol: GradSdfVolume,
        geom: GridGeometry,
        cfg: OptimizerConfig,
        K: np.ndarray,
        save_path: str = "",
        truncation: float = None,
        metrics: Optional[MetricsLogger] = None,
        laplacian_diag_only: bool = False,
        mesh=None,
    ):
        self.vol = vol
        self.geom = geom
        self.cfg = cfg
        # optional jax.sharding.Mesh: the refinement arrays are placed with
        # the surface-voxel axis sharded over "z" and keyframes over
        # "frames"; the jitted blocks then partition under GSPMD with psums
        # over the voxel shards (tested sharded == single-device in
        # tests/test_parallel.py)
        self.mesh = mesh
        self.K = jnp.asarray(K, dtype=jnp.float32)
        self.save_path = save_path
        self.truncation = truncation
        self.metrics = metrics or MetricsLogger(None, echo=True)
        self.laplacian_diag_only = laplacian_diag_only
        # one fused program per outer iteration (round 5): eliminates the
        # ~12-16 host-synced dispatches/iteration whose RPC latency
        # dominates the loop on tunneled runtimes; identical block/energy
        # semantics (see _iteration_core).  cfg.fused_iterations=False
        # restores the per-block dispatch path.
        self.fused_iterations = bool(getattr(cfg, "fused_iterations", True))
        self.images = None
        self.poses = None
        self.keyframe_indices: List[int] = []
        self.timestamps: List[str] = []
        self.prob: Optional[RefineProblem] = None
        self.lights = None
        self.dist = None
        self.albedo = None
        self.grad_stored = None
        # alternating-loop scalar state for exact mid-run checkpoint/resume
        # (SURVEY §5.4); set by alternating_optimize at every iteration
        # boundary, restored by io.checkpoint.load_refine_state
        self.loop_state: Optional[dict] = None
        # write a resumable checkpoint every N outer iterations; requires
        # BOTH fields set (no implicit cwd fallback — the pipeline only
        # wires a path when an output dir is configured)
        self.checkpoint_every: int = 0
        self.checkpoint_path: str = ""

    # ------------------------------------------------------------ setup

    def set_keyframes(
        self,
        images: np.ndarray,          # [F,H,W,3] RGB float
        poses: np.ndarray,           # [F,4,4]
        keyframe_indices: Sequence[int],
        timestamps: Sequence[str] = (),
    ) -> None:
        if not isinstance(images, jax.Array):
            images = np.asarray(images)
        if images.dtype == np.uint8:    # raw-wire keyframes: convert on device
            self.images = jnp.asarray(images).astype(jnp.float32) / 255.0
        else:
            self.images = jnp.asarray(images, dtype=jnp.float32)
        self.poses = jnp.asarray(poses, dtype=jnp.float32)
        self.keyframe_indices = list(keyframe_indices)
        self.timestamps = list(timestamps) or [str(i) for i in keyframe_indices]

    def init(self) -> None:
        """select_vis + surface extraction + light init
        (PsOptimizer.cpp:25-42 / LedOptimizer.cpp:25-36)."""
        import time as _time

        t0 = _time.perf_counter()
        self.prob = extract_problem(self.vol, self.geom, self.keyframe_indices)
        t_extract = _time.perf_counter() - t0
        self.dist = self.prob.dist
        self.albedo = self.prob.albedo
        self.grad_stored = self.prob.grad_stored
        n = int(self.prob.n_surface)
        self.metrics.log("refine_init", surface_voxels=n,
                         keyframes=len(self.keyframe_indices),
                         extract_seconds=t_extract)

        self.place_on_mesh()

        if self.cfg.model == LED:
            self.lights = jnp.ones(3, dtype=jnp.float32)
            self._init_led_light()
        else:
            s = jnp.array([0.0, 0.0, -1.0], dtype=jnp.float32)
            R = self.poses[:, :3, :3]
            dirs = jnp.einsum("fij,j->fi", R, s)
            basis = sh_mod.sh_basis(dirs, self.cfg.order)     # [F,B]
            self.lights = basis.at[:, 0].set(0.02)
        self._warm_base_programs()

    def place_on_mesh(self) -> None:
        """Shard the problem arrays on self.mesh (no-op without one):
        surface-voxel axis over "z", keyframe images over "frames"."""
        if self.mesh is None or self.prob is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P
        from psgradientsdf_tpu.parallel.mesh import Z_AXIS
        from psgradientsdf_tpu.parallel.shard import shard_refine_arrays

        self.prob, self.images = shard_refine_arrays(
            self.mesh, self.prob, self.images)
        n_z = self.mesh.shape[Z_AXIS]

        def n_spec(a):
            if a.ndim == 0 or a.shape[0] % n_z != 0:
                return P()
            return P(Z_AXIS, *([None] * (a.ndim - 1)))

        for name in ("dist", "albedo", "grad_stored"):
            a = getattr(self, name)
            if a is not None:
                setattr(self, name, jax.device_put(
                    a, NamedSharding(self.mesh, n_spec(a))))
        for name in ("poses", "lights", "K"):
            a = getattr(self, name)
            if a is not None:
                setattr(self, name, jax.device_put(
                    a, NamedSharding(self.mesh, P())))

    def _init_led_light(self) -> None:
        """Intensity-ratio light init (LedOptimizer.cpp:76-112)."""
        rd = self._rd()
        rendered = render.rendered_intensity_led(
            self.prob, self.geom, self.dist, self.albedo, self.grad_stored,
            self.lights, self.poses, self.geom.voxel_size,
        )
        m = rd.mask[..., None]
        # rd.r = I - rendered(light=1)  =>  I = r + rendered
        obs = jnp.sum(jnp.where(m, rd.r + rendered, 0.0), axis=(0, 1))
        ren = jnp.sum(jnp.where(m, rendered, 0.0), axis=(0, 1))
        self.lights = obs / jnp.where(jnp.abs(ren) > 1e-12, ren, 1e-12)

    def init_albedo(self) -> None:
        self.albedo = _init_albedo(
            self.prob, self.geom, self.dist, self.grad_stored, self.poses,
            self.images, self.K, self.geom.voxel_size,
        )

    def _warm_block_programs(self, light, albedo, distance, pose,
                             w_n, w_l, w_rho, damping) -> None:
        """AOT-compile the loop's block programs in PARALLEL threads.

        The remote compiler serves concurrent compile RPCs genuinely in
        parallel (bench/parallel_compile_probe.py: two programs 46.9 s
        serial -> 28.8 s concurrent), and an AOT compile populates the
        persistent compilation cache with the exact key the loop's jit
        call will look up — so with the cache enabled the cold refinement
        census costs ~max(program compiles) instead of their sum.  No-op
        without a persistent cache (the AOT result could not be handed to
        the jit call) or under a mesh (sharded arg keys differ)."""
        import threading

        if self.mesh is not None:
            return
        if not (jax.config.jax_compilation_cache_dir or ""):
            return

        def sds(a):
            if hasattr(a, "shape") and hasattr(a, "dtype"):
                return jax.ShapeDtypeStruct(a.shape, a.dtype)
            return a            # static leaves (GridGeometry) pass through

        args = jax.tree_util.tree_map(sds, self._args())
        skw = self._static_kwargs()
        geom = self.geom

        def _res_shape(prob, dist, albedo, grad_stored, poses, images, K,
                       lights):
            return _residuals.__wrapped__(
                prob, geom, dist, albedo, grad_stored, poses, images, K,
                lights, **skw)

        rd_s = jax.eval_shape(_res_shape, args[0], *args[2:])
        argd = (args[0], geom, rd_s) + args[2:5] + (args[5], args[7], args[8])

        if self.fused_iterations:
            # the loop compiles exactly one program: the fused iteration
            jobs = [("iteration", lambda: _iteration_update.lower(
                *args, **skw, reg_weight_n=w_n, reg_weight_l=w_l,
                reg_weight_rho=w_rho, damping=damping,
                laplacian_diag_only=self.laplacian_diag_only,
                do_light=light, do_albedo=albedo, do_distance=distance,
                do_pose=pose, joint_dp=self.cfg.joint_dp).compile())]
            self._run_warm_jobs("blocks", jobs)
            return

        jobs = []
        if albedo:
            jobs.append(("albedo", lambda: _albedo_update.lower(
                *argd, **skw, reg_weight_rho=w_rho, damping=damping).compile()))
        if light:
            jobs.append(("light", lambda: _light_update.lower(
                *argd, **skw, damping=damping).compile()))
        if distance and pose and self.cfg.joint_dp:
            jobs.append(("joint_dp", lambda: _joint_dp_update.lower(
                *argd, **skw, reg_weight_n=w_n, reg_weight_l=w_l,
                damping=damping,
                laplacian_diag_only=self.laplacian_diag_only).compile()))
        else:
            if distance:
                jobs.append(("distance", lambda: _dist_update.lower(
                    *argd, **skw, reg_weight_n=w_n, reg_weight_l=w_l,
                    damping=damping,
                    laplacian_diag_only=self.laplacian_diag_only).compile()))
            if pose:
                jobs.append(("pose", lambda: _pose_update.lower(
                    *argd, **skw, damping=damping).compile()))
        self._run_warm_jobs("blocks", jobs)

    def _warm_base_programs(self) -> None:
        """Parallel AOT warm of the pre-loop programs (residual pass,
        energy epilogue, albedo init) — see _warm_block_programs.  Called
        at the end of init(), BEFORE their first jit use, so the serial
        first calls become cache hits."""
        if self.mesh is not None:
            return
        if not (jax.config.jax_compilation_cache_dir or ""):
            return

        def sds(a):
            if hasattr(a, "shape") and hasattr(a, "dtype"):
                return jax.ShapeDtypeStruct(a.shape, a.dtype)
            return a            # static leaves (GridGeometry) pass through

        args = jax.tree_util.tree_map(sds, self._args())
        skw = self._static_kwargs()
        geom = self.geom

        def _res_shape(prob, dist, albedo, grad_stored, poses, images, K,
                       lights):
            return _residuals.__wrapped__(
                prob, geom, dist, albedo, grad_stored, poses, images, K,
                lights, **skw)

        rd_s = jax.eval_shape(_res_shape, args[0], *args[2:])
        jobs = [
            ("residuals", lambda: _residuals.lower(*args, **skw).compile()),
            ("energy", lambda: _energy_from_rd.lower(
                args[0], rd_s, args[2], args[3],
                **self._energy_kwargs()).compile()),
            ("init_albedo", lambda: _init_albedo.lower(
                args[0], self.geom, args[2], args[4], args[5], args[6],
                args[7], self.geom.voxel_size).compile()),
        ]
        self._run_warm_jobs("base", jobs)

    def _run_warm_jobs(self, phase, jobs) -> None:
        import threading
        import time as _time

        if not jobs:
            return
        t0 = _time.perf_counter()
        errs = {}

        def run(tag, fn):
            try:
                fn()
            except Exception as e:  # warming is best-effort
                errs[tag] = repr(e)

        threads = [threading.Thread(target=run, args=j) for j in jobs]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        self._warm_errors = dict(getattr(self, "_warm_errors", {}), **errs)
        self.metrics.log(
            "warm_compile", phase=phase, programs=[j[0] for j in jobs],
            seconds=round(_time.perf_counter() - t0, 3),
            errors=errs or None)

    # ------------------------------------------------------------ internals

    def _static_kwargs(self):
        return dict(
            model=self.cfg.model,
            order=self.cfg.order,
            loss=self.cfg.loss,
            lam=float(self.cfg.lam),
            voxel_size=self.geom.voxel_size,
        )

    def _args(self):
        return (
            self.prob, self.geom, self.dist, self.albedo, self.grad_stored,
            self.poses, self.images, self.K, self.lights,
        )

    def _rd(self):
        return _residuals(*self._args(), **self._static_kwargs())

    def _args_rd(self, rd):
        return (
            self.prob, self.geom, rd, self.dist, self.albedo,
            self.grad_stored, self.poses, self.K, self.lights,
        )

    def _energy_kwargs(self):
        skw = self._static_kwargs()
        return dict(loss=skw["loss"], lam=skw["lam"],
                    voxel_size=skw["voxel_size"])

    def _energies_rd(self):
        """(rd, (E, E_n, E_l, E_r)) at the current state — the rd doubles
        as the next block's linearization point (see _energy_from_rd)."""
        rd = self._rd()
        e = _energy_from_rd(self.prob, rd, self.dist, self.albedo,
                            **self._energy_kwargs())
        return rd, tuple(float(v) for v in e)

    def energies(self):
        return self._energies_rd()[1]

    def _total_energy(self, E, E_n, E_l, E_r, w_n, w_l, w_rho) -> float:
        total = E + w_n * E_n + w_l * E_l + w_rho * E_r
        self.metrics.log(
            "energy", ps=E, normal_reg=w_n * E_n, laplacian_reg=w_l * E_l,
            rho_reg=w_rho * E_r, total=total,
        )
        return total

    # ------------------------------------------------------------ main loop

    def alternating_optimize(
        self, light: bool, albedo: bool, distance: bool, pose: bool
    ) -> bool:
        cfg = self.cfg
        T = Timer(verbose=False)
        damping = cfg.damping

        if self.loop_state:
            # exact resume from an io.checkpoint refine snapshot: skip the
            # albedo init + energy-ratio weight normalization (their results
            # are part of the restored state) and continue mid-loop
            ls = self.loop_state
            w_n, w_l, w_rho = ls["w_n"], ls["w_l"], ls["w_rho"]
            normal_reg = ls["normal_reg"]
            albedo_reg = ls["albedo_reg"]
            laplacian_reg = ls["laplacian_reg"]
            E, E_n, E_l, E_r = ls["E"], ls["E_n"], ls["E_l"], ls["E_r"]
            E_vec = list(ls["E_vec"])
            E_total = E_vec[-1]     # current total (all-blocks-off resume)
            it = int(ls["it"])
            rd0 = None              # loop recomputes at the restored state
            self.metrics.log("refine_resume", iter=it)
        else:
            w_n, w_l, w_rho = (cfg.reg_weight_n, cfg.reg_weight_l,
                               cfg.reg_weight_rho)
            normal_reg = w_n != 0.0
            albedo_reg = w_rho != 0.0
            laplacian_reg = w_l != 0.0

            self.init_albedo()

            rd0, (E, E_n, E_l, E_r) = self._energies_rd()
            if normal_reg and E_n > 0:
                w_n *= E / E_n                     # weight normalization
            if laplacian_reg:
                if E_l > 0:
                    w_l *= E / E_l
                if cfg.upsample:
                    laplacian_reg = False
            E_total = self._total_energy(E, E_n, E_l, E_r, w_n, w_l, w_rho)
            E_vec = [E_total]
            it = 0

        self._warm_block_programs(
            light, albedo, distance, pose,
            w_n if normal_reg else 0.0, w_l if laplacian_reg else 0.0,
            w_rho, damping)
        try:
            return self._alternating_loop(
                light, albedo, distance, pose, T, damping, it, E, E_n, E_l,
                E_r, E_total, E_vec, w_n, w_l, w_rho, normal_reg, albedo_reg,
                laplacian_reg, rd=rd0)
        finally:
            # an exception between an every-3-iteration async dump and the
            # terminal synchronous save must not leave the dump thread
            # running (torn PLY at interpreter exit); errors it captured
            # are metrics-logged by _join_dump
            self._join_dump()

    def _alternating_loop(self, light, albedo, distance, pose, T, damping,
                          it, E, E_n, E_l, E_r, E_total, E_vec,
                          w_n, w_l, w_rho, normal_reg, albedo_reg,
                          laplacian_reg, rd=None) -> bool:
        # Per block: one small rd-consuming update program, then the SHARED
        # residual program at the updated state — consumed twice, as the
        # energy input AND as the next block's linearization point.  Same
        # block/energy semantics as the reference (PsOptimizer.cpp:263-350)
        # with half the residual passes of the round-2 fused-step scheme
        # and one heavy compile instead of five (round-2 VERDICT #3).
        cfg = self.cfg
        skw = self._static_kwargs()
        ekw = self._energy_kwargs()
        if rd is None:
            rd = self._rd()

        def refresh():
            rd = self._rd()
            return rd, _energy_from_rd(self.prob, rd, self.dist, self.albedo,
                                       **ekw)

        while it < cfg.max_it:
            if self.fused_iterations:
                # ONE dispatch per iteration (round 5): same cores, same
                # refresh points — the per-block path below is the
                # reference-shaped equivalent (equality pinned by
                # test_refine_optimizer.py::test_fused_iteration_matches_blocks)
                T.tic()
                (self.dist, self.albedo, self.grad_stored, self.poses,
                 self.lights, e_blocks) = _iteration_update(
                    *self._args(), **skw,
                    reg_weight_n=w_n if normal_reg else 0.0,
                    reg_weight_l=w_l if laplacian_reg else 0.0,
                    reg_weight_rho=w_rho, damping=damping,
                    laplacian_diag_only=self.laplacian_diag_only,
                    do_light=light, do_albedo=albedo, do_distance=distance,
                    do_pose=pose, joint_dp=cfg.joint_dp)
                dt = T.toc("iteration_fused", self.dist)
                names = []
                if albedo:
                    names.append("albedo")
                if light:
                    names.append("light")
                if distance and pose and cfg.joint_dp:
                    names.append("joint_dp")
                else:
                    if distance:
                        names.append("distance")
                    if pose:
                        names.append("pose")
                # identical energy bookkeeping: E_n/E_l/E_r refresh only
                # while their regularizer is active (PsOptimizer.cpp:311,
                # 338-339 — see the per-block path's comments)
                for name, e in zip(names, e_blocks):
                    E = float(e[0])
                    if name == "albedo" and albedo_reg:
                        E_r = float(e[3])
                    if name in ("distance", "joint_dp"):
                        if normal_reg:
                            E_n = float(e[1])
                        if laplacian_reg:
                            E_l = float(e[2])
                    E_total = self._total_energy(E, E_n, E_l, E_r, w_n, w_l,
                                                 w_rho)
                    self.metrics.log("block", iter=it, block=name,
                                     seconds=dt / max(len(names), 1))
                rd = None   # stale; the unfused path recomputes on demand
            else:
                if albedo:
                    T.tic()
                    self.albedo = _albedo_update(
                        *self._args_rd(rd), **skw,
                        reg_weight_rho=w_rho, damping=damping,
                    )
                    rd, e = refresh()
                    dt = T.toc("albedo", self.albedo)
                    # the reference refreshes each reg energy ONLY while its
                    # regularizer is active (PsOptimizer.cpp:311,338-339):
                    # with upsample the pre-iter-5 Laplacian term is a frozen
                    # constant in the total — refreshing it would wiggle the
                    # convergence metric and fire spurious divergence aborts
                    E = float(e[0])
                    if albedo_reg:
                        E_r = float(e[3])
                    E_total = self._total_energy(E, E_n, E_l, E_r, w_n, w_l, w_rho)
                    self.metrics.log("block", iter=it, block="albedo", seconds=dt)

                if light:
                    T.tic()
                    self.lights = _light_update(
                        *self._args_rd(rd), **skw, damping=damping,
                    )
                    rd, e = refresh()
                    dt = T.toc("light", self.lights)
                    E, _, _, _ = (float(v) for v in e)
                    E_total = self._total_energy(E, E_n, E_l, E_r, w_n, w_l, w_rho)
                    self.metrics.log("block", iter=it, block="light", seconds=dt)

                if distance and pose and cfg.joint_dp:
                    # joint distance+pose GN with Schur pose elimination
                    T.tic()
                    self.dist, self.grad_stored, self.poses = _joint_dp_update(
                        *self._args_rd(rd), **skw,
                        reg_weight_n=w_n if normal_reg else 0.0,
                        reg_weight_l=w_l if laplacian_reg else 0.0,
                        damping=damping,
                        laplacian_diag_only=self.laplacian_diag_only,
                    )
                    rd, e = refresh()
                    dt = T.toc("joint_dp", self.dist)
                    E = float(e[0])
                    if normal_reg:
                        E_n = float(e[1])
                    if laplacian_reg:
                        E_l = float(e[2])
                    E_total = self._total_energy(E, E_n, E_l, E_r, w_n, w_l, w_rho)
                    self.metrics.log("block", iter=it, block="joint_dp", seconds=dt)
                else:
                    if distance:
                        T.tic()
                        self.dist, self.grad_stored = _dist_update(
                            *self._args_rd(rd), **skw,
                            reg_weight_n=w_n if normal_reg else 0.0,
                            reg_weight_l=w_l if laplacian_reg else 0.0,
                            damping=damping,
                            laplacian_diag_only=self.laplacian_diag_only,
                        )
                        rd, e = refresh()
                        dt = T.toc("distance", self.dist)
                        E = float(e[0])
                        if normal_reg:
                            E_n = float(e[1])
                        if laplacian_reg:
                            E_l = float(e[2])
                        E_total = self._total_energy(E, E_n, E_l, E_r, w_n, w_l, w_rho)
                        self.metrics.log("block", iter=it, block="distance", seconds=dt)

                    if pose:
                        T.tic()
                        self.poses = _pose_update(
                            *self._args_rd(rd), **skw, damping=damping,
                        )
                        rd, e = refresh()
                        dt = T.toc("pose", self.poses)
                        E, _, _, _ = (float(v) for v in e)
                        E_total = self._total_energy(E, E_n, E_l, E_r, w_n, w_l, w_rho)
                        self.metrics.log("block", iter=it, block="pose", seconds=dt)

            E_vec.append(E_total)
            rel_diff = abs(E_vec[-2] - E_total) / max(abs(E_vec[-2]), 1e-12)
            self.metrics.log("iteration", iter=it, rel_diff=rel_diff, total=E_total)

            if rel_diff < cfg.conv_threshold:
                self.metrics.log("converged", iter=it)
                self.loop_state = None
                self._save_artifacts("final_refined")
                return True
            if E_vec[-2] < E_total:
                self.metrics.log("diverged", iter=it)
                self.loop_state = None
                self._save_artifacts("final_refined")
                return False

            if it == 5 and cfg.upsample:
                if w_l == 0.0:
                    w_l = 1.0
                laplacian_reg = True
                T.tic()
                self._upsample()
                T.toc("upsample", self.dist)
                self._save_artifacts(f"upsample_after_{it}")
                # the problem arrays changed shape: rd is stale — recompute
                # (this is also the energy eval at the upsampled state)
                rd, e_up = refresh()
                _, _, E_l, _ = (float(v) for v in e_up)
                if E_l > 0:
                    w_l *= E / E_l
                E_total = self._total_energy(E, E_n, E_l, E_r, w_n, w_l, w_rho)
                E_vec.append(E_total)

            if it > 15 and cfg.upsample:
                w_l = 0.0
                laplacian_reg = False

            it += 1
            # record the scalar loop state at every iteration boundary so a
            # mid-run checkpoint resumes exactly here (including the
            # iteration-indexed upsample / Laplacian-disable branches)
            self.loop_state = {
                "it": it, "w_n": float(w_n), "w_l": float(w_l),
                "w_rho": float(w_rho), "normal_reg": bool(normal_reg),
                "albedo_reg": bool(albedo_reg),
                "laplacian_reg": bool(laplacian_reg),
                "E": float(E), "E_n": float(E_n), "E_l": float(E_l),
                "E_r": float(E_r), "E_vec": [float(v) for v in E_vec],
            }
            if (self.checkpoint_every and self.checkpoint_path
                    and it % self.checkpoint_every == 0):
                from psgradientsdf_tpu.io.checkpoint import save_refine_state

                T.tic()
                save_refine_state(self.checkpoint_path, self)
                self.metrics.log("refine_checkpoint", iter=it,
                                 path=self.checkpoint_path,
                                 seconds=T.toc("refine_checkpoint"))
            if it % 3 == 0:
                self.save_poses(f"after_poses_opt_{it}")
                self._save_artifacts(f"after_iter_{it}", asynchronous=True)

        # budget exhausted: the reference ends WITHOUT a final save here
        # (PsOptimizer.cpp:425-427 — only the every-3-iteration dumps
        # survive); we save the final state anyway so a capped run always
        # leaves usable artifacts.
        self.loop_state = None
        self.metrics.log("budget_exhausted", iter=it)
        self._save_artifacts("final_refined")
        return False

    # ------------------------------------------------------------ upsample

    def _upsample(self) -> None:
        self.sync_to_volume()
        self.vol, self.geom, self.keyframe_indices = upsample_volume(
            self.vol, self.geom, self.keyframe_indices, self.truncation
        )
        self.prob = extract_problem(self.vol, self.geom, self.keyframe_indices)
        self.dist = self.prob.dist
        self.albedo = self.prob.albedo
        self.grad_stored = self.prob.grad_stored
        self.place_on_mesh()
        self.metrics.log(
            "upsample", voxel_size=self.geom.voxel_size,
            dims=list(self.geom.dims), surface_voxels=int(self.prob.n_surface),
        )

    # ------------------------------------------------------------ exports

    def sync_to_volume(self) -> None:
        self.vol = writeback(self.vol, self.prob, self.dist, self.albedo, self.grad_stored)

    def _join_dump(self) -> None:
        """Join the async artifact-dump thread; a worker failure is
        metrics-logged (a torn periodic dump must not report success, but
        it is also not fatal to the refinement itself — the terminal
        _save_artifacts writes fresh files synchronously)."""
        t = getattr(self, "_dump_thread", None)
        if t is not None:
            t.join()
            self._dump_thread = None
            exc = getattr(self, "_dump_exc", None)
            self._dump_exc = None
            if exc is not None:
                self.metrics.log("artifact_dump_error", error=repr(exc))

    def _save_artifacts(self, tag: str, asynchronous: bool = False) -> None:
        """Mesh + pointcloud dump.  asynchronous=True offloads the D2H
        fetch, host marching cubes, and PLY writes to a background thread —
        jax arrays are immutable, so capturing the current (synced) volume
        and problem arrays is race-free even while the alternating loop
        rebinds them; the periodic every-3-iteration dumps
        (PsOptimizer.cpp:419-423) otherwise serialize ~3-5 s of host work
        into the warm loop."""
        if not self.save_path:
            return
        self.sync_to_volume()
        os.makedirs(self.save_path, exist_ok=True)
        self._join_dump()
        if not asynchronous:
            self.extract_mesh(tag)
            self.save_pointcloud(tag)
            return

        import threading

        vol, geom, path = self.vol, self.geom, self.save_path
        prob, dist, albedo = self.prob, self.dist, self.albedo
        ghat_dev = geometry.normalize(self.grad_stored)

        self._dump_exc = None

        def work():
            try:
                mesh = extract_mesh_from_volume(
                    np.asarray(vol.dist), np.asarray(vol.weight),
                    np.asarray(vol.color), geom.voxel_size, geom.origin,
                )
                ply.write_mesh_ply(
                    os.path.join(path, f"{tag}_mesh.ply"),
                    mesh.vertices, mesh.faces, mesh.colors,
                )
                n = int(prob.n_surface)
                ghat = np.asarray(ghat_dev)[:n]
                c_v = np.asarray(geom.voxel2world(prob.idx_xyz))[:n]
                d = np.asarray(dist)[:n]
                ply.write_pointcloud_ply(
                    os.path.join(path, f"{tag}_pointcloud.ply"),
                    c_v - d[:, None] * ghat, ghat, np.asarray(albedo)[:n],
                )
            except BaseException as e:  # surfaced by _join_dump
                self._dump_exc = e

        # non-daemon: an unwinding interpreter waits for the writes instead
        # of tearing a half-written PLY
        self._dump_thread = threading.Thread(target=work, daemon=False)
        self._dump_thread.start()

    def extract_mesh(self, tag: str) -> bool:
        self.sync_to_volume()
        mesh = extract_mesh_from_volume(
            np.asarray(self.vol.dist), np.asarray(self.vol.weight),
            np.asarray(self.vol.color), self.geom.voxel_size, self.geom.origin,
        )
        return ply.write_mesh_ply(
            os.path.join(self.save_path, f"{tag}_mesh.ply"),
            mesh.vertices, mesh.faces, mesh.colors,
        )

    def save_pointcloud(self, tag: str) -> bool:
        """x = c_v - d ghat with normals ghat (OptimizerAux.cpp:456-511)."""
        prob, dist = self.prob, self.dist
        n = int(prob.n_surface)
        ghat = np.asarray(geometry.normalize(self.grad_stored))[:n]
        c_v = np.asarray(self.geom.voxel2world(prob.idx_xyz))[:n]
        d = np.asarray(dist)[:n]
        pts = c_v - d[:, None] * ghat
        cols = np.asarray(self.albedo)[:n]
        return ply.write_pointcloud_ply(
            os.path.join(self.save_path, f"{tag}_pointcloud.ply"), pts, ghat, cols
        )

    def save_poses(self, tag: str) -> bool:
        if not self.save_path:
            return False
        os.makedirs(self.save_path, exist_ok=True)
        return trajectory.write_trajectory(
            os.path.join(self.save_path, f"{tag}.txt"),
            self.timestamps,
            [np.asarray(p) for p in self.poses],
        )

    def save_sdf(self, tag: str) -> bool:
        self.sync_to_volume()
        dist = np.asarray(self.vol.dist)
        band = np.abs(dist) <= np.sqrt(3.0) * self.geom.voxel_size
        if not band.any():
            return False
        zz, yy, xx = np.nonzero(band)
        sl = (
            slice(zz.min(), zz.max() + 1),
            slice(yy.min(), yy.max() + 1),
            slice(xx.min(), xx.max() + 1),
        )
        bottom = (
            xx.min() * self.geom.voxel_size,
            yy.min() * self.geom.voxel_size,
            zz.min() * self.geom.voxel_size,
        )
        return sdf_io.write_sdf(
            os.path.join(self.save_path, tag), dist[sl], bottom, self.geom.voxel_size
        )
