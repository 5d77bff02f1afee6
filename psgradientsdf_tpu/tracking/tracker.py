"""Rigid camera tracking: per-frame Gauss-Newton on the point-to-SDF objective.

TPU-native redesign of RigidPointOptimizer (cpp/include/sdf_tracker/
RigidPointOptimizer.cpp:12-124).  The reference's serial per-pixel loop
becomes one fused dense kernel per GN iteration:

    per pixel: backproject -> world -> Gradient-SDF query psi, ghat
               J_xi = [ghat; p x ghat]
    reduce:    E = sum psi^2, g = sum psi*J, H = sum J J^T   (a 6+36-wide
               masked reduction — exactly a psum when sharded)

wrapped in a lax.while_loop with the reference's early exit
(||xi||^2 < conv_threshold^2 checked *after* the solve, *before* the pose
update — RigidPointOptimizer.cpp:66-74).  The whole ≤50-iteration solve runs
on-device in a single jit; only the final pose returns to host.

The per-pixel reduction is also exposed as `gn_terms` for the sharded
tracker in parallel/shard.py (per-slab partial sums + psum).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from psgradientsdf_tpu.core.grid import GridGeometry
from psgradientsdf_tpu.core.volume import (
    GradSdfVolume,
    pack_tracking_payload,
    sdf_query,
    sdf_query_packed,
)
from psgradientsdf_tpu.utils import se3


class TrackResult(NamedTuple):
    pose: jax.Array        # [4,4] refined camera-to-world pose
    converged: jax.Array   # bool
    iterations: jax.Array  # int32 — GN iterations executed
    energy: jax.Array      # mean psi^2 at the last evaluated iterate
    num_valid: jax.Array   # int32 — pixels contributing to the last solve


def gn_terms(
    vol: GradSdfVolume,
    geom: GridGeometry,
    pts_cam: jax.Array,    # [N,3] valid-depth camera-frame points
    valid_z: jax.Array,    # [N] bool depth-range mask
    pose: jax.Array,       # [4,4]
    truncation: float,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-pixel residual/Jacobian terms reduced to (E, g[6], H[6,6], count).

    Mirrors the hot loop of RigidPointOptimizer.cpp:38-60.
    """
    R = pose[:3, :3]
    t = pose[:3, 3]
    p_w = pts_cam @ R.T + t
    psi, ghat, w, valid = sdf_query(vol, geom, p_w, truncation)
    m = valid_z & (w > 0.0) & valid
    mf = m.astype(psi.dtype)

    J = jnp.concatenate([ghat, jnp.cross(p_w, ghat)], axis=-1)  # [N,6]
    psi_m = psi * mf
    E = jnp.sum(psi_m * psi)
    g = J.T @ psi_m
    H = (J * mf[:, None]).T @ J
    count = jnp.sum(m)
    return E, g, H, count


@functools.partial(
    jax.jit,
    static_argnames=(
        "geom", "truncation", "zmin", "zmax", "num_iterations", "stride",
        "early_exit",
    ),
)
def track_frame(
    vol: GradSdfVolume,
    geom: GridGeometry,
    depth: jax.Array,     # [H,W]
    K: jax.Array,         # [3,3]
    init_pose: jax.Array, # [4,4]
    *,
    truncation: float,
    zmin: float,
    zmax: float,
    num_iterations: int = 50,
    conv_threshold_sq: float = 1e-6,
    damping: float = 1.0,
    stride: int = 1,
    early_exit: bool = True,
) -> TrackResult:
    """Full GN tracking solve for one frame (optimize_sampled, cpp:12-79).

    `early_exit=True` (default) uses a lax.while_loop with the reference's
    ||xi||^2 < eps exit (RigidPointOptimizer.cpp:68-71) — each GN iteration
    has ~1.3 ms device latency on TPU, so skipping unneeded iterations
    dominates every other consideration.  `early_exit=False` runs a
    fixed-trip unrolled loop with masked updates (identical results) for
    contexts that need static control flow (e.g. shard_map collectives
    must execute the same collective sequence on every device)."""
    if stride > 1:
        # pixel sub-sampling (optimize_sampled's `sampling` knob); the
        # original pixel coordinates are reconstructed via `* stride` below.
        depth = depth[::stride, ::stride]
    H_img, W_img = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    cols = (jnp.arange(W_img, dtype=jnp.float32) * stride)[None, :]
    rows = (jnp.arange(H_img, dtype=jnp.float32) * stride)[:, None]
    x0 = (cols - cx) / fx
    y0 = (rows - cy) / fy
    z = depth
    pts_cam = jnp.stack(
        [jnp.broadcast_to(x0, z.shape) * z, jnp.broadcast_to(y0, z.shape) * z, z], axis=-1
    ).reshape(-1, 3)
    valid_z = ((z > zmin) & (z < zmax)).reshape(-1)

    # pack (dist, grad, weight) once: one row-gather per pixel per iteration
    payload = pack_tracking_payload(vol)

    def masked_gram(pose):
        """(E, g, H, count) in ONE gather + ONE 8x8 Gram matmul on the MXU.

        G rows = mask * [ghat(3), p x ghat(3), psi, 1]; S = G^T G packs
        H = S[:6,:6], g = S[:6,6], E = S[6,6], count = S[7,7]."""
        R = pose[:3, :3]
        t = pose[:3, 3]
        p_w = pts_cam @ R.T + t
        psi, ghat, w, valid = sdf_query_packed(payload, geom, p_w, truncation)
        mf = (valid_z & (w > 0.0) & valid).astype(psi.dtype)
        G = jnp.concatenate(
            [ghat, jnp.cross(p_w, ghat), psi[:, None], jnp.ones_like(psi)[:, None]],
            axis=-1,
        ) * mf[:, None]
        S = G.T @ G
        return S[6, 6], S[:6, 6], S[:6, :6], S[7, 7]

    # GN loop body shared by both control-flow variants: updates are MASKED
    # once converged/failed (pose frozen at the first converged iterate,
    # step not applied — matching the reference's return-before-update).
    def body(k, carry):
        pose, conv, fail, E_mean, count, iters = carry
        active = (~conv) & (~fail)
        E, g, Hm, cnt = masked_gram(pose)
        fail_now = cnt < 0.5
        # Gauss-Newton step via Cholesky (cpp:66); relative jitter guards
        # PD-ness on degenerate scenes (the reference's bare llt would
        # silently produce garbage there).
        Hj = Hm + (1e-6 * jnp.trace(Hm) / 6.0 + 1e-12) * jnp.eye(6, dtype=Hm.dtype)
        chol = jax.scipy.linalg.cho_factor(Hj)
        xi = damping * jax.scipy.linalg.cho_solve(chol, g)
        conv_now = jnp.sum(xi * xi) < conv_threshold_sq
        # converged -> keep pose (reference returns before applying the step)
        step_ok = active & ~(conv_now | fail_now)
        new_pose = jnp.where(step_ok, se3.se3_exp(-xi) @ pose, pose)
        return (
            new_pose,
            jnp.where(active, conv_now, conv),
            jnp.where(active, fail_now, fail),
            jnp.where(active, E / jnp.maximum(cnt, 1.0), E_mean),
            jnp.where(active, cnt.astype(jnp.int32), count),
            iters + active.astype(jnp.int32),
        )

    init = (
        init_pose,
        jnp.bool_(False),
        jnp.bool_(False),
        jnp.float32(0.0),
        jnp.int32(0),
        jnp.int32(0),
    )
    if early_exit:
        pose, conv, fail, E_mean, count, iters = jax.lax.while_loop(
            lambda c: (c[5] < num_iterations) & (~c[1]) & (~c[2]),
            lambda c: body(c[5], c),
            init,
        )
    else:
        pose, conv, fail, E_mean, count, iters = jax.lax.fori_loop(
            0, num_iterations, body, init, unroll=True
        )
    return TrackResult(
        pose=pose,
        converged=conv & (~fail),
        iterations=iters,
        energy=E_mean,
        num_valid=count,
    )


@functools.partial(jax.jit, static_argnames=("geom", "truncation"))
def energy(
    vol: GradSdfVolume,
    geom: GridGeometry,
    depth: jax.Array,
    K: jax.Array,
    pose: jax.Array,
    *,
    truncation: float,
) -> jax.Array:
    """0.5 * sum psi^2 over valid pixels at a *given* pose
    (RigidPointOptimizer.cpp:81-124; note it inverts the pose convention)."""
    Himg, Wimg = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    cols = jnp.arange(Wimg, dtype=jnp.float32)[None, :]
    rows = jnp.arange(Himg, dtype=jnp.float32)[:, None]
    pts_cam = jnp.stack(
        [((cols - cx) / fx) * depth, ((rows - cy) / fy) * depth, depth], axis=-1
    ).reshape(-1, 3)
    valid_z = (depth > 0.0).reshape(-1)
    R = pose[:3, :3]
    t = pose[:3, 3]
    p_w = (pts_cam - t) @ R  # R^T (p - t)
    psi, _, w, valid = sdf_query(vol, geom, p_w, truncation)
    m = (valid_z & (w > 0.0) & valid).astype(psi.dtype)
    return 0.5 * jnp.sum(psi * psi * m)
