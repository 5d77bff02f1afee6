import jax.numpy as jnp
import numpy as np

from psgradientsdf_tpu.core.grid import GridGeometry
from psgradientsdf_tpu.core.volume import make_volume, fuse_frame
from psgradientsdf_tpu.tracking.tracker import track_frame
from psgradientsdf_tpu.utils import se3


def build_fused_scene(dim=64, h=0.02):
    """Fuse a generic wavy heightfield at z~1.2 (constrains all 6 DOF —
    planes/spheres leave the GN Hessian rank-deficient)."""
    geom = GridGeometry(dims=(dim, dim, dim), voxel_size=h, shift=(0.0, 0.0, 1.2))
    T = 5 * h
    vol = make_volume(geom, truncation=T, frame_cap=32)
    H = W = 96
    f = 90.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=jnp.float32)
    cols = jnp.arange(W, dtype=jnp.float32)[None, :]
    rows = jnp.arange(H, dtype=jnp.float32)[:, None]
    x0 = jnp.broadcast_to((cols - W / 2) / f, (H, W))
    y0 = jnp.broadcast_to((rows - H / 2) / f, (H, W))
    depth = (
        1.2 + 0.08 * jnp.sin(6 * x0) * jnp.cos(5 * y0) + 0.05 * jnp.sin(3 * (x0 + y0))
    ).astype(jnp.float32)
    color = jnp.ones((H, W, 3), dtype=jnp.float32) * 0.5
    dzdx = 0.08 * 6 * jnp.cos(6 * x0) * jnp.cos(5 * y0) + 0.15 * jnp.cos(3 * (x0 + y0))
    dzdy = -0.08 * 5 * jnp.sin(6 * x0) * jnp.sin(5 * y0) + 0.15 * jnp.cos(3 * (x0 + y0))
    n = jnp.stack([-dzdx, -dzdy, jnp.ones_like(dzdx)], axis=-1)
    normals = (n / jnp.linalg.norm(n, axis=-1, keepdims=True)).astype(jnp.float32)
    n_sq_inv = (1.0 / (1.0 + x0 ** 2 + y0 ** 2)).astype(jnp.float32)
    pose = jnp.eye(4, dtype=jnp.float32)
    vol = fuse_frame(
        vol, geom, color, depth, normals, n_sq_inv, K, pose, jnp.int32(0),
        truncation=T, zmin=0.1, zmax=5.0,
    )
    return geom, vol, K, depth, T


def test_tracker_recovers_small_perturbation():
    geom, vol, K, depth, T = build_fused_scene()
    # true pose = identity; start from a small offset
    xi = jnp.array([0.01, -0.008, 0.012, 0.004, -0.006, 0.005], dtype=jnp.float32)
    init = se3.se3_exp(xi)
    res = track_frame(
        vol, geom, depth, K, init,
        truncation=T, zmin=0.1, zmax=5.0, num_iterations=50,
        conv_threshold_sq=1e-10, damping=1.0,
    )
    # recovered pose should be closer to identity than the init
    err_init = float(jnp.linalg.norm(se3.se3_log(init)))
    err_final = float(jnp.linalg.norm(se3.se3_log(res.pose)))
    assert int(res.num_valid) > 100
    assert err_final < 0.3 * err_init, (err_init, err_final)


def test_tracker_identity_is_fixed_point():
    geom, vol, K, depth, T = build_fused_scene()
    res = track_frame(
        vol, geom, depth, K, jnp.eye(4, dtype=jnp.float32),
        truncation=T, zmin=0.1, zmax=5.0, num_iterations=10,
        conv_threshold_sq=1e-6, damping=1.0,
    )
    # pose barely moves (the query's discretization bias keeps a tiny drift,
    # so assert small motion rather than strict convergence)
    assert float(jnp.linalg.norm(se3.se3_log(res.pose))) < 1e-2


def test_tracker_stride():
    geom, vol, K, depth, T = build_fused_scene()
    res = track_frame(
        vol, geom, depth, K, jnp.eye(4, dtype=jnp.float32),
        truncation=T, zmin=0.1, zmax=5.0, num_iterations=5,
        conv_threshold_sq=1e-12, damping=1.0, stride=2,
    )
    assert int(res.num_valid) > 0
