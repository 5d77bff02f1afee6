"""SO(3)/SE(3) Lie-group ops in pure JAX (float32, jit/vmap-safe).

Replaces the reference's Sophus usage (cpp/include/mat.h:25-26,
SE3::exp update in cpp/include/sdf_tracker/RigidPointOptimizer.cpp:74).

Conventions (matching Sophus):
  * se(3) tangent xi = [rho(3), omega(3)]: translation part first.
  * exp/log are exact with Taylor fallbacks near theta=0 so that
    jax.grad through them is finite.
  * quaternions are (x, y, z, w) — TUM trajectory file order
    (cpp/voxel_ps/src/main_ps.cpp:273-275).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector (cpp/include/ps_optimizer/Auxilary.h:29-38)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(omega: jax.Array) -> jax.Array:
    """Rodrigues formula with small-angle Taylor expansion."""
    theta_sq = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    # sin(t)/t and (1-cos(t))/t^2, Taylor-guarded
    use_taylor = theta_sq < 1e-8
    a = jnp.where(use_taylor, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(use_taylor, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta_sq, _EPS * _EPS))
    K = hat(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R: jax.Array) -> jax.Array:
    """Inverse of so3_exp. Accurate for theta in [0, pi)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    # theta / (2 sin(theta)), Taylor-guarded near 0
    small = theta < 1e-4
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.maximum(2.0 * sin_theta, _EPS),
    )
    return scale[..., None] * vee


def se3_exp(xi: jax.Array) -> jax.Array:
    """xi=[rho, omega] -> 4x4 homogeneous transform (Sophus SE3::exp)."""
    rho, omega = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    use_taylor = theta_sq < 1e-8
    K = hat(omega)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    a = jnp.where(use_taylor, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(use_taylor, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta_sq, _EPS * _EPS))
    c = jnp.where(
        use_taylor,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta_sq * theta, _EPS),
    )
    R = eye + a[..., None, None] * K + b[..., None, None] * K2
    V = eye + b[..., None, None] * K + c[..., None, None] * K2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return _rt_to_mat(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """Inverse of se3_exp: 4x4 -> xi=[rho, omega]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    omega = so3_log(R)
    theta_sq = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    K = hat(omega)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    small = theta_sq < 1e-8
    # V^{-1} = I - K/2 + coef * K^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - theta * jnp.cos(theta * 0.5) / jnp.maximum(2.0 * jnp.sin(theta * 0.5), _EPS))
        / jnp.maximum(theta_sq, _EPS * _EPS),
    )
    Vinv = eye - 0.5 * K + coef[..., None, None] * K2
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, omega], axis=-1)


def _rt_to_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def rt_to_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """(3x3, 3) -> 4x4."""
    return _rt_to_mat(R, t)


def mat_inverse(T: jax.Array) -> jax.Array:
    """Fast SE(3) inverse: [R t]^-1 = [R^T, -R^T t]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return _rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Quaternion (x,y,z,w) -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.sqrt(jnp.maximum(x * x + y * y + z * z + w * w, _EPS))
    x, y, z, w = x / n, y / n, z / n, w / n
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (x,y,z,w), w >= 0 branch-free via max-trace method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick numerically best
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    d0 = jnp.maximum(4.0 * qw0, _EPS)
    c0 = jnp.stack([(m21 - m12) / d0, (m02 - m20) / d0, (m10 - m01) / d0, qw0], axis=-1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    d1 = jnp.maximum(4.0 * qx1, _EPS)
    c1 = jnp.stack([qx1, (m01 + m10) / d1, (m02 + m20) / d1, (m21 - m12) / d1], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    d2 = jnp.maximum(4.0 * qy2, _EPS)
    c2 = jnp.stack([(m01 + m10) / d2, qy2, (m12 + m21) / d2, (m02 - m20) / d2], axis=-1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    d3 = jnp.maximum(4.0 * qz3, _EPS)
    c3 = jnp.stack([(m02 + m20) / d3, (m12 + m21) / d3, qz3, (m10 - m01) / d3], axis=-1)

    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply 4x4 transform to (...,3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, pts) + t
