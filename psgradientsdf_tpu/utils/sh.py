"""Spherical-harmonics shading basis (orders 1 and 2).

Replicates the reference basis layout exactly
(cpp/include/ps_optimizer/PsOptimizerJa.cpp:17-28):
  order 1 (4 coeffs):  [1, nx, ny, nz]
  order 2 (9 coeffs):  [1, nx, ny, nz, nx*ny, nx*nz, ny*nz,
                        nx^2 - ny^2, nx^2 - nz^2]
and the order-2 basis derivative dSH/dn
(cpp/include/ps_optimizer/PsOptimizerJa.cpp:244-250).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def n_basis(order: int) -> int:
    return 4 if order == 1 else 9


def sh_basis(n: jax.Array, order: int) -> jax.Array:
    """SH basis of a (possibly batched) direction n (...,3) -> (...,B)."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    one = jnp.ones_like(nx)
    if order == 1:
        return jnp.stack([one, nx, ny, nz], axis=-1)
    if order == 2:
        return jnp.stack(
            [
                one,
                nx,
                ny,
                nz,
                nx * ny,
                nx * nz,
                ny * nz,
                nx * nx - ny * ny,
                nx * nx - nz * nz,
            ],
            axis=-1,
        )
    raise ValueError(f"unsupported SH order {order}")


def dsh_dn(n: jax.Array, order: int) -> jax.Array:
    """Jacobian of sh_basis w.r.t. n: (...,3) -> (...,3,B).

    Row i = d(basis)/d(n_i); matches dSH_dnhat in
    cpp/include/ps_optimizer/PsOptimizerJa.cpp:248-250 (a 3x9 matrix whose
    transpose maps dn -> dSH).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    zero = jnp.zeros_like(nx)
    one = jnp.ones_like(nx)
    if order == 1:
        # d[1, nx, ny, nz]/dn
        rows = [
            jnp.stack([zero, one, zero, zero], axis=-1),
            jnp.stack([zero, zero, one, zero], axis=-1),
            jnp.stack([zero, zero, zero, one], axis=-1),
        ]
        return jnp.stack(rows, axis=-2)
    if order == 2:
        rows = [
            jnp.stack([zero, one, zero, zero, ny, nz, zero, 2 * nx, 2 * nx], axis=-1),
            jnp.stack([zero, zero, one, zero, nx, zero, nz, -2 * ny, zero], axis=-1),
            jnp.stack([zero, zero, zero, one, zero, nx, ny, zero, -2 * nz], axis=-1),
        ]
        return jnp.stack(rows, axis=-2)
    raise ValueError(f"unsupported SH order {order}")
