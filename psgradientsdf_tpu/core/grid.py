"""Voxel grid geometry: coordinate transforms, indexing, interpolation.

Semantics match cpp/include/sdf_tracker/VoxelGrid.h:38-113 and VoxelGrid.cpp:
  * voxel index (i,j,k) = (x,y,z); arrays are stored [Z,Y,X] so the C-order
    linearization equals the reference's i + j*dimx + k*dimx*dimy.
  * origin = shift - 0.5 * voxel_size * dims  (volume centered at `shift`,
    VoxelGrid.h:123)
  * nearest_index rejects the 1-voxel border (VoxelGrid.cpp:57-72).

GridGeometry is a frozen (hashable) dataclass so it can ride through jit as
a static argument.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GridGeometry:
    dims: Tuple[int, int, int]          # (dimx, dimy, dimz)
    voxel_size: float
    shift: Tuple[float, float, float]   # world position of the grid center

    @property
    def origin(self) -> Tuple[float, float, float]:
        h = self.voxel_size
        return (
            self.shift[0] - 0.5 * h * self.dims[0],
            self.shift[1] - 0.5 * h * self.dims[1],
            self.shift[2] - 0.5 * h * self.dims[2],
        )

    @property
    def num_voxels(self) -> int:
        return self.dims[0] * self.dims[1] * self.dims[2]

    @property
    def shape_zyx(self) -> Tuple[int, int, int]:
        return (self.dims[2], self.dims[1], self.dims[0])

    def subdivided(self) -> "GridGeometry":
        """2x upsampled geometry (VoxelGrid.h:143-149): half voxel size,
        double dims, origin shifted by an extra half new-voxel so that the
        eight children of voxel v tile v's cube."""
        h = self.voxel_size * 0.5
        dims = (2 * self.dims[0], 2 * self.dims[1], 2 * self.dims[2])
        # reference: origin = shift - 0.5*h*dims - 0.5*h; encode the extra
        # -0.5*h by shifting the center.
        shift = (self.shift[0] - 0.5 * h, self.shift[1] - 0.5 * h, self.shift[2] - 0.5 * h)
        return GridGeometry(dims=dims, voxel_size=h, shift=shift)

    # ---- jax-traced coordinate transforms (work on batched arrays) ----

    def voxel2world(self, idx_xyz: jax.Array) -> jax.Array:
        """(...,3) int/float voxel index -> world point."""
        origin = jnp.array(self.origin, dtype=jnp.float32)
        return origin + self.voxel_size * idx_xyz.astype(jnp.float32)

    def world2voxelf(self, pts: jax.Array) -> jax.Array:
        origin = jnp.array(self.origin, dtype=jnp.float32)
        return (pts - origin) / self.voxel_size

    def world2voxel(self, pts: jax.Array) -> jax.Array:
        """Rounded voxel index (VoxelGrid.h:63-66)."""
        return jnp.floor(self.world2voxelf(pts) + 0.5).astype(jnp.int32)

    def nearest_info(self, pts: jax.Array):
        """(idx_xyz int32 (...,3), valid bool (...,)) with the reference's
        border rejection: float index must lie strictly inside
        (0, dim-1) on every axis (VoxelGrid.cpp:63)."""
        f = self.world2voxelf(pts)
        dims = jnp.array(self.dims, dtype=jnp.float32)
        valid = jnp.all((f > 0.0) & (f < dims - 1.0), axis=-1)
        idx = jnp.floor(f + 0.5).astype(jnp.int32)
        idx = jnp.clip(idx, 0, jnp.array(self.dims, dtype=jnp.int32) - 1)
        return idx, valid

    def world_coords(self) -> jax.Array:
        """Dense world coordinates of every voxel center, shape [Z,Y,X,3]."""
        dz, dy, dx = self.shape_zyx
        k = jax.lax.broadcasted_iota(jnp.float32, (dz, dy, dx), 0)
        j = jax.lax.broadcasted_iota(jnp.float32, (dz, dy, dx), 1)
        i = jax.lax.broadcasted_iota(jnp.float32, (dz, dy, dx), 2)
        idx = jnp.stack([i, j, k], axis=-1)
        return self.voxel2world(idx)


def gather_zyx(vol: jax.Array, idx_xyz: jax.Array) -> jax.Array:
    """Gather from a [Z,Y,X,...] array at (...,3) (x,y,z) integer indices."""
    return vol[idx_xyz[..., 2], idx_xyz[..., 1], idx_xyz[..., 0]]


def trilinear(vol: jax.Array, geom: GridGeometry, pts: jax.Array, extrap: float) -> jax.Array:
    """Trilinear interpolation of a scalar [Z,Y,X] grid at world points,
    with the reference's border rejection (VoxelGrid.cpp:11-55)."""
    f = geom.world2voxelf(pts)
    dims = jnp.array(geom.dims, dtype=jnp.float32)
    valid = jnp.all((f > 0.0) & (f < dims - 1.0), axis=-1)
    i0 = jnp.floor(f).astype(jnp.int32)
    frac = f - i0.astype(jnp.float32)
    i0 = jnp.clip(i0, 0, jnp.array(geom.dims, dtype=jnp.int32) - 2)

    def corner(dx, dy, dz):
        return vol[i0[..., 2] + dz, i0[..., 1] + dy, i0[..., 0] + dx]

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c00 = corner(0, 0, 0) * (1 - fz) + corner(0, 0, 1) * fz
    c01 = corner(0, 1, 0) * (1 - fz) + corner(0, 1, 1) * fz
    c10 = corner(1, 0, 0) * (1 - fz) + corner(1, 0, 1) * fz
    c11 = corner(1, 1, 0) * (1 - fz) + corner(1, 1, 1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    out = c0 * (1 - fx) + c1 * fx
    return jnp.where(valid, out, jnp.asarray(extrap, dtype=vol.dtype))
