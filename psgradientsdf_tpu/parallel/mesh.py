"""Device-mesh construction and sharding specs for the voxel engine.

The reference is single-process/single-thread (SURVEY §2.1); the TPU build
scales along two axes (SURVEY §5.7):

  "z"       — spatial Z-slab sharding of the dense voxel grid (the
              tensor-parallel analog); fusion and per-voxel work are local,
              FD stencils need 1-voxel halos, GN reductions are psums.
  "frames"  — keyframe sharding in the refinement (the data-parallel
              analog); per-frame pose/light blocks solve locally, voxel
              reductions psum over this axis.

All helpers work identically on a real pod slice or on the
xla_force_host_platform_device_count CPU mesh used by CI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from psgradientsdf_tpu.core.volume import GradSdfVolume

Z_AXIS = "z"
FRAME_AXIS = "frames"


def make_mesh(n_z: int = 0, n_frames: int = 1, devices=None) -> Mesh:
    """(n_z x n_frames) mesh; n_z=0 -> use all remaining devices for z."""
    devices = list(devices if devices is not None else jax.devices())
    if n_z <= 0:
        n_z = len(devices) // max(n_frames, 1)
    need = n_z * n_frames
    if need > len(devices):
        raise ValueError(f"mesh {n_z}x{n_frames} needs {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_z, n_frames)
    return Mesh(arr, (Z_AXIS, FRAME_AXIS))


def volume_specs() -> GradSdfVolume:
    """PartitionSpecs for each GradSdfVolume field: Z-slab layout."""
    return GradSdfVolume(
        dist=P(Z_AXIS, None, None),
        grad=P(Z_AXIS, None, None, None),
        weight=P(Z_AXIS, None, None),
        color=P(Z_AXIS, None, None, None),
        vis=P(None, Z_AXIS, None, None),
    )


def shard_volume(vol: GradSdfVolume, mesh: Mesh) -> GradSdfVolume:
    """Place a volume on the mesh as Z-slabs (replicated over `frames`)."""
    specs = volume_specs()
    return GradSdfVolume(
        *(
            jax.device_put(arr, NamedSharding(mesh, spec))
            for arr, spec in zip(vol, specs)
        )
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
