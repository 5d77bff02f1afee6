""".sdf volume dump/load.

Format (VolumetricGradSdf.cpp:416-439):
    line 1: dimx dimy dimz
    line 2: bbox bottom corner (xmin ymin zmin) * voxel_size
    line 3: voxel_size
    then dim^3 lines of -dist (positive-inside convention for SDFGen
    comparison), x fastest, then y, then z.

Unlike the reference (which can only write), we also provide a loader so
.sdf dumps double as volume snapshots.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def write_sdf(path: str, dist_zyx: np.ndarray, bottom_xyz, voxel_size: float) -> bool:
    dz, dy, dx = dist_zyx.shape
    try:
        with open(path, "w") as fh:
            fh.write(f"{dx} {dy} {dz}\n")
            fh.write(f"{bottom_xyz[0]:g} {bottom_xyz[1]:g} {bottom_xyz[2]:g}\n")
            fh.write(f"{voxel_size:g}\n")
            # -dist, x fastest (cpp:433-437)
            np.savetxt(fh, (-dist_zyx).reshape(-1), fmt="%g")
        return True
    except OSError:
        return False


def read_sdf(path: str) -> Tuple[np.ndarray, np.ndarray, float]:
    """Returns (dist_zyx with negative-inside convention, bottom_xyz, voxel_size)."""
    with open(path) as fh:
        dx, dy, dz = (int(v) for v in fh.readline().split())
        bottom = np.array([float(v) for v in fh.readline().split()], dtype=np.float32)
        voxel_size = float(fh.readline())
        vals = np.loadtxt(fh, dtype=np.float32)
    dist = -vals.reshape(dz, dy, dx)
    return dist, bottom, voxel_size
