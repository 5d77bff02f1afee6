"""Cross-implementation ATE parity on a long, noisy, looped trajectory.

The real TUM sequences are absent from this image (BASELINE.md), so the
strongest available anchor for the ATE north star is: render a 120-frame
closed-loop camera orbit over the wavy heightfield with Gaussian depth
noise, feed BOTH implementations the identical float32 frames, run the
reference tracking+fusion algorithm (bench/cpp_track_ate.cpp — the same
AoS hot loops as cpp_baseline.cpp) and the JAX tracker, and require the
JAX ATE-RMSE to be no worse than the C++ ATE (+15% slack for the
legitimately path-dependent GN stopping points, see test_cpp_parity.py).

Covers both tracker configs: the reference-semantics config (early-exit
while loop, regather every iteration) and the production streaming config
(fixed-trip frozen-correspondence rounds used by bench.py / stream.py).
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest
import jax.numpy as jnp

from psgradientsdf_tpu.core.grid import GridGeometry
from psgradientsdf_tpu.core.volume import fuse_frame, make_volume
from psgradientsdf_tpu.io.trajectory import ate_rmse
from psgradientsdf_tpu.tracking.tracker import track_frame

W, H, DIM, F = 80, 60, 64, 120
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIFT = np.array([0.0, 0.0, 1.2], dtype=np.float32)
ZMIN, ZMAX = 0.5, 3.5


def _g(x, y):
    return (1.2 + 0.08 * np.sin(6 * x) * np.cos(5 * y)
            + 0.05 * np.sin(3 * (x + y)))


def _dg(x, y):
    dgx = 0.08 * 6 * np.cos(6 * x) * np.cos(5 * y) + 0.15 * np.cos(3 * (x + y))
    dgy = -0.08 * 5 * np.sin(6 * x) * np.sin(5 * y) + 0.15 * np.cos(3 * (x + y))
    return dgx, dgy


def _look_at(pos, target, roll):
    f = target - pos
    f = f / np.linalg.norm(f)
    r = np.cross(np.array([0.0, 1.0, 0.0]), f)
    r = r / np.linalg.norm(r)
    d = np.cross(f, r)
    cr, sr = np.cos(roll), np.sin(roll)
    r2 = cr * r + sr * d
    d2 = -sr * r + cr * d
    R = np.stack([r2, d2, f], axis=1)   # columns: right, down, forward
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R.astype(np.float32)
    T[:3, 3] = pos.astype(np.float32)
    return T


def _gt_trajectory():
    poses = []
    for f in range(F):
        th = 2 * np.pi * f / F
        pos = np.array([0.25 * np.sin(th),
                        0.18 * np.sin(th) * np.cos(th),
                        0.10 * np.cos(th) - 0.10])
        target = np.array([0.10 * np.sin(2 * th), 0.10 * np.cos(3 * th), 1.25])
        poses.append(_look_at(pos, target, roll=0.06 * np.sin(2 * th)))
    return poses


def _render(pose, rng):
    """Ray-march the heightfield from `pose`; returns noisy depth,
    camera-frame inward normals at the hit points, and the nsq map."""
    fx = fy = 0.9 * W
    cx, cy = W / 2.0, H / 2.0
    u = np.arange(W, dtype=np.float64)[None, :]
    v = np.arange(H, dtype=np.float64)[:, None]
    x0 = np.broadcast_to((u - cx) / fx, (H, W))
    y0 = np.broadcast_to((v - cy) / fy, (H, W))
    R = pose[:3, :3].astype(np.float64)
    t = pose[:3, 3].astype(np.float64)
    dir_c = np.stack([x0, y0, np.ones_like(x0)], axis=-1)
    dir_w = dir_c @ R.T
    s = np.full((H, W), 1.2)
    for _ in range(40):
        p = t + s[..., None] * dir_w
        s = (_g(p[..., 0], p[..., 1]) - t[2]) / dir_w[..., 2]
    p = t + s[..., None] * dir_w
    dgx, dgy = _dg(p[..., 0], p[..., 1])
    n_w = np.stack([-dgx, -dgy, np.ones_like(dgx)], axis=-1)
    n_w /= np.linalg.norm(n_w, axis=-1, keepdims=True)
    n_c = n_w @ R            # R^T n_w
    depth = s + rng.normal(0.0, 0.002, s.shape)
    nsq = 1.0 / (1.0 + x0 ** 2 + y0 ** 2)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)
    return (K, depth.astype(np.float32), n_c.astype(np.float32),
            nsq.astype(np.float32))


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ate")
    rng = np.random.default_rng(42)
    gt = _gt_trajectory()
    frames = [_render(p, rng) for p in gt]
    K = frames[0][0]
    h = 1.8 / DIM
    T = 5.0 * h

    scene_bin = str(tmp / "scene.bin")
    with open(scene_bin, "wb") as f:
        f.write(struct.pack("4i", W, H, DIM, F))
        f.write(struct.pack("8f", K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                            h, T, ZMIN, ZMAX))
        f.write(SHIFT.tobytes())
        for p in gt:
            f.write(p.astype(np.float32).tobytes())
        for (_, depth, normals, nsq) in frames:
            f.write(depth.tobytes())
            f.write(normals.tobytes())
            f.write(nsq.tobytes())
    return dict(tmp=tmp, gt=gt, frames=frames, K=K, h=h, T=T,
                scene_bin=scene_bin)


@pytest.fixture(scope="module")
def cpp_ate(scene):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    tmp = scene["tmp"]
    binp = str(tmp / "cpp_track_ate")
    outp = str(tmp / "cpp_poses.bin")
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-o", binp,
         os.path.join(REPO, "bench", "cpp_track_ate.cpp")],
        check=True, capture_output=True)
    subprocess.run([binp, scene["scene_bin"], outp],
                   check=True, capture_output=True)
    poses = np.fromfile(outp, dtype=np.float32).reshape(F, 4, 4)
    ate = ate_rmse(list(poses[1:]), scene["gt"][1:])
    # the reference algorithm must actually track (not diverge) on this
    # scenario, otherwise "parity" is vacuous
    assert ate < 0.05, f"C++ tracker diverged: ATE {ate}"
    return ate


def _jax_track(scene, **tkw):
    geom = GridGeometry(dims=(DIM, DIM, DIM), voxel_size=scene["h"],
                        shift=tuple(SHIFT))
    T = scene["T"]
    kw = dict(truncation=T, zmin=ZMIN, zmax=ZMAX)
    vol = make_volume(geom, T, frame_cap=256)
    K = jnp.asarray(scene["K"])
    color = jnp.full((H, W, 3), 0.5, dtype=jnp.float32)
    pose = jnp.asarray(scene["gt"][0])
    tracked = [np.asarray(pose)]
    for f, (_, depth, normals, nsq) in enumerate(scene["frames"]):
        dj = jnp.asarray(depth)
        nj = jnp.asarray(normals)
        qj = jnp.asarray(nsq)
        if f > 0:
            res = track_frame(vol, geom, dj, K, pose, **kw, **tkw)
            pose = res.pose
            tracked.append(np.asarray(pose))
        vol = fuse_frame(vol, geom, color, dj, nj, qj, K, pose,
                         jnp.int32(f), **kw)
    return ate_rmse(tracked[1:], scene["gt"][1:])


def test_ate_reference_config(scene, cpp_ate):
    """Reference-semantics tracker (early-exit, regather every iteration)."""
    ate = _jax_track(scene, num_iterations=50, conv_threshold_sq=1e-6,
                     damping=1.0, early_exit=True, regather_every=1)
    print(f"ATE jax(ref-config)={ate:.5f} cpp={cpp_ate:.5f}")
    assert ate <= cpp_ate * 1.15 + 2e-4


def test_ate_streaming_config(scene, cpp_ate):
    """Production streaming tracker: fixed-trip frozen-correspondence
    rounds (the bench.py / stream executor configuration)."""
    ate = _jax_track(scene, num_iterations=8, conv_threshold_sq=1e-6,
                     damping=1.0, early_exit=False, regather_every=4)
    print(f"ATE jax(stream-config)={ate:.5f} cpp={cpp_ate:.5f}")
    assert ate <= cpp_ate * 1.15 + 2e-4
