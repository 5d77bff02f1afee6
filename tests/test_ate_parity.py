"""Cross-implementation ATE parity on long, noisy, looped trajectories.

The real TUM sequences are absent from this image (BASELINE.md), so the
strongest available anchor for the ATE north star is: render a closed-loop
camera orbit over the wavy heightfield with sensor noise, feed BOTH
implementations the identical float32 frames, run the reference
tracking+fusion algorithm (bench/cpp_track_ate.cpp — the same AoS hot
loops as cpp_baseline.cpp) and the JAX tracker, and require the JAX
ATE-RMSE to be no worse than the C++ ATE (+15% slack for the legitimately
path-dependent GN stopping points, see test_cpp_parity.py).

Two anchors (round-4 VERDICT #5):
  * CI anchor: 80x60 @ 64^3, 120 frames, Gaussian depth noise only —
    fast enough for every CPU test run.
  * PRODUCTION anchor: 640x480 @ 128^3 (the reference's TUM operating
    point, main_ps.cpp:123 + config_tumrgbd.json) over a handheld-like
    trajectory with rotation-dominant segments, depth dropout holes, and
    outlier depth speckle.  Gated behind PSGSDF_TEST_BIG_ATE=1 (minutes
    of render + track on CPU; run serialized with nothing else on the
    chip when driven on TPU).  The gated run also measures the tracker's
    pixel-stride ATE deltas (VERDICT #4; reference's own lever,
    RigidPointOptimizer.h:36-43 `optimize_sampled`).

Covers both tracker configs: the reference-semantics config (early-exit,
regather every iteration) and the production streaming config (fixed-trip
frozen-correspondence rounds used by bench.py / stream.py).
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


def _gt_trajectory(F, handheld=False):
    """Smooth closed orbit; with handheld=True, superimpose rotation-
    dominant segments (fast target swings + roll jitter) like a person
    scanning a desk with a hand camera."""
    rng = np.random.default_rng(3)
    poses = []
    for f in range(F):
        th = 2 * np.pi * f / F
        pos = np.array([0.25 * np.sin(th),
                        0.18 * np.sin(th) * np.cos(th),
                        0.10 * np.cos(th) - 0.10])
        target = np.array([0.10 * np.sin(2 * th), 0.10 * np.cos(3 * th), 1.25])
        roll = 0.06 * np.sin(2 * th)
        if handheld:
            # rotation-dominant: the viewpoint barely moves while the
            # look-at target swings quickly through two bursts per loop
            burst = np.exp(-0.5 * ((np.sin(2 * th) / 0.25) ** 2))
            target = target + burst * np.array(
                [0.25 * np.sin(9 * th), 0.18 * np.cos(7 * th), 0.0])
            roll += 0.10 * burst * np.sin(11 * th)
            pos = pos + rng.normal(0.0, 0.0015, 3)   # hand tremor
        poses.append(_look_at(pos, target, roll))
    return poses


def _render(pose, rng, W, H, dropout=0.0, speckle=0.0):
    """Ray-march the heightfield from `pose`; returns noisy depth,
    camera-frame inward normals at the hit points, and the nsq map.
    dropout: fraction of pixels zeroed in blobs (sensor holes);
    speckle: fraction of pixels with large outlier depth."""
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
    if speckle > 0:
        m = rng.random(s.shape) < speckle
        depth = np.where(m, depth + rng.uniform(-0.5, 0.8, s.shape), depth)
    if dropout > 0:
        # blobby holes: threshold smoothed noise (box-filter a coarse grid)
        coarse = rng.random((H // 8 + 1, W // 8 + 1))
        holes = np.kron(coarse, np.ones((8, 8)))[:H, :W] < dropout
        depth = np.where(holes, 0.0, depth)
    nsq = 1.0 / (1.0 + x0 ** 2 + y0 ** 2)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)
    return (K, depth.astype(np.float32), n_c.astype(np.float32),
            nsq.astype(np.float32))


def build_scene(tmp, *, W, H, DIM, F, handheld=False, dropout=0.0,
                speckle=0.0, seed=42):
    """Render the trajectory, write the cpp_track_ate scene file, return
    the shared scene dict (identical float32 inputs for both sides)."""
    rng = np.random.default_rng(seed)
    gt = _gt_trajectory(F, handheld=handheld)
    frames = [_render(p, rng, W, H, dropout=dropout, speckle=speckle)
              for p in gt]
    K = frames[0][0]
    h = 1.8 / DIM
    T = 5.0 * h

    scene_bin = os.path.join(str(tmp), "scene.bin")
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
                W=W, H=H, DIM=DIM, F=F, scene_bin=scene_bin)


def run_cpp(scene):
    tmp = scene["tmp"]
    binp = os.path.join(str(tmp), "cpp_track_ate")
    outp = os.path.join(str(tmp), "cpp_poses.bin")
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-o", binp,
         os.path.join(REPO, "bench", "cpp_track_ate.cpp")],
        check=True, capture_output=True)
    subprocess.run([binp, scene["scene_bin"], outp],
                   check=True, capture_output=True)
    poses = np.fromfile(outp, dtype=np.float32).reshape(scene["F"], 4, 4)
    return ate_rmse(list(poses[1:]), scene["gt"][1:])


def jax_track_ate(scene, stale_every=0, **tkw):
    """stale_every=N tracks every frame against a map snapshot refreshed
    at N-frame chunk boundaries — the resident streaming executor's lag
    contract (the canonical volume is read-only within a chunk;
    core/resident.py).  The snapshot is taken AFTER frame 0 is fused
    (the executor refreshes at chunk start from a canonical map that
    already contains frame 0) — an earlier version of this harness
    started from the EMPTY volume, so the first N-1 frames tracked
    against a map with no data at all, conflating a degenerate startup
    with steady-state lag (advisor round 4)."""
    DIM = scene["DIM"]
    geom = GridGeometry(dims=(DIM, DIM, DIM), voxel_size=scene["h"],
                        shift=tuple(SHIFT))
    T = scene["T"]
    kw = dict(truncation=T, zmin=ZMIN, zmax=ZMAX)
    vol = make_volume(geom, T, frame_cap=256)
    K = jnp.asarray(scene["K"])
    color = jnp.full((scene["H"], scene["W"], 3), 0.5, dtype=jnp.float32)
    pose = jnp.asarray(scene["gt"][0])
    tracked = [np.asarray(pose)]
    track_vol = vol
    for f, (_, depth, normals, nsq) in enumerate(scene["frames"]):
        dj = jnp.asarray(depth)
        nj = jnp.asarray(normals)
        qj = jnp.asarray(nsq)
        if stale_every and f > 0 and f % stale_every == 0:
            track_vol = vol          # chunk boundary: refresh snapshot
        if f > 0:
            res = track_frame(track_vol if stale_every else vol, geom, dj,
                              K, pose, **kw, **tkw)
            pose = res.pose
            tracked.append(np.asarray(pose))
        vol = fuse_frame(vol, geom, color, dj, nj, qj, K, pose,
                         jnp.int32(f), **kw)
        if stale_every and f == 0:
            track_vol = vol          # first chunk sees the frame-0 map
    return ate_rmse(tracked[1:], scene["gt"][1:])


# --------------------------------------------------------------------------
# CI anchor: 80x60 @ 64^3
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return build_scene(tmp_path_factory.mktemp("ate"),
                       W=80, H=60, DIM=64, F=120)


@pytest.fixture(scope="module")
def cpp_ate(scene):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    ate = run_cpp(scene)
    # the reference algorithm must actually track (not diverge) on this
    # scenario, otherwise "parity" is vacuous
    assert ate < 0.05, f"C++ tracker diverged: ATE {ate}"
    return ate


def test_ate_reference_config(scene, cpp_ate):
    """Reference-semantics tracker (early-exit, regather every iteration)."""
    from psgradientsdf_tpu.tracking import configs

    ate = jax_track_ate(scene, **configs.REFERENCE)
    print(f"ATE jax(ref-config)={ate:.5f} cpp={cpp_ate:.5f}")
    assert ate <= cpp_ate * 1.15 + 2e-4


def test_ate_streaming_config(scene, cpp_ate):
    """Production streaming tracker: fixed-trip frozen-correspondence
    rounds — the SAME config dicts bench.py times (tracking/configs.py)."""
    from psgradientsdf_tpu.tracking import configs

    ate = jax_track_ate(scene, **configs.STREAMING)
    print(f"ATE jax(stream-config)={ate:.5f} cpp={cpp_ate:.5f}")
    assert ate <= cpp_ate * 1.15 + 2e-4
    # the ATE-parity config must match the reference config here too
    ate_p = jax_track_ate(scene, **configs.PARITY)
    print(f"ATE jax(parity-config)={ate_p:.5f}")
    assert ate_p <= cpp_ate * 1.15 + 2e-4


def test_ate_stale_map_config(scene, cpp_ate):
    """Stale-map tracking envelope (RE-MEASURED round 5 after the advisor
    caught a harness flaw: the round-4 harness started the snapshot from
    the EMPTY volume, so with lag N the first N-1 frames tracked against
    a map with no data — the pinned '1.65x at N=5, 4x at N=10' envelope
    was that degenerate startup, not steady-state lag).  With the
    snapshot correctly seeded from the frame-0 map and refreshed at
    chunk boundaries (the resident executor's actual contract,
    core/resident.py), chunk-lagged tracking is FREE on this orbit at
    every measured depth: N=3 2.69, N=5 2.66, N=10 2.63, N=20 2.64,
    N=40 2.52 vs fresh 2.62 mm (2026-08-21).  The production handheld
    anchor's envelope is measured in test_ate_production_anchor."""
    tkw = dict(num_iterations=8, conv_threshold_sq=1e-6, damping=1.0,
               early_exit=False, regather_every=4)
    fresh = jax_track_ate(scene, **tkw)
    stale3 = jax_track_ate(scene, stale_every=3, **tkw)
    stale10 = jax_track_ate(scene, stale_every=10, **tkw)
    print(f"ATE jax stale3={stale3:.5f} stale10={stale10:.5f} "
          f"fresh={fresh:.5f} cpp={cpp_ate:.5f}")
    # steady-state chunk lag is free (within noise) at 3 and 10 frames
    assert stale3 <= fresh * 1.15 + 2e-4
    assert stale10 <= fresh * 1.15 + 2e-4


# --------------------------------------------------------------------------
# Production anchor: 640x480 @ 128^3, handheld trajectory (gated)
# --------------------------------------------------------------------------

@pytest.mark.skipif(not os.environ.get("PSGSDF_TEST_BIG_ATE"),
                    reason="production-scale anchor: PSGSDF_TEST_BIG_ATE=1")
def test_ate_production_anchor(tmp_path):
    """The reference's TUM operating point (640x480 @ 128^3,
    main_ps.cpp:123) on a handheld trajectory with rotation-dominant
    segments, 6%-area dropout holes, and 0.3% outlier speckle.

    Round 5: the tracker configs come from tracking/configs.py (the SAME
    dicts bench.py times and records), and the measured ATEs are asserted
    against the pinned PRODUCTION_ATE_M table — so the artifact of record
    can never pair a config's fps with a different config's ATE
    (round-4 VERDICT #2)."""
    from psgradientsdf_tpu.tracking import configs

    sc = build_scene(tmp_path, W=640, H=480, DIM=128, F=120,
                     handheld=True, dropout=0.06, speckle=0.003)
    cpp = run_cpp(sc)
    assert cpp < 0.05, f"C++ tracker diverged at production scale: {cpp}"
    results = {"cpp": cpp}
    results["reference"] = jax_track_ate(sc, **configs.REFERENCE)
    results["streaming"] = jax_track_ate(sc, **configs.STREAMING)
    results["parity"] = jax_track_ate(sc, **configs.PARITY)
    results["streaming_fast"] = jax_track_ate(sc, **configs.STREAMING_FAST)
    results["streaming_stride2"] = jax_track_ate(
        sc, **dict(configs.STREAMING, stride=2))
    results["stream_stride4"] = jax_track_ate(
        sc, **dict(configs.STREAMING, stride=4))
    # stale-map envelope at the handheld operating point (round 5: the CI
    # anchor showed chunk lag free after the harness fix; verify the
    # rotation-burst trajectory agrees before any design leans on it)
    for n in (3, 10):
        results[f"stream_stale{n}"] = jax_track_ate(
            sc, stale_every=n, **configs.STREAMING)
    print("production ATE-RMSE (m): "
          + "  ".join(f"{k}={v:.5f}" for k, v in results.items()))
    # every pinned number in tracking/configs.py must reproduce (10% rel:
    # the scene build is seeded, so drift here means the config or the
    # tracker changed — exactly what the pin is for)
    for key, want in configs.PRODUCTION_ATE_M.items():
        got = results[key]
        assert abs(got - want) <= 0.10 * want + 2e-5, (key, got, want)
    # semantic bounds (robustness gates, not re-measurements):
    # the reference-config tracker holds C++ parity
    assert results["reference"] <= cpp * 1.15 + 2e-4
    # the PARITY streaming config really is at parity (round-5 VERDICT #3
    # closure: streaming ATE <= 1.2x C++ achieved — it BEATS C++)
    assert results["parity"] <= cpp * 1.2 + 2e-5
    # the STREAMING headline config stays sub-voxel
    assert results["streaming"] <= cpp * 2.2 + 1e-4
    assert results["streaming_stride2"] <= results["streaming"] * 1.2 + 5e-5
    assert results["stream_stride4"] <= cpp * 3.0 + 1e-4
