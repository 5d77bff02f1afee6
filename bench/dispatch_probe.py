"""Dispatch-overhead probe: why do 20 host-dispatched 10-frame chunks at
256^3 cost ~95-111 ms/frame when the identical computation inside ONE
program measures 35 ms/frame (chunk_probe.py)?  Donation did not close the
gap, so measure the per-dispatch cost directly.

Variants:
  trivial_dispatch   20 dispatches of vol.dist[0,0,0]+=k (full vol as arg)
  chunk_hostloop     bench-style: 20x step_chunk host dispatches, fence at end
  chunk_hostloop_d   same with donate_argnums=(0,)
  chunk_super        2 dispatches of a 100-frame super-chunk
  per_chunk_fetch    20x step_chunk, fetch after EVERY chunk (serialized)

Usage: PSGSDF_BENCH_DIM=256 python bench/dispatch_probe.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DIM = int(os.environ.get("PSGSDF_BENCH_DIM", "256"))
W, H = 640, 480
FRAMES = 200


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("PSGSDF_PROBE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "")
    jax.config.update("jax_compilation_cache_dir", "/tmp/psgsdf_probe_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from bench_scene import make_scene
    from psgradientsdf_tpu.core.grid import GridGeometry
    from psgradientsdf_tpu.core import volume as V
    from psgradientsdf_tpu.tracking.tracker import track_frame

    log(f"[probe3] devices: {jax.devices()}  DIM={DIM}")

    K_np, depth_np, normals_np, nsq_np, color_np = make_scene(W, H)
    h = 1.8 / DIM
    T = 5 * h
    geom = GridGeometry(dims=(DIM, DIM, DIM), voxel_size=h, shift=(0.0, 0.0, 1.2))
    fuse_kw = dict(truncation=T, zmin=0.5, zmax=3.5)
    track_kw = dict(
        truncation=T, zmin=0.5, zmax=3.5, num_iterations=4,
        conv_threshold_sq=1e-6, damping=1.0, early_exit=False,
        regather_every=4,
    )

    K = jnp.asarray(K_np)
    depth = jnp.asarray(depth_np)
    normals = jnp.asarray(normals_np)
    nsq = jnp.asarray(nsq_np)
    color = jnp.asarray(color_np)
    eye = jnp.asarray(np.eye(4, dtype=np.float32))

    from scipy.spatial.transform import Rotation
    OFFSET = np.array([0.004, -0.003, 0.005, 0.002, -0.002, 0.0015], np.float32)
    off_np = np.eye(4, dtype=np.float32)
    off_np[:3, :3] = Rotation.from_rotvec(OFFSET[3:]).as_matrix().astype(np.float32)
    off_np[:3, 3] = OFFSET[:3]
    off = jnp.asarray(off_np)

    vol = V.make_volume(geom, T, frame_cap=64)
    vol = V.fuse_frame(vol, geom, color, depth, normals, nsq, K, eye,
                       jnp.int32(0), **fuse_kw)
    n_act = int(V.count_active_rows(geom, depth, K, eye, **fuse_kw))
    CAP = min(DIM * DIM, -(-int(n_act * 1.2) // 512) * 512)
    _ = float(jnp.sum(vol.dist))
    log(f"[probe3] first dispatch done, CAP={CAP}")

    results = {}
    seed_i = [100]

    def seed():
        seed_i[0] += 1
        return jnp.int32(seed_i[0])

    # ---- trivial per-dispatch cost with the big state as arg -------------
    @jax.jit
    def touch(vol, s):
        return vol._replace(dist=vol.dist.at[0, 0, 0].add(
            1e-9 * s.astype(jnp.float32)))

    vol = touch(vol, seed())
    _ = float(vol.dist[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(20):
        vol = touch(vol, seed())
    _ = float(vol.dist[0, 0, 0])
    results["trivial_dispatch_ms"] = (time.perf_counter() - t0) / 20 * 1e3
    log(f"[probe3] trivial_dispatch: {results['trivial_dispatch_ms']:.1f} ms/dispatch")

    # ---- bench-style chunk (no donation) ---------------------------------
    def make_step(chunk, donate):
        def step_chunk(vol, pose, fid0, s):
            def body(k, carry):
                vol, pose, ovf = carry
                sp = off @ pose
                res = track_frame(vol, geom, depth, K, sp, **track_kw)
                vol, ov = V.fuse_frame_culled(
                    vol, geom, color, depth, normals, nsq, K, res.pose,
                    jnp.int32(1) + (fid0 + k + s) % 60, **fuse_kw,
                    row_capacity=CAP)
                return vol, res.pose, ovf | ov
            vol, pose, ovf = jax.lax.fori_loop(
                0, chunk, body, (vol, pose, jnp.bool_(False)))
            return vol, pose, ovf
        if donate:
            return functools.partial(jax.jit, donate_argnums=(0,))(step_chunk)
        return jax.jit(step_chunk)

    def run_hostloop(name, chunk, donate, per_chunk_fetch=False):
        step = make_step(chunk, donate)
        vol2 = V.make_volume(geom, T, frame_cap=64)
        vol2 = V.fuse_frame(vol2, geom, color, depth, normals, nsq, K, eye,
                            jnp.int32(0), **fuse_kw)
        pose = eye
        # warm/compile
        vol2, pose, _ = step(vol2, pose, jnp.int32(0), seed())
        _ = float(jnp.sum(vol2.dist))
        n_chunks = FRAMES // chunk
        best = 1e18
        for _rep in range(2):
            t0 = time.perf_counter()
            ovf = None
            for c in range(n_chunks):
                vol2, pose, ovf = step(vol2, pose, jnp.int32(c * chunk), seed())
                if per_chunk_fetch:
                    _ = float(jnp.sum(pose))
            _ = float(jnp.sum(vol2.dist) + jnp.float32(ovf))
            best = min(best, time.perf_counter() - t0)
        results[name] = best / FRAMES * 1e3
        log(f"[probe3] {name}: {best/FRAMES*1e3:.2f} ms/frame "
            f"({n_chunks} dispatches of {chunk})")

    run_hostloop("chunk_hostloop_ms", 10, donate=False)
    run_hostloop("chunk_hostloop_donate_ms", 10, donate=True)
    run_hostloop("chunk_super_ms", 100, donate=False)
    run_hostloop("per_chunk_fetch_ms", 10, donate=False, per_chunk_fetch=True)

    print(json.dumps({"dim": DIM, "cap": CAP, "res": {
        k: round(v, 3) for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
