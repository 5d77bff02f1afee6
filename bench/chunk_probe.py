"""Chunk-program probe: decompose the bench step_chunk's ~96 ms/frame at
256^3 (fusion alone measures 26 ms — fusion_probe.py — so ~65 ms hides in
the combined track+fuse program).

Variants (chained-fetch protocol, distinct seeds — see fusion_probe.py):
  chunk_full      bench step_chunk replica (track 4-iter frozen + culled fuse)
  chunk_track     tracking only (volume perturbed per frame vs hoisting)
  chunk_fuse      fusion only
  repack_only     pack_tracking_payload per frame (the [V,8] concat)
  chunk_packed    PackedVolume design: payload IS the state, no repack

Usage:  PSGSDF_BENCH_DIM=256 python bench/chunk_probe.py
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DIM = int(os.environ.get("PSGSDF_BENCH_DIM", "256"))
W, H = 640, 480
CHUNK = 10


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

    log(f"[probe2] devices: {jax.devices()}  DIM={DIM}")

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

    OFFSET = np.array([0.004, -0.003, 0.005, 0.002, -0.002, 0.0015], np.float32)
    from scipy.spatial.transform import Rotation
    off_np = np.eye(4, dtype=np.float32)
    Rm = Rotation.from_rotvec(OFFSET[3:]).as_matrix().astype(np.float32)
    Kh = np.array([[0, -OFFSET[5], OFFSET[4]], [OFFSET[5], 0, -OFFSET[3]],
                   [-OFFSET[4], OFFSET[3], 0]], dtype=np.float32)
    Vm = np.eye(3, dtype=np.float32) + 0.5 * Kh + (Kh @ Kh) / 6.0
    off_np[:3, :3] = Rm
    off_np[:3, 3] = Vm @ OFFSET[:3]
    off = jnp.asarray(off_np)

    vol = V.make_volume(geom, T, frame_cap=64)
    vol = V.fuse_frame(vol, geom, color, depth, normals, nsq, K, eye,
                       jnp.int32(0), **fuse_kw)
    n_act = int(V.count_active_rows(geom, depth, K, eye, **fuse_kw))
    CAP = min(DIM * DIM, -(-int(n_act * 1.2) // 512) * 512)
    log(f"[probe2] CAP={CAP}")
    _ = float(jnp.sum(vol.dist))
    log("[probe2] first dispatch done")

    results = {}
    seeds = itertools.count(1)

    def seed():
        return jnp.int32(next(seeds))

    def marginal(name, make_chain, n1=1, n2=3, per_frame=CHUNK):
        try:
            f1, f2 = make_chain(n1), make_chain(n2)
            _ = float(f1(seed()))
            _ = float(f2(seed()))
            best = 1e18
            for _r in range(2):
                t0 = time.perf_counter()
                _ = float(f1(seed()))
                t1 = time.perf_counter()
                _ = float(f2(seed()))
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
            results[name] = best / per_frame
            log(f"[probe2] {name}: {best/per_frame*1e3:.2f} ms/frame")
        except Exception as e:
            results[name] = None
            log(f"[probe2] {name}: FAILED {type(e).__name__}: {e}")

    # ---- 1. bench step_chunk replica --------------------------------------
    def chain_chunk_full(n):
        @jax.jit
        def run(vol, pose, s):
            def frame(k, carry):
                vol, pose, ovf = carry
                seedp = off @ pose
                res = track_frame(vol, geom, depth, K, seedp, **track_kw)
                vol, ov = V.fuse_frame_culled(
                    vol, geom, color, depth, normals, nsq, K, res.pose,
                    jnp.int32(1) + (k + s) % 60, **fuse_kw, row_capacity=CAP)
                return vol, res.pose, ovf | ov
            def chunk(c, carry):
                vol, pose, ovf = carry
                return jax.lax.fori_loop(
                    0, CHUNK, frame, (vol, pose, ovf))
            vol, pose, ovf = jax.lax.fori_loop(
                0, n, chunk, (vol, pose, jnp.bool_(False)))
            return jnp.sum(vol.dist) + jnp.float32(ovf) + jnp.sum(pose)
        return lambda s: run(vol, eye, s)

    marginal("chunk_full", chain_chunk_full)

    # ---- 2. tracking only (perturb volume per frame against hoisting) -----
    def chain_chunk_track(n):
        @jax.jit
        def run(vol, pose, s):
            def frame(k, carry):
                vol, pose = carry
                seedp = off @ pose
                res = track_frame(vol, geom, depth, K, seedp, **track_kw)
                vol = vol._replace(
                    dist=vol.dist + 1e-9 * (k + s).astype(jnp.float32))
                return vol, res.pose
            def chunk(c, carry):
                return jax.lax.fori_loop(0, CHUNK, frame, carry)
            vol, pose = jax.lax.fori_loop(0, n, chunk, (vol, pose))
            return jnp.sum(pose) + jnp.sum(vol.dist[0, 0])
        return lambda s: run(vol, eye, s)

    marginal("chunk_track", chain_chunk_track)

    # ---- 3. fusion only ---------------------------------------------------
    def chain_chunk_fuse(n):
        @jax.jit
        def run(vol, s):
            def frame(k, carry):
                vol, ovf = carry
                vol, ov = V.fuse_frame_culled(
                    vol, geom, color, depth, normals, nsq, K, eye,
                    jnp.int32(1) + (k + s) % 60, **fuse_kw, row_capacity=CAP)
                return vol, ovf | ov
            def chunk(c, carry):
                return jax.lax.fori_loop(0, CHUNK, frame, carry)
            vol, ovf = jax.lax.fori_loop(0, n, chunk, (vol, jnp.bool_(False)))
            return jnp.sum(vol.dist) + jnp.float32(ovf)
        return lambda s: run(vol, s)

    marginal("chunk_fuse", chain_chunk_fuse)

    # ---- 4. the [V,8] repack alone ----------------------------------------
    def chain_repack(n):
        @jax.jit
        def run(vol, s):
            def frame(k, acc_vol):
                acc, vol = acc_vol
                vol = vol._replace(
                    dist=vol.dist + 1e-9 * (k + s).astype(jnp.float32))
                payload = V.pack_tracking_payload(vol)
                return acc + jnp.sum(payload[0]) + payload[k % 1000, 0], vol
            def chunk(c, carry):
                return jax.lax.fori_loop(0, CHUNK, frame, carry)
            acc, vol = jax.lax.fori_loop(0, n, chunk, (jnp.float32(0.0), vol))
            return acc
        return lambda s: run(vol, s)

    marginal("repack_only", chain_repack)

    # ---- 5. packed-state chunk (payload IS the state; no repack) ----------
    pvol = V.PackedVolume.from_volume(vol)

    def chain_chunk_packed(n):
        @jax.jit
        def run(pvol, pose, s):
            def frame(k, carry):
                pvol, pose, ovf = carry
                seedp = off @ pose
                res = track_frame(pvol, geom, depth, K, seedp, **track_kw)
                pvol, ov = V.fuse_frame_culled_packed(
                    pvol, geom, color, depth, normals, nsq, K, res.pose,
                    jnp.int32(1) + (k + s) % 60, **fuse_kw, row_capacity=CAP)
                return pvol, res.pose, ovf | ov
            def chunk(c, carry):
                return jax.lax.fori_loop(0, CHUNK, frame, carry)
            pvol, pose, ovf = jax.lax.fori_loop(
                0, n, chunk, (pvol, pose, jnp.bool_(False)))
            return (jnp.sum(pvol.payload[..., 0]) + jnp.float32(ovf)
                    + jnp.sum(pose))
        return lambda s: run(pvol, eye, s)

    marginal("chunk_packed", chain_chunk_packed)

    print(json.dumps({"dim": DIM, "cap": CAP, "ms_per_frame": {
        k: (round(v * 1e3, 3) if v is not None else None)
        for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
