"""In-situ culled-fusion probe: state-row movement engines + K-frame batching.

Times the REAL fusion kernels (not isolated copies) on the real TPU with
the chained-fetch protocol at PSGSDF_BENCH_DIM:

  packed_xla / packed_xla2d / packed_pallas   fuse_frame_culled_packed with
                                              each rows_impl (512^3 bench path)
  soa_xla / soa_xla2d / soa_pallas            fuse_frame_culled (SoA path)
  batched_K10                                 fuse_frames_culled, 10 frames per
                                              state movement (GT-pose path) —
                                              reported PER FRAME

Every iteration jitters the pose translation by 1e-7*k (loop-invariant
inputs get their cull and pixel gather hoisted; the jitter is far below
the cull's float-safety margins) and folds a distinct seed (the runtime
memoizes same-input executions).

Usage: PSGSDF_BENCH_DIM=512 python bench/insitu_probe.py
Diagnostics to stderr; one JSON line on stdout.
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

DIM = int(os.environ.get("PSGSDF_BENCH_DIM", "512"))
W, H = 640, 480
KB = 10   # batched-kernel frame count
# PSGSDF_PROBE_ONLY: comma list of variant names to run (substring match);
# PSGSDF_PROBE_SEG: X-segment granularity for the soa/packed kernels
ONLY = os.environ.get("PSGSDF_PROBE_ONLY", "")
SEG = int(os.environ.get("PSGSDF_PROBE_SEG", "0")) or None


def _want(name):
    return not ONLY or any(t in name for t in ONLY.split(","))


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

    log(f"[insitu] devices: {jax.devices()}  DIM={DIM}")
    K_np, depth_np, normals_np, nsq_np, color_np = make_scene(W, H)
    h = 1.8 / DIM
    T = 5 * h
    geom = GridGeometry(dims=(DIM, DIM, DIM), voxel_size=h,
                        shift=(0.0, 0.0, 1.2))
    fuse_kw = dict(truncation=T, zmin=0.5, zmax=3.5)

    K = jnp.asarray(K_np)
    depth = jnp.asarray(depth_np)
    normals = jnp.asarray(normals_np)
    nsq = jnp.asarray(nsq_np)
    color = jnp.asarray(color_np)
    eye = jnp.asarray(np.eye(4, dtype=np.float32))

    S_SEG = SEG or DIM
    n_act = int(V.count_active_rows(geom, depth, K, eye, **fuse_kw,
                                    seg_x=SEG))
    NSEGS = DIM * DIM * (DIM // S_SEG)
    CAP = min(NSEGS, -(-int(n_act * 21 // 20) // 512) * 512)
    log(f"[insitu] seg={SEG}: active {n_act}/{NSEGS} -> CAP={CAP} "
        f"({CAP*S_SEG/1e6:.2f}M idx)")

    CAP_ROW = min(DIM * DIM, -(-int(int(V.count_active_rows(
        geom, depth, K, eye, **fuse_kw)) * 21 // 20) // 512) * 512)
    vol = V.make_volume(geom, T, frame_cap=64)
    vol, ov = V.fuse_frame_culled(
        vol, geom, color, depth, normals, nsq, K, eye, jnp.int32(0),
        **fuse_kw, row_capacity=CAP_ROW)
    assert not bool(ov)
    _ = float(jnp.sum(vol.dist))
    log("[insitu] map built; first dispatch done")

    results = {}
    seed_c = [0]

    def seed():
        seed_c[0] += 1
        return jnp.int32(seed_c[0])

    def marginal(name, make_chain, n1=3, n2=9, frames_per_iter=1):
        if not _want(name):
            return
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
            per_frame = best / frames_per_iter
            results[name] = per_frame
            log(f"[insitu] {name}: {per_frame*1e3:.2f} ms/frame "
                f"({per_frame*1e9/(CAP*S_SEG):.2f} ns/idx)")
        except Exception as e:
            results[name] = None
            log(f"[insitu] {name}: FAILED {type(e).__name__}: {e}")

    def jit_pose(k, s):
        tj = 1e-7 * (k + s).astype(jnp.float32)
        return eye + jnp.zeros((4, 4), jnp.float32).at[0, 3].set(tj)

    # ---- SoA kernel (first: SoA + packed volumes together OOM at 512^3) ---
    for impl in ("xla", "xla2d", "pallas"):
        def chain(n, impl=impl):
            @jax.jit
            def run(vol, s):
                def body(k, carry):
                    vol, ovf = carry
                    vol, ov = V.fuse_frame_culled(
                        vol, geom, color, depth, normals, nsq, K,
                        jit_pose(k, s), jnp.int32(1) + (k + s) % 60,
                        **fuse_kw, row_capacity=CAP, rows_impl=impl,
                        seg_x=SEG)
                    return vol, ovf | ov
                vol, ovf = jax.lax.fori_loop(0, n, body, (vol, jnp.bool_(False)))
                return jnp.sum(vol.dist) + jnp.float32(ovf)
            return lambda s: run(vol, s)

        marginal(f"soa_{impl}", chain)

    # ---- K-frame batched kernel (GT-pose path) ----------------------------
    def chain_batched(n):
        @jax.jit
        def run(vol, s):
            def body(k, carry):
                vol, ovf = carry
                poses = jnp.stack([jit_pose(k * KB + j, s) for j in range(KB)])
                colors = jnp.stack([color] * KB)
                depths = jnp.stack([depth] * KB)
                normalss = jnp.stack([normals] * KB)
                nsqs = jnp.stack([nsq] * KB)
                fids = jnp.int32(1) + (jnp.arange(KB, dtype=jnp.int32)
                                       + k + s) % 30
                vol, ov = V.fuse_frames_culled(
                    vol, geom, colors, depths, normalss, nsqs, K, poses,
                    fids, **fuse_kw, row_capacity=CAP)
                return vol, ovf | ov
            vol, ovf = jax.lax.fori_loop(0, n, body, (vol, jnp.bool_(False)))
            return jnp.sum(vol.dist) + jnp.float32(ovf)
        return lambda s: run(vol, s)

    marginal("batched_K10", chain_batched, n1=1, n2=3, frames_per_iter=KB)

    # ---- packed kernel (convert AFTER freeing the SoA chains) -------------
    pvol = V.PackedVolume.from_volume(vol)
    _ = float(jnp.sum(pvol.payload[0]))
    del vol, chain, chain_batched
    import gc

    gc.collect()

    for impl in ("xla", "xla2d", "pallas"):
        def pchain(n, impl=impl):
            @jax.jit
            def run(pv, s):
                def body(k, carry):
                    pv, ovf = carry
                    pv, ov = V.fuse_frame_culled_packed(
                        pv, geom, color, depth, normals, nsq, K,
                        jit_pose(k, s), jnp.int32(1) + (k + s) % 60,
                        **fuse_kw, row_capacity=CAP, rows_impl=impl,
                        seg_x=SEG)
                    return pv, ovf | ov
                pv, ovf = jax.lax.fori_loop(0, n, body, (pv, jnp.bool_(False)))
                return jnp.sum(pv.payload[0]) + jnp.float32(ovf)
            return lambda s: run(pvol, s)

        marginal(f"packed_{impl}", pchain)

    print(json.dumps({
        "dim": DIM, "cap": CAP, "idx": CAP * S_SEG, "seg": SEG,
        "ms_per_frame": {k: (round(v * 1e3, 3) if v is not None else None)
                         for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
