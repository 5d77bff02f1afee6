"""Absolute-wall probe: separate program-shape vs measurement-methodology
for the 35 vs 105 ms/frame contradiction at 256^3 (chunk_probe marginal
vs dispatch_probe walls — both reproduced clean/serialized).

Times ABSOLUTE wall (enqueue + fetch) of single dispatches:
  nested_n1    probe2-style program: fori(1) x fori(10 frames), 5 calls
  nested_n3    probe2-style program: fori(3) x fori(10 frames), 3 calls
  flat_10      probe3-style program: fori(10 frames), 5 calls (evolving vol)
  flat_10_same same program, SAME input vol buffer every call (memo probe)

Usage: PSGSDF_BENCH_DIM=256 python bench/wall_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DIM = int(os.environ.get("PSGSDF_BENCH_DIM", "256"))
W, H = 640, 480


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

    log(f"[probe4] devices: {jax.devices()}  DIM={DIM}")

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
    log(f"[probe4] first dispatch done, CAP={CAP}")

    results = {}
    seed_i = [1000]

    def seed():
        seed_i[0] += 1
        return jnp.int32(seed_i[0])

    def frame_body(k, carry, s):
        vol, pose, ovf = carry
        sp = off @ pose
        res = track_frame(vol, geom, depth, K, sp, **track_kw)
        vol, ov = V.fuse_frame_culled(
            vol, geom, color, depth, normals, nsq, K, res.pose,
            jnp.int32(1) + (k + s) % 60, **fuse_kw, row_capacity=CAP)
        return vol, res.pose, ovf | ov

    def nested(n):
        @jax.jit
        def run(vol, pose, s):
            def chunk(c, carry):
                return jax.lax.fori_loop(
                    0, 10, lambda k, cr: frame_body(k, cr, s), carry)
            vol, pose, ovf = jax.lax.fori_loop(
                0, n, chunk, (vol, pose, jnp.bool_(False)))
            return jnp.sum(vol.dist) + jnp.float32(ovf) + jnp.sum(pose)
        return run

    @jax.jit
    def flat10(vol, pose, s):
        vol, pose, ovf = jax.lax.fori_loop(
            0, 10, lambda k, cr: frame_body(k, cr, s),
            (vol, pose, jnp.bool_(False)))
        return vol, pose, ovf

    def walls(name, fn, calls, fetch):
        ts = []
        for c in calls:
            t0 = time.perf_counter()
            r = fn(*c)
            _ = fetch(r)
            ts.append(time.perf_counter() - t0)
        results[name] = ts
        log(f"[probe4] {name}: " + " ".join(f"{t*1e3:.0f}" for t in ts) + " ms")

    if os.environ.get("PSGSDF_PROBE_NESTED"):
        # nested-chunk programs with SCALAR-ONLY outputs (the bench.py
        # run_chunks structure): SoA state vs PackedVolume state, absolute
        # walls of a 2-chunk (20-frame) program — which carry should the
        # bench chain use at this DIM?
        def nested_scalar_soa(n):
            @jax.jit
            def run(vol, pose, s):
                def chunk(c, carry):
                    return jax.lax.fori_loop(
                        0, 10, lambda k, cr: frame_body(c * 10 + k, cr, s),
                        carry)
                vol, pose, ovf = jax.lax.fori_loop(
                    0, n, chunk, (vol, pose, jnp.bool_(False)))
                return jnp.sum(vol.dist) + jnp.float32(ovf) + jnp.sum(pose)
            return run

        def nested_scalar_packed(n):
            @jax.jit
            def run(pvol, pose, s):
                def chunk(c, carry):
                    return jax.lax.fori_loop(
                        0, 10,
                        lambda k, cr: frame_body_packed(c * 10 + k, cr, s),
                        carry)
                pvol, pose, ovf = jax.lax.fori_loop(
                    0, n, chunk, (pvol, pose, jnp.bool_(False)))
                return (jnp.sum(pvol.payload) + jnp.float32(ovf)
                        + jnp.sum(pose))
            return run

        def frame_body_packed(k, carry, s):
            pvol, pose, ovf = carry
            sp = off @ pose
            res = track_frame(pvol, geom, depth, K, sp, **track_kw)
            pvol, ov = V.fuse_frame_culled_packed(
                pvol, geom, color, depth, normals, nsq, K, res.pose,
                jnp.int32(1) + (k + s) % 60, **fuse_kw, row_capacity=CAP)
            return pvol, res.pose, ovf | ov

        pvol = V.PackedVolume.from_volume(vol)
        for name, fn, state in (
            ("nested_soa20_ms", nested_scalar_soa(2), vol),
            ("nested_packed20_ms", nested_scalar_packed(2), pvol),
        ):
            _ = float(fn(state, eye, seed()))
            walls(name, fn, [(state, eye, seed()) for _ in range(4)],
                  lambda r: float(r))
        print(json.dumps({"dim": DIM, "cap": CAP, "walls": {
            k: [round(t * 1e3, 1) for t in v] for k, v in results.items()}}))
        return 0

    only_packed = bool(os.environ.get("PSGSDF_PROBE_PACKED_ONLY"))
    if not only_packed:
        n1, n3 = nested(1), nested(3)
        _ = float(n1(vol, eye, seed()))       # compile
        _ = float(n3(vol, eye, seed()))
        walls("nested_n1_ms", n1, [(vol, eye, seed()) for _ in range(5)],
              lambda r: float(r))
        walls("nested_n3_ms", n3, [(vol, eye, seed()) for _ in range(3)],
              lambda r: float(r))

        v2, p2, _ = flat10(vol, eye, seed())  # compile + evolving buffers
        _ = float(jnp.sum(p2))
        seq = []
        vv, pp = v2, p2
        for _ in range(5):
            seq.append((vv, pp))
            vv, pp, _ = flat10(vv, pp, seed())
        _ = float(jnp.sum(pp))                # materialize the chain
        walls("flat10_evolving_ms", flat10,
              [(v, p, seed()) for (v, p) in seq],
              lambda r: float(jnp.sum(r[1])))
        walls("flat10_samebuf_ms", flat10,
              [(vol, eye, seed()) for _ in range(5)],
              lambda r: float(jnp.sum(r[1])))
        # free the SoA chains before the packed variant (a 16 GB chip
        # cannot hold 10+ live full-volume states)
        del seq, vv, pp, v2, p2
        import gc
        gc.collect()

    # packed-state variant: the [Z,Y,X*8] payload has no small trailing
    # dim, so crossing the jit boundary should NOT pay the 42x-padded
    # layout copies that the SoA grad/color [Z,Y,X,3] outputs do
    def frame_body_packed(k, carry, s):
        pvol, pose, ovf = carry
        sp = off @ pose
        res = track_frame(pvol, geom, depth, K, sp, **track_kw)
        pvol, ov = V.fuse_frame_culled_packed(
            pvol, geom, color, depth, normals, nsq, K, res.pose,
            jnp.int32(1) + (k + s) % 60, **fuse_kw, row_capacity=CAP)
        return pvol, res.pose, ovf | ov

    @jax.jit
    def flat10_packed(pvol, pose, s):
        return jax.lax.fori_loop(
            0, 10, lambda k, cr: frame_body_packed(k, cr, s),
            (pvol, pose, jnp.bool_(False)))

    pvol = V.PackedVolume.from_volume(vol)
    del vol
    import gc
    gc.collect()
    pv2, pp2, _ = flat10_packed(pvol, eye, seed())   # compile
    _ = float(jnp.sum(pp2))
    # time calls on an evolving 3-deep chain, recycling buffers (the chip
    # holds at most 4 live packed states)
    chain = [(pvol, eye), (pv2, pp2)]
    vv, pp = pv2, pp2
    vv, pp, _ = flat10_packed(vv, pp, seed())
    chain.append((vv, pp))
    _ = float(jnp.sum(pp))
    walls("flat10_packed_ms", flat10_packed,
          [(v, p, seed()) for (v, p) in chain] + [(pvol, eye, seed())],
          lambda r: float(jnp.sum(r[1])))

    print(json.dumps({"dim": DIM, "cap": CAP, "walls": {
        k: [round(t * 1e3, 1) for t in v] for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
