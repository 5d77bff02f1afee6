"""Resident-streaming executor probe: tracked track+fuse with chunk-compact state.

Measures the ROUND-4 candidate for the at-scale bench path: the volume's
active rows stay compact across a chunk (core/resident.py), fused in place
— per-frame cost is the pixel gather + update over the resident set, the
state-row movement (the ~91 ms/frame non-floor cost at 512^3,
BASELINE.md) is amortized to flush+refresh once per chunk.  Variants:

  res_row      resident slots = whole X-rows (seg=None)
  res_seg64    resident slots = 64-voxel X-segments (the cull admits
               25-41% fewer voxels at 256^3/512^3; with resident state
               there is no per-frame short-row gather to pay for it)
  res_seg32    32-voxel segments

Each variant runs the FULL tracked loop (per-frame GN seed at
offset @ prev pose, resident tracker, fuse at tracked pose) inside ONE
jit program with scalar outputs (boundary-layout rule), chained-marginal
timed, and asserts the exactness flags (capacity/delta/coverage/track-
miss) stayed zero.

Usage: PSGSDF_BENCH_DIM=512 python bench/resident_probe.py
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
SEGS = os.environ.get("PSGSDF_PROBE_SEGS", "none,64,32")
W, H = 640, 480
CHUNK = 10
OFFSET = np.array([0.004, -0.003, 0.005, 0.002, -0.002, 0.0015],
                  dtype=np.float32)


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
    from psgradientsdf_tpu.core import resident as RES
    from psgradientsdf_tpu.core import volume as V

    log(f"[res] devices: {jax.devices()}  DIM={DIM}")
    K_np, depth_np, normals_np, nsq_np, color_np = make_scene(W, H)
    h = 1.8 / DIM
    T = 5 * h
    geom = GridGeometry(dims=(DIM, DIM, DIM), voxel_size=h,
                        shift=(0.0, 0.0, 1.2))
    fuse_kw = dict(truncation=T, zmin=0.5, zmax=3.5)
    track_kw = dict(
        **fuse_kw, num_iterations=4, conv_threshold_sq=1e-6, damping=1.0,
        early_exit=False, regather_every=4,
    )
    # margins for the tracker-prep allocation: the scenario's per-frame
    # motion is ~7 mm translation + ~3 mrad rotation -> <=6 px of
    # reprojection at f=525/z=1.2 and <=8 mm of camera depth; 2x safety
    MPX, MT = 12.0, 0.02

    K = jnp.asarray(K_np)
    depth = jnp.asarray(depth_np)
    normals = jnp.asarray(normals_np)
    nsq = jnp.asarray(nsq_np)
    color = jnp.asarray(color_np)
    eye = jnp.asarray(np.eye(4, dtype=np.float32))

    from scipy.spatial.transform import Rotation

    off_np = np.eye(4, dtype=np.float32)
    Rm = Rotation.from_rotvec(OFFSET[3:]).as_matrix().astype(np.float32)
    Kh = np.array([[0, -OFFSET[5], OFFSET[4]], [OFFSET[5], 0, -OFFSET[3]],
                   [-OFFSET[4], OFFSET[3], 0]], dtype=np.float32)
    Vm = np.eye(3, dtype=np.float32) + 0.5 * Kh + (Kh @ Kh) / 6.0
    off_np[:3, :3] = Rm
    off_np[:3, 3] = Vm @ OFFSET[:3]
    off = jnp.asarray(off_np)

    # map build (canonical culled kernel, row granularity)
    n_act_row = int(V.count_active_rows(geom, depth, K, eye, **fuse_kw))
    ZY = DIM * DIM
    CAP_ROW = min(ZY, -(-int(n_act_row * 21 // 20) // 512) * 512)
    vol = V.make_volume(geom, T, frame_cap=64)
    vol, ov = V.fuse_frame_culled(
        vol, geom, color, depth, normals, nsq, K, eye, jnp.int32(0),
        **fuse_kw, row_capacity=CAP_ROW)
    assert not bool(ov)
    pvol = V.PackedVolume.from_volume(vol)
    _ = float(jnp.sum(pvol.payload[0]))
    # round-trip the canonical state through HOST numpy: keeping the 4-D
    # canonical AND a streaming-shaped copy on the 16 GB chip at 512^3
    # (5.4 GB each) plus program temps exhausts it — upload each variant
    # pre-shaped instead (np.reshape is free host-side)
    np_payload = np.asarray(pvol.payload).reshape(ZY * DIM * 8)
    np_vis = np.asarray(pvol.vis)
    Wc = np_vis.shape[0]
    np_vis = np_vis.reshape(Wc, ZY * DIM)
    del vol, pvol
    import gc

    gc.collect()
    log(f"[res] map built; row-active {n_act_row}/{ZY}; state on host "
        f"({np_payload.nbytes/1e9:.1f}+{np_vis.nbytes/1e9:.1f} GB)")

    results = {}
    seed_c = [0]

    def seed():
        seed_c[0] += 1
        return jnp.int32(seed_c[0])

    for seg_s in SEGS.split(","):
        seg = None if seg_s == "none" else int(seg_s)
        S = seg or DIM
        NSEGS = ZY * (DIM // S)
        # size the resident capacity from the margin-inflated cull at the
        # map pose, +25% chunk-drift headroom (flags assert sufficiency)
        @jax.jit
        def count_margin(d, p):
            a = RES._act_flat(geom, d, K, p, **fuse_kw, S=S,
                              margin_px=MPX, margin_t=MT)
            return jnp.sum(a.astype(jnp.int32))

        n_res = int(count_margin(depth, eye))
        CAPR = min(NSEGS, -(-int(n_res * 11 // 10) // 512) * 512)
        DCAP = max(1024, -(-(CAPR // 16) // 512) * 512)
        idx_per_frame = CAPR * S
        log(f"[res] seg={seg_s}: margin-active {n_res}/{NSEGS} -> CAPR={CAPR}"
            f" ({idx_per_frame/1e6:.2f}M idx/frame; row path: "
            f"{CAP_ROW*DIM/1e6:.2f}M), DCAP={DCAP}")

        # upload the state pre-shaped at this variant's slot granularity
        # (a 4-D carry makes every 2-D view a materialized payload copy
        # per chunk — resident._shapes)
        pv_seg = V.PackedVolume(
            payload=jnp.asarray(np_payload.reshape(NSEGS, S * 8)),
            vis=jnp.asarray(np_vis.reshape(Wc, NSEGS, S)))
        _ = float(jnp.sum(pv_seg.payload[0]))

        @functools.partial(jax.jit, static_argnames=("n",))
        def run_chunks(pv, off_m, s, *, n, seg=seg, CAPR=CAPR, DCAP=DCAP):
            def frame(gk, fc):
                res, pv, pose, iters, miss = fc
                seedp = off_m @ pose
                res = RES.resident_alloc(
                    res, pv, geom, depth, K, seedp, **fuse_kw,
                    delta_capacity=DCAP, margin_px=MPX, margin_t=MT)
                tr, m = RES.track_frame_resident(
                    res, geom, depth, K, seedp, **track_kw)
                res = RES.resident_alloc(
                    res, pv, geom, depth, K, tr.pose, **fuse_kw,
                    delta_capacity=DCAP)
                res = RES.fuse_frame_resident(
                    res, geom, color, depth, normals, nsq, K, tr.pose,
                    jnp.int32(1) + (gk + s) % 60, **fuse_kw)
                return res, pv, tr.pose, iters + tr.iterations, miss | m

            def chunk(c, carry):
                pv, pose, iters, flags, miss = carry
                res = RES.resident_refresh(
                    pv, geom, depth, K, pose, **fuse_kw, capacity=CAPR,
                    seg_x=seg, margin_px=MPX, margin_t=MT)
                res, pv, pose, iters, miss = jax.lax.fori_loop(
                    0, CHUNK,
                    lambda k, fc: frame(c * CHUNK + k, fc),
                    (res, pv, pose, iters, miss))
                pv = RES.resident_flush(res, pv)
                return pv, pose, iters, flags | res.flags, miss

            pv, pose, iters, flags, miss = jax.lax.fori_loop(
                0, n, chunk,
                (pv, eye, jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
            return (jnp.sum(pv.payload[0]) + jnp.sum(pose), iters, flags,
                    miss.astype(jnp.int32))

        try:
            n1, n2 = 2, 6
            f1 = functools.partial(run_chunks, n=n1)
            f2 = functools.partial(run_chunks, n=n2)
            t0 = time.perf_counter()
            r1 = f1(pv_seg, off, seed())
            _ = float(r1[0])
            log(f"[res] seg={seg_s}: first exec {time.perf_counter()-t0:.1f}s"
                f" flags={int(r1[2])} miss={int(r1[3])}")
            assert int(r1[2]) == 0, f"resident flags={int(r1[2])}"
            assert int(r1[3]) == 0, "tracker miss flag"
            r2 = f2(pv_seg, off, seed())
            _ = float(r2[0])
            assert int(r2[2]) == 0 and int(r2[3]) == 0
            best = 1e18
            for _rep in range(3):
                t0 = time.perf_counter()
                ra = f1(pv_seg, off, seed())
                _ = float(ra[0])
                t1 = time.perf_counter()
                rb = f2(pv_seg, off, seed())
                _ = float(rb[0])
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0))
                           / ((n2 - n1) * CHUNK))
                assert int(rb[2]) == 0 and int(rb[3]) == 0
            results[f"res_{seg_s}"] = dict(
                ms_per_frame=round(best * 1e3, 3),
                fps=round(1.0 / best, 2),
                idx_per_frame=idx_per_frame,
                ns_per_idx=round(best * 1e9 / idx_per_frame, 3),
                capr=CAPR,
            )
            log(f"[res] seg={seg_s}: {best*1e3:.2f} ms/frame "
                f"({1.0/best:.1f} fps, {best*1e9/idx_per_frame:.2f} ns/idx)")
        except Exception as e:
            results[f"res_{seg_s}"] = None
            log(f"[res] seg={seg_s}: FAILED {type(e).__name__}: {e}")
        del pv_seg, run_chunks, f1, f2
        gc.collect()

    print(json.dumps({"dim": DIM, "chunk": CHUNK, "variants": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
