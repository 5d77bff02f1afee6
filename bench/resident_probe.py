"""Resident-streaming executor probe: track+fuse with chunk-compact state.

Round-4 design (after the margin-based exact-tracking variant measured
270-363 ms/frame at 512^3 — transpose + double allocs + NSEG-scaling
overheads ate the state-movement win): the STALE-MAP executor.

  * Within a chunk the canonical volume is READ-ONLY — resident
    membership is monotone, fusion updates live in the compact rows, and
    the flush at chunk end is the only canonical write.
  * The tracker therefore reads the CANONICAL volume with the proven
    track_frame path (no transposed records table, no margins, no
    fused-ever ledger).  Its map is stale by at most one chunk — the same
    lag contract as the K-frame batched GT-pose kernel, measured on the
    ATE harness (tests/test_ate_parity.py stale-map variant).
  * Fusion stays EXACT: one alloc at the tracked pose admits newly active
    slots (their canonical state is current — monotone membership), the
    in-place update is the shared _fuse_voxel_update, FLAG_COVERAGE
    guards the active-set cover.

Variants: seg in {none, 64} x mode in {stale (tracked), gt (fusion only)}.
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
SEGS = os.environ.get("PSGSDF_PROBE_SEGS", "none,64")
MODES = os.environ.get("PSGSDF_PROBE_MODES", "stale,gt")
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
    from psgradientsdf_tpu.tracking.tracker import track_frame

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
    _ = float(jnp.sum(pvol.payload[0, 0]))
    del vol
    import gc

    gc.collect()
    log(f"[res] map built; row-active {n_act_row}/{ZY}")

    results = {}
    seed_c = [0]

    def seed():
        seed_c[0] += 1
        return jnp.int32(seed_c[0])

    for seg_s in SEGS.split(","):
        seg = None if seg_s == "none" else int(seg_s)
        S = seg or DIM
        NSEGS = ZY * (DIM // S)
        # capacity: bare active set at the map pose + chunk-drift headroom
        # (no tracking margins — the stale-map tracker reads the canonical
        # volume; flags assert cover)
        @jax.jit
        def count_act(d, p):
            a = RES._act_flat(geom, d, K, p, **fuse_kw, S=S)
            return jnp.sum(a.astype(jnp.int32))

        n_act = int(count_act(depth, eye))
        CAPR = min(NSEGS, -(-int(n_act * 27 // 25) // 512) * 512)
        DCAP = max(1024, -(-(CAPR // 24) // 512) * 512)
        idx_per_frame = CAPR * S
        log(f"[res] seg={seg_s}: active {n_act}/{NSEGS} -> CAPR={CAPR}"
            f" ({idx_per_frame/1e6:.2f}M idx/frame; row path: "
            f"{CAP_ROW*DIM/1e6:.2f}M), DCAP={DCAP}")

        for mode in MODES.split(","):
            @functools.partial(jax.jit, static_argnames=("n",))
            def run_chunks(pv, off_m, s, *, n, seg=seg, CAPR=CAPR,
                           DCAP=DCAP, mode=mode):
                def frame(gk, fc):
                    res, pose, iters, pv = fc
                    seedp = off_m @ pose
                    if mode == "gt":
                        # fusion-only leg: sub-micron pose jitter (the
                        # accumulating orbit walks the active set off the
                        # static capacity; a FIXED pose lets XLA hoist the
                        # cull+gather — bench.py fuse_chain convention)
                        tj = 1e-7 * (gk + s).astype(jnp.float32)
                        new_pose = eye + jnp.zeros(
                            (4, 4), jnp.float32).at[0, 3].set(tj)
                    else:
                        tr = track_frame(pv, geom, depth, K, seedp,
                                         **track_kw)
                        new_pose = tr.pose
                        iters = iters + tr.iterations
                    res = RES.resident_alloc(
                        res, pv, geom, depth, K, new_pose, **fuse_kw,
                        delta_capacity=DCAP)
                    res = RES.fuse_frame_resident(
                        res, geom, color, depth, normals, nsq, K, new_pose,
                        jnp.int32(1) + (gk + s) % 60, **fuse_kw,
                        update_ledger=False)
                    return res, new_pose, iters, pv

                def chunk(c, carry):
                    pv, pose, iters, flags = carry
                    res = RES.resident_refresh(
                        pv, geom, depth, K, pose, **fuse_kw, capacity=CAPR,
                        seg_x=seg)
                    res, pose, iters, pv = jax.lax.fori_loop(
                        0, CHUNK,
                        lambda k, fc: frame(c * CHUNK + k, fc),
                        (res, pose, iters, pv))
                    pv = RES.resident_flush(res, pv)
                    return pv, pose, iters, flags | res.flags

                pv, pose, iters, flags = jax.lax.fori_loop(
                    0, n, chunk,
                    (pv, eye, jnp.int32(0), jnp.int32(0)))
                return (jnp.sum(pv.payload[0, 0]) + jnp.sum(pose), iters,
                        flags)

            name = f"res_{seg_s}_{mode}"
            try:
                n1, n2 = 2, 6
                f1 = functools.partial(run_chunks, n=n1)
                f2 = functools.partial(run_chunks, n=n2)
                t0 = time.perf_counter()
                r1 = f1(pvol, off, seed())
                _ = float(r1[0])
                log(f"[res] {name}: first exec "
                    f"{time.perf_counter()-t0:.1f}s flags={int(r1[2])}")
                assert int(r1[2]) == 0, f"resident flags={int(r1[2])}"
                r2 = f2(pvol, off, seed())
                _ = float(r2[0])
                assert int(r2[2]) == 0
                best = 1e18
                for _rep in range(3):
                    t0 = time.perf_counter()
                    ra = f1(pvol, off, seed())
                    _ = float(ra[0])
                    t1 = time.perf_counter()
                    rb = f2(pvol, off, seed())
                    _ = float(rb[0])
                    t2 = time.perf_counter()
                    best = min(best, ((t2 - t1) - (t1 - t0))
                               / ((n2 - n1) * CHUNK))
                    assert int(rb[2]) == 0
                results[name] = dict(
                    ms_per_frame=round(best * 1e3, 3),
                    fps=round(1.0 / best, 2),
                    idx_per_frame=idx_per_frame,
                    ns_per_idx=round(best * 1e9 / idx_per_frame, 3),
                    capr=CAPR,
                )
                log(f"[res] {name}: {best*1e3:.2f} ms/frame "
                    f"({1.0/best:.1f} fps, "
                    f"{best*1e9/idx_per_frame:.2f} ns/idx)")
            except Exception as e:
                results[name] = None
                log(f"[res] {name}: FAILED {type(e).__name__}: {e}")
            del run_chunks, f1, f2
            gc.collect()

    print(json.dumps({"dim": DIM, "chunk": CHUNK, "variants": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
