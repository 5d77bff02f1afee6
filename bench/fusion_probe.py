"""Fusion scaling probe: where does fuse_frame_culled leave the fast-gather
regime at 256^3? (VERDICT round-2 item #1)

Times, on the real TPU with the chained-fetch protocol (BASELINE.md):
  1. fuse_frame_culled as shipped        (expect ~96 ms/frame at 256^3)
  2. fuse_frame full-grid                (expect ~101 ms)
  3. isolated pixel-payload gather       (CAP*X idx from the [H*W,8] table)
  4. isolated state row gathers          (CAP rows from [ZY,X]/[ZY,X,3])
  5. isolated state row scatter
  6. sub-batched culled fusion (B=4)     (smaller per-op gather shapes)
  7. per-Z-slab culled fusion (S=8,16)   (per-slab state tables -> VMEM-sized)

Every timed call takes a distinct int32 seed folded into the computation —
the axon runtime memoizes same-input executions (see CLAUDE.md).

Usage:  PSGSDF_BENCH_DIM=256 python bench/fusion_probe.py
All output to stderr; final JSON summary on stdout.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("PSGSDF_PROBE_CPU"):  # shape-smoke mode (conftest-less)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "")
    jax.config.update("jax_compilation_cache_dir", "/tmp/psgsdf_probe_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from bench_scene import make_scene
    from psgradientsdf_tpu.core.grid import GridGeometry
    from psgradientsdf_tpu.core import volume as V

    log(f"[probe] devices: {jax.devices()}  DIM={DIM}")

    K_np, depth_np, normals_np, nsq_np, color_np = make_scene(W, H)
    h = 1.8 / DIM
    T = 5 * h
    geom = GridGeometry(dims=(DIM, DIM, DIM), voxel_size=h, shift=(0.0, 0.0, 1.2))
    fuse_kw = dict(truncation=T, zmin=0.5, zmax=3.5)

    K = jnp.asarray(K_np)
    depth = jnp.asarray(depth_np)
    normals = jnp.asarray(normals_np)
    nsq = jnp.asarray(nsq_np)
    color = jnp.asarray(color_np)
    eye = jnp.asarray(np.eye(4, dtype=np.float32))

    vol = V.make_volume(geom, T, frame_cap=64)
    vol = V.fuse_frame(vol, geom, color, depth, normals, nsq, K, eye,
                       jnp.int32(0), **fuse_kw)
    n_act = int(V.count_active_rows(geom, depth, K, eye, **fuse_kw))
    CAP = min(DIM * DIM, -(-int(n_act * 1.2) // 512) * 512)
    log(f"[probe] active rows {n_act}/{DIM*DIM} -> CAP={CAP} "
        f"({CAP*DIM/1e6:.2f}M idx)")
    _ = float(jnp.sum(vol.dist))  # first-dispatch fence (stall lands here)
    log("[probe] first dispatch done")

    results = {}
    seeds = itertools.count(1)

    def seed():
        return jnp.int32(next(seeds))

    def marginal(name, make_chain, n1=3, n2=9):
        """Marginal per-rep seconds via (T(n2)-T(n1))/(n2-n1), best of 2.
        make_chain(n) -> fn(seed_scalar) -> jax scalar (fetched for fence)."""
        try:
            f1, f2 = make_chain(n1), make_chain(n2)
            _ = float(f1(seed()))  # compile + warm
            _ = float(f2(seed()))
            best = 1e18
            for _r in range(2):
                t0 = time.perf_counter()
                _ = float(f1(seed()))
                t1 = time.perf_counter()
                _ = float(f2(seed()))
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
            results[name] = best
            log(f"[probe] {name}: {best*1e3:.2f} ms")
        except Exception as e:
            results[name] = None
            log(f"[probe] {name}: FAILED {type(e).__name__}: {e}")

    # ---- 1. shipped culled fusion -----------------------------------------
    def chain_culled(n):
        @jax.jit
        def run(vol, s):
            def body(k, carry):
                vol, ovf = carry
                v2, ov = V.fuse_frame_culled(
                    vol, geom, color, depth, normals, nsq, K, eye,
                    jnp.int32(1) + (k + s) % 60, **fuse_kw, row_capacity=CAP)
                return v2, ovf | ov
            vol, ovf = jax.lax.fori_loop(0, n, body, (vol, jnp.bool_(False)))
            return jnp.sum(vol.dist) + jnp.float32(ovf)
        return lambda s: run(vol, s)

    marginal("culled_full", chain_culled)

    # ---- 2. full-grid fusion ----------------------------------------------
    def chain_full(n):
        @jax.jit
        def run(vol, s):
            def body(k, vol):
                return V.fuse_frame(
                    vol, geom, color, depth, normals, nsq, K, eye,
                    jnp.int32(1) + (k + s) % 60, **fuse_kw)
            vol = jax.lax.fori_loop(0, n, body, vol)
            return jnp.sum(vol.dist)
        return lambda s: run(vol, s)

    marginal("fuse_full", chain_full, n1=2, n2=5)

    # ---- shared pieces for isolated probes --------------------------------
    pix_payload = V.pack_pixel_payload(color, depth, normals, nsq)
    active = V._row_activity(geom, depth, K, eye, **fuse_kw)
    (rows_idx,) = jnp.nonzero(active.reshape(-1), size=CAP,
                              fill_value=DIM * DIM - 1)
    rows_idx = jnp.minimum(rows_idx, DIM * DIM - 1)
    # realistic per-voxel pixel indices from the actual projection
    origin = np.asarray(geom.origin, dtype=np.float32)
    ri = np.asarray(rows_idx)
    rz = (ri // DIM).astype(np.float32)
    ry = (ri % DIM).astype(np.float32)
    rx = np.arange(DIM, dtype=np.float32)[None, :]
    pw = np.stack([
        np.broadcast_to(origin[0] + h * rx, (CAP, DIM)),
        np.broadcast_to(origin[1] + h * ry[:, None], (CAP, DIM)),
        np.broadcast_to(origin[2] + h * rz[:, None], (CAP, DIM))], axis=-1)
    fx, fy, cx, cy = K_np[0, 0], K_np[1, 1], K_np[0, 2], K_np[1, 2]
    zz = np.maximum(pw[..., 2], 1e-3)
    uu = np.clip((cx + fx * pw[..., 0] / zz + 0.5).astype(np.int32), 0, W - 1)
    vv = np.clip((cy + fy * pw[..., 1] / zz + 0.5).astype(np.int32), 0, H - 1)
    pidx = jnp.asarray(vv * W + uu)          # [CAP, DIM] int32

    # ---- 3. isolated pixel-payload gather ---------------------------------
    def chain_pix_gather(n):
        @jax.jit
        def run(payload, pidx, s):
            def body(k, acc):
                rows = jnp.take(payload, (pidx + k + s) % (H * W), axis=0)
                return acc + jnp.sum(rows)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda s: run(pix_payload, pidx, s)

    marginal("pix_gather", chain_pix_gather)

    def chain_pix_gather_flat(n):
        pf = pidx.reshape(-1)
        @jax.jit
        def run(payload, pf, s):
            def body(k, acc):
                rows = jnp.take(payload, (pf + k + s) % (H * W), axis=0)
                return acc + jnp.sum(rows)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda s: run(pix_payload, pf, s)

    marginal("pix_gather_flat", chain_pix_gather_flat)

    # ---- 4. state row gathers ---------------------------------------------
    ZY = DIM * DIM

    def chain_state_gather(n):
        @jax.jit
        def run(vol, rows, s):
            d2 = vol.dist.reshape(ZY, DIM)
            g2 = vol.grad.reshape(ZY, DIM, 3)
            w2 = vol.weight.reshape(ZY, DIM)
            c2 = vol.color.reshape(ZY, DIM, 3)
            def body(k, acc):
                r = (rows + k + s) % ZY
                t = (jnp.sum(jnp.take(d2, r, axis=0))
                     + jnp.sum(jnp.take(g2, r, axis=0))
                     + jnp.sum(jnp.take(w2, r, axis=0))
                     + jnp.sum(jnp.take(c2, r, axis=0)))
                return acc + t
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda s: run(vol, rows_idx, s)

    marginal("state_gather", chain_state_gather)

    # ---- 5. state row scatter ---------------------------------------------
    upd_d = jnp.zeros((CAP, DIM), jnp.float32)
    upd_g = jnp.zeros((CAP, DIM, 3), jnp.float32)

    def chain_state_scatter(n):
        @jax.jit
        def run(vol, rows, ud, ug, s):
            d2 = vol.dist.reshape(ZY, DIM)
            g2 = vol.grad.reshape(ZY, DIM, 3)
            def body(k, carry):
                d2, g2 = carry
                r = (rows + k + s) % ZY
                d2 = d2.at[r].set(ud + (k + s).astype(jnp.float32), mode="drop")
                g2 = g2.at[r].set(ug + (k + s).astype(jnp.float32), mode="drop")
                return d2, g2
            d2, g2 = jax.lax.fori_loop(0, n, body, (d2, g2))
            return jnp.sum(d2) + jnp.sum(g2)
        return lambda s: run(vol, rows_idx, upd_d, upd_g, s)

    marginal("state_scatter_dist_grad", chain_state_scatter)

    # ---- 6. sub-batched culled fusion (B sub-gathers of the capacity) -----
    for B in (4,):
        capb = CAP // B

        def chain_batched(n, B=B, capb=capb):
            @jax.jit
            def run(vol, s):
                def body(k, carry):
                    vol, ovf = carry
                    act = V._row_activity(geom, depth, K, eye, **fuse_kw)
                    pp = V.pack_pixel_payload(color, depth, normals, nsq)
                    af = act.reshape(-1)
                    n_active = jnp.sum(af.astype(jnp.int32))
                    ov = n_active > CAP
                    (ridx,) = jnp.nonzero(af, size=CAP, fill_value=ZY)
                    fidx = jnp.int32(1) + (k + s) % 60
                    word = fidx // 32
                    bit = (jnp.uint32(1) << jnp.uint32(fidx % 32))

                    def bat(b, vol):
                        rb = jax.lax.dynamic_slice_in_dim(ridx, b * capb, capb)
                        slot_ok = rb < ZY
                        safe = jnp.minimum(rb, ZY - 1)
                        d_r = jnp.take(vol.dist.reshape(ZY, DIM), safe, axis=0)
                        g_r = jnp.take(vol.grad.reshape(ZY, DIM, 3), safe, axis=0)
                        w_r = jnp.take(vol.weight.reshape(ZY, DIM), safe, axis=0)
                        c_r = jnp.take(vol.color.reshape(ZY, DIM, 3), safe, axis=0)
                        visw = jax.lax.dynamic_index_in_dim(
                            vol.vis.reshape(-1, ZY, DIM), word, 0, keepdims=False)
                        vw_r = jnp.take(visw, safe, axis=0)
                        rzb = (safe // DIM).astype(jnp.float32)
                        ryb = (safe % DIM).astype(jnp.float32)
                        rxb = jnp.arange(DIM, dtype=jnp.float32)[None, :]
                        og = jnp.array(geom.origin, dtype=jnp.float32)
                        p_w = jnp.stack([
                            og[0] + h * jnp.broadcast_to(rxb, (capb, DIM)),
                            og[1] + h * jnp.broadcast_to(ryb[:, None], (capb, DIM)),
                            og[2] + h * jnp.broadcast_to(rzb[:, None], (capb, DIM))],
                            axis=-1)
                        nd, ng, nw, nc, vo = V._fuse_voxel_update(
                            p_w, d_r, g_r, w_r, c_r, pp, K, eye, (H, W), bit,
                            slot_ok[:, None], **fuse_kw,
                            cos_thresh_sq=0.25 * 0.25)
                        nvw = vw_r | vo
                        nd2 = vol.dist.reshape(ZY, DIM).at[rb].set(
                            nd, mode="drop").reshape(vol.dist.shape)
                        ng2 = vol.grad.reshape(ZY, DIM, 3).at[rb].set(
                            ng, mode="drop").reshape(vol.grad.shape)
                        nw2 = vol.weight.reshape(ZY, DIM).at[rb].set(
                            nw, mode="drop").reshape(vol.weight.shape)
                        nc2 = vol.color.reshape(ZY, DIM, 3).at[rb].set(
                            nc, mode="drop").reshape(vol.color.shape)
                        nvis = jax.lax.dynamic_update_index_in_dim(
                            vol.vis.reshape(-1, ZY, DIM),
                            visw.at[rb].set(nvw, mode="drop"), word, 0
                        ).reshape(vol.vis.shape)
                        return V.GradSdfVolume(nd2, ng2, nw2, nc2, nvis)

                    vol = jax.lax.fori_loop(0, B, bat, vol)
                    return vol, ovf | ov
                vol2, ovf = jax.lax.fori_loop(0, n, body, (vol, jnp.bool_(False)))
                return jnp.sum(vol2.dist) + jnp.float32(ovf)
            return lambda s: run(vol, s)

        marginal(f"culled_batched_B{B}", chain_batched)

    # ---- 7. per-Z-slab culled fusion --------------------------------------
    active_np = np.asarray(active)
    for S in (8, 16):
        Zl = DIM // S
        per_slab = active_np.reshape(S, Zl * DIM).sum(axis=1)
        cap_s = max(256, -(-int(per_slab.max() * 1.2) // 256) * 256)
        log(f"[probe] S={S}: per-slab active max={per_slab.max()} "
            f"-> cap_s={cap_s} (total idx {S*cap_s*DIM/1e6:.2f}M)")

        def chain_slab(n, S=S, Zl=Zl, cap_s=cap_s):
            @jax.jit
            def run(vol, s):
                def body(k, carry):
                    vol, ovf = carry
                    pp = V.pack_pixel_payload(color, depth, normals, nsq)
                    fidx = jnp.int32(1) + (k + s) % 60
                    dist4 = vol.dist.reshape(S, Zl, DIM, DIM)
                    grad4 = vol.grad.reshape(S, Zl, DIM, DIM, 3)
                    wt4 = vol.weight.reshape(S, Zl, DIM, DIM)
                    col4 = vol.color.reshape(S, Zl, DIM, DIM, 3)
                    vis4 = vol.vis.reshape(-1, S, Zl, DIM, DIM)

                    def slab(si, carry):
                        dist4, grad4, wt4, col4, vis4, ovf = carry
                        z0 = si * Zl
                        act = V._row_activity(
                            geom, depth, K, eye, **fuse_kw, z0=z0, z_rows=Zl)
                        sv = V.GradSdfVolume(
                            jax.lax.dynamic_index_in_dim(dist4, si, 0, False),
                            jax.lax.dynamic_index_in_dim(grad4, si, 0, False),
                            jax.lax.dynamic_index_in_dim(wt4, si, 0, False),
                            jax.lax.dynamic_index_in_dim(col4, si, 0, False),
                            jax.lax.dynamic_index_in_dim(vis4, si, 1, False),
                        )
                        nv, ov = V._fuse_culled_slab(
                            sv, geom, z0, Zl, act, pp, K, eye, (H, W),
                            fidx, None, **fuse_kw, cos_thresh_sq=0.25 * 0.25,
                            row_capacity=cap_s)
                        dist4 = jax.lax.dynamic_update_index_in_dim(
                            dist4, nv.dist, si, 0)
                        grad4 = jax.lax.dynamic_update_index_in_dim(
                            grad4, nv.grad, si, 0)
                        wt4 = jax.lax.dynamic_update_index_in_dim(
                            wt4, nv.weight, si, 0)
                        col4 = jax.lax.dynamic_update_index_in_dim(
                            col4, nv.color, si, 0)
                        vis4 = jax.lax.dynamic_update_index_in_dim(
                            vis4, nv.vis, si, 1)
                        return dist4, grad4, wt4, col4, vis4, ovf | ov

                    dist4, grad4, wt4, col4, vis4, ovf = jax.lax.fori_loop(
                        0, S, slab, (dist4, grad4, wt4, col4, vis4, ovf))
                    vol = V.GradSdfVolume(
                        dist4.reshape(vol.dist.shape),
                        grad4.reshape(vol.grad.shape),
                        wt4.reshape(vol.weight.shape),
                        col4.reshape(vol.color.shape),
                        vis4.reshape(vol.vis.shape))
                    return vol, ovf
                vol2, ovf = jax.lax.fori_loop(0, n, body, (vol, jnp.bool_(False)))
                return jnp.sum(vol2.dist) + jnp.float32(ovf)
            return lambda s: run(vol, s)

        marginal(f"culled_slab_S{S}", chain_slab)

    print(json.dumps({"dim": DIM, "cap": CAP, "ms": {
        k: (round(v * 1e3, 3) if v is not None else None)
        for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
