"""Indexed contiguous-row copy probe (round-4 VERDICT #1).

Measures, on the real TPU with the chained-fetch protocol, the rate of
moving CAP indexed contiguous rows of a [NSEG, R] f32 table — the state
movement pattern of fuse_frame_culled — under every candidate design:

  rt_xla_2d        jnp.take + .at[idx].set on the 2-D [NSEG, R] view
  rt_xla_3d        same on the 3-D [NSEG, S, 8] view (shipped kernel's view)
  rt_pl            Pallas pipelined gather_rows(group=8) + scatter_rows
  rt_pl_dma        Pallas manual HBM->HBM DMA gather + scatter
  rt_plg_xsc       Pallas gather + XLA scatter   (isolate each side)
  rt_xg_plsc       XLA take + Pallas scatter
  rt_contig        contiguous dynamic-slice read+write of the same bytes
                   (the machine's streaming reference)
  *_2k             the same at 2 KB segment granularity ([NSEG*8, R/8]
                   table, 8x the index count) — prices the VERDICT-#2
                   fine-grained-cull repack

Every round trip perturbs the gathered rows (+1.0) so XLA cannot elide
the scatter, and every iteration rotates the index vector so the remote
runtime cannot memoize and XLA cannot hoist.  Row indices are the REAL
level-1 cull survivors of the bench scene (clustered runs, like
production).

Usage:  PSGSDF_BENCH_DIM=512 python bench/row_probe.py
All diagnostics to stderr; one JSON summary line on stdout.
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
    from psgradientsdf_tpu.ops import rowcopy

    log(f"[rowprobe] devices: {jax.devices()}  DIM={DIM}")

    K_np, depth_np, normals_np, nsq_np, color_np = make_scene(W, H)
    h = 1.8 / DIM
    T = 5 * h
    geom = GridGeometry(dims=(DIM, DIM, DIM), voxel_size=h,
                        shift=(0.0, 0.0, 1.2))
    K = jnp.asarray(K_np)
    depth = jnp.asarray(depth_np)
    eye = jnp.asarray(np.eye(4, dtype=np.float32))

    # real level-1 cull survivors (clustered, like production)
    active = V._row_activity(geom, depth, K, eye, truncation=T, zmin=0.5,
                             zmax=3.5)
    act_np = np.asarray(active).reshape(-1)
    NSEG = act_np.size                       # DIM*DIM rows
    rows_np = np.nonzero(act_np)[0].astype(np.int32)
    n_act = rows_np.size
    CAP = min(NSEG, -(-int(n_act * 21 // 20) // 512) * 512)
    idx_np = np.full(CAP, rows_np[0], np.int32)   # pad with dup of first row
    idx_np[:min(n_act, CAP)] = rows_np[:CAP]
    S = DIM
    R = S * 8                                 # packed row width (f32)
    log(f"[rowprobe] NSEG={NSEG} active={n_act} CAP={CAP} R={R} "
        f"({CAP*R*4/1e6:.0f} MB/dir)")

    idx = jnp.asarray(idx_np)
    # 2 KB-granularity variant: same bytes, 8x the index count
    idx2k_np = (idx_np[:, None] * 8 + np.arange(8, dtype=np.int32)[None, :]
                ).reshape(-1)
    idx2k = jnp.asarray(idx2k_np)

    @jax.jit
    def init_table():
        # build on device (H2D of 4.3 GB over the tunnel would take minutes)
        col = jax.lax.broadcasted_iota(jnp.float32, (NSEG, R), 0)
        row = jax.lax.broadcasted_iota(jnp.float32, (NSEG, R), 1)
        return col * 1e-4 + row * 1e-6

    table0 = init_table()
    _ = float(jnp.sum(table0[0]))   # first-dispatch fence (stall lands here)
    log("[rowprobe] table ready; first dispatch done")

    results = {}
    seed_c = [0]

    def seed():
        seed_c[0] += 1
        return jnp.int32(seed_c[0])

    bytes_dir = CAP * R * 4          # one direction, per round trip

    def marginal(name, make_chain, n1=2, n2=6):
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
            gbps = 2 * bytes_dir / best / 1e9
            results[name] = {"s": best, "gbps_2dir": round(gbps, 2)}
            log(f"[rowprobe] {name}: {best*1e3:.2f} ms  "
                f"({gbps:.1f} GB/s gather+scatter)")
        except Exception as e:
            results[name] = None
            log(f"[rowprobe] {name}: FAILED {type(e).__name__}: {e}")

    def chain(gather_fn, scatter_fn, idx_arr, nseg):
        """Round-trip chain: rows = gather(st); scatter(st, rows+1)."""
        def make(n):
            @jax.jit
            def run(st, s):
                def body(k, st):
                    ik = (idx_arr + (k + s)) % nseg
                    rows = gather_fn(st, ik)
                    return scatter_fn(st, ik, rows + 1.0)
                st = jax.lax.fori_loop(0, n, body, st)
                return st[0, 0] + st[nseg // 2, 0]
            return lambda s: run(table0.reshape(nseg, -1), s)
        return make

    # --- XLA baselines ------------------------------------------------------
    marginal("rt_xla_2d", chain(
        lambda st, ik: jnp.take(st, ik, axis=0),
        lambda st, ik, r: st.at[ik].set(r),
        idx, NSEG))

    def g3(st, ik):
        return jnp.take(st.reshape(NSEG, S, 8), ik, axis=0)

    def s3(st, ik, r):
        return st.reshape(NSEG, S, 8).at[ik].set(r).reshape(NSEG, R)

    marginal("rt_xla_3d", chain(g3, s3, idx, NSEG))

    # --- contiguous streaming reference ------------------------------------
    def make_contig(n):
        @jax.jit
        def run(st, s):
            def body(k, st):
                start = ((k + s) * 1024) % (NSEG - CAP)
                rows = jax.lax.dynamic_slice_in_dim(st, start, CAP, axis=0)
                return jax.lax.dynamic_update_slice_in_dim(
                    st, rows + 1.0, start, axis=0)
            st = jax.lax.fori_loop(0, n, body, st)
            return st[0, 0] + st[NSEG // 2, 0]
        return lambda s: run(table0, s)

    marginal("rt_contig", make_contig)

    # --- Pallas variants ----------------------------------------------------
    pl_g = functools.partial(rowcopy.gather_rows, group=8)
    marginal("rt_pl", chain(
        lambda st, ik: pl_g(st, ik),
        lambda st, ik, r: rowcopy.scatter_rows(st, ik, r),
        idx, NSEG))
    marginal("rt_pl_dma", chain(
        lambda st, ik: rowcopy.gather_rows_dma(st, ik),
        lambda st, ik, r: rowcopy.scatter_rows_dma(st, ik, r),
        idx, NSEG))
    marginal("rt_plg_xsc", chain(
        lambda st, ik: pl_g(st, ik),
        lambda st, ik, r: st.at[ik].set(r),
        idx, NSEG))
    marginal("rt_xg_plsc", chain(
        lambda st, ik: jnp.take(st, ik, axis=0),
        lambda st, ik, r: rowcopy.scatter_rows(st, ik, r),
        idx, NSEG))

    # --- 2 KB segment granularity ------------------------------------------
    marginal("rt_xla_2k", chain(
        lambda st, ik: jnp.take(st, ik, axis=0),
        lambda st, ik, r: st.at[ik].set(r),
        idx2k, NSEG * 8))
    marginal("rt_pl_2k", chain(
        lambda st, ik: pl_g(st, ik),
        lambda st, ik, r: rowcopy.scatter_rows(st, ik, r),
        idx2k, NSEG * 8))
    marginal("rt_pl_dma_2k", chain(
        lambda st, ik: rowcopy.gather_rows_dma(st, ik),
        lambda st, ik, r: rowcopy.scatter_rows_dma(st, ik, r),
        idx2k, NSEG * 8))

    # --- correctness spot-check (pallas vs XLA on the real idx) ------------
    try:
        st = table0.reshape(NSEG, R)
        want = np.asarray(jnp.take(st, idx, axis=0)[:8, :8])
        got = np.asarray(pl_g(st, idx)[:8, :8])
        got2 = np.asarray(rowcopy.gather_rows_dma(st, idx)[:8, :8])
        ok = bool(np.array_equal(want, got) and np.array_equal(want, got2))
        results["pallas_gather_matches_xla"] = ok
        log(f"[rowprobe] pallas gather == xla take: {ok}")
    except Exception as e:
        results["pallas_gather_matches_xla"] = f"FAILED {e}"

    print(json.dumps({
        "dim": DIM, "nseg": NSEG, "cap": CAP, "row_bytes": R * 4,
        "bytes_per_dir": bytes_dir,
        "results": {k: v for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
