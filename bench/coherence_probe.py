"""Pixel-gather coherence on the REAL fusion index stream.

The shipped 512^3 kernel measures 6.8 ns per pixel-gather index
(whole kernel).  This probe isolates the GATHER on the exact index
stream the kernel issues (cull survivors' voxels projected at the map
pose) and compares orderings:

  real        rows in (z,y) cull order — what the kernel issues
  rowsorted   same rows, reordered by projected image position (the
              cheapest kernel change that could improve locality)
  elemsorted  all indices globally sorted (locality upper bound; NOT
              implementable in the kernel — scatter-back would need the
              inverse permutation at equal cost)
  shuffled    random permutation (locality lower bound)

If `real` is already near `elemsorted`, the kernel's 6.8 ns is
update-bound and the pinned-floor claim strengthens; if `rowsorted`
closes a significant real->elemsorted gap, row sorting goes into the
kernel.

Usage: PSGSDF_BENCH_DIM=512 python bench/coherence_probe.py
"""

from __future__ import annotations

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
    import jax.numpy as jnp

    if os.environ.get("PSGSDF_PROBE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "")
    jax.config.update("jax_compilation_cache_dir", "/tmp/psgsdf_probe_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench_scene import make_scene
    from psgradientsdf_tpu.core.grid import GridGeometry
    from psgradientsdf_tpu.core import volume as V

    log(f"[coh] devices: {jax.devices()}  DIM={DIM}")
    K_np, depth_np, _, _, _ = make_scene(W, H)
    h = 1.8 / DIM
    T = 5 * h
    geom = GridGeometry(dims=(DIM, DIM, DIM), voxel_size=h,
                        shift=(0.0, 0.0, 1.2))
    fuse_kw = dict(truncation=T, zmin=0.5, zmax=3.5)

    # ---- host-side reconstruction of the kernel's index stream ----------
    act = np.asarray(jax.jit(
        lambda d, K, p: V._row_activity(geom, d, K, p, **fuse_kw)
    )(jnp.asarray(depth_np), jnp.asarray(K_np),
      jnp.eye(4, dtype=jnp.float32)))
    rows_idx = np.nonzero(act.reshape(-1))[0]
    CAP = rows_idx.size
    S = DIM
    Y = DIM
    log(f"[coh] {CAP} active rows -> {CAP*S/1e6:.2f}M idx")

    origin = np.array([geom.origin[0], geom.origin[1], geom.origin[2]],
                      dtype=np.float64)
    rz = (rows_idx // Y).astype(np.float64)
    ry = (rows_idx % Y).astype(np.float64)
    rx = np.arange(S, dtype=np.float64)[None, :]
    px = origin[0] + h * np.broadcast_to(rx, (CAP, S))
    py = (origin[1] + h * ry)[:, None]
    pz = (origin[2] + h * rz)[:, None]
    fx, fy = K_np[0, 0], K_np[1, 1]
    cx, cy = K_np[0, 2], K_np[1, 2]
    safe_z = np.maximum(np.broadcast_to(pz, (CAP, S)), 1e-6)
    u = np.clip((cx + fx * px / safe_z + 0.5).astype(np.int64), 0, W - 1)
    v = np.clip((cy + fy * np.broadcast_to(py, (CAP, S)) / safe_z
                 + 0.5).astype(np.int64), 0, H - 1)
    pix = (v * W + u).astype(np.int32)            # [CAP, S] real stream

    # orderings
    key = pix[:, S // 2].astype(np.int64) * 4096 + np.arange(CAP) % 4096
    order = np.argsort(key, kind="stable")
    streams = {
        "real": pix,
        "rowsorted": pix[order],
        "elemsorted": np.sort(pix.reshape(-1)).reshape(CAP, S),
        "shuffled": np.random.default_rng(0).permutation(
            pix.reshape(-1)).reshape(CAP, S),
    }

    rng = np.random.default_rng(1)
    payload = jnp.asarray(rng.normal(size=(H * W, 8)).astype(np.float32))

    results = {}
    seed_c = [0]

    def seed():
        seed_c[0] += 1
        return jnp.int32(seed_c[0])

    M = CAP * S
    for name, idx_np in streams.items():
        idx = jnp.asarray(idx_np)

        def make(n):
            @jax.jit
            def run(payload, idx, s):
                def body(k, acc):
                    # k+s rotation keeps inputs distinct per iteration
                    # without destroying the ordering's locality (the
                    # payload table is index-uniform)
                    rows = jnp.take(payload, (idx + (k + s) % 7) % (H * W),
                                    axis=0)
                    return acc + jnp.sum(rows)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return lambda s: run(payload, idx, s)

        f1, f2 = make(2), make(6)
        _ = float(f1(seed()))
        _ = float(f2(seed()))
        best = 1e18
        for _r in range(3):
            t0 = time.perf_counter()
            _ = float(f1(seed()))
            t1 = time.perf_counter()
            _ = float(f2(seed()))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / 4)
        results[name] = round(best * 1e9 / M, 3)
        log(f"[coh] {name}: {best*1e3:.2f} ms = {best*1e9/M:.2f} ns/idx")

    print(json.dumps({"dim": DIM, "idx": M, "ns_per_idx": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
