"""Pixel-payload gather shape sensitivity probe.

The fusion kernels gather [CAP, S] indices from the [307200, 8] f32 pixel
payload.  The 512^3 batched floor implies ~3.5 ns/idx, the 256^3 one
~5.9 ns/idx — same table, same >=1M index count, different index-matrix
SHAPE.  This probe times the isolated gather at several index shapes per
total count to find the fast-emitter's shape conditions.

Usage: python bench/pix_probe.py   (real TPU; ~5 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H = 640, 480


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_enable_xla_caches", "")
    jax.config.update("jax_compilation_cache_dir", "/tmp/psgsdf_probe_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"[pix] devices: {jax.devices()}")

    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.normal(size=(H * W, 8)).astype(np.float32))

    results = {}
    seed_c = [0]

    def seed():
        seed_c[0] += 1
        return jnp.int32(seed_c[0])

    def timed(name, idx, n1=3, n2=9):
        M = idx.size

        def make(n):
            @jax.jit
            def run(payload, idx, s):
                def body(k, acc):
                    rows = jnp.take(payload, (idx + k + s) % (H * W), axis=0)
                    return acc + jnp.sum(rows)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return lambda s: run(payload, idx, s)

        f1, f2 = make(n1), make(n2)
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
        ns = best * 1e9 / M
        results[name] = round(ns, 3)
        log(f"[pix] {name}: {best*1e3:.3f} ms = {ns:.2f} ns/idx (M={M})")

    # realistic clustered indices (projected rows), truncated per count
    base = rng.integers(0, H * W, size=32 << 20, dtype=np.int64)

    for total, shapes in [
        (3_801_088, [(14848, 256), (3_801_088,)]),
        (28_835_840, [(56320, 512), (225280, 128), (28_835_840,)]),
        (524_288, [(4096, 128), (1024, 512), (524_288,)]),
    ]:
        idx_np = base[:total].astype(np.int32)
        for shp in shapes:
            name = f"n{total//1000}k_" + "x".join(str(s) for s in shp)
            timed(name, jnp.asarray(idx_np.reshape(shp)))

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
