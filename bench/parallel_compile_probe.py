"""Does the axon remote compiler serve concurrent compile RPCs in parallel?

Compiles the two heaviest refinement programs (dist/light epilogues at
sokrates-like shapes) serially, then two DIFFERENT-shaped instances
concurrently in threads, and compares walls.  If concurrency wins, the
pipeline can warm the refinement census in parallel threads at
refinement start (the shapes are known after extract_problem).

Usage: python bench/parallel_compile_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from psgradientsdf_tpu.config import OptimizerConfig
    from psgradientsdf_tpu.core.grid import GridGeometry
    from psgradientsdf_tpu.refine import optimizer as O
    from psgradientsdf_tpu.refine.render import ResidualData
    from psgradientsdf_tpu.refine.problem import RefineProblem

    print(f"[pcomp] devices: {jax.devices()}", file=sys.stderr, flush=True)

    def shapes(N, F, Himg, Wimg):
        geom = GridGeometry(dims=(128, 128, 128), voxel_size=0.004,
                            shift=(0.0, 0.0, 1.2))
        sd = jax.ShapeDtypeStruct
        prob = RefineProblem(
            valid=sd((N,), jnp.bool_), idx_xyz=sd((N, 3), jnp.int32),
            dist=sd((N,), jnp.float32), albedo=sd((N, 3), jnp.float32),
            grad_stored=sd((N, 3), jnp.float32), vis=sd((N, F), jnp.bool_),
            nbr_dir=sd((N, 3), jnp.float32), nbr_idx=sd((N, 3), jnp.int32),
            nbr_dist_const=sd((N, 3), jnp.float32),
            nbr_albedo_const=sd((N, 3, 3), jnp.float32),
            lap_idx=sd((N, 6), jnp.int32),
            lap_dist_const=sd((N, 6), jnp.float32),
            n_surface=sd((), jnp.int32),
        )
        rd = ResidualData(
            r=sd((N, F, 3), jnp.float32), w=sd((N, F, 3), jnp.float32),
            mask=sd((N, F), jnp.bool_), p_cam=sd((N, F, 3), jnp.float32),
            uv=sd((N, F, 2), jnp.float32),
            g_img=sd((N, F, 3, 2), jnp.float32),
        )
        args = (prob, geom, rd, sd((N,), jnp.float32),
                sd((N, 3), jnp.float32), sd((N, 3), jnp.float32),
                sd((F, 4, 4), jnp.float32), sd((3, 3), jnp.float32),
                sd((F, 4), jnp.float32))
        kw = dict(model="SH1", order=1, loss=1, lam=0.2, voxel_size=0.004)
        return args, kw

    def compile_dist(N, F):
        args, kw = shapes(N, F, 1139, 1709)
        t0 = time.perf_counter()
        O._dist_update.lower(*args, **kw, reg_weight_n=0.5, reg_weight_l=0.0,
                             damping=1.0, laplacian_diag_only=False).compile()
        return time.perf_counter() - t0

    def compile_light(N, F):
        args, kw = shapes(N, F, 1139, 1709)
        t0 = time.perf_counter()
        O._light_update.lower(*args, **kw, damping=1.0).compile()
        return time.perf_counter() - t0

    res = {}
    # serial baseline (distinct shapes so nothing is cached)
    t0 = time.perf_counter()
    res["serial_dist_s"] = compile_dist(61440, 34)
    res["serial_light_s"] = compile_light(61440, 34)
    res["serial_total_s"] = time.perf_counter() - t0
    print(f"[pcomp] serial: dist {res['serial_dist_s']:.1f}s + light "
          f"{res['serial_light_s']:.1f}s", file=sys.stderr, flush=True)

    # concurrent, new shapes
    out = {}
    def run(tag, fn, N, F):
        out[tag] = fn(N, F)
    t0 = time.perf_counter()
    ts = [threading.Thread(target=run, args=("dist", compile_dist, 73728, 34)),
          threading.Thread(target=run, args=("light", compile_light, 73728, 34))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    res["concurrent_total_s"] = time.perf_counter() - t0
    res["concurrent_each_s"] = out
    print(f"[pcomp] concurrent total {res['concurrent_total_s']:.1f}s "
          f"(each: {out})", file=sys.stderr, flush=True)
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else
                          {kk: round(vv, 2) for kk, vv in v.items()})
                      for k, v in res.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
