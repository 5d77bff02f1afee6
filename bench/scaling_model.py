"""Multi-chip scaling model for the 512^3 scan (round-4 VERDICT #4).

Single-chip 256^3/512^3 is pipeline-bound at ~5x the C++ baseline (the
round-4 design-space closure, BASELINE.md "pipeline-bound"); the remaining
path to >=10x at scale is Z-slab sharding.  Real multi-chip hardware is
not available in this environment, so this script produces the AUDITABLE
inputs of the scaling claim on the 8-device virtual CPU mesh:

  1. per-slab gather index counts for the bench scene's frustum at 512^3
     (the per-chip fusion work under Z-slab sharding, from the REAL
     level-1 cull, for N_chips in {1,2,4,8});
  2. the per-frame collective BYTES of the compiled sharded scan step
     (sharded fusion + psum tracker), parsed from post-GSPMD HLO by
     parallel/hlo_comm.py — pinned by tests/test_scaling_model.py;
  3. the resulting fps(N_chips) model: per-chip fusion floor (max slab
     index count x the MEASURED single-chip ns/idx from
     BENCH_details_512.json) + tracking + collectives at a stated ICI
     bandwidth.

Writes SCALING_512.json at the repo root and prints it.
Run: python bench/scaling_model.py   (forces the 8-device CPU platform)
"""

from __future__ import annotations

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "bench"))

from bench_scene import make_scene  # noqa: E402

from psgradientsdf_tpu.core.grid import GridGeometry  # noqa: E402
from psgradientsdf_tpu.core.volume import _row_activity  # noqa: E402
from psgradientsdf_tpu.parallel import shard  # noqa: E402
from psgradientsdf_tpu.parallel.hlo_comm import (  # noqa: E402
    collective_bytes, collective_ops,
)
from psgradientsdf_tpu.parallel.mesh import make_mesh, shard_volume  # noqa: E402
from psgradientsdf_tpu.core.volume import make_volume  # noqa: E402

W, H, DIM = 640, 480, 512

# measured single-chip rates (BENCH_details_512.json run-of-record):
# whole fused kernel ns per gather index, and the tracking adder
NS_PER_IDX_512 = 6.78          # round-4 record; r3 session 6.48
TRACK_MS_512 = 5.0             # stale-correspondence rounds (BASELINE.md)
# v5e ICI: 4 links/chip at ~45 GB/s usable each way (public "How to
# Scale Your Model" numbers); the model only needs the ORDER — the scan
# moves KBs/frame, so even 1 GB/s would not register
ICI_GBPS = 45.0
DISPATCH_MS = 0.0              # scan runs inside one program (bench.py)


def per_slab_counts(geom, depth, K):
    """Active-row counts per chip for N in {1,2,4,8}, under BOTH plane
    assignments: contiguous Z-slabs (frustum-skewed) and the strided
    interleave (parallel/shard.py interleave_z — bit-exactness and
    balance pinned by tests/test_scaling_model.py)."""
    act = np.asarray(_row_activity(
        geom, depth, K, jnp.eye(4, dtype=jnp.float32),
        truncation=5 * geom.voxel_size, zmin=0.5, zmax=3.5)).astype(np.int64)

    def caps_of(slabs, n):
        return [min(act.size // n, -(-int(s * 21 // 20) // 256) * 256)
                for s in slabs]

    out = {}
    for n in (1, 2, 4, 8):
        contig = act.reshape(n, -1).sum(axis=1)
        inter = np.array([act[k::n].sum() for k in range(n)])
        cc, ci = caps_of(contig, n), caps_of(inter, n)
        out[n] = dict(
            active_rows_contiguous=[int(s) for s in contig],
            active_rows_interleaved=[int(s) for s in inter],
            row_capacity_interleaved=[int(c) for c in ci],
            max_idx_per_chip_contiguous=max(int(c) * DIM for c in cc),
            max_idx_per_chip=max(int(c) * DIM for c in ci),
        )
    return out


def compiled_collectives(geom, depth_np, K_np):
    """Compile the sharded fusion step and the sharded tracker on the
    8-device mesh; return their collective-byte accounting from HLO."""
    mesh = make_mesh(8, 1)
    kw = dict(truncation=5 * geom.voxel_size, zmin=0.5, zmax=3.5)
    K = jnp.asarray(K_np)
    depth = jnp.asarray(depth_np)
    color = jnp.zeros((H, W, 3), jnp.float32)
    normals = jnp.zeros((H, W, 3), jnp.float32)
    nsq = jnp.ones((H, W), jnp.float32)
    eye = jnp.eye(4, dtype=jnp.float32)

    # a modest per-shard capacity: the collective structure of the program
    # does not depend on it (the only collective is the overflow psum)
    fuse = jax.jit(shard.sharded_fuse_frame_culled_fn(
        mesh, geom, **kw, row_capacity=2048, interleave_z=True))
    vol_sh = shard_volume(make_volume(geom, 5 * geom.voxel_size,
                                      frame_cap=32), mesh)
    fuse_txt = (fuse.lower(vol_sh, color, depth, normals, nsq, K, eye,
                           jnp.int32(0)).compile().as_text())

    trk = shard.make_sharded_tracker(
        mesh, geom, (H, W), **kw, num_iterations=8,
        conv_threshold_sq=1e-6, damping=1.0, early_exit=False,
        regather_every=4, interleave_z=True)
    trk_txt = trk.lower(vol_sh, depth, K, eye).compile().as_text()

    return dict(
        fusion=collective_bytes(fuse_txt),
        fusion_ops=[(k, s, b) for k, s, b in collective_ops(fuse_txt)],
        tracker=collective_bytes(trk_txt),
        tracker_ops_count=len(collective_ops(trk_txt)),
    )


def fps_model(slabs, comm):
    """fps(N) = 1e3 / (fusion ms at the slab max + tracking + collectives)."""
    comm_bytes = comm["fusion"]["total"] + comm["tracker"]["total"]
    comm_ms = comm_bytes / (ICI_GBPS * 1e9) * 1e3
    model = {}
    for n, s in slabs.items():
        fuse_ms = s["max_idx_per_chip"] * NS_PER_IDX_512 * 1e-6
        # tracking: the pixel set is image-sized regardless of N; its
        # payload gather rides the same slab (records gathered from the
        # local slab after a psum'd per-slab Gram) — conservatively keep
        # the full single-chip tracking adder on every chip
        frame_ms = fuse_ms + TRACK_MS_512 + comm_ms + DISPATCH_MS
        model[n] = dict(
            fusion_ms=round(fuse_ms, 2),
            track_ms=TRACK_MS_512,
            comm_ms=round(comm_ms, 6),
            frame_ms=round(frame_ms, 2),
            fps=round(1e3 / frame_ms, 2),
        )
    return model, comm_bytes, comm_ms


def main() -> int:
    K_np, depth_np, _, _, _ = make_scene(W, H)
    h = 1.8 / DIM
    geom = GridGeometry(dims=(DIM, DIM, DIM), voxel_size=h,
                        shift=(0.0, 0.0, 1.2))
    print("[scaling] per-slab cull counts ...", file=sys.stderr)
    slabs = per_slab_counts(geom, jnp.asarray(depth_np), jnp.asarray(K_np))
    print("[scaling] compiling sharded step on the 8-device mesh ...",
          file=sys.stderr)
    comm = compiled_collectives(geom, depth_np, K_np)
    model, comm_bytes, comm_ms = fps_model(slabs, comm)

    # the C++ baseline at 512^3 (BENCH_details_512.json run-of-record)
    cpp_fps = 0.922
    out = dict(
        scenario=f"{W}x{H} bench frustum, {DIM}^3, Z-slab sharding",
        inputs=dict(ns_per_idx_512=NS_PER_IDX_512,
                    track_ms=TRACK_MS_512, ici_gbps=ICI_GBPS),
        per_slab=slabs,
        collective_bytes_per_frame=dict(
            fusion=comm["fusion"], tracker_per_solve=comm["tracker"],
            total=comm_bytes, note=(
                "per-device operand bytes of every collective in the "
                "compiled sharded step (parallel/hlo_comm.py); tracker "
                "counts one 8-GN-iteration solve")),
        fusion_collective_ops=comm["fusion_ops"],
        fps_model=model,
        vs_cpp={n: round(m["fps"] / cpp_fps, 2) for n, m in model.items()},
        cpp_fps_512=cpp_fps,
    )
    with open(os.path.join(REPO, "SCALING_512.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
