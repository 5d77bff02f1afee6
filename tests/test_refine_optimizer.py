"""End-to-end refinement smoke tests on a synthetic Lambertian scene."""

import jax.numpy as jnp
import numpy as np
import pytest

from psgradientsdf_tpu.config import OptimizerConfig, SH1, LED
from psgradientsdf_tpu.refine.optimizer import PhotometricRefiner
from psgradientsdf_tpu.utils import robust, se3

from helpers import wavy_scene, shaded_images


def build_refiner(model=SH1, upsample=False, n_poses=2, save_path=""):
    poses = [jnp.eye(4, dtype=jnp.float32)]
    for i in range(1, n_poses):
        xi = 0.02 * jnp.asarray(
            np.random.RandomState(i).randn(6).astype(np.float32)
        )
        poses.append(se3.se3_exp(xi))
    sc = wavy_scene(dim=48, h=0.03, H=64, W=64, f=60.0, poses=poses)
    light_gt = jnp.array([0.1, 0.2, -0.15, 0.85], dtype=jnp.float32)
    images = shaded_images(sc["frames"], light_gt, order=1)

    cfg = OptimizerConfig(
        max_it=4, conv_threshold=1e-6, damping=1.0, lam=0.2,
        reg_weight_n=1.0, reg_weight_l=0.0, reg_weight_rho=0.0,
        order=1, upsample=upsample, model=model, loss=robust.CAUCHY,
    )
    ref = PhotometricRefiner(
        sc["vol"], sc["geom"], cfg, np.asarray(sc["K"]),
        save_path=save_path, truncation=sc["truncation"],
    )
    ref.set_keyframes(
        images, jnp.stack([p for p in poses]), list(range(n_poses)),
        [f"{i:03d}" for i in range(n_poses)],
    )
    ref.init()
    return ref, light_gt


def test_init_and_energies():
    ref, light_gt = build_refiner()
    assert int(ref.prob.n_surface) > 500
    ref.init_albedo()
    E, E_n, E_l, E_r = ref.energies()
    assert np.isfinite([E, E_n, E_l, E_r]).all()
    assert E > 0


def test_albedo_block_reduces_energy():
    ref, light_gt = build_refiner()
    ref.init_albedo()
    # set lights to ground truth so the albedo solve has the right target
    ref.lights = jnp.broadcast_to(light_gt, ref.lights.shape)
    E0 = ref.energies()[0]
    from psgradientsdf_tpu.refine.optimizer import _albedo_block
    for _ in range(3):
        ref.albedo = _albedo_block(
            *ref._args(), **ref._static_kwargs(), reg_weight_rho=0.0, damping=1.0
        )
    E1 = ref.energies()[0]
    assert np.isfinite(E1)
    assert E1 < E0, (E0, E1)


def test_light_block_recovers_light_with_gt_albedo():
    """With albedo fixed at ground truth the light solve is well-posed and a
    single GN step must land near the GT SH light.  (With mean-intensity
    albedo init the albedo absorbs the shading and ambient-only light is the
    true LSQ optimum — an inherent rho*l ambiguity shared with the
    reference, so direction recovery is only testable this way.)"""
    ref, light_gt = build_refiner()
    # ground-truth albedo at the surface points
    from psgradientsdf_tpu.refine import render as render_mod
    pts = render_mod.surface_points_world(
        ref.prob, ref.geom, ref.dist, ref.grad_stored
    )
    x, y = pts[:, 0], pts[:, 1]
    ref.albedo = jnp.stack(
        [
            0.5 + 0.2 * jnp.sin(10 * x),
            0.5 + 0.2 * jnp.cos(8 * y),
            0.5 + 0.15 * jnp.sin(6 * (x + y)),
        ],
        axis=-1,
    )
    from psgradientsdf_tpu.refine.optimizer import _light_block
    E0 = ref.energies()[0]
    for _ in range(2):
        ref.lights = _light_block(*ref._args(), **ref._static_kwargs(), damping=1.0)
    E1 = ref.energies()[0]
    assert E1 < E0
    l = np.asarray(ref.lights)[0]
    gt = np.asarray(light_gt)
    cos = l[1:] @ gt[1:] / (np.linalg.norm(l[1:]) * np.linalg.norm(gt[1:]) + 1e-9)
    assert cos > 0.9, (l, gt)
    np.testing.assert_allclose(l, gt, atol=0.15)


def test_alternating_optimize_runs(tmp_path):
    ref, light_gt = build_refiner(save_path=str(tmp_path))
    ok = ref.alternating_optimize(light=True, albedo=True, distance=True, pose=True)
    # must terminate without NaN; energies finite
    E = ref.energies()[0]
    assert np.isfinite(E)
    # artifacts saved on convergence/divergence or periodic dumps
    # (either final_refined or after_iter files)
    files = list(tmp_path.iterdir())
    assert any("pointcloud" in f.name or "mesh" in f.name for f in files) or not ok


def test_dist_block_reduces_geometry_error():
    """Perturb distances; the distance solve should pull them back."""
    ref, light_gt = build_refiner()
    ref.init_albedo()
    ref.lights = jnp.broadcast_to(light_gt, ref.lights.shape)
    rng = np.random.RandomState(0)
    d_true = ref.dist
    noise = jnp.asarray(
        (0.2 * ref.geom.voxel_size * rng.randn(*d_true.shape)).astype(np.float32)
    )
    ref.dist = d_true + jnp.where(ref.prob.valid, noise, 0.0)
    E0 = ref.energies()[0]
    from psgradientsdf_tpu.refine.optimizer import _dist_block
    for _ in range(2):
        ref.dist, ref.grad_stored = _dist_block(
            *ref._args(), **ref._static_kwargs(),
            reg_weight_n=0.5, reg_weight_l=0.0, damping=1.0,
            laplacian_diag_only=False,
        )
    E1 = ref.energies()[0]
    assert np.isfinite(E1)
    assert E1 < E0, (E0, E1)


def test_pcg_fixed_matches_scipy_cg():
    """Static-trip masked PCG (needed under shard_map) == while-loop CG."""
    import numpy as np
    import jax.numpy as jnp
    import jax
    from psgradientsdf_tpu.refine.solvers import pcg_fixed

    rng = np.random.default_rng(0)
    A_np = rng.normal(size=(64, 64)).astype(np.float32)
    A_np = A_np @ A_np.T + 64 * np.eye(64, dtype=np.float32)
    b_np = rng.normal(size=(64,)).astype(np.float32)
    A = jnp.asarray(A_np)
    b = jnp.asarray(b_np)
    d = jnp.diag(A)
    matvec = lambda x: A @ x
    M_inv = lambda x: x / d
    x_ref, _ = jax.scipy.sparse.linalg.cg(matvec, b, maxiter=200, tol=1e-8,
                                          M=M_inv)
    x_fix = pcg_fixed(matvec, b, M_inv, 200, 1e-8)
    assert np.allclose(np.asarray(x_fix), np.asarray(x_ref), atol=1e-4)
    assert np.allclose(np.asarray(A_np @ np.asarray(x_fix)), b_np, atol=1e-3)


def test_joint_dist_pose_schur_matches_dense():
    """Schur-complement elimination == dense joint solve on the real
    (small-N) refinement system."""
    import jax
    from psgradientsdf_tpu.refine import jacobians
    from psgradientsdf_tpu.refine.optimizer import _residuals
    from psgradientsdf_tpu.refine import solvers

    ref, light_gt = build_refiner()
    ref.init_albedo()
    kw = ref._static_kwargs()
    rd = _residuals(*ref._args(), **kw)
    G = jacobians.image_pi_grad(ref.images, rd, ref.K)
    DJ = jacobians.dist_jacobian_sh(
        ref.prob, ref.geom, ref.dist, ref.albedo, ref.grad_stored, ref.lights,
        G, ref.poses, ref.geom.voxel_size, 1)
    J_c = jacobians.pose_jacobian_sh(G, rd, ref.poses)

    skw = dict(reg_weight_n=0.5, reg_weight_l=0.0, damping=1.0)
    dd, dxi = solvers.solve_joint_dist_pose(
        ref.prob, rd, DJ, J_c, ref.dist, ref.geom.voxel_size,
        cg_iters=400, cg_tol=1e-10, **skw)

    # dense reference: materialize the joint H via operator probes
    N = int(ref.prob.dist.shape[0])
    F = int(ref.poses.shape[0])
    valid = np.asarray(ref.prob.valid)
    w = jnp.where(ref.prob.valid[:, None, None], rd.w, 0.0)

    b_d, diag, hdd_mv = solvers._distance_system(
        ref.prob, rd, DJ, ref.dist, ref.geom.voxel_size,
        laplacian_diag_only=False, **skw)
    eye_N = jnp.eye(N, dtype=jnp.float32)
    H_dd = np.asarray(jax.vmap(hdd_mv)(eye_N)).T          # [N,N]

    def hpd_col(x):
        Jdx = solvers.stencil_apply(x, DJ.J0, DJ.Ji, ref.prob.nbr_idx)
        return jnp.einsum("nfc,nfcb->fb", w * Jdx, J_c).reshape(-1)
    H_pd = np.asarray(jax.vmap(hpd_col)(eye_N)).T          # [6F, N]

    H_pp = np.asarray(jnp.einsum("nfc,nfcb,nfcd->fbd", w, J_c, J_c))
    Hpp_dense = np.zeros((6 * F, 6 * F), np.float64)
    for f in range(F):
        Hf = H_pp[f] + skw["damping"] * np.diag(np.diag(H_pp[f])) + 1e-8 * np.eye(6)
        Hpp_dense[6*f:6*f+6, 6*f:6*f+6] = Hf

    g_d = np.asarray(jnp.where(ref.prob.valid, b_d, 0.0))
    g_p = np.asarray(jnp.einsum("nfc,nfcb,nfc->fb", w, J_c, rd.r)).reshape(-1)

    # restrict to valid rows (invalid rows are identity in the operator)
    vi = np.where(valid)[0]
    n_v = len(vi)
    H = np.zeros((n_v + 6 * F, n_v + 6 * F), np.float64)
    H[:n_v, :n_v] = H_dd[np.ix_(vi, vi)]
    H[:n_v, n_v:] = H_pd[:, vi].T
    H[n_v:, :n_v] = H_pd[:, vi]
    H[n_v:, n_v:] = Hpp_dense
    g = np.concatenate([g_d[vi], g_p])
    sol = np.linalg.solve(H, g)

    dd_v = np.asarray(dd)[vi]
    assert np.allclose(dd_v, sol[:n_v], atol=5e-4), (
        np.abs(dd_v - sol[:n_v]).max())
    assert np.allclose(np.asarray(dxi).reshape(-1), sol[n_v:], atol=5e-4), (
        np.abs(np.asarray(dxi).reshape(-1) - sol[n_v:]).max())


def test_joint_dp_step_reduces_energy():
    """The joint Schur step must reduce the photometric+reg energy from a
    perturbed-pose start (the scenario alternation handles poorly)."""
    ref, light_gt = build_refiner(n_poses=3)
    ref.init_albedo()
    ref.cfg.joint_dp = True
    E0 = ref.energies()
    tot0 = E0[0] + 0.5 * E0[1]
    from psgradientsdf_tpu.refine.optimizer import _joint_dp_step
    d, g, p, e = _joint_dp_step(
        *ref._args(), **ref._static_kwargs(),
        reg_weight_n=0.5, reg_weight_l=0.0, damping=1.0,
        laplacian_diag_only=False)
    e = [float(v) for v in e]
    tot1 = e[0] + 0.5 * e[1]
    assert np.isfinite(tot1)
    assert tot1 < tot0, (tot0, tot1)


def test_sh2_alternating_optimize_reduces_energy():
    """End-to-end SH order-2: alternating refinement runs and reduces the
    photometric energy (9-coefficient lights, order-2 dSH/dn in the
    distance Jacobian — PsOptimizerJa.cpp:17-28,253-289)."""
    from psgradientsdf_tpu.config import SH2
    from helpers import wavy_scene, shaded_images

    poses = [jnp.eye(4, dtype=jnp.float32)]
    for i in range(1, 3):
        xi = 0.015 * jnp.asarray(np.random.RandomState(i).randn(6).astype(np.float32))
        poses.append(se3.se3_exp(xi))
    sc = wavy_scene(dim=48, h=0.03, H=64, W=64, f=60.0, poses=poses)
    light_gt = jnp.array(
        [0.1, 0.25, -0.2, 0.8, 0.05, -0.03, 0.04, 0.02, -0.05], dtype=jnp.float32)
    images = shaded_images(sc["frames"], light_gt, order=2)

    cfg = OptimizerConfig(
        max_it=3, conv_threshold=1e-8, damping=1.0, lam=0.2,
        reg_weight_n=1.0, reg_weight_l=0.0, reg_weight_rho=0.0,
        order=2, model=SH2, loss=robust.CAUCHY,
    )
    ref = PhotometricRefiner(
        sc["vol"], sc["geom"], cfg, np.asarray(sc["K"]),
        save_path="", truncation=sc["truncation"],
    )
    ref.set_keyframes(images, jnp.stack(poses), list(range(3)))
    ref.init()
    assert ref.lights.shape == (3, 9)
    ref.init_albedo()
    E0 = ref.energies()[0]
    ref.alternating_optimize(light=True, albedo=True, distance=True, pose=True)
    E1 = ref.energies()[0]
    assert np.isfinite(E1)
    assert E1 < E0, (E0, E1)


def test_ablation_flags_all_false_converges_immediately():
    """main_ps.cpp:79-82 ablation booleans: with every block disabled the
    alternating loop makes no updates and exits on the first convergence
    check (rel-dE = 0)."""
    ref, _ = build_refiner()
    d0, a0, p0 = ref.dist, ref.albedo, ref.poses
    ok = ref.alternating_optimize(light=False, albedo=False,
                                  distance=False, pose=False)
    assert ok  # converged (rel_diff == 0 at iter 0)
    assert np.array_equal(np.asarray(ref.dist), np.asarray(d0))
    assert np.array_equal(np.asarray(ref.poses), np.asarray(p0))


def test_ablation_single_block():
    """Only-albedo ablation touches albedo and nothing else."""
    ref, light_gt = build_refiner()
    ref.lights = jnp.broadcast_to(light_gt, ref.lights.shape)
    d0, p0, l0 = ref.dist, ref.poses, ref.lights
    ref.cfg.max_it = 2
    ref.alternating_optimize(light=False, albedo=True, distance=False, pose=False)
    assert np.array_equal(np.asarray(ref.dist), np.asarray(d0))
    assert np.array_equal(np.asarray(ref.poses), np.asarray(p0))
    assert np.array_equal(np.asarray(ref.lights), np.asarray(l0))


def test_pose_block_chunked_matches_full():
    """N-chunked pose normal-equation accumulation (memory-bounded path for
    post-upsample problem sizes) matches the full computation.

    Calls the UNJITTED function (__wrapped__): mutating the module-level
    _POSE_CHUNK does not invalidate jax.jit's trace cache, so going through
    the jitted entry point would silently compare the cached full path with
    itself."""
    import psgradientsdf_tpu.refine.optimizer as O

    ref, _ = build_refiner()
    N = int(ref.prob.dist.shape[0])
    old = O._POSE_CHUNK
    try:
        O._POSE_CHUNK = 1 << 30          # force the full path
        p_ref = O._pose_block.__wrapped__(
            *ref._args(), **ref._static_kwargs(), damping=1.0)
        O._POSE_CHUNK = max(N // 4, 1)   # force the chunked path
        assert N % O._POSE_CHUNK == 0
        p_chunk = O._pose_block.__wrapped__(
            *ref._args(), **ref._static_kwargs(), damping=1.0)
    finally:
        O._POSE_CHUNK = old
    assert np.allclose(np.asarray(p_ref), np.asarray(p_chunk), atol=1e-6)


def test_warm_compile_parallel(tmp_path):
    """The parallel AOT compile-warm (persistent-cache census cut) builds
    valid programs for the loop's exact shapes/statics — exercised with a
    cache dir configured, since warming no-ops without one."""
    import jax

    from helpers import wavy_scene
    from psgradientsdf_tpu.config import OptimizerConfig
    from psgradientsdf_tpu.refine.optimizer import PhotometricRefiner

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "cache"))
    try:
        sc = wavy_scene(dim=24, h=0.05, H=40, W=40, f=36.0)
        cfg = OptimizerConfig(model="SH1", order=1, loss=1, lam=0.2,
                              max_it=1, conv_threshold=1e-9,
                              reg_weight_n=0.5, reg_weight_l=0.0,
                              reg_weight_rho=0.0, damping=1.0)
        ref = PhotometricRefiner(sc["vol"], sc["geom"], cfg,
                                 np.asarray(sc["K"]),
                                 truncation=sc["truncation"])
        img = np.asarray(sc["frames"][0]["color"])[None]
        ref.set_keyframes(img, np.eye(4, dtype=np.float32)[None], [0])
        ref.init()           # triggers _warm_base_programs
        ref.alternating_optimize(True, True, True, True)
        # warming ran (cache dir configured) and captured no errors
        assert getattr(ref, "_warm_errors", None) == {}, ref._warm_errors
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


@pytest.mark.parametrize("model,joint", [(SH1, False), (LED, False),
                                         (SH1, True)])
def test_fused_iteration_matches_blocks(model, joint, tmp_path):
    """The round-5 fused per-iteration program (one dispatch: all blocks +
    refreshes + energies) must reproduce the per-block dispatch path —
    same states, same energy trace, same convergence verdict."""
    import json
    import os

    from psgradientsdf_tpu.utils.metrics import MetricsLogger

    results = {}
    for tag, fused in (("blocks", False), ("fused", True)):
        ref, _ = build_refiner(model=model)
        ref.cfg.joint_dp = joint
        ref.cfg.max_it = 3
        ref.cfg.conv_threshold = 0.0       # fixed 3 iterations both paths
        ref.fused_iterations = fused
        mpath = str(tmp_path / f"m_{tag}_{model}_{joint}.jsonl")
        ref.metrics = MetricsLogger(mpath, echo=False)
        ok = ref.alternating_optimize(light=True, albedo=True,
                                      distance=True, pose=True)
        trace = [json.loads(l)["total"] for l in open(mpath)
                 if json.loads(l).get("event") == "iteration"]
        results[tag] = dict(ok=ok, dist=np.asarray(ref.dist),
                            albedo=np.asarray(ref.albedo),
                            poses=np.asarray(ref.poses),
                            lights=np.asarray(ref.lights), trace=trace)

    b, f = results["blocks"], results["fused"]
    assert b["ok"] == f["ok"]
    assert len(b["trace"]) == len(f["trace"]) >= 2
    np.testing.assert_allclose(f["trace"], b["trace"], rtol=1e-4)
    np.testing.assert_allclose(f["dist"], b["dist"], atol=1e-6)
    np.testing.assert_allclose(f["albedo"], b["albedo"], atol=1e-6)
    np.testing.assert_allclose(f["poses"], b["poses"], atol=1e-6)
    np.testing.assert_allclose(f["lights"], b["lights"], atol=1e-5)
