"""Gradient-SDF volume: SoA arrays + the volumetric fusion kernel.

TPU-native redesign of VolumetricGradSdf (cpp/include/sdf_tracker/
VolumetricGradSdf.{h,cpp}).  The reference's AoS `SdfVoxel*` heap array plus
ragged per-voxel `std::vector<bool>` visibility becomes five dense,
statically-shaped arrays (a JAX pytree):

    dist    [Z,Y,X]     truncated signed distance (negative inside)
    grad    [Z,Y,X,3]   accumulated (unnormalized) Gradient-SDF gradient
    weight  [Z,Y,X]     fusion confidence
    color   [Z,Y,X,3]   running-mean RGB
    vis     [W,Z,Y,X]   uint32 bit-packed per-frame visibility
                        (bit f%32 of word f//32 == "voxel updated in frame f")

Fusion (`fuse_frame`) evaluates the reference's per-voxel update
(VolumetricGradSdf.cpp:51-138) for *all* voxels in one fused elementwise +
gather kernel: transform to camera, project to nearest pixel, gate
(z-range / fusion weight / normal validity / viewing angle), then masked
running-mean updates.  No scatter is needed — the loop is over voxels, not
pixels, so everything is a gather from the image maps.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from psgradientsdf_tpu.core.grid import GridGeometry


class GradSdfVolume(NamedTuple):
    dist: jax.Array      # [Z,Y,X] f32
    grad: jax.Array      # [Z,Y,X,3] f32
    weight: jax.Array    # [Z,Y,X] f32
    color: jax.Array     # [Z,Y,X,3] f32
    vis: jax.Array       # [W,Z,Y,X] uint32 bit-packed visibility


def make_volume(geom: GridGeometry, truncation: float, frame_cap: int = 256) -> GradSdfVolume:
    """Fresh volume: dist = +T everywhere (VolumetricGradSdf.cpp:14-38)."""
    zyx = geom.shape_zyx
    n_words = (frame_cap + 31) // 32
    return GradSdfVolume(
        dist=jnp.full(zyx, truncation, dtype=jnp.float32),
        grad=jnp.zeros(zyx + (3,), dtype=jnp.float32),
        weight=jnp.zeros(zyx, dtype=jnp.float32),
        color=jnp.zeros(zyx + (3,), dtype=jnp.float32),
        vis=jnp.zeros((n_words,) + zyx, dtype=jnp.uint32),
    )


def fusion_weight(sdf: jax.Array, T: float) -> jax.Array:
    """Asymmetric fusion weight (Sdf.h:48-66): 1 in front of the surface
    (sdf >= 0), linear ramp 1 + sdf/T on [-T, 0), 0 behind."""
    return jnp.where(sdf >= 0.0, 1.0, jnp.where(sdf >= -T, 1.0 + sdf / T, 0.0))


@functools.partial(
    jax.jit, static_argnames=("geom", "truncation", "zmin", "zmax", "cos_thresh_sq")
)
def fuse_frame(
    vol: GradSdfVolume,
    geom: GridGeometry,
    color: jax.Array,      # [H,W,3] RGB in [0,1]
    depth: jax.Array,      # [H,W] meters
    normals: jax.Array,    # [H,W,3] unit inward normals (FALS)
    n_sq_inv: jax.Array,   # [H,W] cached 1/(1+x0^2+y0^2) from the FALS cache
    K: jax.Array,          # [3,3]
    pose: jax.Array,       # [4,4] camera-to-world
    frame_idx: jax.Array,  # scalar int32 — visibility bit to set
    gate: Optional[jax.Array] = None,  # scalar bool — False => no-op update
    *,
    truncation: float,
    zmin: float,
    zmax: float,
    cos_thresh_sq: float = 0.25 * 0.25,
) -> GradSdfVolume:
    """One fused depth/color frame (VolumetricGradSdf.cpp:51-138).

    `gate` makes the whole update a masked no-op when False — the static-
    control-flow alternative to wrapping the call in lax.cond (dynamic
    conditionals cost a host round trip per execution on remote backends
    and block cross-frame dispatch pipelining)."""
    H, W = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    R = pose[:3, :3]
    t = pose[:3, 3]

    p_w = geom.world_coords()                      # [Z,Y,X,3]
    p_c = jnp.einsum("ij,zyxj->zyxi", R.T, p_w - t)
    pz = p_c[..., 2]
    in_front = pz > 0.0

    safe_z = jnp.where(in_front, pz, 1.0)
    # nearest-pixel projection with +0.5 rounding via int cast
    # (VolumetricGradSdf.cpp:87-88 static_cast<int> truncates toward zero,
    # which accepts the [-0.5, 0) sliver as pixel 0 — floor would not)
    u = (cx + fx * p_c[..., 0] / safe_z + 0.5).astype(jnp.int32)
    v = (cy + fy * p_c[..., 1] / safe_z + 0.5).astype(jnp.int32)
    in_img = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    uc = jnp.clip(u, 0, W - 1)
    vc = jnp.clip(v, 0, H - 1)

    # TPU gathers cost ~constant per ROW regardless of row width, so all
    # eight per-pixel quantities ride ONE row-gather of a packed payload
    # (measured 2.6x over separate per-map gathers).
    pix_payload = jnp.concatenate(
        [depth[..., None], normals, color, n_sq_inv[..., None]], axis=-1
    ).reshape(H * W, 8)
    rows = jnp.take(pix_payload, vc * W + uc, axis=0)   # [Z,Y,X,8]
    z = rows[..., 0]
    n_img = rows[..., 1:4]
    col = rows[..., 4:7]
    nsq = rows[..., 7]

    z_ok = (z > zmin) & (z < zmax)

    sdf = z - pz
    w = fusion_weight(sdf, truncation)

    n_valid = jnp.sum(n_img * n_img, axis=-1) >= 0.1

    # viewing-angle gate: cos^2(angle between normal and ray) >= cos_thresh_sq
    # (VolumetricGradSdf.cpp:114-116)
    xy_hom = p_c / safe_z[..., None]
    ndot = jnp.sum(n_img * xy_hom, axis=-1)
    angle_ok = ndot * ndot * nsq >= cos_thresh_sq

    mask = in_front & in_img & z_ok & (w > 0.0) & n_valid & angle_ok
    if gate is not None:
        mask = mask & gate
    wm = jnp.where(mask, w, 0.0)

    new_weight = vol.weight + wm
    safe_W = jnp.maximum(new_weight, 1e-12)
    tr_sdf = jnp.clip(sdf, -truncation, truncation)
    new_dist = vol.dist + (tr_sdf - vol.dist) * wm / safe_W
    # normals are inward-pointing -> accumulate -w * R * n (cpp:123)
    n_world = jnp.einsum("ij,zyxj->zyxi", R, n_img)
    new_grad = vol.grad - wm[..., None] * n_world
    new_color = vol.color + (col - vol.color) * (wm / safe_W)[..., None]

    # visibility bit for this frame
    word = frame_idx // 32
    bit = (jnp.uint32(1) << jnp.uint32(frame_idx % 32))
    vis_update = jnp.where(mask, bit, jnp.uint32(0))
    new_vis = vol.vis.at[word].set(vol.vis[word] | vis_update)

    return GradSdfVolume(
        dist=new_dist, grad=new_grad, weight=new_weight, color=new_color, vis=new_vis
    )


def vis_bit(vis: jax.Array, frame_idx) -> jax.Array:
    """Extract boolean visibility of frame `frame_idx` -> [Z,Y,X] bool."""
    word = frame_idx // 32
    bit = jnp.uint32(1) << jnp.uint32(frame_idx % 32)
    return (vis[word] & bit) != 0


def vis_count(vis: jax.Array) -> jax.Array:
    """Number of frames each voxel was seen in -> [Z,Y,X] int32."""
    counts = jax.lax.population_count(vis)
    return jnp.sum(counts, axis=0).astype(jnp.int32)


def pack_tracking_payload(vol: GradSdfVolume) -> jax.Array:
    """Pack (dist, grad, weight) into one flat [V,8] row-gatherable payload.

    One TPU row-gather fetches a full voxel record — ~2.6x faster than three
    separate gathers (gather cost is per-row, not per-byte)."""
    zyx = vol.dist.shape
    return jnp.concatenate(
        [
            vol.dist[..., None],
            vol.grad,
            vol.weight[..., None],
            jnp.zeros(zyx + (3,), dtype=vol.dist.dtype),
        ],
        axis=-1,
    ).reshape(-1, 8)


def sdf_records_packed(
    payload_flat: jax.Array, geom: GridGeometry, pts: jax.Array
):
    """Nearest-voxel records at pts from a pack_tracking_payload buffer
    (ONE row-gather): (d, ghat, c_v, w, valid) — the pieces of the
    Gradient-SDF query (VolumetricGradSdf.h:76-93) before psi evaluation.
    Shared by sdf_query_packed and the tracker's frozen-correspondence
    rounds (tracking/tracker.py)."""
    idx, valid = geom.nearest_info(pts)
    X, Y = geom.dims[0], geom.dims[1]
    lin = (idx[..., 2] * Y + idx[..., 1]) * X + idx[..., 0]
    rows = jnp.take(payload_flat, lin, axis=0)
    d = rows[..., 0]
    g = rows[..., 1:4]
    w = rows[..., 4]
    gnorm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    ghat = g / jnp.maximum(gnorm, 1e-12)
    c_v = geom.voxel2world(idx)
    return d, ghat, c_v, w, valid


def sdf_query_packed(
    payload_flat: jax.Array, geom: GridGeometry, pts: jax.Array, truncation: float
):
    """sdf_query against a pack_tracking_payload buffer (one gather)."""
    d, ghat, c_v, w, valid = sdf_records_packed(payload_flat, geom, pts)
    psi = d + jnp.sum(ghat * (c_v - pts), axis=-1)
    psi = jnp.where(valid, psi, truncation)
    ghat = jnp.where(valid[..., None], ghat, 0.0)
    w = jnp.where(valid, w, 0.0)
    return psi, ghat, w, valid


def sdf_query(
    vol: GradSdfVolume, geom: GridGeometry, pts: jax.Array, truncation: float
):
    """Gradient-SDF point query (VolumetricGradSdf.h:76-93).

    psi(p) = dist[v] + ghat . (c_v - p) for the *nearest* voxel v (no
    trilerp — first-order extrapolation along the stored gradient).
    Returns (psi, ghat, weight, valid)."""
    idx, valid = geom.nearest_info(pts)
    d = vol.dist[idx[..., 2], idx[..., 1], idx[..., 0]]
    g = vol.grad[idx[..., 2], idx[..., 1], idx[..., 0]]
    w = vol.weight[idx[..., 2], idx[..., 1], idx[..., 0]]
    gnorm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    ghat = g / jnp.maximum(gnorm, 1e-12)
    c_v = geom.voxel2world(idx)
    psi = d + jnp.sum(ghat * (c_v - pts), axis=-1)
    psi = jnp.where(valid, psi, truncation)
    ghat = jnp.where(valid[..., None], ghat, 0.0)
    w = jnp.where(valid, w, 0.0)
    return psi, ghat, w, valid


def surface_band_mask(vol: GradSdfVolume, voxel_size: float) -> jax.Array:
    """Surface-band voxels: |dist| <= sqrt(3)*h and seen in >= 1 frame
    (OptimizerAux.cpp:237-257)."""
    band = jnp.abs(vol.dist) <= jnp.sqrt(3.0) * voxel_size
    seen = vis_count(vol.vis) >= 1
    return band & seen


def subsample_dist(dist: jax.Array, grad: jax.Array, voxel_size: float) -> jax.Array:
    """8-child distance subdivision d +- (h/4)(+-gx +-gy +-gz)
    (VolumetricGradSdf.cpp:469-494). Returns [Z,Y,X,2,2,2] child distances
    ordered child index (dz,dy,dx) in {0,1}."""
    g = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-12)
    h4 = 0.25 * voxel_size
    signs = jnp.array([-1.0, 1.0], dtype=jnp.float32)
    # offsets[dz,dy,dx] = sx*gx + sy*gy + sz*gz
    sx = signs.reshape(1, 1, 2)
    sy = signs.reshape(1, 2, 1)
    sz = signs.reshape(2, 1, 1)
    off = (
        sx * g[..., None, None, None, 0]
        + sy * g[..., None, None, None, 1]
        + sz * g[..., None, None, None, 2]
    )
    return dist[..., None, None, None] + h4 * off
