"""Bilinear image sampling and finite-difference image gradients.

Port-of-semantics (not code) of cpp/include/ps_optimizer/Auxilary.h:41-123:
  * bilinear_rgb(img, r, c): bilinear interpolation with the reference's
    border behavior — when the +1 neighbor row/column falls outside the
    image, interpolation degrades to 1-D (or nearest).  Images here are
    RGB float32 in [0,1] (the BGR->RGB swap of Auxilary.h:59 happens at
    load time in io/loaders.py instead).
  * image_gradient_rgb(img, r, c, axis): bilinearly-blended forward
    differences, axis=0 -> d/d(col) (u-direction), axis=1 -> d/d(row)
    (v-direction), matching computeImageGradient's direction convention
    as called from the Jacobians (PsOptimizerJa.cpp:79-80).

All functions take arbitrary batched (r, c) and are jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_rc(img: jax.Array, ri: jax.Array, ci: jax.Array) -> jax.Array:
    """img[(ri, ci)] with clipped integer indices; img is (H, W, C)."""
    H, W = img.shape[0], img.shape[1]
    ri = jnp.clip(ri, 0, H - 1)
    ci = jnp.clip(ci, 0, W - 1)
    return img[ri, ci]


def bilinear_rgb(img: jax.Array, r: jax.Array, c: jax.Array) -> jax.Array:
    """Sample (H,W,3) image at float (row, col) -> (...,3).

    Matches interpolateImage (Auxilary.h:41-61): four explicit cases for
    the +1 neighbors being out of range.
    """
    H, W = img.shape[0], img.shape[1]
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    fr = (r - r0.astype(r.dtype))[..., None]
    fc = (c - c0.astype(c.dtype))[..., None]

    v00 = _gather_rc(img, r0, c0)
    v01 = _gather_rc(img, r0, c0 + 1)
    v10 = _gather_rc(img, r0 + 1, c0)
    v11 = _gather_rc(img, r0 + 1, c0 + 1)

    full = (1 - fc) * (fr * v10 + (1 - fr) * v00) + fc * (fr * v11 + (1 - fr) * v01)
    col_only = (1 - fc) * v00 + fc * v01          # row+1 out of range
    row_only = fr * v10 + (1 - fr) * v00          # col+1 out of range
    nearest = v00

    row_ok = (r0 + 1 < H)[..., None]
    col_ok = (c0 + 1 < W)[..., None]
    return jnp.where(
        row_ok & col_ok,
        full,
        jnp.where(col_ok, col_only, jnp.where(row_ok, row_only, nearest)),
    )


def image_gradient_rgb(img: jax.Array, r: jax.Array, c: jax.Array, axis: int) -> jax.Array:
    """Finite-difference gradient of an (H,W,3) image at float (row,col).

    axis=0: d/d(col) (horizontal / u);  axis=1: d/d(row) (vertical / v).
    Matches computeImageGradient (Auxilary.h:64-123) including its border
    fallbacks (backward difference at the far edge, unweighted single
    difference when the other axis' +1 neighbor is out of range).
    """
    H, W = img.shape[0], img.shape[1]
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    fr = (r - r0.astype(r.dtype))[..., None]
    fc = (c - c0.astype(c.dtype))[..., None]
    row_ok = (r0 + 1 < H)[..., None]
    col_ok = (c0 + 1 < W)[..., None]

    if axis == 0:
        # column-direction difference, blended across rows
        d_r0 = _gather_rc(img, r0, c0 + 1) - _gather_rc(img, r0, c0)
        d_r1 = _gather_rc(img, r0 + 1, c0 + 1) - _gather_rc(img, r0 + 1, c0)
        # far-column fallback: backward difference
        b_r0 = _gather_rc(img, r0, c0) - _gather_rc(img, r0, c0 - 1)
        b_r1 = _gather_rc(img, r0 + 1, c0) - _gather_rc(img, r0 + 1, c0 - 1)
        blended = (1 - fr) * d_r0 + fr * d_r1
        blended_back = (1 - fr) * b_r0 + fr * b_r1
        return jnp.where(
            row_ok & col_ok,
            blended,
            jnp.where(~row_ok, d_r0, blended_back),
        )
    else:
        # row-direction difference, blended across columns
        d_c0 = _gather_rc(img, r0 + 1, c0) - _gather_rc(img, r0, c0)
        d_c1 = _gather_rc(img, r0 + 1, c0 + 1) - _gather_rc(img, r0, c0 + 1)
        b_c0 = _gather_rc(img, r0, c0) - _gather_rc(img, r0 - 1, c0)
        b_c1 = _gather_rc(img, r0, c0 + 1) - _gather_rc(img, r0 - 1, c0 + 1)
        blended = (1 - fc) * d_c0 + fc * d_c1
        blended_back = (1 - fc) * b_c0 + fc * b_c1
        return jnp.where(
            row_ok & col_ok,
            blended,
            jnp.where(~col_ok, d_c0, blended_back),
        )


def backproject_grid(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Backproject an (H,W) depth map to camera-frame points (H,W,3)."""
    H, W = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    cols = jnp.arange(W, dtype=depth.dtype)[None, :]
    rows = jnp.arange(H, dtype=depth.dtype)[:, None]
    x0 = (cols - cx) / fx
    y0 = (rows - cy) / fy
    return jnp.stack([x0 * depth, y0 * depth, depth], axis=-1)
